"""Count L-BFGS line-search evaluations per step across config axes.

Originally (r3) tested the hypothesis that bf16's slower full-Wolfe rate
at 512px is eval-count-bound (noisier loss/gtd -> more line-search evals),
not per-eval speed. r4 adds the t_init axis: the 'unit' opening trial
(quasi-Newton t=1 once history exists) should be Wolfe-accepted most
steps, cutting evals/step on the eval-bound full-Wolfe path.

Usage: exp_lbfgs_evals.py [steps] [dtype1,dtype2] [t_init1,t_init2]
                          [--per-chunk N]

--per-chunk N additionally reports evals/step for every N-step segment
of the run (one device sync per segment): the r4 8-job serving runs
showed per-chunk wall ~4x higher over steps 250-500 than 0-250, and the
segment profile separates "searches get longer near convergence"
(which a smarter opening trial could fix) from a constant rate.
"""
import sys
import time

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from artstyletransfer_tpu.config import Config
from artstyletransfer_tpu.engine.transfer import TransferJob, _build_runners
from artstyletransfer_tpu.utils.image import load_image

CONTENT = "/root/reference/data/content-images/bird.jpg"
STYLE = "/root/reference/data/style-images/cubism2.jpg"


def main():
    argv = list(sys.argv[1:])
    per_chunk = 0
    if "--per-chunk" in argv:
        i = argv.index("--per-chunk")
        per_chunk = int(argv[i + 1])
        del argv[i:i + 2]
    content, style = load_image(CONTENT), load_image(STYLE)
    steps = int(argv[0]) if len(argv) > 0 else 100
    dtypes = argv[1].split(",") if len(argv) > 1 else ["float32", "bfloat16"]
    t_inits = argv[2].split(",") if len(argv) > 2 else ["lr"]
    for dtype in dtypes:
        for t_init in t_inits:
            cfg = Config(levels_num=2, base_diameter=256, optimizer="lbfgs",
                         compute_dtype=dtype, lbfgs_t_init=t_init)
            job = TransferJob(content, style, cfg)
            runners = _build_runners(cfg, tuple(job.level_shapes))
            x = jnp.array(job._x0, copy=True)
            opt = runners.init(job.params, job.targets, x)
            t0 = time.perf_counter()
            if per_chunk:
                evals_before, done = 0, 0
                while done < steps:
                    n = min(per_chunk, steps - done)
                    tc = time.perf_counter()
                    x, opt, f = runners.chunk(job.params, job.targets, x,
                                              opt, jnp.int32(done), n)
                    evals_now = int(np.asarray(opt.n_evals))  # device sync
                    wc = time.perf_counter() - tc
                    seg = evals_now - evals_before
                    note = ("" if n == per_chunk else
                            " [fresh executable: wall includes its "
                            "compile]")
                    print(f"  steps {done}-{done + n}: {seg} evals "
                          f"({seg / n:.2f}/step), loss "
                          f"{float(np.asarray(f)):.4e}, {wc:.1f}s{note}",
                          flush=True)
                    evals_before, done = evals_now, done + n
            else:
                x, opt, f = runners.chunk(job.params, job.targets, x, opt,
                                          jnp.int32(0), steps)
            n_evals = int(np.asarray(opt.n_evals))  # also the device sync
            wall = time.perf_counter() - t0
            print(f"{dtype} t_init={t_init}: {steps} steps, {n_evals} evals "
                  f"({n_evals / steps:.2f}/step), final loss "
                  f"{float(np.asarray(f)):.4e}, "
                  f"{wall:.1f}s incl. compile", flush=True)
            del x, opt, f


if __name__ == "__main__":
    main()
