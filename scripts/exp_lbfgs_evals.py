"""Count L-BFGS line-search evaluations per step across config axes.

Originally (r3) tested the hypothesis that bf16's slower full-Wolfe rate
at 512px is eval-count-bound (noisier loss/gtd -> more line-search evals),
not per-eval speed. r4 adds the t_init axis: the 'unit' opening trial
(quasi-Newton t=1 once history exists) should be Wolfe-accepted most
steps, cutting evals/step on the eval-bound full-Wolfe path.

Usage: exp_lbfgs_evals.py [steps] [dtype1,dtype2] [t_init1,t_init2]
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
    content, style = load_image(CONTENT), load_image(STYLE)
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    dtypes = (sys.argv[2].split(",") if len(sys.argv) > 2
              else ["float32", "bfloat16"])
    t_inits = sys.argv[3].split(",") if len(sys.argv) > 3 else ["lr"]
    for dtype in dtypes:
        for t_init in t_inits:
            cfg = Config(levels_num=2, base_diameter=256, optimizer="lbfgs",
                         compute_dtype=dtype, lbfgs_t_init=t_init)
            job = TransferJob(content, style, cfg)
            runners = _build_runners(cfg, tuple(job.level_shapes))
            x = jnp.array(job._x0, copy=True)
            opt = runners.init(job.params, job.targets, x)
            t0 = time.perf_counter()
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
