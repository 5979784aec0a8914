"""Count L-BFGS line-search evaluations per step, f32 vs bf16.

Tests the hypothesis that bf16's slower full-Wolfe rate at 512px is
eval-count-bound (noisier loss/gtd -> more line-search evals), not
per-eval speed.
"""
import sys

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
    for dtype in ("float32", "bfloat16"):
        cfg = Config(levels_num=2, base_diameter=256, optimizer="lbfgs",
                     compute_dtype=dtype)
        job = TransferJob(content, style, cfg)
        runners = _build_runners(cfg, tuple(job.level_shapes))
        x = jnp.array(job._x0, copy=True)
        opt = runners.init(job.params, job.targets, x)
        x, opt, f = runners.chunk(job.params, job.targets, x, opt,
                                  jnp.int32(0), steps)
        n_evals = int(np.asarray(opt.n_evals))
        print(f"{dtype}: {steps} steps, {n_evals} evals "
              f"({n_evals / steps:.2f}/step), final loss "
              f"{float(np.asarray(f)):.4e}", flush=True)


if __name__ == "__main__":
    main()
