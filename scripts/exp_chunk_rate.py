"""Differential-time the REAL compiled chunk_fn (Adam path) on the chip.

Compares against the ablate-style grad loop to locate any per-step cost
the production step carries beyond the raw pyramid gradient.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from artstyletransfer_tpu.config import Config
from artstyletransfer_tpu.engine.transfer import TransferJob, _build_runners
from artstyletransfer_tpu.utils.image import load_image

CONTENT = "/root/reference/data/content-images/bird.jpg"
STYLE = "/root/reference/data/style-images/cubism2.jpg"


def sync(arr):
    return float(np.asarray(arr).ravel()[0])


def main():
    dtype = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"
    cfg = Config(levels_num=3, base_diameter=256, optimizer="adam",
                 iters_num=100, stream_every=50, compute_dtype=dtype)
    content, style = load_image(CONTENT), load_image(STYLE)
    job = TransferJob(content, style, cfg)
    runners = _build_runners(cfg, tuple(job.level_shapes))
    params, targets = job.params, job.targets
    x0 = jnp.asarray(job._x0, copy=True)
    opt0 = runners.init(params, targets, x0)

    times = {}
    for n in (10, 60):
        # fresh buffers each call (chunk donates x/opt_state)
        x = jnp.array(x0, copy=True)
        o = jax.tree.map(lambda a: jnp.array(a, copy=True), opt0)
        out = runners.chunk(params, targets, x, o, jnp.int32(0), n)
        sync(out[2])  # compile+warm
        x = jnp.array(x0, copy=True)
        o = jax.tree.map(lambda a: jnp.array(a, copy=True), opt0)
        t0 = time.perf_counter()
        out = runners.chunk(params, targets, x, o, jnp.int32(0), n)
        sync(out[2])
        times[n] = time.perf_counter() - t0
    ms = (times[60] - times[10]) / 50 * 1e3
    print(f"real chunk_fn ({dtype}): {ms:.2f} ms/step "
          f"(T10={times[10]:.2f}s T60={times[60]:.2f}s)", flush=True)


if __name__ == "__main__":
    main()
