"""Per-tap fused-style-bwd crossover experiment at small resolutions.

Times the level-0 grad step with the fused 1x1-conv style backward applied
to a chosen subset of taps (by min h*w), at 256px and 512px.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from artstyletransfer_tpu.config import Config
from artstyletransfer_tpu.engine.transfer import TransferJob
from artstyletransfer_tpu.models.vgg19 import (
    extract_features, CONTENT_INDEX, STYLE_INDICES)
from artstyletransfer_tpu.ops.losses import _style_layer_mse_convbwd
from artstyletransfer_tpu.ops.gram import gram_matrix
from artstyletransfer_tpu.ops.tv import total_variation
from artstyletransfer_tpu.utils.image import load_image

CONTENT = "/root/reference/data/content-images/bird.jpg"
STYLE = "/root/reference/data/style-images/cubism2.jpg"


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def sync(arr):
    return float(np.asarray(arr).ravel()[0])


def time_loop(tag, step, x0, iters=(20, 120)):
    """Differential timing: run jitted fori_loop at two trip counts."""
    def run(n):
        def body(_, x):
            return step(x)
        return jax.lax.fori_loop(0, n, body, x0)

    times = {}
    for n in iters:
        f = jax.jit(lambda: run(n))
        sync(f())  # compile+warm
        t0 = time.perf_counter()
        sync(f())
        times[n] = time.perf_counter() - t0
    ms = (times[iters[1]] - times[iters[0]]) / (iters[1] - iters[0]) * 1e3
    log(f"{tag}: {ms:.2f} ms/step")
    return ms


def main():
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    dtype = sys.argv[2] if len(sys.argv) > 2 else "float32"
    cfg = Config(levels_num=1, base_diameter=base, optimizer="adam",
                 iters_num=100, stream_every=50, compute_dtype=dtype)
    content, style = load_image(CONTENT), load_image(STYLE)
    job = TransferJob(content, style, cfg)
    log(f"pyramid: {job.level_shapes}, dtype {dtype}")
    shape = job.level_shapes[0]
    params = job.params
    t_content, t_grams = job.targets[0]
    x0 = jnp.asarray(job._x0, copy=True)

    def make_loss(min_pixels):
        def loss(x):
            img = x.reshape(shape)
            feats = extract_features(params, img, cfg.compute_dtype,
                                     cfg.conv_precision)
            c = jnp.mean(jnp.square(
                feats[CONTENT_INDEX].astype(jnp.float32) - t_content))
            s = jnp.float32(0.0)
            for gt, i in zip(t_grams, STYLE_INDICES):
                f = feats[i]
                _, h, w, _ = f.shape
                if h * w >= min_pixels:
                    s = s + _style_layer_mse_convbwd(f, gt[0])
                else:
                    s = s + jnp.mean(jnp.square(gram_matrix(f)[0] - gt[0]))
            s = s / len(STYLE_INDICES)
            t = total_variation(img)
            return (cfg.content_weight * c + cfg.style_weight * s
                    + cfg.tv_weight * t)
        return loss

    variants = [("none (autodiff)", 1 << 62),
                ("all fused", 0),
                ("fused >=2^17 px", 1 << 17),
                ("fused >=2^16 px", 1 << 16),
                ("fused >=2^14 px", 1 << 14)]
    results = {}
    for tag, mp in variants:
        g = jax.grad(make_loss(mp))
        results[tag] = time_loop(tag, lambda x: x - 1e-12 * g(x),
                                 jnp.array(x0, copy=True))
    for tag, ms in results.items():
        print(f"{base}px {dtype} {tag}: {ms:.2f} ms/step")


if __name__ == "__main__":
    main()
