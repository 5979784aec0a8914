"""Prototype: AUTO entry layouts for the per-job targets.

Compile the chunk-style loop with Layout.AUTO on the targets pytree, read
back the compiler-chosen input formats, device_put the targets into them
(one-time relayout), and differential-time the loop. Success = ~58 ms/step
at 3level1024 bf16 (the all-const number) with targets still runtime args.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.experimental.layout import Format, Layout

sys.path.insert(0, "/root/repo")

from artstyletransfer_tpu.config import Config
from artstyletransfer_tpu.engine.transfer import TransferJob, _make_pyramid_loss
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
    loss_fn = _make_pyramid_loss(list(job.level_shapes), cfg)
    params, targets = job.params, job.targets
    x0 = jnp.asarray(job._x0, copy=True)
    opt = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    opt0 = opt.init(x0)

    def scalar_loss(p, t, x):
        total, _ = loss_fn(p, t, x)
        return total

    vgrad = jax.value_and_grad(scalar_loss, argnums=2)

    def body_for(p, t):
        def body(i, carry):
            x, o, _ = carry
            f, g = vgrad(p, t, x)
            upd, o = opt.update(g, o)
            lr = cfg.lr_start * jnp.power(jnp.float32(cfg.lr_decay),
                                          i.astype(jnp.float32) + 1.0)
            return x - lr * upd, o, f
        return body

    def loop(t, x, o, n):
        return jax.lax.fori_loop(0, n, body_for(params, t),
                                 (x, o, jnp.float32(0.0)))

    # in_shardings: AUTO layout for targets, default for the rest
    auto_t = jax.tree.map(lambda _: Format(Layout.AUTO), targets)
    times = {}
    for n in (10, 60):
        jf = jax.jit(lambda t, x, o: loop(t, x, o, n),
                     in_shardings=(auto_t, None, None))
        lowered = jf.lower(targets, x0, opt0)
        compiled = lowered.compile()
        formats = compiled.input_formats[0]
        t_fmt = formats[0]
        if n == 10:
            for lvl, (cf, gfs) in enumerate(t_fmt):
                print(f"level {lvl} content layout: {cf}", file=sys.stderr)
        t_dev = jax.tree.map(jax.device_put, targets, t_fmt)
        out = compiled(t_dev, x0, opt0)
        sync(out[2])  # warm
        t0 = time.perf_counter()
        out = compiled(t_dev, x0, opt0)
        sync(out[2])
        times[n] = time.perf_counter() - t0
    ms = (times[60] - times[10]) / 50 * 1e3
    print(f"AUTO-layout targets ({dtype}): {ms:.2f} ms/step "
          f"(T10={times[10]:.2f} T60={times[60]:.2f})", flush=True)


if __name__ == "__main__":
    main()
