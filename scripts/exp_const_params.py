"""Isolate the 55 vs 70 ms/step gap between the ablate grad loop and the
real chunk_fn: params/targets as jit constants vs runtime arguments, and
the Adam update vs plain AXPY.

Variants (all at 3level1024, fori_loop differential timing):
  A const params + axpy        (= ablate grad3)
  B const params + adam+lrpow  (real step math, const weights)
  C arg   params + axpy        (ablate math, runtime weights)
  D arg   params + adam+lrpow  (= real chunk_fn)
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

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
    only = set(sys.argv[2:]) or {"A", "B", "C", "D"}
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

    def axpy_body(p, t):
        def body(i, carry):
            x, o, _ = carry
            f, g = vgrad(p, t, x)
            return x - 1e-12 * g, o, f
        return body

    def adam_body(p, t):
        def body(i, carry):
            x, o, _ = carry
            f, g = vgrad(p, t, x)
            upd, o = opt.update(g, o)
            lr = cfg.lr_start * jnp.power(jnp.float32(cfg.lr_decay),
                                          i.astype(jnp.float32) + 1.0)
            return x - lr * upd, o, f
        return body

    def run_const(body_maker, n):
        body = body_maker(params, targets)
        @jax.jit
        def f():
            return jax.lax.fori_loop(0, n, body,
                                     (x0, opt0, jnp.float32(0.0)))
        return f

    def run_arg(body_maker, n):
        @jax.jit
        def f(p, t, x, o):
            return jax.lax.fori_loop(0, n, body_maker(p, t),
                                     (x, o, jnp.float32(0.0)))
        return lambda: f(params, targets, x0, opt0)

    def timeit(tag, make):
        times = {}
        for n in (10, 60):
            f = make(n)
            sync(f()[2])
            t0 = time.perf_counter()
            sync(f()[2])
            times[n] = time.perf_counter() - t0
        ms = (times[60] - times[10]) / 50 * 1e3
        print(f"{tag}: {ms:.2f} ms/step (T10={times[10]:.2f} T60={times[60]:.2f})",
              flush=True)

    def run_pt_const(body_maker, n):
        # deployable: params+targets baked in, x/opt_state runtime args
        body = body_maker(params, targets)
        @jax.jit
        def f(x, o):
            return jax.lax.fori_loop(0, n, body,
                                     (x, o, jnp.float32(0.0)))
        return lambda: f(x0, opt0)

    def run_p_const(body_maker, n):
        # serving-friendly: only params baked in (targets differ per job)
        @jax.jit
        def f(t, x, o):
            return jax.lax.fori_loop(0, n, body_maker(params, t),
                                     (x, o, jnp.float32(0.0)))
        return lambda: f(targets, x0, opt0)

    if "A" in only:
        timeit("A const+axpy", lambda n: run_const(axpy_body, n))
    if "B" in only:
        timeit("B const+adam", lambda n: run_const(adam_body, n))
    if "C" in only:
        timeit("C arg+axpy  ", lambda n: run_arg(axpy_body, n))
    if "D" in only:
        timeit("D arg+adam  ", lambda n: run_arg(adam_body, n))
    if "E" in only:
        timeit("E pt-const+adam (x,opt args)",
               lambda n: run_pt_const(adam_body, n))
    if "F" in only:
        timeit("F p-const+adam (t,x,opt args)",
               lambda n: run_p_const(adam_body, n))

    # which target tensor forces the per-step tax: the content tap or the
    # gram matrices?
    contents = [t[0] for t in targets]
    gramss = [t[1] for t in targets]

    def run_mixed(const_content, n):
        @jax.jit
        def f(rt, x, o):
            if const_content:
                t = [(c, g) for c, g in zip(contents, rt)]
            else:
                t = [(c, g) for c, g in zip(rt, gramss)]
            return jax.lax.fori_loop(0, n, adam_body(params, t),
                                     (x, o, jnp.float32(0.0)))
        rt = gramss if const_content else contents
        return lambda: f(rt, x0, opt0)

    if "G" in only:
        timeit("G content-const grams-arg", lambda n: run_mixed(True, n))
    if "H" in only:
        timeit("H grams-const content-arg", lambda n: run_mixed(False, n))

    # K: content targets stored FLAT (1-D) so their entry layout imposes no
    # 4-D tiling constraint on the conv cluster; the tap is flattened at the
    # comparison point instead (one explicit relayout of the tap per use).
    from artstyletransfer_tpu.models.vgg19 import (
        CONTENT_INDEX, STYLE_INDICES, extract_features)
    from artstyletransfer_tpu.ops.losses import _style_layer_mse_convbwd
    from artstyletransfer_tpu.ops.resize import downscale2x
    from artstyletransfer_tpu.ops.tv import total_variation

    shapes = list(job.level_shapes)
    flat_contents = [c.reshape(-1) for c in contents]

    def loss_flat(p, fc, gs, x):
        total = jnp.float32(0.0)
        img = x.reshape(shapes[0])
        for lvl, shp in enumerate(shapes):
            if lvl > 0:
                img = downscale2x(img)
            feats = extract_features(p, img, cfg.compute_dtype,
                                     cfg.conv_precision)
            c = jnp.mean(jnp.square(
                feats[CONTENT_INDEX].astype(jnp.float32).reshape(-1)
                - fc[lvl]))
            s = jnp.float32(0.0)
            for gt, i in zip(gs[lvl], STYLE_INDICES):
                s = s + _style_layer_mse_convbwd(feats[i], gt[0])
            s = s / len(STYLE_INDICES)
            t = total_variation(img)
            total = total + (cfg.content_weight * c + cfg.style_weight * s
                             + cfg.tv_weight * t)
        return total

    def run_flat(n):
        vg = jax.value_and_grad(loss_flat, argnums=3)

        @jax.jit
        def f(fc, gs, x, o):
            def body(i, carry):
                x, o, _ = carry
                fv, g = vg(params, fc, gs, x)
                upd, o = opt.update(g, o)
                lr = cfg.lr_start * jnp.power(jnp.float32(cfg.lr_decay),
                                              i.astype(jnp.float32) + 1.0)
                return x - lr * upd, o, fv
            return jax.lax.fori_loop(0, n, body, (x, o, jnp.float32(0.0)))
        return lambda: f(flat_contents, gramss, x0, opt0)

    if "K" in only:
        timeit("K flat-content-arg", run_flat)

    # L: break the entry-layout constraint chain by passing each content
    # target through a full-shape dynamic-update-slice inside the body —
    # the DUS output's layout is compiler-chosen (not pinned to the entry
    # param), so the relayout should land on the 17 MB loop-invariant
    # instead of cascading into the activations.
    from jax import lax

    def run_dus(n):
        def launder(t):
            return lax.dynamic_update_slice(t, t[0:1], (0,) * t.ndim)

        @jax.jit
        def f(t, x, o):
            def body(i, carry):
                x, o, _ = carry
                tl = [(launder(c), g) for c, g in t]
                fv, g_ = vgrad(params, tl, x)
                upd, o = opt.update(g_, o)
                lr = cfg.lr_start * jnp.power(jnp.float32(cfg.lr_decay),
                                              i.astype(jnp.float32) + 1.0)
                return x - lr * upd, o, fv
            return jax.lax.fori_loop(0, n, body, (x, o, jnp.float32(0.0)))
        return lambda: f(targets, x0, opt0)

    if "L" in only:
        timeit("L dus-laundered-content", run_dus)


if __name__ == "__main__":
    main()
