"""Ablation profiler for the 3level1024 optimization step (VERDICT r1 #1).

Times jitted fori_loop variants of the hot step on the current JAX platform
(the real v5e chip when run under the ambient axon env). Differential
timing — run each loop at two trip counts and divide the delta — cancels
the remote tunnel's per-dispatch latency (~0.5-1s) and any constant
chunk-entry cost, leaving pure per-step device time.

Usage:  python scripts/ablate_step.py [variant ...]   (default: all)
Output: per-variant ms/step on stderr + a JSON dict on stdout.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")

from artstyletransfer_tpu.config import Config
from artstyletransfer_tpu.engine.transfer import (TransferJob,
                                                  _make_pyramid_loss)
from artstyletransfer_tpu.models.vgg19 import (CONTENT_INDEX, STYLE_INDICES,
                                               extract_features)
from artstyletransfer_tpu.ops.gram import gram_matrix
from artstyletransfer_tpu.utils.image import load_image

CONTENT = "/root/reference/data/content-images/bird.jpg"
STYLE = "/root/reference/data/style-images/cubism2.jpg"

N_LO, N_HI = 10, 60  # differential trip counts


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_loop(name, body, x0, n_lo=N_LO, n_hi=N_HI):
    """body(x) -> x (loop-carried). Returns ms per iteration."""

    def run(x, n):
        return lax.fori_loop(0, n, lambda i, xx: body(xx), x)

    fn = jax.jit(run)

    def block(out):
        # block_until_ready is unreliable through the axon tunnel for some
        # outputs; fetching one scalar forces a real device sync (the fetch
        # cost is constant and cancelled by the differential timing)
        jax.block_until_ready(out)
        leaf = jax.tree.leaves(out)[0]
        float(leaf.ravel()[0])

    # warmup/compile at both trip counts (dynamic bound -> one executable,
    # but be safe)
    block(fn(x0, N_LO))
    times = {}
    for n in (n_lo, n_hi):
        reps = []
        for _ in range(3):
            t0 = time.time()
            block(fn(x0, n))
            reps.append(time.time() - t0)
        times[n] = min(reps)
    ms = (times[n_hi] - times[n_lo]) / (n_hi - n_lo) * 1e3
    log(f"{name:34s} {ms:8.2f} ms/step   "
        f"(T{n_lo}={times[n_lo]:.2f}s T{n_hi}={times[n_hi]:.2f}s)")
    return ms


def main(argv):
    only = set(argv) if argv else None
    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    import os

    dtype = os.environ.get("ASTT_ABLATE_DTYPE", "float32")
    pool = os.environ.get("ASTT_ABLATE_POOL", "reduce_window")
    cfg = Config(levels_num=3, base_diameter=256, optimizer="adam",
                 iters_num=100, stream_every=50, compute_dtype=dtype,
                 pool_impl=pool)
    log(f"compute_dtype: {dtype}, pool_impl: {pool}")
    content, style = load_image(CONTENT), load_image(STYLE)
    job = TransferJob(content, style, cfg)
    log(f"pyramid: {job.level_shapes}")
    params, targets = job.params, job.targets
    x0 = jnp.array(job._x0, copy=True)
    top_shape = job.level_shapes[0]

    loss_fn = _make_pyramid_loss(job.level_shapes, cfg)

    def scalar_loss(x):
        total, _ = loss_fn(params, targets, x)
        return total

    results = {}

    def want(name):
        return only is None or name in only

    # -- 1. full grad (3 levels, no optimizer update) ------------------------
    if want("grad3"):
        g = jax.grad(scalar_loss)
        results["grad3"] = time_loop("grad 3-level", lambda x: x - 1e-12 * g(x), x0)

    # -- 2. forward-only (3 levels) ------------------------------------------
    if want("fwd3"):
        results["fwd3"] = time_loop(
            "fwd 3-level", lambda x: x + 1e-30 * scalar_loss(x), x0)

    # -- per-level grad: 1-level loss at each pyramid resolution -------------
    for lvl in range(3):
        key = f"grad_lvl{lvl}"
        if not want(key):
            continue
        shape = job.level_shapes[lvl]
        lvl_loss = _make_pyramid_loss([shape], cfg)
        tgt = (targets[lvl],)
        x_l = jnp.zeros((int(np.prod(shape)),), jnp.float32) + x0[:1]

        def sl(x, lvl_loss=lvl_loss, tgt=tgt):
            total, _ = lvl_loss(params, tgt, x)
            return total

        g = jax.grad(sl)
        results[key] = time_loop(f"grad level{lvl} only {shape[1:3]}",
                                 lambda x, g=g: x - 1e-12 * g(x), x_l)

    # -- content-only grad at level0 (isolates Gram cost by subtraction) -----
    if want("grad_content0"):
        shape = top_shape
        t_content = targets[0][0]

        def content_only(x):
            img = x.reshape(shape)
            feats = extract_features(params, img, cfg.compute_dtype,
                                     cfg.conv_precision)
            return jnp.mean(jnp.square(feats[CONTENT_INDEX] - t_content))

        g = jax.grad(content_only)
        x_l = jnp.array(x0, copy=True)
        results["grad_content0"] = time_loop(
            "grad level0 content-only", lambda x: x - 1e-12 * g(x), x_l)

    # -- VGG forward only at level0 (tap sums, no gram/losses) ---------------
    if want("vgg_fwd0"):
        def tap_sum(x):
            img = x.reshape(top_shape)
            feats = extract_features(params, img, cfg.compute_dtype,
                                     cfg.conv_precision)
            return sum(jnp.sum(f) for f in feats)

        results["vgg_fwd0"] = time_loop(
            "vgg fwd level0 (taps only)",
            lambda x: x + 1e-30 * tap_sum(x), jnp.array(x0, copy=True))

    # -- VGG forward+backward at level0 --------------------------------------
    if want("vgg_bwd0"):
        def tap_sum(x):
            img = x.reshape(top_shape)
            feats = extract_features(params, img, cfg.compute_dtype,
                                     cfg.conv_precision)
            return sum(jnp.sum(f) for f in feats)

        g = jax.grad(tap_sum)
        results["vgg_bwd0"] = time_loop(
            "vgg fwd+bwd level0 (taps only)",
            lambda x: x - 1e-12 * g(x), jnp.array(x0, copy=True))

    # -- maxpool chain fwd+bwd isolation (level0 sizes) -----------------------
    if want("pool0"):
        h, w = top_shape[1], top_shape[2]
        y0 = jnp.ones((1, h, w, 64), jnp.float32).reshape(-1)

        def pool_chain(y):
            from artstyletransfer_tpu.models.vgg19 import _maxpool2

            z = y.reshape(1, h, w, 64)
            for _ in range(4):
                z = _maxpool2(z)
            return jnp.sum(z)

        g = jax.grad(pool_chain)
        results["pool0"] = time_loop(
            "4x maxpool fwd+bwd @level0 c64",
            lambda y: y - 1e-12 * g(y), y0)

    # -- gram fwd+bwd at level0 relu1_1 size ----------------------------------
    if want("gram0"):
        h, w = top_shape[1], top_shape[2]
        y0 = jnp.ones((1, h, w, 64), jnp.float32).reshape(-1)

        def gram_loss(y):
            z = y.reshape(1, h, w, 64)
            return jnp.sum(gram_matrix(z))

        g = jax.grad(gram_loss)
        results["gram0"] = time_loop(
            "gram fwd+bwd @level0 c64",
            lambda y: y - 1e-12 * g(y), y0)

    # -- level0 grad with alternative gram formulations -----------------------
    # The bf16 profile shows the style-gram path adds ~49 ms to a ~30 ms
    # content-only grad while the gram matmuls are worth ~3 ms: the cost is
    # XLA layout copies between the conv fusions' space-to-depth tap layouts
    # and the standard layout the flattening reshape forces on the dot. These
    # variants express the SAME contraction without flattening h*w, giving
    # layout assignment the freedom to keep (parts of) the tap layout.
    def _style_level0_variant(tag, gram_fn):
        if not want(tag):
            return
        from artstyletransfer_tpu.ops.tv import total_variation

        shape = top_shape
        t_content, t_grams = targets[0]

        def loss_v(x):
            img = x.reshape(shape)
            feats = extract_features(params, img, cfg.compute_dtype,
                                     cfg.conv_precision)
            c = jnp.mean(jnp.square(
                feats[CONTENT_INDEX].astype(jnp.float32) - t_content))
            s = jnp.float32(0.0)
            for gt, i in zip(t_grams, STYLE_INDICES):
                s = s + jnp.mean(jnp.square(gt[0] - gram_fn(feats[i])[0]))
            s = s / len(STYLE_INDICES)
            t = total_variation(img)
            return (cfg.content_weight * c + cfg.style_weight * s
                    + cfg.tv_weight * t)

        g = jax.grad(loss_v)
        results[tag] = time_loop(f"grad level0 {tag}",
                                 lambda x: x - 1e-12 * g(x),
                                 jnp.array(x0, copy=True))

    def _gram4d(x):
        b, h, w, c = x.shape
        gram = jnp.einsum("bhwc,bhwd->bcd", x, x,
                          preferred_element_type=jnp.float32)
        return gram / jnp.asarray(c * h * w, jnp.float32)

    def _gramh(x, kmax=64):
        b, h, w, c = x.shape
        k = 1
        for kk in range(2, kmax + 1):
            if h % kk == 0 and (h // kk) * w < (1 << 17):
                k = kk
                break
        xs = x.reshape(b, k, h // k, w, c)
        gram = jnp.einsum("bkhwc,bkhwd->bkcd", xs, xs,
                          preferred_element_type=jnp.float32)
        return jnp.sum(gram, axis=1) / jnp.asarray(c * h * w, jnp.float32)

    def _gramrow(x):
        b, h, w, c = x.shape
        gram = jnp.einsum("bhwc,bhwd->bhcd", x, x,
                          preferred_element_type=jnp.float32)
        return jnp.sum(gram, axis=1) / jnp.asarray(c * h * w, jnp.float32)

    # -- lane-aligned shapes: same job, content resized so every level W is a
    # multiple of 128 (1532 -> 1536). If the tap layout copies are padded
    # sublane/lane shuffles, alignment should collapse their cost.
    if want("grad3_aligned"):
        from artstyletransfer_tpu.ops.resize import bicubic_resize_np

        c_al = bicubic_resize_np(content, 1024, 1536)
        job_al = TransferJob(c_al, style, cfg)
        loss_al = _make_pyramid_loss(job_al.level_shapes, cfg)
        t_al, p_al = job_al.targets, job_al.params

        def sl_al(x):
            total, _ = loss_al(p_al, t_al, x)
            return total

        g = jax.grad(sl_al)
        results["grad3_aligned"] = time_loop(
            "grad 3-level W%128==0 (1024x1536)",
            lambda x: x - 1e-12 * g(x), jnp.array(job_al._x0, copy=True))

    _style_level0_variant("style0_base", gram_matrix)
    _style_level0_variant("style0_gram4d", _gram4d)
    _style_level0_variant("style0_gramh", _gramh)
    _style_level0_variant("style0_gramrow", _gramrow)

    # -- custom-VJP style loss: backward as a 1x1 conv -------------------------
    # d/df mean((G - Gt)^2) = (4 / (c^2 * chw)) * f @ (G - Gt): a 1x1 conv of
    # the tap with a (c,c) kernel. A conv consumer can eat the tap in its
    # native space-to-depth layout and emit the cotangent straight into the
    # transpose-conv backward cluster — no standard-layout round trip.
    if want("style0_convbwd"):
        @jax.custom_vjp
        def style_layer_mse(f, gt):
            g = _gram4d(f)[0]
            return jnp.mean(jnp.square(g - gt))

        def _fwd(f, gt):
            g = _gram4d(f)[0]
            return jnp.mean(jnp.square(g - gt)), (f, g, gt)

        def _bwd(res, s):
            f, g, gt = res
            _, h, w, c = f.shape
            d = g - gt
            scale = 2.0 / (c * c * c * h * w)
            ker = ((d + d.T) * (scale * s)).astype(f.dtype)[None, None]
            df = lax.conv_general_dilated(
                f, ker, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return df, None

        style_layer_mse.defvjp(_fwd, _bwd)

        from artstyletransfer_tpu.ops.tv import total_variation

        shape = top_shape
        t_content, t_grams = targets[0]

        def loss_cb(x):
            img = x.reshape(shape)
            feats = extract_features(params, img, cfg.compute_dtype,
                                     cfg.conv_precision)
            c = jnp.mean(jnp.square(
                feats[CONTENT_INDEX].astype(jnp.float32) - t_content))
            s = jnp.float32(0.0)
            for gt, i in zip(t_grams, STYLE_INDICES):
                s = s + style_layer_mse(feats[i], gt[0])
            s = s / len(STYLE_INDICES)
            t = total_variation(img)
            return (cfg.content_weight * c + cfg.style_weight * s
                    + cfg.tv_weight * t)

        g = jax.grad(loss_cb)
        results["style0_convbwd"] = time_loop(
            "grad level0 conv1x1-backward style",
            lambda x: x - 1e-12 * g(x), jnp.array(x0, copy=True))

    # -- full grad with Pallas gram/TV kernels --------------------------------
    if want("grad3_pallas"):
        cfgp = Config(levels_num=3, base_diameter=256, optimizer="adam",
                      use_pallas=True)
        lossp = _make_pyramid_loss(job.level_shapes, cfgp)

        def slp(x):
            total, _ = lossp(params, targets, x)
            return total

        g = jax.grad(slp)
        results["grad3_pallas"] = time_loop(
            "grad 3-level pallas gram/tv", lambda x: x - 1e-12 * g(x),
            jnp.array(x0, copy=True))

    # -- bf16 full grad --------------------------------------------------------
    if want("grad3_bf16"):
        cfg16 = Config(levels_num=3, base_diameter=256, optimizer="adam",
                       compute_dtype="bfloat16")
        loss16 = _make_pyramid_loss(job.level_shapes, cfg16)

        def sl16(x):
            total, _ = loss16(params, targets, x)
            return total

        g = jax.grad(sl16)
        results["grad3_bf16"] = time_loop(
            "grad 3-level bf16", lambda x: x - 1e-12 * g(x),
            jnp.array(x0, copy=True))

    print(json.dumps(results))
    return 0


def extra_ablations(argv):
    """Second round: gram formulations + pool alternatives (run directly)."""
    only = set(argv) if argv else None
    log(f"backend: {jax.default_backend()}")
    h, w, c = 1024, 1532, 64
    n = h * w
    results = {}

    def want(nm):
        return only is None or nm in only

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.random((1, h, w, c)).astype(np.float32))
    target = jnp.asarray(rng.random((c, c)).astype(np.float32))

    # realistic gram backward: MSE against a target gram
    if want("gram_mse"):
        def loss(y):
            g = gram_matrix(y.reshape(1, h, w, c))
            return jnp.mean(jnp.square(g[0] - target))

        gr = jax.grad(loss)
        results["gram_mse"] = time_loop(
            "gram+MSE fwd+bwd f32", lambda y: y - 1e-12 * gr(y),
            feats.reshape(-1))

    if want("gram_mse_bf16"):
        def loss16(y):
            z = y.reshape(1, h, w, c).astype(jnp.bfloat16)
            zz = z.reshape(1, n, c)
            g = jnp.einsum("bnc,bnd->bcd", zz, zz,
                           preferred_element_type=jnp.float32)
            g = g / jnp.float32(c * n)
            return jnp.mean(jnp.square(g[0] - target))

        gr = jax.grad(loss16)
        results["gram_mse_bf16"] = time_loop(
            "gram+MSE fwd+bwd bf16-in", lambda y: y - 1e-12 * gr(y),
            feats.reshape(-1))

    if want("gram_mse_bf16_chunked"):
        def loss16c(y):
            # gram_matrix short-circuits bf16 below 2^21 into the 4-D dot,
            # so build the chunked lowering explicitly to measure it
            z = y.reshape(1, h, w, c).astype(jnp.bfloat16)
            k = 64
            n = h * w
            feats = z.reshape(1, k, n // k, c)
            g = jnp.einsum("bknc,bknd->bkcd", feats, feats,
                           preferred_element_type=jnp.float32)
            g = jnp.sum(g, axis=1) / (c * n)
            return jnp.mean(jnp.square(g[0] - target))

        gr = jax.grad(loss16c)
        results["gram_mse_bf16_chunked"] = time_loop(
            "gram(chunked)+MSE fwd+bwd bf16-in", lambda y: y - 1e-12 * gr(y),
            feats.reshape(-1))

    if want("gram_mse_2d"):
        def loss2d(y):
            z = y.reshape(n, c)
            g = jnp.dot(z.T, z, preferred_element_type=jnp.float32)
            g = g / jnp.float32(c * n)
            return jnp.mean(jnp.square(g - target))

        gr = jax.grad(loss2d)
        results["gram_mse_2d"] = time_loop(
            "gram(2d xT@x)+MSE fwd+bwd", lambda y: y - 1e-12 * gr(y),
            feats.reshape(-1))

    if want("gram_mse_pallas"):
        from artstyletransfer_tpu.ops import pallas_kernels as pk

        log(f"pallas gram supported: {pk.gram_supported((1, h, w, c))}")

        def lossp(y):
            g = pk.gram_pallas(y.reshape(1, h, w, c), True, False)
            return jnp.mean(jnp.square(g[0] - target))

        gr = jax.grad(lossp)
        results["gram_mse_pallas"] = time_loop(
            "gram(pallas)+MSE fwd+bwd", lambda y: y - 1e-12 * gr(y),
            feats.reshape(-1))

    # pool alternatives at the real VGG level-0 shapes
    pool_shapes = [(h, w, 64), (h // 2, w // 2, 128),
                   (h // 4, w // 4, 256), (h // 8, w // 8, 512)]

    if want("pool_sas"):
        def _maxpool2_sas(x):
            return lax.reduce_window(
                x, -jnp.inf, lax.max,
                window_dimensions=(1, 2, 2, 1),
                window_strides=(1, 2, 2, 1), padding="VALID")

        def loss_sas(ys):
            return sum(jnp.sum(_maxpool2_sas(y)) for y in ys)

        gr = jax.grad(loss_sas)
        ys0 = tuple(jnp.asarray(rng.random((1,) + s).astype(np.float32))
                    for s in pool_shapes)

        def body(ys):
            gs = gr(ys)
            return tuple(y - 1e-12 * g for y, g in zip(ys, gs))

        results["pool_sas"] = time_loop(
            "pools (reduce_window) real shapes", body, ys0)

    if want("pool_reshape"):
        from artstyletransfer_tpu.models.vgg19 import _maxpool2

        def loss_rs(ys):
            return sum(jnp.sum(_maxpool2(y, "slices")) for y in ys)

        gr = jax.grad(loss_rs)
        ys0 = tuple(jnp.asarray(rng.random((1,) + s).astype(np.float32))
                    for s in pool_shapes)

        def body(ys):
            gs = gr(ys)
            return tuple(y - 1e-12 * g for y, g in zip(ys, gs))

        results["pool_reshape"] = time_loop(
            "pools (reshape+max) real shapes", body, ys0)

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    if "extra" in sys.argv[1:2]:
        sys.exit(extra_ablations(sys.argv[2:]))
    sys.exit(main(sys.argv[1:]))
