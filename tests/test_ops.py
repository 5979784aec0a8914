"""Numeric parity of gram / TV / losses / resize vs the torch twin and cv2."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from artstyletransfer_tpu.ops import (
    bicubic_resize,
    downscale2x,
    gram_matrix,
    total_variation,
)
from artstyletransfer_tpu.ops.resize import bicubic_resize_np
from artstyletransfer_tpu.baselines import torch_ref


def test_gram_matches_torch(rng):
    x = rng.standard_normal((2, 13, 17, 8)).astype(np.float32)
    ours = np.asarray(gram_matrix(jnp.asarray(x)))
    theirs = torch_ref.gram_matrix(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_gram_unnormalized(rng):
    x = rng.standard_normal((1, 4, 4, 3)).astype(np.float32)
    ours = np.asarray(gram_matrix(jnp.asarray(x), should_normalize=False))
    theirs = torch_ref.gram_matrix(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), should_normalize=False
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_tv_matches_torch(rng):
    x = rng.standard_normal((1, 19, 23, 3)).astype(np.float32) * 100
    ours = float(total_variation(jnp.asarray(x)))
    theirs = float(torch_ref.total_variation(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_bicubic_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    img = rng.random((37, 53, 3)).astype(np.float32)
    for (oh, ow) in [(74, 106), (19, 27), (128, 96)]:
        ours = np.asarray(bicubic_resize(jnp.asarray(img), oh, ow))
        ref = cv2.resize(img, (ow, oh), interpolation=cv2.INTER_CUBIC)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-5)


def test_downscale2x_matches_torch_interpolate(rng):
    img = rng.random((1, 32, 48, 3)).astype(np.float32) * 200 - 100
    ours = np.asarray(downscale2x(jnp.asarray(img)))
    t = torch.from_numpy(np.transpose(img, (0, 3, 1, 2)))
    ref = torch.nn.functional.interpolate(t, size=(16, 24), mode="bicubic")
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_numpy_and_jax_resize_agree(rng):
    img = rng.random((21, 34, 3)).astype(np.float32)
    a = bicubic_resize_np(img, 42, 68)
    b = np.asarray(bicubic_resize(jnp.asarray(img), 42, 68))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_gram_chunked_lowering_matches_plain(rng):
    """Large-n grams use the chunked (K partial sums) lowering; it must be
    numerically equivalent to the single-contraction form."""
    from artstyletransfer_tpu.ops import gram as gram_mod

    x = rng.standard_normal((1, 512, 512, 8)).astype(np.float32)  # n = 2^18
    assert 512 * 512 >= gram_mod._CHUNK_THRESHOLD
    got = np.asarray(gram_mod.gram_matrix(jnp.asarray(x)))
    f = x.reshape(1, -1, 8)
    ref = np.einsum("bnc,bnd->bcd", f, f) / (8 * 512 * 512)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-7)

    # gradient path too
    def loss(xx):
        return jnp.sum(gram_mod.gram_matrix(xx))

    g = np.asarray(jax.grad(loss)(jnp.asarray(x)))
    # d/dx sum(G) with G = F^T F / (c n): each row contributes 2*rowsum(F)
    rowsum = f.sum(axis=2, keepdims=True)
    ref_g = np.broadcast_to(2 * rowsum / (8 * 512 * 512), f.shape).reshape(x.shape)
    np.testing.assert_allclose(g, ref_g, rtol=1e-4, atol=1e-7)


def test_gram_prime_contraction_pads_to_chunked(rng):
    """Prime-ish hw >= 2^17 (odd aspect ratios) must take the zero-padded
    chunked lowering, never the loop-ified single-dot fallback, and stay
    numerically exact (zero rows are inert in x^T x; normalization uses the
    true c*h*w)."""
    from artstyletransfer_tpu.ops import gram as gram_mod

    # 131101 is prime and >= 2^17: no divisor <= 64 exists.
    n = 131101
    assert n >= gram_mod._CHUNK_THRESHOLD and gram_mod._best_chunks(n) == 1
    k, n_pad = gram_mod._chunk_plan(n)
    assert k == gram_mod._MAX_CHUNKS and n_pad % k == 0 and n_pad >= n

    x = rng.standard_normal((1, n, 1, 4)).astype(np.float32)
    got = np.asarray(gram_mod.gram_matrix(jnp.asarray(x)))
    f = x.reshape(1, n, 4)
    ref = np.einsum("bnc,bnd->bcd", f, f) / (4 * n)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-7)

    # gradient through the padded path
    def loss(xx):
        return jnp.sum(gram_mod.gram_matrix(xx))

    g = np.asarray(jax.grad(loss)(jnp.asarray(x)))
    rowsum = f.sum(axis=2, keepdims=True)
    ref_g = np.broadcast_to(2 * rowsum / (4 * n), f.shape).reshape(x.shape)
    np.testing.assert_allclose(g, ref_g, rtol=1e-4, atol=1e-7)


def test_gram_chunk_plan_divisible_unchanged():
    """Divisible contractions keep the exact-divisor plan (no padding)."""
    from artstyletransfer_tpu.ops import gram as gram_mod

    k, n_pad = gram_mod._chunk_plan(512 * 512)
    assert n_pad == 512 * 512 and k == 64
    k, n_pad = gram_mod._chunk_plan(1000)  # below threshold
    assert (k, n_pad) == (1, 1000)


def test_gram_bf16_4d_lowering_matches_flat(rng):
    """The bf16 4-D dot lowering must equal the flattened einsum exactly
    (same contraction, f32 accumulation, only the index bookkeeping
    differs)."""
    x = rng.standard_normal((2, 9, 11, 8)).astype(np.float32)
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    ours = np.asarray(gram_matrix(xb))
    flat = np.asarray(
        jnp.einsum("bnc,bnd->bcd", xb.reshape(2, 99, 8), xb.reshape(2, 99, 8),
                   preferred_element_type=jnp.float32)) / (8 * 9 * 11)
    np.testing.assert_allclose(ours, flat, rtol=1e-6, atol=1e-7)


def test_fused_style_bwd_matches_autodiff(rng):
    """level_loss(fused_style_bwd=True) must produce the same value AND the
    same image gradient as the plain autodiff path (the 1x1-conv backward
    is the closed-form gradient, not an approximation)."""
    from artstyletransfer_tpu.ops.losses import level_loss

    feats_shapes = [(1, 8, 10, 4), (1, 4, 5, 6), (1, 2, 2, 8),
                    (1, 2, 2, 8), (1, 6, 7, 5), (1, 2, 2, 8)]
    img = rng.standard_normal((1, 8, 10, 3)).astype(np.float32)

    mix = [jnp.asarray(rng.standard_normal(
               (img.size, int(np.prod(shp)))).astype(np.float32)
               / int(np.prod(shp)))
           for shp in feats_shapes]

    def make_feats(x):
        # differentiable synthetic "taps" so gradients flow to x
        return [(x.reshape(-1) @ w).reshape(shp)
                for w, shp in zip(mix, feats_shapes)]

    t_content = rng.standard_normal(feats_shapes[4]).astype(np.float32)
    t_grams = tuple(
        jnp.asarray(rng.standard_normal(
            (1, feats_shapes[i][-1], feats_shapes[i][-1])).astype(np.float32))
        for i in (0, 1, 2, 3, 5))

    def total(x, fused):
        ll = level_loss(make_feats(x), t_content, t_grams,
                        x.reshape(1, 8, 10, 3), 1e3, 4e5, 1e2,
                        content_index=4, style_indices=(0, 1, 2, 3, 5),
                        fused_style_bwd=fused)
        return ll.total

    x = jnp.asarray(img)
    v_fused, g_fused = jax.value_and_grad(lambda x: total(x, True))(x)
    v_plain, g_plain = jax.value_and_grad(lambda x: total(x, False))(x)
    np.testing.assert_allclose(float(v_fused), float(v_plain), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_plain),
                               rtol=1e-4, atol=1e-6)


def test_fused_style_bwd_batch_gt1_falls_back(rng):
    """Batched (b>1) taps must take the autodiff path (the fused backward
    assumes the reference's batch-element-0 semantics with b == 1)."""
    from artstyletransfer_tpu.ops.losses import level_loss

    feats = [jnp.asarray(rng.standard_normal((2, 4, 5, 3)).astype(np.float32))
             for _ in range(6)]
    t_content = feats[4] * 0.5
    t_grams = tuple(jnp.asarray(
        rng.standard_normal((2, 3, 3)).astype(np.float32))
        for _ in range(5))
    a = level_loss(feats, t_content, t_grams, feats[0], 1.0, 1.0, 1.0,
                   content_index=4, style_indices=(0, 1, 2, 3, 5),
                   fused_style_bwd=True)
    b = level_loss(feats, t_content, t_grams, feats[0], 1.0, 1.0, 1.0,
                   content_index=4, style_indices=(0, 1, 2, 3, 5),
                   fused_style_bwd=False)
    np.testing.assert_allclose(float(a.total), float(b.total), rtol=1e-6)
