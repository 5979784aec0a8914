"""Pallas kernels vs XLA reference ops (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from artstyletransfer_tpu.ops.gram import gram_matrix
from artstyletransfer_tpu.ops.tv import total_variation
from artstyletransfer_tpu.ops.pallas_kernels import (
    gram_pallas,
    gram_supported,
    tv_pallas,
    tv_supported,
)


def test_gram_supported_shapes():
    assert gram_supported((1, 32, 32, 128))
    assert gram_supported((1, 32, 32, 64))        # relu1_1's channel width
    assert gram_supported((1, 64, 96, 256))
    assert not gram_supported((1, 32, 32, 48))    # not a lane multiple
    assert not gram_supported((1, 7, 13, 128))    # no mult-of-8 row tile


def test_gram_pallas_c64_matches_xla(rng):
    """relu1_1-shaped gram (c=64, the largest tap) incl. backward."""
    x = jnp.asarray(rng.standard_normal((1, 16, 24, 64)).astype(np.float32))
    ours = np.asarray(gram_pallas(x, True, True))
    ref = np.asarray(gram_matrix(x))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    target = jnp.asarray(rng.standard_normal((1, 64, 64)).astype(np.float32))

    def loss_pallas(x):
        return jnp.mean(jnp.square(gram_pallas(x, True, True) - target))

    def loss_xla(x):
        return jnp.mean(jnp.square(gram_matrix(x) - target))

    g_pallas = jax.grad(loss_pallas)(x)
    g_xla = jax.grad(loss_xla)(x)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_xla),
                               rtol=1e-4, atol=1e-6)


def test_gram_pallas_matches_xla(rng):
    x = rng.standard_normal((2, 16, 24, 128)).astype(np.float32)
    ours = np.asarray(gram_pallas(jnp.asarray(x), True, True))
    ref = np.asarray(gram_matrix(jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_gram_pallas_unnormalized(rng):
    x = rng.standard_normal((1, 8, 16, 128)).astype(np.float32)
    ours = np.asarray(gram_pallas(jnp.asarray(x), False, True))
    ref = np.asarray(gram_matrix(jnp.asarray(x), should_normalize=False))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-4)


def test_gram_pallas_grad_matches_xla(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 16, 128)).astype(np.float32))
    target = jnp.asarray(
        rng.standard_normal((1, 128, 128)).astype(np.float32))

    def loss_pallas(x):
        return jnp.mean(jnp.square(gram_pallas(x, True, True) - target))

    def loss_xla(x):
        return jnp.mean(jnp.square(gram_matrix(x) - target))

    g_pallas = jax.grad(loss_pallas)(x)
    g_xla = jax.grad(loss_xla)(x)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_xla),
                               rtol=1e-4, atol=1e-6)


def test_tv_supported_shapes():
    assert tv_supported((1, 64, 96, 3))
    assert not tv_supported((2, 64, 96, 3))       # batch > 1
    assert not tv_supported((1, 2048, 2048, 3))   # exceeds VMEM budget


def test_tv_pallas_matches_xla(rng):
    y = rng.standard_normal((1, 24, 40, 3)).astype(np.float32) * 50
    ours = float(tv_pallas(jnp.asarray(y), interpret=True))
    ref = float(total_variation(jnp.asarray(y)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_tv_pallas_grad_matches_xla(rng):
    y = jnp.asarray(rng.standard_normal((1, 12, 16, 3)).astype(np.float32))

    g_pallas = jax.grad(lambda y: tv_pallas(y, interpret=True))(y)
    g_xla = jax.grad(lambda y: total_variation(y))(y)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_xla),
                               rtol=1e-4, atol=1e-6)


def test_conv_relu_supported_shapes():
    from artstyletransfer_tpu.ops.pallas_kernels import conv_relu_supported

    assert conv_relu_supported((1, 64, 96, 64), 64)
    assert not conv_relu_supported((2, 64, 96, 64), 64)   # batch > 1
    assert not conv_relu_supported((1, 63, 96, 64), 64)   # H not tileable
    assert not conv_relu_supported((1, 64, 96, 48), 64)   # C not lane-aligned


def test_conv_relu_pallas_matches_xla(rng):
    from artstyletransfer_tpu.ops.pallas_kernels import (_conv_relu_xla,
                                                         conv3x3_relu_pallas)

    x = jnp.asarray(rng.standard_normal((1, 16, 24, 64)).astype(np.float32))
    w = jnp.asarray(
        (rng.standard_normal((3, 3, 64, 64)) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((64,)).astype(np.float32))
    ours = np.asarray(conv3x3_relu_pallas(x, w, b, True))
    ref = np.asarray(_conv_relu_xla(x, w, b))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_conv_relu_pallas_grad_matches_xla(rng):
    from artstyletransfer_tpu.ops.pallas_kernels import (_conv_relu_xla,
                                                         conv3x3_relu_pallas)

    x = jnp.asarray(rng.standard_normal((1, 8, 16, 64)).astype(np.float32))
    w = jnp.asarray(
        (rng.standard_normal((3, 3, 64, 64)) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((64,)).astype(np.float32))

    def lp(x, w, b):
        return jnp.sum(conv3x3_relu_pallas(x, w, b, True) ** 2)

    def lx(x, w, b):
        return jnp.sum(_conv_relu_xla(x, w, b) ** 2)

    gp = jax.grad(lp, argnums=(0, 1, 2))(x, w, b)
    gx = jax.grad(lx, argnums=(0, 1, 2))(x, w, b)
    for a, c in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-4)
