"""Bicubic resize as dense separable matrix products (MXU-native).

Both resizes the reference relies on use the Catmull-Rom-like cubic kernel
with a = -0.75 and half-pixel source centers:
- OpenCV INTER_CUBIC for the input pyramid and noise upscaling
  (reference neural_style_transfer.py:226, :304, :427)
- torch F.interpolate(mode='bicubic') for the in-graph optimizing-image
  downscale chain (reference neural_style_transfer.py:175)

TPU-native design: a separable resize is expressed as two dense matmuls,
``out = R_h @ img @ R_w^T`` per channel, where R_h (H_out, H_in) and R_w
(W_out, W_in) hold the 4-tap cubic weights with edge clamping. Shapes are
static under jit, so the matrices are baked in as constants; the resize runs
on the MXU, fuses with neighbors, and is exactly (transpose-)differentiable —
no gather/scatter, no dynamic shapes. For the common halve-by-two case the
matrix has fixed taps [-0.09375, 0.59375, 0.59375, -0.09375].
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

_A = -0.75  # cubic kernel sharpness used by both OpenCV and torch


def _cubic_kernel(x: np.ndarray, a: float = _A) -> np.ndarray:
    """Keys cubic convolution kernel with sharpness a."""
    x = np.abs(x)
    x2 = x * x
    x3 = x2 * x
    inner = (a + 2.0) * x3 - (a + 3.0) * x2 + 1.0
    outer = a * x3 - 5.0 * a * x2 + 8.0 * a * x - 4.0 * a
    return np.where(x <= 1.0, inner, np.where(x < 2.0, outer, 0.0))


@lru_cache(maxsize=256)
def _resize_matrix_cached(n_in: int, n_out: int) -> np.ndarray:
    scale = n_in / n_out
    # Half-pixel centers: src = (dst + 0.5) * scale - 0.5
    dst = np.arange(n_out, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5
    base = np.floor(src).astype(np.int64)
    frac = src - base
    mat = np.zeros((n_out, n_in), dtype=np.float64)
    for tap in (-1, 0, 1, 2):
        w = _cubic_kernel(frac - tap)
        idx = np.clip(base + tap, 0, n_in - 1)  # replicate border
        np.add.at(mat, (dst.astype(np.int64), idx), w)
    return mat.astype(np.float32)


def resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) bicubic interpolation matrix (numpy constant)."""
    return _resize_matrix_cached(int(n_in), int(n_out))


def bicubic_resize(img: jax.Array, out_h: int, out_w: int,
                   precision=None) -> jax.Array:
    """Bicubic-resize an NHWC (or HWC) image to (out_h, out_w).

    Matches cv2.resize(..., INTER_CUBIC) / torch bicubic semantics
    (a=-0.75, half-pixel centers, replicate border, no antialiasing).
    precision: lax.Precision for the separable contractions — HIGHEST for
    true-f32 resizes on TPU (at DEFAULT the MXU runs f32 operands as bf16
    passes); the engine threads cfg.conv_precision.
    """
    squeeze = img.ndim == 3
    if squeeze:
        img = img[None]
    _, h, w, _ = img.shape
    if (h, w) == (out_h, out_w):
        return img[0] if squeeze else img
    r_h = jnp.asarray(resize_matrix(h, out_h))
    r_w = jnp.asarray(resize_matrix(w, out_w))
    # out[b, i, j, c] = sum_{y,x} R_h[i,y] img[b,y,x,c] R_w[j,x]
    out = jnp.einsum("iy,byxc->bixc", r_h, img,
                     preferred_element_type=jnp.float32,
                     precision=precision)
    out = jnp.einsum("jx,bixc->bijc", r_w, out,
                     preferred_element_type=jnp.float32,
                     precision=precision)
    return out[0] if squeeze else out


def downscale2x(img: jax.Array, precision=None) -> jax.Array:
    """Halve an NHWC image (floor division of dims), reference pyramid step
    semantics (reference neural_style_transfer.py:173-176)."""
    _, h, w, _ = img.shape
    return bicubic_resize(img, h // 2, w // 2, precision=precision)


def bicubic_resize_np(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Host-side numpy twin of bicubic_resize for one-time preprocessing.

    Used by the init pipeline so host-built pyramids match the in-graph
    resize bit-for-bit (same matrices). Uses tensordot so the contraction
    runs through BLAS (2K-level pyramids build in seconds, not minutes).
    """
    squeeze = img.ndim == 3
    if squeeze:
        img = img[None]
    b, h, w, c = img.shape
    if (h, w) != (out_h, out_w):
        from ..native import available as native_available
        from ..native import bicubic_resize as native_resize

        if b == 1 and native_available():
            # native 4-tap path: ~n_in/4 fewer MACs than the dense matmul
            out = native_resize(np.asarray(img[0], dtype=np.float32),
                                out_h, out_w)
            return out if squeeze else out[None]
        img = img.astype(np.float32)
        r_h = resize_matrix(h, out_h)
        r_w = resize_matrix(w, out_w)
        # (i,y) . (b,y,x,c) -> (i,b,x,c) -> (b,i,x,c)
        img = np.tensordot(r_h, img, axes=([1], [1])).transpose(1, 0, 2, 3)
        # (j,x) . (b,i,x,c) -> (j,b,i,c) -> (b,i,j,c)
        img = np.tensordot(r_w, img, axes=([1], [2])).transpose(1, 2, 0, 3)
    img = np.ascontiguousarray(img, dtype=np.float32)
    return img[0] if squeeze else img
