"""Gram matrix op.

Reference parity: gram of an NCHW feature map as features.view(b,ch,h*w) @
features^T, normalized by ch*h*w (reference math_utils.py:26-34).

TPU-native: feature maps here are NHWC, so the Gram is a single
(hw, c)^T @ (hw, c) contraction per batch element — one large MXU matmul with
the channel dim on the lane axis; no transpose materialization. A fused
Pallas kernel (reshape+matmul+normalize with HBM->VMEM pipelining) lives in
ops/pallas_kernels.py and is used when enabled; this XLA version is the
reference implementation and fallback (XLA already fuses the normalize).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gram_matrix(x: jax.Array, should_normalize: bool = True) -> jax.Array:
    """Batched Gram matrix of an NHWC feature map -> (b, c, c) float32."""
    b, h, w, c = x.shape
    feats = x.reshape(b, h * w, c)
    gram = jnp.einsum("bnc,bnd->bcd", feats, feats,
                      preferred_element_type=jnp.float32)
    if should_normalize:
        gram = gram / jnp.asarray(c * h * w, dtype=gram.dtype)
    return gram
