"""Gram matrix op.

Reference parity: gram of an NCHW feature map as features.view(b,ch,h*w) @
features^T, normalized by ch*h*w (reference math_utils.py:26-34).

TPU-native: feature maps here are NHWC, so the Gram is a (hw, c)^T @ (hw, c)
contraction per batch element with the channel dim on the MXU lane axis.

Large-n lowering: when the contracting dimension hw crosses ~2^17, XLA's TPU
backend stops emitting a single MXU matmul and instead loop-ifies the dot
into an HLO while loop (64-iteration dynamic-update-slice assembly of a
c-major copy plus slice+reduce steps) — measured at +31 ms/step for the
relu1_1 tap of a 1024px image, ~6x the cost of the matmul itself
(PARITY.md "Single-chip performance analysis"). Splitting the contraction
into K row chunks keeps every dot below the loop-ification threshold: the
Gram becomes a (b, K, hw/K, c) batched matmul producing K partial Grams
summed in f32. Numerically this only reorders the f32 accumulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Contraction sizes >= this get the chunked lowering (empirically where
# XLA's loop-ification kicks in well below this, but chunking only starts
# paying for itself around here).
_CHUNK_THRESHOLD = 1 << 17
_MAX_CHUNKS = 64


def _best_chunks(n: int, kmax: int = _MAX_CHUNKS) -> int:
    """Largest divisor of n up to kmax (1 if n is prime)."""
    best = 1
    for k in range(2, kmax + 1):
        if n % k == 0:
            best = k
    return best


def _chunk_plan(n: int) -> tuple[int, int]:
    """Chunking plan for a contraction of n rows: (k, n_pad).

    n_pad >= n is divisible by k and each chunk n_pad // k stays below the
    loop-ification threshold where possible. For prime-ish n (odd aspect
    ratios) with no divisor <= _MAX_CHUNKS, the rows are zero-padded up to
    the next _MAX_CHUNKS-divisible count instead of silently falling back
    to the loop-ified single-dot lowering: zero rows are inert in x^T x and
    normalization uses the true c*h*w, so the Gram is exact.
    """
    if n < _CHUNK_THRESHOLD:
        return 1, n
    k = _best_chunks(n)
    if k > 1 and (n // k) < _CHUNK_THRESHOLD:
        return k, n
    k = _MAX_CHUNKS
    n_pad = -(-n // k) * k
    return k, n_pad


def gram_matrix(x: jax.Array, should_normalize: bool = True,
                precision=None) -> jax.Array:
    """Batched Gram matrix of an NHWC feature map -> (b, c, c) float32.

    bfloat16 inputs below ~2^21 contraction elements take a direct 4-D
    dot (contracting (h, w), no flattening reshape): bf16 operands do not
    trip XLA's large-contraction loop-ification at these sizes, and
    skipping the reshape saves a layout round trip next to the conv
    fusions (measured -4 ms/step at 1024 px vs the chunked lowering).

    precision: lax.Precision for the contraction. Must be HIGHEST when the
    caller wants true f32 Grams from f32 taps — at DEFAULT the TPU MXU
    truncates f32 operands to bf16 passes (same failure class CLAUDE.md
    records for L-BFGS GEMVs). The engine threads cfg.conv_precision here.
    """
    b, h, w, c = x.shape
    n = h * w
    if x.dtype == jnp.bfloat16 and n < (1 << 21):
        gram = jnp.einsum("bhwc,bhwd->bcd", x, x,
                          preferred_element_type=jnp.float32,
                          precision=precision)
        if should_normalize:
            gram = gram / jnp.asarray(c * h * w, dtype=gram.dtype)
        return gram
    k, n_pad = _chunk_plan(n)
    if k > 1:
        feats = x.reshape(b, n, c)
        if n_pad != n:
            feats = jnp.pad(feats, ((0, 0), (0, n_pad - n), (0, 0)))
        feats = feats.reshape(b, k, n_pad // k, c)
        gram = jnp.einsum("bknc,bknd->bkcd", feats, feats,
                          preferred_element_type=jnp.float32,
                          precision=precision)
        gram = jnp.sum(gram, axis=1)
    else:
        feats = x.reshape(b, n, c)
        gram = jnp.einsum("bnc,bnd->bcd", feats, feats,
                          preferred_element_type=jnp.float32,
                          precision=precision)
    if should_normalize:
        gram = gram / jnp.asarray(c * h * w, dtype=gram.dtype)
    return gram
