"""Content / style / TV losses for one pyramid level.

Reference parity (reference neural_style_transfer.py:84-112):
- content loss: mean MSE between conv4_2 feature maps (batch squeezed)
- style loss: mean over style layers of MSE between Gram matrices, taking
  batch element [0] of each Gram
- tv loss: squared-mean TV of the (preprocessed) level image
- level total = content_weight*content + style_weight*style + tv_weight*tv
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .gram import gram_matrix
from .tv import total_variation


class LevelLoss(NamedTuple):
    total: jax.Array
    content: jax.Array
    style: jax.Array
    tv: jax.Array


def content_loss(target_content: jax.Array, current_content: jax.Array) -> jax.Array:
    """MSE between content-tap feature maps (f32 accumulation: the taps may
    be bfloat16 in compute_dtype=bfloat16 mode; the casts fuse into the
    reduction, no extra materialization)."""
    return jnp.mean(jnp.square(target_content.astype(jnp.float32)
                               - current_content.astype(jnp.float32)))


def regularization(y: jax.Array) -> jax.Array:
    """sum((y/128)^10) / numel^10 — present in the reference but unused
    (reference math_utils.py:44-47, referenced only in a comment at
    neural_style_transfer.py:107). Kept for component parity."""
    els = float(np.prod(y.shape))
    return jnp.sum(jnp.power(y / 128.0, 10)) / (els ** 10)


def style_loss(target_grams: Sequence[jax.Array],
               current_grams: Sequence[jax.Array]) -> jax.Array:
    """Mean over layers of MSE between Gram matrices (batch element 0)."""
    acc = jnp.float32(0.0)
    for gt, gh in zip(target_grams, current_grams):
        acc = acc + jnp.mean(jnp.square(gt[0] - gh[0]))
    return acc / len(target_grams)


def level_loss(feats, target_content: jax.Array,
               target_grams: Sequence[jax.Array], level_img: jax.Array,
               content_weight: float, style_weight: float, tv_weight: float,
               content_index: int = 4,
               style_indices: Sequence[int] = (0, 1, 2, 3, 5),
               use_pallas: bool = False) -> LevelLoss:
    """Weighted loss of one pyramid level given current feature taps.

    use_pallas routes Gram/TV through the fused Pallas TPU kernels
    (ops/pallas_kernels.py) for shapes they support, falling back to the
    XLA ops otherwise. Callers should enable it only on TPU backends.
    """
    if use_pallas:
        from . import pallas_kernels as pk

        def gram_fn(x):
            if pk.gram_supported(x.shape):
                return pk.gram_pallas(x, True, False)
            return gram_matrix(x)

        def tv_fn(y):
            if pk.tv_supported(y.shape):
                return pk.tv_pallas(y)
            return total_variation(y)
    else:
        gram_fn = gram_matrix
        tv_fn = total_variation

    c = content_loss(target_content, feats[content_index])
    current_grams = [gram_fn(feats[i]) for i in style_indices]
    s = style_loss(target_grams, current_grams)
    t = tv_fn(level_img)
    total = content_weight * c + style_weight * s + tv_weight * t
    return LevelLoss(total=total, content=c, style=s, tv=t)
