"""Content / style / TV losses for one pyramid level.

Reference parity (reference neural_style_transfer.py:84-112):
- content loss: mean MSE between conv4_2 feature maps (batch squeezed)
- style loss: mean over style layers of MSE between Gram matrices, taking
  batch element [0] of each Gram
- tv loss: squared-mean TV of the (preprocessed) level image
- level total = content_weight*content + style_weight*style + tv_weight*tv
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

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


# --------------------------------------------------------------------------
# Fused style-layer loss: backward expressed as a 1x1 convolution.
#
# Autodiff of mean((gram(f) - Gt)^2) pulls the tap f through a standard-
# layout matmul in BOTH directions, and on TPU the layout copies between the
# conv fusions' space-to-depth tap layouts and the dot's standard layout
# dominate the whole optimization step (~35 ms of a 79 ms bf16 step at
# 1024 px — PARITY.md "Single-chip performance analysis"). The closed-form
# gradient
#
#     d/df mean((G - Gt)^2) = (4 / (c^2 * c*h*w)) * f @ (G - Gt)
#
# is a 1x1 conv of the tap with a tiny (c, c) kernel, and a convolution
# consumer eats the tap in its NATIVE layout and emits the cotangent
# straight into the transpose-conv backward cluster — no standard-layout
# round trip. Measured on v5e-1 at 3level1024 bf16: level-0 grad 79.1 ->
# 61.3 ms/step. The custom VJP is exact (same math, one extra f32->tap-dtype
# cast on the (c,c) kernel); parity with autodiff is pinned by
# tests/test_ops.py.
# --------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _style_layer_mse_convbwd(f: jax.Array, gt: jax.Array,
                             precision=None) -> jax.Array:
    """MSE between gram(f)[0] and the (c, c) target gram gt.

    Requires batch size 1 (the engine's invariant; the reference reads
    batch element [0] only — reference neural_style_transfer.py:100-104).
    precision applies to both the forward Gram contraction and the 1x1
    backward conv (the engine threads cfg.conv_precision — at DEFAULT the
    TPU MXU runs f32 operands as bf16 passes).
    """
    g = gram_matrix(f, precision=precision)[0]
    return jnp.mean(jnp.square(g - gt))


def _style_layer_fwd(f, gt, precision):
    g = gram_matrix(f, precision=precision)[0]
    return jnp.mean(jnp.square(g - gt)), (f, g, gt)


def _style_layer_bwd(precision, res, s):
    f, g, gt = res
    _, h, w, c = f.shape
    # general form: d = (G - Gt) + (G - Gt)^T (real target grams are
    # symmetric, making d = 2(G - Gt), but don't assume it)
    d = g - gt
    scale = 2.0 / (c * c * c * h * w)
    ker = ((d + d.T) * (scale * s)).astype(f.dtype)[None, None]  # (1,1,c,c)
    df = lax.conv_general_dilated(
        f, ker, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision)
    return df, None


_style_layer_mse_convbwd.defvjp(_style_layer_fwd, _style_layer_bwd)


def level_loss(feats, target_content: jax.Array,
               target_grams: Sequence[jax.Array], level_img: jax.Array,
               content_weight: float, style_weight: float, tv_weight: float,
               content_index: int = 4,
               style_indices: Sequence[int] = (0, 1, 2, 3, 5),
               use_pallas: bool = False,
               fused_style_bwd: bool = True,
               precision=None) -> LevelLoss:
    """Weighted loss of one pyramid level given current feature taps.

    use_pallas routes Gram/TV through the fused Pallas TPU kernels
    (ops/pallas_kernels.py) for shapes they support, falling back to the
    XLA ops otherwise. Callers should enable it only on TPU backends.

    fused_style_bwd (default on) computes each style layer's loss through
    the custom-VJP path whose backward is a 1x1 conv in the tap's native
    layout (see _style_layer_mse_convbwd) — same math, ~23% faster full
    step on TPU at 1024 px. Applies only to batch-1 taps (the engine
    invariant); anything else falls back to plain autodiff.
    """
    if use_pallas:
        from . import pallas_kernels as pk

        def gram_fn(x):
            if pk.gram_supported(x.shape):
                return pk.gram_pallas(x, True, False)
            return gram_matrix(x, precision=precision)

        def tv_fn(y):
            if pk.tv_supported(y.shape):
                return pk.tv_pallas(y)
            return total_variation(y)
    else:
        gram_fn = partial(gram_matrix, precision=precision)
        tv_fn = total_variation

    c = content_loss(target_content, feats[content_index])
    if fused_style_bwd and not use_pallas and all(
            feats[i].shape[0] == 1 for i in style_indices):
        acc = jnp.float32(0.0)
        for gt, i in zip(target_grams, style_indices):
            acc = acc + _style_layer_mse_convbwd(feats[i], gt[0], precision)
        # normalize like style_loss (len(target_grams)) so the fused and
        # autodiff paths stay interchangeable even if the sequences differ
        s = acc / len(target_grams)
    else:
        current_grams = [gram_fn(feats[i]) for i in style_indices]
        s = style_loss(target_grams, current_grams)
    t = tv_fn(level_img)
    total = content_weight * c + style_weight * s + tv_weight * t
    return LevelLoss(total=total, content=c, style=s, tv=t)
