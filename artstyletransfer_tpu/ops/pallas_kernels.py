"""Pallas TPU kernels for the style-transfer hot ops.

The reference delegates these to cuBLAS/libtorch (reference math_utils.py:31
`bmm` for Grams, math_utils.py:37-41 for TV). Here they are hand-written TPU
kernels:

- gram: accumulates G += X_tile^T X_tile over row tiles of the (hw, c)
  feature matrix in a VMEM scratch accumulator, normalizing on the last
  tile — one pass over HBM, MXU contraction, no intermediate (hw, c) copy.
- tv: one pass over the image computing both |dx| and |dy| partial sums per
  block without materializing the difference tensors.

Both ops carry custom VJPs (closed forms) so they are usable inside the
jitted, differentiated optimization step. Kernels require TPU-compatible
tilings (last dim a multiple of 128, etc.); `gram_supported`/`tv_supported`
report whether a given shape qualifies, and callers fall back to the XLA
versions (ops/gram.py, ops/tv.py) otherwise. Tests run the kernels in
interpreter mode on CPU against the XLA versions.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ---------------------------------------------------------------------------
# Fused Gram matrix
# ---------------------------------------------------------------------------


def _pick_row_tile(n: int, max_tile: int = 4096) -> int:
    """Largest multiple-of-8 divisor of n up to max_tile (0 if none)."""
    best = 0
    for tile in range(8, min(n, max_tile) + 1, 8):
        if n % tile == 0:
            best = tile
    return best


def gram_supported(shape) -> bool:
    b, h, w, c = shape
    # c=64 (relu1_1, the largest tap) rides half the MXU lanes — still far
    # faster than XLA's transpose-then-reduce lowering at these shapes
    return c % 64 == 0 and c <= 1024 and _pick_row_tile(h * w) >= 8


def _gram_kernel(x_ref, o_ref, acc_ref, *, scale: float):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]  # (TILE_N, C)
    acc_ref[:] += lax.dot_general(
        x, x, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        o_ref[:] = acc_ref[:] * scale


def _gram_fwd_impl(x: jax.Array, should_normalize: bool,
                   interpret: bool) -> jax.Array:
    b, h, w, c = x.shape
    n = h * w
    tile = _pick_row_tile(n)
    scale = 1.0 / (c * h * w) if should_normalize else 1.0

    def one(xb):
        feats = xb.reshape(n, c)
        return pl.pallas_call(
            partial(_gram_kernel, scale=scale),
            grid=(n // tile,),
            in_specs=[pl.BlockSpec((tile, c), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((c, c), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((c, c), jnp.float32),
            scratch_shapes=[pltpu.VMEM((c, c), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=2 * n * c * c, bytes_accessed=n * c * 4 + c * c * 4,
                transcendentals=0),
            interpret=interpret,
        )(feats)

    return jax.vmap(one)(x)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def gram_pallas(x: jax.Array, should_normalize: bool = True,
                interpret: bool = False) -> jax.Array:
    """Fused Gram of an NHWC feature map -> (b, c, c) float32."""
    return _gram_fwd_impl(x, should_normalize, interpret)


def _gram_vjp_fwd(x, should_normalize, interpret):
    return _gram_fwd_impl(x, should_normalize, interpret), x


def _gram_bwd_kernel(x_ref, g_ref, o_ref):
    # dF_tile = F_tile @ g_sym  — one streamed MXU matmul per row tile
    o_ref[:] = lax.dot_general(
        x_ref[:], g_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _gram_bwd_impl(x: jax.Array, g_sym: jax.Array,
                   interpret: bool) -> jax.Array:
    """dF = F @ g_sym streamed over row tiles (one HBM pass, no transpose)."""
    b, h, w, c = x.shape
    n = h * w
    tile = _pick_row_tile(n)

    def one(xb, gb):
        feats = xb.reshape(n, c)
        return pl.pallas_call(
            _gram_bwd_kernel,
            grid=(n // tile,),
            in_specs=[pl.BlockSpec((tile, c), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((c, c), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, c), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * n * c * c,
                bytes_accessed=2 * n * c * 4 + c * c * 4,
                transcendentals=0),
            interpret=interpret,
        )(feats, gb)

    return jax.vmap(one)(x, g_sym)


def _gram_vjp_bwd(should_normalize, interpret, x, g):
    # G = s * F^T F with F = reshape(x, (n, c))  =>
    # dF = s * F (G_bar + G_bar^T),  s = 1/(c h w) if normalizing
    b, h, w, c = x.shape
    scale = 1.0 / (c * h * w) if should_normalize else 1.0
    g_sym = ((g + jnp.swapaxes(g, -1, -2)) * scale).astype(jnp.float32)
    feats = x.astype(jnp.float32)
    dfeats = _gram_bwd_impl(feats, g_sym, interpret)
    return (dfeats.reshape(x.shape).astype(x.dtype),)


gram_pallas.defvjp(_gram_vjp_fwd, _gram_vjp_bwd)


# ---------------------------------------------------------------------------
# Fused total variation
# ---------------------------------------------------------------------------


_TV_VMEM_BUDGET = 2 * 1024 * 1024  # input bytes; ~4x temporaries fit in 16MB


def tv_supported(shape) -> bool:
    b, h, w, c = shape
    return (b == 1 and h >= 2 and w >= 2
            and h * w * c * 4 <= _TV_VMEM_BUDGET)


def _tv_kernel(y_ref, sx_ref, sy_ref, *, c: int):
    """Whole image resident in VMEM as a 2-D (h, w*c) tile: both TV partial
    sums in one pass, no materialized difference tensors in HBM.

    The 2-D flattening matters: a (h, w, 3) VMEM tile would pad the
    3-channel axis to 128 lanes (42x memory blow-up); in (h, w*c) layout a
    horizontal pixel diff is a shift by c along the lane axis.
    """
    y = y_ref[:]  # (h, w*c)
    sx_ref[0, 0] = jnp.sum(jnp.abs(y[:, :-c] - y[:, c:]))
    sy_ref[0, 0] = jnp.sum(jnp.abs(y[:-1, :] - y[1:, :]))


def tv_pallas(y: jax.Array, interpret: bool = False) -> jax.Array:
    """Squared-mean TV (reference semantics) as one fused VMEM pass.

    Valid for VMEM-fitting images (tv_supported); larger levels use the XLA
    version. Differentiable via the closed-form VJP below.
    """
    return _tv_impl(y, interpret)


def _tv_means(y, interpret):
    """The two TV mean-abs-difference terms via the fused kernel."""
    b, h, w, c = y.shape
    sx, sy = pl.pallas_call(
        partial(_tv_kernel, c=c),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((1, 1), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)),
        interpret=interpret,
    )(y.reshape(h, w * c))
    return sx[0, 0] / (h * (w - 1) * c), sy[0, 0] / ((h - 1) * w * c)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _tv_impl(y, interpret):
    mean_x, mean_y = _tv_means(y, interpret)
    return mean_x * mean_x + mean_y * mean_y


def _tv_vjp_fwd(y, interpret):
    # the fwd rule must dispatch the fused kernel too: the optimization
    # step always runs under jax.grad, so an unfused fwd here would mean
    # the kernel never executes in the only path that matters
    mean_x, mean_y = _tv_means(y, interpret)
    return mean_x * mean_x + mean_y * mean_y, (y, mean_x, mean_y)


def _tv_vjp_bwd(interpret, res, g):
    # d/dy [(mean|dx|)^2 + (mean|dy|)^2]
    #   = 2*mean_x * d(mean|dx|)/dy + 2*mean_y * d(mean|dy|)/dy
    y, mean_x, mean_y = res
    return (g * (2.0 * mean_x) * _dx_part(y)
            + g * (2.0 * mean_y) * _dy_part(y),)


def _dx_part(y):
    b, h, w, c = y.shape
    sx = jnp.sign(y[:, :, :-1, :] - y[:, :, 1:, :]) / (b * h * (w - 1) * c)
    grad = jnp.zeros_like(y)
    grad = grad.at[:, :, :-1, :].add(sx)
    grad = grad.at[:, :, 1:, :].add(-sx)
    return grad


def _dy_part(y):
    b, h, w, c = y.shape
    sy = jnp.sign(y[:, :-1, :, :] - y[:, 1:, :, :]) / (b * (h - 1) * w * c)
    grad = jnp.zeros_like(y)
    grad = grad.at[:, :-1, :, :].add(sy)
    grad = grad.at[:, 1:, :, :].add(-sy)
    return grad


_tv_impl.defvjp(_tv_vjp_fwd, _tv_vjp_bwd)


# ---------------------------------------------------------------------------
# Fused 3x3 conv + bias + ReLU (the SURVEY §2.2 "north star" block)
# ---------------------------------------------------------------------------

_CONV_TILE_H = 4


def conv_relu_supported(shape, cout: int) -> bool:
    """(1, H, W, C) NHWC with lane-aligned channels and H tileable."""
    b, h, w, c = shape
    return (b == 1 and c % 64 == 0 and cout % 64 == 0
            and h % _CONV_TILE_H == 0 and w % 8 == 0
            and (_CONV_TILE_H + 2) * (w + 2) * (-(-c // 128) * 128) * 4
            <= 4 * 1024 * 1024)


def _conv_relu_kernel(x_hbm, w_ref, b_ref, o_ref, scratch, sem, *,
                      tile_h: int, width: int, cin: int, cout: int):
    """One H-tile of SAME-padded 3x3 conv + bias + ReLU.

    The input lives in HBM pre-padded to (H+2, W+2, C); each grid step DMAs
    its (tile_h+2)-row halo slab into VMEM (double-buffered by the grid
    pipeline), then accumulates the nine shifted (tile_h*W, Cin) @ (Cin,
    Cout) MXU matmuls.
    """
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * tile_h, tile_h + 2)], scratch, sem)
    dma.start()
    dma.wait()
    # accumulate tap-by-tap into the output block so each shifted slice's
    # relayout copy can be retired before the next (keeps VMEM stack small)
    o_ref[:] = jnp.broadcast_to(b_ref[:], (tile_h, width, cout))
    for dy in range(3):
        for dx in range(3):
            sub = scratch[dy:dy + tile_h, dx:dx + width, :]
            part = lax.dot(sub.reshape(tile_h * width, cin), w_ref[dy, dx],
                           preferred_element_type=jnp.float32)
            o_ref[:] += part.reshape(tile_h, width, cout)
    o_ref[:] = jnp.maximum(o_ref[:], 0.0)


def _conv_relu_fwd_impl(x: jax.Array, w: jax.Array, b: jax.Array,
                        interpret: bool) -> jax.Array:
    _, h, width, cin = x.shape
    cout = w.shape[-1]
    # Mosaic DMAs slice HBM memrefs at lane (128) granularity: pad the
    # channel dims to 128 multiples (zero channels are mathematically inert)
    cin_p = -(-cin // 128) * 128
    cout_p = -(-cout // 128) * 128
    xp = jnp.pad(x[0], ((1, 1), (1, 1), (0, cin_p - cin)))  # SAME halo
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, cin_p - cin), (0, cout_p - cout)))
    bp = jnp.pad(b, (0, cout_p - cout))
    out = pl.pallas_call(
        partial(_conv_relu_kernel, tile_h=_CONV_TILE_H, width=width,
                cin=cin_p, cout=cout_p),
        grid=(h // _CONV_TILE_H,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # stays in HBM, manual DMA
            pl.BlockSpec((3, 3, cin_p, cout_p), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout_p,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_CONV_TILE_H, width, cout_p),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, width, cout_p), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_CONV_TILE_H + 2, width + 2, cin_p), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * h * width * 9 * cin_p * cout_p,
            bytes_accessed=(h * width * (cin_p + cout_p)
                            + 9 * cin_p * cout_p) * 4,
            transcendentals=0),
        interpret=interpret,
    )(xp, wp, bp)
    return out[None, :, :, :cout]


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3_relu_pallas(x: jax.Array, w: jax.Array, b: jax.Array,
                        interpret: bool = False) -> jax.Array:
    """Fused SAME 3x3 conv + bias + ReLU, NHWC/HWIO, f32.

    The "north-star" Pallas block of SURVEY §2.2 (replacing the reference's
    cuDNN conv+ReLU, reference neural_nets.py:53-65). Status after honest
    on-device evaluation (v5e, 2026-08 libtpu; PARITY.md has the numbers):
    the 3x3 halo makes every shifted slice sublane-unaligned, so Mosaic
    inserts per-tap relayout copies that blow the 16 MB VMEM stack budget
    at VGG's level-0 widths (17.9-33.4 MB scoped allocations), and the
    accumulate-in-place variant crashes the TPU worker. XLA's
    space-to-depth convolution fusions (13.3 ms for ALL sixteen level-0
    convs, ~48% MFU) remain the production path; this kernel is kept as an
    interpreter-validated experimental block for future Mosaic versions.
    EXPERIMENTAL: do not route production traffic through it on TPU.
    """
    return _conv_relu_fwd_impl(x, w, b, interpret)


def _conv_relu_xla(x, w, b):
    """XLA twin of the fused block (used for the backward and in tests)."""
    y = lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    return jnp.maximum(y, 0.0)


def _conv_relu_vjp_fwd(x, w, b, interpret):
    y = _conv_relu_fwd_impl(x, w, b, interpret)
    return y, (x, w, b)


def _conv_relu_vjp_bwd(interpret, res, g):
    # backward through the mathematically identical XLA graph (rematerialized
    # forward); the Pallas value of this block is the fused forward pass
    x, w, b = res
    _, vjp = jax.vjp(_conv_relu_xla, x, w, b)
    return vjp(g)


conv3x3_relu_pallas.defvjp(_conv_relu_vjp_fwd, _conv_relu_vjp_bwd)
