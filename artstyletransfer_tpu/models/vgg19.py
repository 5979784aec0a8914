"""VGG19 feature extractor as a pure-JAX NHWC forward pass.

Reference parity: the reference wraps torchvision's pretrained VGG19 into six
sequential slices exposing the taps ['relu1_1', 'relu2_1', 'relu3_1',
'relu4_1', 'conv4_2', 'relu5_1'] with content index 4 (conv4_2, pre-ReLU) and
style indices [0, 1, 2, 3, 5] (reference neural_nets.py:21-29, :37-48), with
frozen weights (reference neural_nets.py:49-51).

TPU-native design decisions:
- NHWC layout + HWIO kernels — the native layout for TPU convolutions, so the
  channel dimension rides the 128-wide lane axis of the MXU.
- The network is truncated after relu5_1: conv5_2..conv5_4 are never computed
  (the reference pays for them neither — its slices stop at layer 29).
- Weights are an explicit pytree argument (functional, jit/vmap/pjit-friendly),
  never module state; freezing is the default in a functional paradigm
  (gradients flow to the image argument only).
- Optional bfloat16 compute: weights/activations cast to bf16 for the conv
  (MXU-native), accumulating in float32 via preferred_element_type.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# Taps exposed to the loss code (reference neural_nets.py:21).
LAYER_NAMES = ("relu1_1", "relu2_1", "relu3_1", "relu4_1", "conv4_2", "relu5_1")
CONTENT_INDEX = 4  # conv4_2 (reference neural_nets.py:26)
STYLE_INDICES = (0, 1, 2, 3, 5)  # everything except conv4_2 (reference neural_nets.py:28-29)

# VGG19 conv stack up to conv5_1. Each entry: (name, out_channels).
# Blocks are separated by 2x2 max-pooling. Only the layers needed to produce
# the six taps are present (conv5_2+ are omitted on purpose).
VGG19_LAYERS = (
    ("conv1_1", 64), ("conv1_2", 64),
    ("pool", 0),
    ("conv2_1", 128), ("conv2_2", 128),
    ("pool", 0),
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), ("conv3_4", 256),
    ("pool", 0),
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), ("conv4_4", 512),
    ("pool", 0),
    ("conv5_1", 512),
)

CONV_NAMES = tuple(n for n, _ in VGG19_LAYERS if n != "pool")

# Which (name -> tap slot) activations to record.
# conv4_2 is captured PRE-ReLU (reference neural_nets.py:45-46: slice5 is the
# bare conv layer 21); every other tap is post-ReLU.
_TAPS = {
    "relu1_1": ("conv1_1", "post"),
    "relu2_1": ("conv2_1", "post"),
    "relu3_1": ("conv3_1", "post"),
    "relu4_1": ("conv4_1", "post"),
    "conv4_2": ("conv4_2", "pre"),
    "relu5_1": ("conv5_1", "post"),
}


class Vgg19Features(NamedTuple):
    """The six feature taps, NHWC (reference neural_nets.py:66-68)."""

    relu1_1: jax.Array
    relu2_1: jax.Array
    relu3_1: jax.Array
    relu4_1: jax.Array
    conv4_2: jax.Array
    relu5_1: jax.Array


Params = Dict[str, Dict[str, jax.Array]]


_PRECISIONS = {
    "default": lax.Precision.DEFAULT,   # fastest (bf16 passes on TPU)
    "high": lax.Precision.HIGH,         # more bf16 passes
    "highest": lax.Precision.HIGHEST,   # full f32 emulation
}


def _conv2d_same(x: jax.Array, w: jax.Array, b: jax.Array,
                 compute_dtype: jnp.dtype,
                 precision: str = "highest") -> jax.Array:
    """3x3 stride-1 SAME convolution in NHWC/HWIO.

    Activations stay in compute_dtype end-to-end (the MXU accumulates in
    f32 internally regardless; keeping the output in compute_dtype keeps
    forward and transpose conv dtypes consistent so autodiff works, and in
    bf16 mode halves HBM traffic). Taps are upcast to f32 at the loss
    boundary (extract_features).

    `precision` controls the MXU pass count for float32 operands
    (bf16x1 / bf16x3 / bf16x6); it is ignored for bfloat16 compute.
    """
    y = lax.conv_general_dilated(
        x.astype(compute_dtype),
        w.astype(compute_dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=_PRECISIONS[precision],
    )
    return y + b.astype(compute_dtype)


def _maxpool2(x: jax.Array, impl: str = "reduce_window") -> jax.Array:
    """2x2 stride-2 max pool (torchvision MaxPool2d(kernel=2, stride=2)).

    Two implementations with identical forward semantics (incl. flooring
    odd dims):

    - 'reduce_window' (default): XLA fuses it into the surrounding conv
      fusions on TPU — measured 22% faster for the full 1024px step than
      the slice variant, despite the select-and-scatter backward looking
      expensive in isolation.
    - 'slices': strided-slice + maximum. reduce_window's
      (select-and-scatter) sharding support triggers "involuntary full
      rematerialization" partitioner fallbacks on tiny pooled shapes; the
      slice form avoids those warnings but a stride-2 slice along a
      SHARDED H axis still makes GSPMD replicate everything downstream of
      the first pool (measured: only the conv1 block of each level
      actually partitioned, scripts/space_memory.py round 4).
    - 'reshape': split H (and W) into (dim/2, 2) and max over the window
      axes. A split-dim reshape of an evenly-sharded axis partitions
      cleanly, so the whole VGG stack stays sharded under the 'space'
      axis — this is what the space-sharded batched executor uses.

    Gradient-at-ties differs between the variants (first-wins vs
    split-evenly), but ties only occur between equal activations — after
    ReLU that means zeros, whose gradient the ReLU mask kills anyway; the
    torch-twin trajectory tests confirm bit-comparable training either way
    (tests/test_trajectory_parity.py).
    """
    if impl in ("slices", "reshape"):
        b, h, w, c = x.shape
        x = x[:, :h - h % 2, :w - w % 2, :]
        if impl == "reshape":
            b2, h2, w2, c2 = x.shape
            x = x.reshape(b2, h2 // 2, 2, w2 // 2, 2, c2)
            return x.max(axis=(2, 4))
        x = jnp.maximum(x[:, 0::2], x[:, 1::2])
        return jnp.maximum(x[:, :, 0::2], x[:, :, 1::2])
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


def extract_features(params: Params, x: jax.Array,
                     compute_dtype: str = "float32",
                     precision: str = "highest",
                     use_relu: bool = True,
                     pool_impl: str = "reduce_window") -> Vgg19Features:
    """Run the truncated VGG19 stack and return the six taps.

    Args:
      params: {conv_name: {'w': (3,3,Cin,Cout) HWIO, 'b': (Cout,)}}.
      x: preprocessed image batch, NHWC float32
         (pixels*255 - ImageNet mean, see utils/image.py).
      compute_dtype: 'float32' or 'bfloat16' for the conv MACs.
      use_relu: True exposes post-ReLU taps (relu1_1..relu5_1, the
        reference default); False exposes the pre-ReLU conv taps
        (conv1_1..conv5_1, "as in the original paper" — reference
        neural_nets.py:17-25). conv4_2 is pre-ReLU either way.

    Returns:
      Vgg19Features of NHWC maps in compute_dtype. Keeping bf16 taps bf16
      (instead of upcasting at the tap boundary) halves the HBM traffic of
      the tap layout copies that dominate the large-image step (PARITY.md
      "Single-chip performance analysis"); the loss code accumulates in
      f32 (gram via preferred_element_type, MSEs upcast before reducing).
    """
    cdt = jnp.dtype(compute_dtype)
    taps: Dict[str, jax.Array] = {}
    if use_relu:
        pre_wanted = {src: tap for tap, (src, kind) in _TAPS.items()
                      if kind == "pre"}
        post_wanted = {src: tap for tap, (src, kind) in _TAPS.items()
                       if kind == "post"}
    else:
        pre_wanted = {src: tap for tap, (src, _kind) in _TAPS.items()}
        post_wanted = {}

    h = x
    for name, _ in VGG19_LAYERS:
        if name == "pool":
            h = _maxpool2(h, pool_impl)
            continue
        p = params[name]
        h = _conv2d_same(h, p["w"], p["b"], cdt, precision)
        if name in pre_wanted:
            taps[pre_wanted[name]] = h
        h = jax.nn.relu(h)
        if name in post_wanted:
            taps[post_wanted[name]] = h
        if name == "conv5_1":
            break  # nothing past relu5_1 is ever used

    return Vgg19Features(*(taps[n] for n in LAYER_NAMES))


def prepare_model(model: str):
    """Return (feature_fn, content_index, style_indices) for a model name.

    Reference parity: prepare_model(model, device) with only 'vgg19'
    supported, raising ValueError otherwise (reference math_utils.py:9-23).
    Device placement is implicit in JAX (jit partitions decide placement).
    """
    if model == "vgg19":
        return extract_features, CONTENT_INDEX, list(STYLE_INDICES)
    raise ValueError(f"{model} not supported.")


def param_shapes() -> Dict[str, Dict[str, tuple]]:
    """Static shape table for all conv parameters (HWIO kernels)."""
    shapes = {}
    cin = 3
    for name, cout in VGG19_LAYERS:
        if name == "pool":
            continue
        shapes[name] = {"w": (3, 3, cin, cout), "b": (cout,)}
        cin = cout
    return shapes


def count_params(params: Params) -> int:
    return int(sum(np.prod(v["w"].shape) + np.prod(v["b"].shape)
                   for v in params.values()))
