"""VGG19 weight loading, conversion, and deterministic initialization.

The reference downloads torchvision's pretrained VGG19 at first use
(reference neural_nets.py:19, cached under TORCH_HOME per reference
neural_style_transfer.py:8-10). This framework has no network dependency:
weights are resolved, in order, from

  1. an explicit path (``.npz`` native format, torchvision ``.pth``
     state-dict, or Keras ``.h5``),
  2. the ``ASTT_VGG19_WEIGHTS`` environment variable,
     (either naming a missing file is a loud ``FileNotFoundError``),
  3. a cached native ``.npz`` under ``~/.cache/artstyletransfer_tpu/``,
  4. a deterministic seeded He-normal initialization (documented fallback —
     random VGGs are known to carry usable style/content statistics, and all
     parity/bench comparisons in this repo run both frameworks on the SAME
     weights, so benchmarks remain apples-to-apples).

Native format: a single ``.npz`` with arrays ``{name}_w`` (HWIO) and
``{name}_b`` for each conv layer in models/vgg19.py CONV_NAMES.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from .vgg19 import CONV_NAMES, param_shapes

_CACHE_DIR = os.path.join(os.path.expanduser("~"), ".cache", "artstyletransfer_tpu")
_CACHE_FILE = os.path.join(_CACHE_DIR, "vgg19_features.npz")
_ENV_VAR = "ASTT_VGG19_WEIGHTS"

# torchvision vgg19.features module indices of each conv layer, used when
# converting a torchvision state_dict (features.<idx>.weight, OIHW layout).
_TORCHVISION_INDICES = {
    "conv1_1": 0, "conv1_2": 2,
    "conv2_1": 5, "conv2_2": 7,
    "conv3_1": 10, "conv3_2": 12, "conv3_3": 14, "conv3_4": 16,
    "conv4_1": 19, "conv4_2": 21, "conv4_3": 23, "conv4_4": 25,
    "conv5_1": 28,
}

# Keras applications VGG19 layer names (kernels already HWIO).
_KERAS_NAMES = {
    "conv1_1": "block1_conv1", "conv1_2": "block1_conv2",
    "conv2_1": "block2_conv1", "conv2_2": "block2_conv2",
    "conv3_1": "block3_conv1", "conv3_2": "block3_conv2",
    "conv3_3": "block3_conv3", "conv3_4": "block3_conv4",
    "conv4_1": "block4_conv1", "conv4_2": "block4_conv2",
    "conv4_3": "block4_conv3", "conv4_4": "block4_conv4",
    "conv5_1": "block5_conv1",
}

Params = Dict[str, Dict[str, np.ndarray]]


def init_vgg19_params(seed: int = 0, dtype=np.float32) -> Params:
    """Deterministic He-normal init of the truncated VGG19 stack."""
    rng = np.random.default_rng(seed)
    params: Params = {}
    for name, shp in param_shapes().items():
        kh, kw, cin, cout = shp["w"]
        std = np.sqrt(2.0 / (kh * kw * cin))
        params[name] = {
            "w": (rng.standard_normal(shp["w"]) * std).astype(dtype),
            "b": np.zeros(shp["b"], dtype=dtype),
        }
    return params


def save_vgg19_params(params: Params, path: str) -> None:
    arrays = {}
    for name in CONV_NAMES:
        arrays[f"{name}_w"] = np.asarray(params[name]["w"], dtype=np.float32)
        arrays[f"{name}_b"] = np.asarray(params[name]["b"], dtype=np.float32)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **arrays)


def _load_npz(path: str) -> Params:
    data = np.load(path)
    return {
        name: {"w": data[f"{name}_w"], "b": data[f"{name}_b"]}
        for name in CONV_NAMES
    }


def _load_torch_pth(path: str) -> Params:
    """Convert a torchvision VGG19 state_dict: OIHW -> HWIO."""
    import torch  # CPU torch is an optional conversion dependency only

    state = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    params: Params = {}
    for name, idx in _TORCHVISION_INDICES.items():
        w = state[f"features.{idx}.weight"].numpy()  # (O, I, H, W)
        b = state[f"features.{idx}.bias"].numpy()
        params[name] = {
            "w": np.transpose(w, (2, 3, 1, 0)).astype(np.float32),  # HWIO
            "b": b.astype(np.float32),
        }
    return params


def _load_keras_h5(path: str) -> Params:
    import h5py

    params: Params = {}
    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        for name, kname in _KERAS_NAMES.items():
            grp = root[kname]
            while not any(k.endswith("kernel:0") or k == "kernel" for k in grp.keys()):
                grp = grp[list(grp.keys())[0]]
            kernel_key = "kernel:0" if "kernel:0" in grp else "kernel"
            bias_key = "bias:0" if "bias:0" in grp else "bias"
            params[name] = {
                "w": np.asarray(grp[kernel_key], dtype=np.float32),  # HWIO already
                "b": np.asarray(grp[bias_key], dtype=np.float32),
            }
    return params


def _validate(params: Params) -> Params:
    shapes = param_shapes()
    for name in CONV_NAMES:
        got_w = tuple(params[name]["w"].shape)
        want_w = shapes[name]["w"]
        if got_w != want_w:
            raise ValueError(f"{name}: kernel shape {got_w} != expected {want_w}")
    return params


def load_vgg19_params(path: Optional[str] = None, seed: int = 0,
                      cache: bool = True) -> Params:
    """Resolve VGG19 weights (see module docstring for the search order)."""
    candidates = []
    if path:
        candidates.append(path)
    env = os.environ.get(_ENV_VAR)
    if env:
        candidates.append(env)
    if os.path.exists(_CACHE_FILE):
        candidates.append(_CACHE_FILE)

    for cand in candidates:
        if not os.path.exists(cand):
            if (path and cand == path) or (env and cand == env):
                # a path named explicitly — argument or env var — must
                # fail loudly: falling through could end at RANDOM seeded
                # weights, and a server silently stylizing with those
                # (e.g. after a typo'd ASTT_VGG19_WEIGHTS) is far worse
                # than refusing to start
                raise FileNotFoundError(f"VGG19 weights not found: {cand}")
            # a stale cache entry falls through the documented resolution
            # order instead of aborting it
            import sys

            print(f"warning: VGG19 weights candidate {cand} does not "
                  "exist; trying the next source", file=sys.stderr)
            continue
        if cand.endswith(".npz"):
            params = _validate(_load_npz(cand))
        elif cand.endswith((".pth", ".pt")):
            params = _validate(_load_torch_pth(cand))
        elif cand.endswith((".h5", ".hdf5")):
            params = _validate(_load_keras_h5(cand))
        else:
            raise ValueError(f"Unknown weight format: {cand}")
        if cache and cand != _CACHE_FILE:
            try:
                os.makedirs(_CACHE_DIR, exist_ok=True)
                save_vgg19_params(params, _CACHE_FILE)
            except OSError:
                pass
        return params

    return init_vgg19_params(seed=seed)


def convert_weights_main(argv=None) -> int:
    """``astt-convert-weights``: convert torchvision ``.pth`` / Keras ``.h5``
    VGG19 weights to the native ``.npz`` format (and optionally install them
    into the cache so every run picks them up automatically).

    The reference downloads pretrained weights at first use (reference
    neural_nets.py:19); on a zero-egress host, drop a weights file here
    instead:

        astt-convert-weights vgg19-dcbb9e9d.pth -o vgg19.npz --install
    """
    import argparse

    parser = argparse.ArgumentParser(prog="astt-convert-weights")
    parser.add_argument("input", help="source weights (.pth/.pt/.h5/.npz)")
    parser.add_argument("-o", "--output", default=None,
                        help="output .npz path (default: <input>.npz)")
    parser.add_argument("--install", action="store_true",
                        help=f"also install into the cache ({_CACHE_FILE}) "
                             "so all runs resolve them automatically")
    args = parser.parse_args(argv)

    params = load_vgg19_params(args.input, cache=False)
    out = args.output or os.path.splitext(args.input)[0] + ".npz"
    save_vgg19_params(params, out)
    n = sum(int(np.prod(v["w"].shape)) + int(np.prod(v["b"].shape))
            for v in params.values())
    print(f"wrote {out} ({len(params)} conv layers, {n:,} parameters)")
    if args.install:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        save_vgg19_params(params, _CACHE_FILE)
        print(f"installed -> {_CACHE_FILE}")
    return 0
