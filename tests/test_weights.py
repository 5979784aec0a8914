"""Weight loading/conversion: npz round-trip, torchvision .pth conversion,
resolution order, and the seeded fallback."""

import numpy as np
import pytest

import torch

from artstyletransfer_tpu.models.vgg19 import CONV_NAMES, param_shapes
from artstyletransfer_tpu.models.weights import (
    _TORCHVISION_INDICES,
    init_vgg19_params,
    load_vgg19_params,
    save_vgg19_params,
)


def test_seeded_init_deterministic():
    a = init_vgg19_params(seed=3)
    b = init_vgg19_params(seed=3)
    c = init_vgg19_params(seed=4)
    np.testing.assert_array_equal(a["conv3_2"]["w"], b["conv3_2"]["w"])
    assert not np.array_equal(a["conv3_2"]["w"], c["conv3_2"]["w"])


def test_npz_round_trip(tmp_path):
    params = init_vgg19_params(seed=1)
    path = str(tmp_path / "w.npz")
    save_vgg19_params(params, path)
    loaded = load_vgg19_params(path, cache=False)
    for name in CONV_NAMES:
        np.testing.assert_array_equal(params[name]["w"], loaded[name]["w"])
        np.testing.assert_array_equal(params[name]["b"], loaded[name]["b"])


def test_torchvision_pth_conversion(tmp_path):
    """A synthetic torchvision-layout state_dict converts OIHW -> HWIO."""
    rng = np.random.default_rng(0)
    state = {}
    shapes = param_shapes()
    for name, idx in _TORCHVISION_INDICES.items():
        kh, kw, cin, cout = shapes[name]["w"]
        w = rng.standard_normal((cout, cin, kh, kw)).astype(np.float32)
        state[f"features.{idx}.weight"] = torch.from_numpy(w)
        state[f"features.{idx}.bias"] = torch.from_numpy(
            rng.standard_normal(cout).astype(np.float32))
    # torchvision state dicts also contain classifier weights; they must
    # be ignored
    state["classifier.0.weight"] = torch.zeros(10, 10)
    path = str(tmp_path / "vgg19.pth")
    torch.save(state, path)

    params = load_vgg19_params(path, cache=False)
    w_ref = state["features.0.weight"].numpy()  # (O, I, H, W)
    np.testing.assert_array_equal(params["conv1_1"]["w"],
                                  np.transpose(w_ref, (2, 3, 1, 0)))
    assert params["conv5_1"]["w"].shape == (3, 3, 512, 512)


def test_wrong_shape_rejected(tmp_path):
    params = init_vgg19_params(seed=1)
    params["conv1_1"]["w"] = params["conv1_1"]["w"][:, :, :, :32]
    path = str(tmp_path / "bad.npz")
    # save_vgg19_params validates nothing; loading must
    import numpy as _np

    arrays = {}
    for name in CONV_NAMES:
        arrays[f"{name}_w"] = params[name]["w"]
        arrays[f"{name}_b"] = params[name]["b"]
    _np.savez(path, **arrays)
    with pytest.raises(ValueError, match="shape"):
        load_vgg19_params(path, cache=False)


def test_missing_explicit_path_raises():
    with pytest.raises(FileNotFoundError):
        load_vgg19_params("/nope/does_not_exist.npz", cache=False)


def test_unknown_format_rejected(tmp_path):
    path = tmp_path / "w.bin"
    path.write_bytes(b"xx")
    with pytest.raises(ValueError, match="format"):
        load_vgg19_params(str(path), cache=False)
