"""VGG19 feature extractor: architecture, taps, and parity vs the torch twin."""

import numpy as np

import jax.numpy as jnp
import torch

from artstyletransfer_tpu.models import (
    CONTENT_INDEX,
    LAYER_NAMES,
    STYLE_INDICES,
    extract_features,
    prepare_model,
)
from artstyletransfer_tpu.models.vgg19 import count_params, param_shapes
from artstyletransfer_tpu.baselines.torch_ref import TorchVgg19


def test_tap_metadata():
    # reference neural_nets.py:21-29
    assert LAYER_NAMES == ("relu1_1", "relu2_1", "relu3_1", "relu4_1",
                           "conv4_2", "relu5_1")
    assert CONTENT_INDEX == 4
    assert tuple(STYLE_INDICES) == (0, 1, 2, 3, 5)


def test_prepare_model_rejects_unknown():
    # reference math_utils.py:14-15
    import pytest

    with pytest.raises(ValueError):
        prepare_model("alexnet")
    fn, cidx, sidx = prepare_model("vgg19")
    assert cidx == 4 and sidx == [0, 1, 2, 3, 5]


def test_param_shapes():
    shapes = param_shapes()
    assert shapes["conv1_1"]["w"] == (3, 3, 3, 64)
    assert shapes["conv5_1"]["w"] == (3, 3, 512, 512)
    assert len(shapes) == 13  # truncated after conv5_1


def test_feature_shapes(vgg_params):
    x = jnp.zeros((1, 64, 96, 3), jnp.float32)
    feats = extract_features(vgg_params, x)
    assert feats.relu1_1.shape == (1, 64, 96, 64)
    assert feats.relu2_1.shape == (1, 32, 48, 128)
    assert feats.relu3_1.shape == (1, 16, 24, 256)
    assert feats.relu4_1.shape == (1, 8, 12, 512)
    assert feats.conv4_2.shape == (1, 8, 12, 512)
    assert feats.relu5_1.shape == (1, 4, 6, 512)


def test_parity_with_torch_twin(vgg_params, rng):
    x = (rng.random((1, 32, 40, 3)).astype(np.float32) * 255.0
         - np.array([123.675, 116.28, 103.53], np.float32))
    ours = extract_features(vgg_params, jnp.asarray(x))
    theirs = TorchVgg19(vgg_params)(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    for i, name in enumerate(("relu1_1", "relu2_1", "relu3_1", "relu4_1",
                              "conv4_2", "relu5_1")):
        a = np.asarray(ours[i])
        b = np.transpose(theirs[i].numpy(), (0, 2, 3, 1))
        scale = max(1.0, float(np.abs(b).max()))
        np.testing.assert_allclose(a / scale, b / scale, rtol=1e-4, atol=2e-5,
                                   err_msg=name)


def test_use_relu_false_gives_pre_relu_taps(vgg_params, rng):
    """use_relu=False exposes conv taps (reference neural_nets.py:17-25)."""
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
                    * 50)
    relu_taps = extract_features(vgg_params, x, use_relu=True)
    conv_taps = extract_features(vgg_params, x, use_relu=False)
    # post-ReLU taps are the clamped pre-ReLU taps
    np.testing.assert_allclose(np.asarray(relu_taps.relu1_1),
                               np.maximum(np.asarray(conv_taps.relu1_1), 0),
                               rtol=1e-6)
    # conv taps must contain negatives (no ReLU applied)
    assert (np.asarray(conv_taps.relu1_1) < 0).any()
    # the content tap is pre-ReLU in both modes
    np.testing.assert_array_equal(np.asarray(relu_taps.conv4_2),
                                  np.asarray(conv_taps.conv4_2))


def test_count_params(vgg_params):
    # Conv stack through conv5_1: sum of 3x3 kernels + biases
    n = count_params(vgg_params)
    assert n == sum(3 * 3 * cin * cout + cout for cin, cout in
                    [(3, 64), (64, 64), (64, 128), (128, 128),
                     (128, 256), (256, 256), (256, 256), (256, 256),
                     (256, 512), (512, 512), (512, 512), (512, 512),
                     (512, 512)])
