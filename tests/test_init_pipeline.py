"""Noise-init pipeline: native primitives vs cv2, and reference semantics."""

import numpy as np
import pytest

from artstyletransfer_tpu.config import Config
from artstyletransfer_tpu.engine.init_pipeline import (
    build_init_image,
    build_noise_map,
    gaussian_blur,
    gaussian_kernel_1d,
    gaussian_mask,
    make_style_noise,
    noise_replacement_map,
    sobel5,
)


def test_gaussian_kernel_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    for n, sigma in [(9, 2.0), (101, 0.2), (33, 33 * 0.3), (256, 256 * 0.2)]:
        ours = gaussian_kernel_1d(n, sigma)
        ref = cv2.getGaussianKernel(n, sigma).ravel()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_gaussian_mask_semantics():
    # central amplitude at the center pixel, -> peripheral at corners
    mask = gaussian_mask((64, 96, 3), central_amplitude=0.4,
                         peripheral_amplitude=0.1, dispersion_scale=0.2)
    assert mask.shape == (64, 96, 3)
    np.testing.assert_allclose(mask[32, 48], 0.4, atol=1e-6)
    assert abs(mask[0, 0, 0] - 0.1) < 0.05  # near peripheral at the corner
    assert np.all(mask >= 0.0999) and np.all(mask <= 0.4001)


def test_sobel_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    img = rng.random((37, 45, 3)).astype(np.float32)
    for axis, (dx, dy) in (("x", (1, 0)), ("y", (0, 1))):
        ours = sobel5(img, axis)
        ref = cv2.Sobel(img, cv2.CV_64F, dx, dy, ksize=5)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_gaussian_blur_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    img = rng.random((120, 130, 3)).astype(np.float64)
    ours = gaussian_blur(img, ksize=101, sigma=0.2)
    ref = cv2.GaussianBlur(img, ksize=(101, 101), sigmaX=0.2)
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-8)


def test_style_noise_preserves_color_distribution(rng):
    style = rng.random((30, 30, 3)).astype(np.float32)
    noise = make_style_noise(style, (20, 25, 3), rng)
    assert noise.shape == (20, 25, 3)
    # the noise is a permutation of the resized style's pixels
    from artstyletransfer_tpu.ops.resize import bicubic_resize_np

    resized = bicubic_resize_np(style, 20, 25).reshape(-1, 3)
    ours_sorted = np.sort(noise.reshape(-1, 3), axis=0)
    ref_sorted = np.sort(resized, axis=0)
    np.testing.assert_allclose(ours_sorted, ref_sorted, atol=1e-6)


def test_build_noise_map_granularities(rng):
    style = rng.random((40, 40, 3)).astype(np.float32)
    cfg = Config(noise_levels=(4, -2, 0),
                 noise_levels_central_amplitude=(0.3, 0.2, 0.2),
                 noise_levels_peripheral_amplitude=(0.2, 0.1, 0.0),
                 noise_levels_dispersion=(0.2, 0.6, 0.3))
    noise = build_noise_map((32, 48, 3), style, cfg, rng)
    assert noise.shape == (32, 48, 3)
    assert np.isfinite(noise).all()
    assert noise.std() > 0  # actual structure, not a constant


def test_noise_replacement_edges_get_less_noise(rng):
    # a sharp vertical edge should suppress noise locally
    img = np.zeros((64, 64, 3), np.float32)
    img[:, 32:] = 1.0
    nr = noise_replacement_map(img, noise_factor=0.95)
    assert nr.shape == (64, 64, 3)
    edge = nr[32, 31:34].mean()
    flat = nr[32, 5].mean()
    assert edge < flat  # strong gradient -> less noise
    assert flat <= 0.95 + 1e-5


def test_noise_replacement_ignore_gradient_flag():
    img = np.zeros((16, 16, 3), np.float32)
    nr = noise_replacement_map(img, 0.5, ignore_gradient_map=True)
    assert float(nr) == 0.5


def test_build_init_image_methods(rng):
    content = rng.random((40, 56, 3)).astype(np.float32)
    style = rng.random((32, 32, 3)).astype(np.float32)
    cfg = Config(levels_num=1, base_diameter=16)

    img, name = build_init_image("content+noise", content, style, cfg, rng)
    assert name == "content"
    assert img.shape == (16, 22, 3)

    img_r, name_r = build_init_image("random", content, style, cfg, rng)
    assert name_r == "random" and img_r.shape == (16, 22, 3)

    img_s, name_s = build_init_image("style", content, style, cfg, rng)
    assert name_s == "style" and img_s.shape == (16, 16, 3)

    with pytest.raises(ValueError):
        build_init_image("zeros", content, style, cfg, rng)
