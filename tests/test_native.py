"""Native C++ image ops vs the numpy/cv2 references."""

import numpy as np
import pytest

from artstyletransfer_tpu import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def test_native_bicubic_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    img = rng.random((47, 61, 3)).astype(np.float32)
    for oh, ow in [(94, 122), (23, 31), (128, 96)]:
        ours = native.bicubic_resize(img, oh, ow)
        ref = cv2.resize(img, (ow, oh), interpolation=cv2.INTER_CUBIC)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-5)


def test_native_filter_matches_scipy(rng):
    scipy_ndimage = pytest.importorskip("scipy.ndimage")
    img = rng.random((40, 52, 3)).astype(np.float64)
    kx = np.array([-1.0, -2.0, 0.0, 2.0, 1.0])
    ky = np.array([1.0, 4.0, 6.0, 4.0, 1.0])
    ours = native.sep_filter_reflect101(img, kx, ky)
    ref = scipy_ndimage.correlate1d(img, ky, axis=0, mode="mirror")
    ref = scipy_ndimage.correlate1d(ref, kx, axis=1, mode="mirror")
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-12)


def test_native_filter_long_gaussian(rng):
    scipy_ndimage = pytest.importorskip("scipy.ndimage")
    from artstyletransfer_tpu.engine.init_pipeline import gaussian_kernel_1d

    img = rng.random((64, 64, 3)).astype(np.float64)
    k = gaussian_kernel_1d(101, 0.2)
    ours = native.sep_filter_reflect101(img, k, k)
    ref = scipy_ndimage.correlate1d(img, k, axis=0, mode="mirror")
    ref = scipy_ndimage.correlate1d(ref, k, axis=1, mode="mirror")
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-12)


def test_resize_np_uses_native_transparently(rng):
    """bicubic_resize_np output must be identical regardless of backend."""
    from artstyletransfer_tpu.ops.resize import bicubic_resize_np

    img = rng.random((37, 53, 3)).astype(np.float32)
    out = bicubic_resize_np(img, 74, 106)
    # compare against the pure-matrix path
    import artstyletransfer_tpu.native as nat

    orig_tried, orig_lib = nat._tried, nat._lib
    try:
        nat._tried, nat._lib = True, None  # disable native
        ref = bicubic_resize_np(img, 74, 106)
    finally:
        nat._tried, nat._lib = orig_tried, orig_lib
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
