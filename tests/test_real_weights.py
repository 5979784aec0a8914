"""Perceptual parity with REAL pretrained VGG19 weights.

Zero-egress hosts cannot download torchvision's vgg19 weights, so these
tests are collected-but-skipped until a weights file is provided:

    astt-convert-weights vgg19-dcbb9e9d.pth --install
    # or: export ASTT_VGG19_WEIGHTS=/path/to/vgg19.{npz,pth,h5}
    pytest tests/test_real_weights.py

With real weights they validate the reference's visual identity (reference
README.md figures, img/bird_vg_lvl*.jpg): identical feature taps, and a
short optimization trajectory perceptually matching the torch twin.
"""

import os

import numpy as np
import pytest

from artstyletransfer_tpu.models.weights import (_CACHE_FILE,
                                                 load_vgg19_params,
                                                 init_vgg19_params)

_HAVE_REAL = bool(os.environ.get("ASTT_VGG19_WEIGHTS")) or \
    os.path.exists(_CACHE_FILE)

pytestmark = pytest.mark.skipif(
    not _HAVE_REAL,
    reason="real VGG19 weights unavailable (set ASTT_VGG19_WEIGHTS or run "
           "astt-convert-weights --install)")


@pytest.fixture(scope="module")
def real_params():
    params = load_vgg19_params()
    # guard: must not silently fall back to seeded init
    seeded = init_vgg19_params(seed=0)
    assert not np.allclose(params["conv1_1"]["w"], seeded["conv1_1"]["w"]), \
        "loader fell back to seeded weights"
    return params


@pytest.fixture(scope="module")
def real_images():
    from artstyletransfer_tpu.utils.image import load_image

    root = "/root/reference/data"
    if not os.path.exists(root):
        pytest.skip("reference images unavailable")
    return (load_image(f"{root}/content-images/bird.jpg"),
            load_image(f"{root}/style-images/vg_starry_night.jpg")
            if os.path.exists(f"{root}/style-images/vg_starry_night.jpg")
            else load_image(f"{root}/style-images/cubism2.jpg"))


def test_real_weight_taps_match_torch(real_params, real_images):
    """All six feature taps agree with the torch twin on a real image."""
    import jax.numpy as jnp

    from artstyletransfer_tpu.baselines.torch_ref import TorchVgg19
    from artstyletransfer_tpu.models.vgg19 import extract_features
    from artstyletransfer_tpu.ops.resize import bicubic_resize_np
    from artstyletransfer_tpu.utils.image import prepare_img
    import torch

    img = bicubic_resize_np(real_images[0], 128, 192)
    pre = prepare_img(img)
    ours = extract_features(real_params, jnp.asarray(pre))
    theirs = TorchVgg19(real_params)(
        torch.from_numpy(np.transpose(pre, (0, 3, 1, 2))))
    for tap_ours, tap_theirs in zip(ours, theirs):
        a = np.asarray(tap_ours)
        b = np.transpose(tap_theirs.detach().numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)


def test_real_weight_trajectory_perceptual_parity(real_params, real_images):
    """20 Adam steps at 256px: PSNR vs the torch twin must stay perceptually
    identical (the reference's whole visual identity rides on this path)."""
    from artstyletransfer_tpu.config import Config
    from artstyletransfer_tpu.engine.pyramid import build_input_pyramids
    from artstyletransfer_tpu.engine.transfer import TransferJob
    from artstyletransfer_tpu.baselines.torch_ref import (TorchPyramidLoss,
                                                          TorchVgg19,
                                                          run_steps)
    from artstyletransfer_tpu.utils.image import prepare_img, unprepare_img

    content, style = real_images
    cfg = Config(levels_num=1, iters_num=20, base_diameter=256,
                 optimizer="adam", stream_every=20, seed=3)
    job = TransferJob(content, style, cfg, params=real_params)
    _, ours, _ = list(job.run())[-1]

    c_lvls, s_lvls = build_input_pyramids(content, style, 1, 256)
    to_nchw = lambda a: np.ascontiguousarray(  # noqa: E731
        np.transpose(prepare_img(a), (0, 3, 1, 2)))
    tl = TorchPyramidLoss(TorchVgg19(real_params),
                          [to_nchw(c) for c in c_lvls],
                          [to_nchw(s) for s in s_lvls],
                          cfg.content_weight, cfg.style_weight,
                          cfg.tv_weight)
    init_nchw = np.ascontiguousarray(np.transpose(
        np.asarray(job._x0).reshape(job.level_shapes[0]), (0, 3, 1, 2)))
    theirs_nchw, _ = run_steps(tl, init_nchw, 20, optimizer="adam",
                               lr_start=cfg.lr_start)
    theirs = unprepare_img(np.transpose(theirs_nchw, (0, 2, 3, 1)))

    mse = float(np.mean((ours - theirs) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 40.0, f"real-weights trajectory diverged: {psnr:.1f} dB"


def test_visual_parity_harness_scores_goldens(real_params, tmp_path):
    """One-command visual identity check (scripts/visual_parity.py): with
    real weights, a short bird+VanGogh level-1 run must regenerate a figure
    that scores against the bundled reference golden, and the report JSON
    must be written. Uses few iterations to stay CI-sized; the full
    500-iteration README regeneration is the same command without --iters."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "..", "scripts"))
    import visual_parity

    if not os.path.exists(visual_parity.REF_IMG):
        pytest.skip("reference goldens unavailable")
    rc = visual_parity.main([
        "--pairs", "bird_vg", "--levels", "1", "--iters", "30",
        "--out", str(tmp_path)])
    assert rc == 0
    import json

    report = json.load(open(tmp_path / "report.json"))
    assert len(report) == 1
    row = report[0]
    assert row["pair"] == "bird_vg" and row["level"] == 1
    # 30 iterations is far from converged; require sane metric values, not
    # final-quality thresholds (the 500-iter run is the real check)
    assert 0.0 < row["ssim"] <= 1.0 and row["psnr_db"] > 5.0
    assert os.path.exists(row["ours"])
