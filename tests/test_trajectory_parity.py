"""Whole-pipeline trajectory parity: N Adam steps here vs the torch twin.

Strongest end-to-end numerics check: starting from the identical init
image, five full optimization steps (pyramid downscale chain, 2x VGG19
forward, Gram/content/TV losses, backward, bias-corrected Adam with the
x0.999 lr decay) must produce the same image in both frameworks. Measured
agreement on CPU is ~120 dB PSNR (bit-level); the bound below leaves room
for platform variation while still catching any semantic drift.
"""

import numpy as np
import torch

from artstyletransfer_tpu.config import Config
from artstyletransfer_tpu.engine.pyramid import build_input_pyramids
from artstyletransfer_tpu.engine.transfer import TransferJob
from artstyletransfer_tpu.baselines.torch_ref import (
    TorchPyramidLoss,
    TorchVgg19,
    run_steps,
)
from artstyletransfer_tpu.utils.image import prepare_img, unprepare_img


def test_adam_trajectory_matches_torch(vgg_params):
    rng = np.random.default_rng(2)
    content = rng.random((40, 56, 3)).astype(np.float32)
    style = rng.random((36, 36, 3)).astype(np.float32)
    cfg = Config(levels_num=2, iters_num=5, base_diameter=16,
                 optimizer="adam", stream_every=5,
                 init_method="content+noise", seed=3)

    job = TransferJob(content, style, cfg, params=vgg_params)
    _, ours, loss_ours = list(job.run())[-1]

    c_lvls, s_lvls = build_input_pyramids(content, style, 2, 16)
    to_nchw = lambda a: np.ascontiguousarray(  # noqa: E731
        np.transpose(prepare_img(a), (0, 3, 1, 2)))
    tl = TorchPyramidLoss(TorchVgg19(vgg_params),
                          [to_nchw(c) for c in c_lvls],
                          [to_nchw(s) for s in s_lvls],
                          cfg.content_weight, cfg.style_weight,
                          cfg.tv_weight)
    init_nchw = np.ascontiguousarray(np.transpose(
        np.asarray(job._x0).reshape(job.level_shapes[0]), (0, 3, 1, 2)))
    theirs_nchw, loss_theirs = run_steps(tl, init_nchw, 5, optimizer="adam",
                                         lr_start=cfg.lr_start)
    theirs = unprepare_img(np.transpose(theirs_nchw, (0, 2, 3, 1)))

    mse = float(np.mean((ours - theirs) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 60.0, f"trajectory diverged: {psnr:.1f} dB"
    np.testing.assert_allclose(loss_ours, loss_theirs, rtol=1e-3)
