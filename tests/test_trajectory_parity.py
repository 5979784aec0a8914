"""Whole-pipeline trajectory parity: N optimizer steps here vs the torch twin.

Strongest end-to-end numerics check: starting from the identical init
image, five full optimization steps (pyramid downscale chain, 2x VGG19
forward, Gram/content/TV losses, backward, optimizer update) must produce
the same image in both frameworks. Measured agreement on CPU is ~120 dB
PSNR (bit-level) for Adam; the bounds below leave room for platform
variation while still catching any semantic drift.

L-BFGS note: the reference runs torch.optim.LBFGS(max_iter=1,
line_search_fn='strong_wolfe') with the DEFAULT max_eval (= max_iter*5//4
= 1), which makes torch pass max_ls=0 into its strong-Wolfe search — ZERO
line-search iterations per step: one trial at t=lr, kept only if its loss
improves. Two parity tests below: (a) exact reference semantics
(lbfgs_max_ls_steps=0), and (b) the full 25-iteration strong-Wolfe search
(this framework's default; torch's behavior when max_eval permits,
reproduced with max_eval=26)."""

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


def _torch_twin(content, style, cfg, vgg_params, job):
    c_lvls, s_lvls = build_input_pyramids(content, style, cfg.levels_num,
                                          cfg.base_diameter)
    to_nchw = lambda a: np.ascontiguousarray(  # noqa: E731
        np.transpose(prepare_img(a), (0, 3, 1, 2)))
    tl = TorchPyramidLoss(TorchVgg19(vgg_params),
                          [to_nchw(c) for c in c_lvls],
                          [to_nchw(s) for s in s_lvls],
                          cfg.content_weight, cfg.style_weight,
                          cfg.tv_weight)
    init_nchw = np.ascontiguousarray(np.transpose(
        np.asarray(job._x0).reshape(job.level_shapes[0]), (0, 3, 1, 2)))
    return tl, init_nchw


def _psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def test_adam_trajectory_matches_torch(vgg_params):
    rng = np.random.default_rng(2)
    content = rng.random((40, 56, 3)).astype(np.float32)
    style = rng.random((36, 36, 3)).astype(np.float32)
    cfg = Config(levels_num=2, iters_num=5, base_diameter=16,
                 optimizer="adam", stream_every=5,
                 init_method="content+noise", seed=3)

    job = TransferJob(content, style, cfg, params=vgg_params)
    _, ours, loss_ours = list(job.run())[-1]

    tl, init_nchw = _torch_twin(content, style, cfg, vgg_params, job)
    theirs_nchw, loss_theirs = run_steps(tl, init_nchw, 5, optimizer="adam",
                                         lr_start=cfg.lr_start)
    theirs = unprepare_img(np.transpose(theirs_nchw, (0, 2, 3, 1)))

    psnr = _psnr(ours, theirs)
    assert psnr > 60.0, f"trajectory diverged: {psnr:.1f} dB"
    np.testing.assert_allclose(loss_ours, loss_theirs, rtol=1e-3)


def test_lbfgs_reference_semantics_matches_torch(vgg_params):
    """Exact reference L-BFGS: max_ls=0 trial-accept steps with the
    per-closure-call x0.999 lr decay (2 closure calls per step)."""
    rng = np.random.default_rng(7)
    content = rng.random((40, 56, 3)).astype(np.float32)
    style = rng.random((36, 36, 3)).astype(np.float32)
    cfg = Config(levels_num=2, iters_num=6, base_diameter=16,
                 optimizer="lbfgs", stream_every=1, lbfgs_max_ls_steps=0,
                 init_method="content+noise", seed=3)

    job = TransferJob(content, style, cfg, params=vgg_params)
    steps = list(job.run())
    ours = steps[-1][1]
    our_losses = [s[2] for s in steps]

    tl, init_nchw = _torch_twin(content, style, cfg, vgg_params, job)
    theirs_nchw, _ = run_steps(tl, init_nchw, 6, optimizer="lbfgs",
                               lr_start=cfg.lr_start)
    theirs = unprepare_img(np.transpose(theirs_nchw, (0, 2, 3, 1)))

    psnr = _psnr(ours, theirs)
    assert psnr > 60.0, (
        f"L-BFGS (reference semantics) diverged from torch: {psnr:.1f} dB; "
        f"our losses {our_losses}")


def test_lbfgs_full_wolfe_matches_torch(vgg_params):
    """The full strong-Wolfe line search (this framework's default) vs
    torch with max_eval=26 (so torch runs its real 25-iteration search)."""
    rng = np.random.default_rng(7)
    content = rng.random((40, 56, 3)).astype(np.float32)
    style = rng.random((36, 36, 3)).astype(np.float32)
    cfg = Config(levels_num=2, iters_num=5, base_diameter=16,
                 optimizer="lbfgs", stream_every=1, lbfgs_max_ls_steps=25,
                 init_method="content+noise", seed=3)

    job = TransferJob(content, style, cfg, params=vgg_params)
    steps = list(job.run())
    ours = steps[-1][1]
    our_losses = [s[2] for s in steps]

    tl, init_nchw = _torch_twin(content, style, cfg, vgg_params, job)
    theirs_nchw, loss_theirs = run_steps(tl, init_nchw, 5, optimizer="lbfgs",
                                         lr_start=cfg.lr_start,
                                         lbfgs_max_eval=26)
    theirs = unprepare_img(np.transpose(theirs_nchw, (0, 2, 3, 1)))

    psnr = _psnr(ours, theirs)
    # line-search branch decisions amplify f32 noise, so the bound is looser
    # than the deterministic reference-semantics test
    assert psnr > 35.0, (
        f"L-BFGS (full Wolfe) diverged from torch: {psnr:.1f} dB; "
        f"our losses {our_losses}, torch last {loss_theirs}")
    np.testing.assert_allclose(our_losses[-1], loss_theirs, rtol=5e-2)
