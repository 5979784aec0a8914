"""PyTorch-CPU twin of the style-transfer math, for parity tests and as the
measured benchmark baseline.

The reference framework targets PyTorch (reference neural_style_transfer.py,
math_utils.py, neural_nets.py) but cannot run in this environment
(torchvision and pretrained weights are unavailable), so this module
re-implements the same math directly in torch from the documented semantics,
consuming the SAME weight pytree as the JAX path (models/weights.py). That
gives bit-comparable parity tests and an honest steps/sec baseline.

Semantics reproduced:
- VGG19 six-tap forward, maxpool, conv4_2 pre-ReLU content tap
  (reference neural_nets.py:21-68)
- gram_matrix normalized by ch*h*w (reference math_utils.py:26-34)
- squared-mean total variation (reference math_utils.py:37-41)
- pyramid loss: per-level bicubic /2 downscale chain of the optimizing image,
  per-level content MSE + mean-over-layers gram MSE + TV, summed over levels
  (reference neural_style_transfer.py:84-112, :168-186)
- Adam / LBFGS(max_iter=1, strong_wolfe) step loop with lr *= 0.999 per
  closure call (reference neural_style_transfer.py:133-138, :154-158)
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np
import torch
import torch.nn.functional as F

from ..models.vgg19 import CONV_NAMES, VGG19_LAYERS

_POOL_AFTER = {"conv1_2", "conv2_2", "conv3_4", "conv4_4"}


class TorchVgg19:
    """Six-tap VGG19 feature extractor from an HWIO numpy param dict.

    use_relu=False taps the conv outputs pre-ReLU ("as in the original
    paper", reference neural_nets.py:10,17-25); conv4_2 is pre-ReLU either
    way.
    """

    def __init__(self, params: Dict[str, Dict[str, np.ndarray]], device="cpu",
                 use_relu: bool = True):
        self.use_relu = use_relu
        self.device = torch.device(device)
        self.weights = {}
        for name in CONV_NAMES:
            w = np.transpose(np.asarray(params[name]["w"]), (3, 2, 0, 1))  # HWIO->OIHW
            self.weights[name] = (
                torch.from_numpy(np.ascontiguousarray(w)).to(self.device),
                torch.from_numpy(np.asarray(params[name]["b"])).to(self.device),
            )

    def __call__(self, x: torch.Tensor) -> List[torch.Tensor]:
        """x: NCHW preprocessed. Returns the 6 taps in LAYER_NAMES order."""
        taps = {}
        h = x
        for name, _ in VGG19_LAYERS:
            if name == "pool":
                continue
            w, b = self.weights[name]
            h = F.conv2d(h, w, b, stride=1, padding=1)
            if name == "conv4_2":
                taps["conv4_2"] = h
            if not self.use_relu and name in (
                    "conv1_1", "conv2_1", "conv3_1", "conv4_1", "conv5_1"):
                taps[{"conv1_1": "relu1_1", "conv2_1": "relu2_1",
                      "conv3_1": "relu3_1", "conv4_1": "relu4_1",
                      "conv5_1": "relu5_1"}[name]] = h
            h = F.relu(h)
            if self.use_relu and name in (
                    "conv1_1", "conv2_1", "conv3_1", "conv4_1", "conv5_1"):
                taps[{"conv1_1": "relu1_1", "conv2_1": "relu2_1",
                      "conv3_1": "relu3_1", "conv4_1": "relu4_1",
                      "conv5_1": "relu5_1"}[name]] = h
            if name in _POOL_AFTER:
                h = F.max_pool2d(h, kernel_size=2, stride=2)
            if name == "conv5_1":
                break
        return [taps[n] for n in
                ("relu1_1", "relu2_1", "relu3_1", "relu4_1", "conv4_2", "relu5_1")]


def gram_matrix(x: torch.Tensor, should_normalize: bool = True) -> torch.Tensor:
    b, ch, h, w = x.size()
    features = x.view(b, ch, w * h)
    gram = features.bmm(features.transpose(1, 2))
    if should_normalize:
        gram = gram / (ch * h * w)
    return gram


def total_variation(y: torch.Tensor) -> torch.Tensor:
    mean_x = torch.mean(torch.abs(y[:, :, :, :-1] - y[:, :, :, 1:]))
    mean_y = torch.mean(torch.abs(y[:, :, :-1, :] - y[:, :, 1:, :]))
    return mean_x * mean_x + mean_y * mean_y


class TorchPyramidLoss:
    """Per-level targets + total pyramid loss on the optimizing image."""

    def __init__(self, net: TorchVgg19, content_levels: Sequence[np.ndarray],
                 style_levels: Sequence[np.ndarray], content_weight: float,
                 style_weight: float, tv_weight: float):
        # content/style_levels: preprocessed NCHW numpy, highest-res first.
        self.net = net
        self.cw, self.sw, self.tw = content_weight, style_weight, tv_weight
        self.targets = []
        with torch.no_grad():
            for c_np, s_np in zip(content_levels, style_levels):
                c = torch.from_numpy(c_np).to(net.device)
                s = torch.from_numpy(s_np).to(net.device)
                c_feats = net(c)
                s_feats = net(s)
                target_content = c_feats[4].squeeze(0)
                target_grams = [gram_matrix(s_feats[i]) for i in (0, 1, 2, 3, 5)]
                self.targets.append((target_content, target_grams))

    def level_loss(self, img: torch.Tensor, level: int):
        feats = self.net(img)
        target_content, target_grams = self.targets[level]
        content_loss = F.mse_loss(target_content, feats[4].squeeze(0))
        style_loss = 0.0
        for gt, idx in zip(target_grams, (0, 1, 2, 3, 5)):
            style_loss = style_loss + F.mse_loss(gt[0], gram_matrix(feats[idx])[0])
        style_loss = style_loss / len(target_grams)
        tv_loss = total_variation(img)
        total = self.cw * content_loss + self.sw * style_loss + self.tw * tv_loss
        return total, content_loss, style_loss, tv_loss

    def total_loss(self, optimizing_img: torch.Tensor):
        total = None
        cur = optimizing_img
        for level in range(len(self.targets)):
            if level > 0:
                sh = cur.shape[2] // 2
                sw = cur.shape[3] // 2
                cur = F.interpolate(cur, size=(sh, sw), mode="bicubic")
            lvl_total, _, _, _ = self.level_loss(cur, level)
            total = lvl_total if total is None else total + lvl_total
        return total


def run_steps(loss: TorchPyramidLoss, init_img_nchw: np.ndarray, n_steps: int,
              optimizer: str = "adam", lr_start: float = 10.0,
              lr_decay: float = 0.999,
              lbfgs_max_eval=None) -> tuple[np.ndarray, float]:
    """Run n optimization steps; returns (final image NCHW, last loss).

    lbfgs_max_eval: torch LBFGS max_eval. The reference leaves it at the
    default (max_iter*5//4 = 1 for max_iter=1), which makes torch pass
    max_ls=0 to its strong-Wolfe search — i.e. the reference performs ZERO
    line-search iterations per step: one trial at t=lr, kept only if its
    loss is lower. Pass max_eval=26 to get a real 25-iteration strong-Wolfe
    search for validating the full line-search implementation.
    """
    img = torch.from_numpy(init_img_nchw.copy()).to(loss.net.device)
    img.requires_grad_(True)
    if optimizer == "adam":
        opt = torch.optim.Adam((img,), lr=lr_start)
    elif optimizer == "lbfgs":
        opt = torch.optim.LBFGS((img,), max_iter=1, max_eval=lbfgs_max_eval,
                                line_search_fn="strong_wolfe", lr=lr_start)
    else:
        raise RuntimeError("Unknown optimizer")

    last = [0.0]

    def closure():
        for g in opt.param_groups:
            g["lr"] *= lr_decay
        if torch.is_grad_enabled():
            opt.zero_grad()
        total = loss.total_loss(img)
        if total.requires_grad:
            total.backward()
        last[0] = float(total.item())
        return total

    for _ in range(n_steps):
        opt.step(closure)
    return img.detach().cpu().numpy(), last[0]
