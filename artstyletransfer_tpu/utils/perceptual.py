"""Perceptual image comparison metrics (PSNR, SSIM).

Used by the visual-identity harness (scripts/visual_parity.py) to score
regenerated figures against the reference's published goldens
(reference README.md:35-60, reference img/bird_vg_lvl{1,2,3}.jpg), and by
the real-weights parity tests. Pure numpy + a separable Gaussian window —
no skimage dependency (unavailable in this environment).
"""

from __future__ import annotations

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 1.0) -> float:
    """Peak signal-to-noise ratio in dB between same-shape float images."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range ** 2 / mse))


def _gaussian_kernel1d(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    k = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return k / k.sum()


def _filter2d_sep(img: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Separable 'valid' Gaussian filtering of an HW or HWC image."""
    out = img.astype(np.float64)
    out = np.apply_along_axis(lambda m: np.convolve(m, k, mode="valid"),
                              0, out)
    out = np.apply_along_axis(lambda m: np.convolve(m, k, mode="valid"),
                              1, out)
    return out


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 1.0,
         win_size: int = 11, sigma: float = 1.5) -> float:
    """Mean structural similarity (Wang et al. 2004 formulation).

    Gaussian 11x11 sigma=1.5 window, K1=0.01, K2=0.03 — the standard
    constants skimage/MATLAB use. Multi-channel inputs average the
    per-channel SSIM.
    """
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch: {a.shape} vs {b.shape}")
    if a.ndim == 3:
        return float(np.mean([ssim(a[..., c], b[..., c], data_range,
                                   win_size, sigma)
                              for c in range(a.shape[-1])]))
    if min(a.shape) < win_size:
        raise ValueError(f"image smaller than the {win_size}px SSIM window")

    k = _gaussian_kernel1d(win_size, sigma)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2

    mu_a = _filter2d_sep(a, k)
    mu_b = _filter2d_sep(b, k)
    mu_aa = mu_a * mu_a
    mu_bb = mu_b * mu_b
    mu_ab = mu_a * mu_b
    sigma_aa = _filter2d_sep(a * a, k) - mu_aa
    sigma_bb = _filter2d_sep(b * b, k) - mu_bb
    sigma_ab = _filter2d_sep(a * b, k) - mu_ab

    num = (2 * mu_ab + c1) * (2 * sigma_ab + c2)
    den = (mu_aa + mu_bb + c1) * (sigma_aa + sigma_bb + c2)
    return float(np.mean(num / den))
