"""Volume quality metrics: PSNR and SSIM.

The reference paper (EJNMMI 2025) evaluates denoising via PSNR/SSIM tables
(reference README.md:37-44); the repo itself ships no metric code, only a
std-based noise-reduction stat (scripts/test.py:154-161). These give the
rebuild a first-class quantitative parity surface.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def psnr(
    reference: np.ndarray, test: np.ndarray, data_range: Optional[float] = None
) -> float:
    """Peak signal-to-noise ratio in dB."""
    reference = np.asarray(reference, np.float64)
    test = np.asarray(test, np.float64)
    if data_range is None:
        data_range = float(reference.max() - reference.min())
    mse = float(np.mean((reference - test) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(data_range ** 2 / mse)


def _uniform_filter(x: np.ndarray, size: int) -> np.ndarray:
    """Separable box filter with reflect padding (any rank)."""
    for axis in range(x.ndim):
        pad = [(0, 0)] * x.ndim
        lo = size // 2
        hi = size - 1 - lo
        pad[axis] = (lo, hi)
        xp = np.pad(x, pad, mode="reflect")
        c = np.cumsum(xp, axis=axis, dtype=np.float64)
        zero = np.zeros_like(np.take(c, [0], axis=axis))
        c = np.concatenate([zero, c], axis=axis)
        upper = np.take(c, np.arange(size, c.shape[axis]), axis=axis)
        lower = np.take(c, np.arange(0, c.shape[axis] - size), axis=axis)
        x = (upper - lower) / size
    return x


def ssim(
    reference: np.ndarray,
    test: np.ndarray,
    data_range: Optional[float] = None,
    win_size: int = 7,
    k1: float = 0.01,
    k2: float = 0.03,
) -> float:
    """Structural similarity (mean over the volume), standard Wang et al.
    formulation with a uniform window — works for 2-D and 3-D arrays."""
    x = np.asarray(reference, np.float64)
    y = np.asarray(test, np.float64)
    assert x.shape == y.shape
    if data_range is None:
        data_range = float(x.max() - x.min())
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_x = _uniform_filter(x, win_size)
    mu_y = _uniform_filter(y, win_size)
    mu_xx = _uniform_filter(x * x, win_size)
    mu_yy = _uniform_filter(y * y, win_size)
    mu_xy = _uniform_filter(x * y, win_size)

    n = win_size ** x.ndim
    cov_norm = n / (n - 1)
    var_x = cov_norm * (mu_xx - mu_x * mu_x)
    var_y = cov_norm * (mu_yy - mu_y * mu_y)
    cov_xy = cov_norm * (mu_xy - mu_x * mu_y)

    num = (2 * mu_x * mu_y + c1) * (2 * cov_xy + c2)
    den = (mu_x ** 2 + mu_y ** 2 + c1) * (var_x + var_y + c2)
    return float(np.mean(num / den))


def volume_report(
    reference: np.ndarray, test: np.ndarray, data_range: Optional[float] = None
) -> dict:
    return {
        "psnr_db": psnr(reference, test, data_range),
        "ssim": ssim(reference, test, data_range),
        "mae": float(np.mean(np.abs(
            np.asarray(reference, np.float64) - np.asarray(test, np.float64)
        ))),
        "rmse": float(np.sqrt(np.mean(
            (np.asarray(reference, np.float64) - np.asarray(test, np.float64))
            ** 2
        ))),
    }
