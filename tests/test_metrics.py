"""Tests for PSNR/SSIM against analytic cases and skimage (if present)."""

import numpy as np
import pytest

from ddpm3d_tpu.utils.metrics import psnr, ssim, volume_report


def test_psnr_identity_and_known_value(rng):
    x = rng.uniform(0, 1, size=(16, 16, 16))
    assert psnr(x, x) == float("inf")
    noise = np.full_like(x, 0.1)
    # MSE = 0.01, range=max-min -> psnr = 10*log10(range^2/0.01)
    r = float(x.max() - x.min())
    expect = 10 * np.log10(r ** 2 / 0.01)
    np.testing.assert_allclose(psnr(x, x + noise), expect, rtol=1e-6)


def test_ssim_identity_is_one(rng):
    x = rng.uniform(0, 1, size=(20, 20, 20))
    np.testing.assert_allclose(ssim(x, x), 1.0, atol=1e-10)


def test_ssim_degrades_with_noise(rng):
    x = rng.uniform(0, 1, size=(24, 24, 24))
    s1 = ssim(x, x + rng.normal(0, 0.05, x.shape), data_range=1.0)
    s2 = ssim(x, x + rng.normal(0, 0.3, x.shape), data_range=1.0)
    assert 0 < s2 < s1 < 1


def test_ssim_matches_skimage_when_available(rng):
    skimage = pytest.importorskip("skimage.metrics")
    x = rng.uniform(0, 1, size=(32, 32))
    y = np.clip(x + rng.normal(0, 0.1, x.shape), 0, 1)
    ours = ssim(x, y, data_range=1.0, win_size=7)
    theirs = skimage.structural_similarity(
        x, y, data_range=1.0, win_size=7, use_sample_covariance=True,
        gaussian_weights=False,
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-3)


def test_volume_report_keys(rng):
    x = rng.uniform(0, 1, size=(8, 8, 8))
    rep = volume_report(x, x + 0.01)
    assert set(rep) == {"psnr_db", "ssim", "mae", "rmse"}
    np.testing.assert_allclose(rep["mae"], 0.01, rtol=1e-6)


def test_ssim_matches_bruteforce_oracle(rng):
    """Independent oracle: per-window Wang et al. SSIM computed with literal
    python window loops (same reflect-padding convention) — removes the
    optional-skimage dependency from the cross-check."""
    x = rng.uniform(0, 1, size=(12, 12))
    y = np.clip(x + rng.normal(0, 0.1, x.shape), 0, 1)
    win, dr, k1, k2 = 7, 1.0, 0.01, 0.03
    c1, c2 = (k1 * dr) ** 2, (k2 * dr) ** 2
    lo = win // 2
    hi = win - 1 - lo
    xp = np.pad(x, ((lo, hi), (lo, hi)), mode="reflect")
    yp = np.pad(y, ((lo, hi), (lo, hi)), mode="reflect")
    n = win * win
    vals = []
    for i in range(x.shape[0]):
        for j in range(x.shape[1]):
            wx = xp[i:i + win, j:j + win].ravel()
            wy = yp[i:i + win, j:j + win].ravel()
            mx, my = wx.mean(), wy.mean()
            vx = ((wx - mx) ** 2).sum() / (n - 1)
            vy = ((wy - my) ** 2).sum() / (n - 1)
            cxy = ((wx - mx) * (wy - my)).sum() / (n - 1)
            vals.append(
                (2 * mx * my + c1) * (2 * cxy + c2)
                / ((mx * mx + my * my + c1) * (vx + vy + c2))
            )
    np.testing.assert_allclose(
        ssim(x, y, data_range=dr, win_size=win), np.mean(vals), rtol=1e-9
    )
