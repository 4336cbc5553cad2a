"""Tests for the C++ native data tier vs the numpy reference paths."""

import numpy as np
import pytest

from ddpm3d_tpu import native
from ddpm3d_tpu.data import tiff_io
from ddpm3d_tpu.data.patches import (
    blend_patches_hann,
    extract_patches_zxy,
    hann_window_3d,
    patch_grid,
)

needs_native = pytest.mark.skipif(
    not native.available(), reason="g++ native build unavailable"
)


@needs_native
def test_native_tiff_read_roundtrip(tmp_path, rng):
    vol = rng.normal(size=(7, 20, 24)).astype(np.float32)
    p = str(tmp_path / "v.tif")
    tiff_io.imwrite(p, vol)
    back = native.tiff_read(p)
    assert back is not None and back.shape == vol.shape
    np.testing.assert_array_equal(back, vol)


@needs_native
def test_native_tiff_read_4d(tmp_path, rng):
    vol = rng.normal(size=(2, 5, 12, 16)).astype(np.float32)
    p = str(tmp_path / "v4.tif")
    tiff_io.imwrite(p, vol)
    back = native.tiff_read(p)
    assert back is not None and back.shape == vol.shape
    np.testing.assert_array_equal(back, vol)


@needs_native
def test_native_tiff_read_uint16(tmp_path):
    img = np.arange(6 * 8, dtype=np.uint16).reshape(6, 8)
    p = str(tmp_path / "u16.tif")
    tiff_io.imwrite(p, img)
    back = native.tiff_read(p)
    np.testing.assert_array_equal(back, img.astype(np.float32))


@needs_native
def test_native_extract_patches_matches_numpy(rng):
    vol = rng.normal(size=(10, 30, 30)).astype(np.float32)
    grid = patch_grid([0, 14], [0, 14], [0, 2])
    ps = 16
    ref = extract_patches_zxy(vol, grid, ps)
    nat = native.extract_patches(vol, grid, ps, inv_div=1.0)
    assert nat is not None
    np.testing.assert_allclose(nat, ref, rtol=1e-6)
    # with normalization
    nat4 = native.extract_patches(vol, grid, ps, inv_div=0.25)
    np.testing.assert_allclose(nat4, ref * 0.25, rtol=1e-6)


@needs_native
def test_native_blend_matches_numpy(rng):
    ps = 16
    grid = patch_grid([0, 8, 16], [0, 8, 16], [0, 4])
    patches = rng.normal(size=(len(grid), ps, ps, ps)).astype(np.float32)
    shape = (32, 32, 20)
    ref = blend_patches_hann(patches, grid, shape, ps)
    win = hann_window_3d(ps)
    nat = native.blend_hann(patches, grid, shape, ps, win)
    assert nat is not None
    np.testing.assert_allclose(nat, ref, rtol=1e-4, atol=1e-6)
