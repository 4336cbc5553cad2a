"""Tests for TIFF IO, patch grids (vs the reference planners run live), and
Hann blending."""

import os
import sys

import numpy as np
import pytest

from ddpm3d_tpu.data import (
    PatchDataset,
    blend_patches_hann,
    extract_patches_zxy,
    hann_window_3d,
    load_data,
    patch_grid,
    tiff_io,
    train_xy_starts,
    train_z_starts,
)
from ddpm3d_tpu.data import test_xy_starts as infer_xy_starts
from ddpm3d_tpu.data import test_z_starts as infer_z_starts


def test_tiff_roundtrip_3d(tmp_path, rng):
    vol = rng.normal(size=(7, 20, 24)).astype(np.float32)
    p = str(tmp_path / "vol.tif")
    tiff_io.imwrite(p, vol)
    back = tiff_io.imread(p)
    np.testing.assert_array_equal(back, vol)


def test_tiff_roundtrip_4d_channels(tmp_path, rng):
    vol = rng.normal(size=(2, 5, 16, 16)).astype(np.float32)
    p = str(tmp_path / "pair.tif")
    tiff_io.imwrite(p, vol)
    back = tiff_io.imread(p)
    assert back.shape == (2, 5, 16, 16)
    np.testing.assert_array_equal(back, vol)


def test_tiff_roundtrip_2d_uint16(tmp_path):
    img = (np.arange(96, dtype=np.uint16)).reshape(8, 12)
    p = "/tmp/t2d.tif"
    tiff_io.imwrite(p, img)
    back = tiff_io.imread(p)
    np.testing.assert_array_equal(back, img)


def test_train_grid_matches_reference_planner():
    """Run the reference's planner methods directly and compare."""
    import types

    # The reference module imports libraries absent here (mpi4py, tifffile,
    # SimpleITK, blobfile); stub them — the planner methods don't use them.
    for name in ["mpi4py", "tifffile", "SimpleITK", "blobfile"]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "mpi4py":
                mod.MPI = types.SimpleNamespace(
                    COMM_WORLD=types.SimpleNamespace(
                        Get_rank=lambda: 0, Get_size=lambda: 1
                    )
                )
            sys.modules[name] = mod
    sys.path.insert(0, "/root/reference")
    from guided_diffusion.image_datasets import ImageDataset as RefDS

    ref = RefDS.__new__(RefDS)  # skip __init__ (needs files)
    ref.resolution = 96
    for dim in [96, 100, 150, 200, 250, 300]:
        assert train_xy_starts(dim, 96) == ref._calculate_xy_starts(dim), dim
        assert train_z_starts(dim, 96) == ref._calculate_z_starts(dim), dim


def test_train_grid_canonical_200():
    # 200-wide axis with 96 patches: stride 76 -> [0, 76] + tail 104
    assert train_xy_starts(200, 96) == [0, 76, 104]
    # The 80% overlap guard rejects the Z tail patch until D >= 116
    # (96 - (D-96) <= 76): a 105-deep volume trains on Z=0 only.
    assert train_z_starts(105, 96) == [0]
    assert train_z_starts(120, 96) == [0, 24]
    assert train_z_starts(96, 96) == [0]


def test_test_grid_canonical():
    assert infer_xy_starts(200, 96, 3) == [0, 52, 104]
    assert infer_z_starts(105, 96) == [0, 9]
    assert infer_z_starts(90, 96) == [0]
    # 18-patch grid for the canonical volume
    grid = patch_grid([0, 52, 104], [0, 52, 104], [0, 9])
    assert len(grid) == 18
    assert grid[0] == (0, 0, 0) and grid[1] == (0, 0, 9)


def test_extract_patches_pad():
    vol = np.ones((10, 20, 20), np.float32)  # (Z,X,Y)
    grid = [(0, 0, 0), (4, 4, 2)]
    patches = extract_patches_zxy(vol, grid, 16)
    assert patches.shape == (2, 16, 16, 16)
    # first patch: covers z 0:10 -> rows 10: are zero padding
    assert patches[0, :10].all() and not patches[0, 10:].any()
    # second patch: z 2:10 = 8 planes data
    assert patches[1, :8].all() and not patches[1, 8:].any()


def test_hann_window_matches_reference_construction():
    sys.path.insert(0, "/root/reference")
    h = hann_window_3d(96)
    h1 = np.hanning(96)
    ref = np.outer(np.outer(h1, h1).flatten(), h1).reshape(96, 96, 96)
    ref = ref / ref.max()
    np.testing.assert_allclose(h, ref, rtol=1e-6)


def test_blend_constant_patches_reconstructs_constant():
    """Blending constant-valued patches must give that constant wherever
    weight > 0, and 0 on zero-weight boundary planes (reference
    np.divide-where semantics)."""
    ps = 16
    grid = patch_grid([0, 8, 16], [0, 8, 16], [0, 4])
    patches = np.full((len(grid), ps, ps, ps), 3.25, np.float32)
    out = blend_patches_hann(patches, grid, (32, 32, 20), ps)
    w = np.zeros((32, 32, 20), np.float32)
    win = hann_window_3d(ps)
    for (x0, y0, z0) in grid:
        w[x0:x0 + ps, y0:y0 + ps, z0:z0 + ps] += win
    np.testing.assert_allclose(out[w > 0], 3.25, rtol=1e-5)
    assert (out[w == 0] == 0).all()


def test_blend_count_matches_average_and_reports_uncovered():
    from ddpm3d_tpu.data import blend_patches_count

    ps = 8
    grid = [(0, 0, 0), (4, 0, 0)]
    patches = np.stack([
        np.full((ps, ps, ps), 2.0, np.float32),
        np.full((ps, ps, ps), 4.0, np.float32),
    ])
    out, uncovered = blend_patches_count(patches, grid, (16, 8, 8), ps)
    np.testing.assert_allclose(out[:4], 2.0)     # only patch 1
    np.testing.assert_allclose(out[4:8], 3.0)    # overlap: mean(2,4)
    np.testing.assert_allclose(out[8:12], 4.0)   # only patch 2
    np.testing.assert_allclose(out[12:], 0.0)    # uncovered
    assert uncovered == 4 * 8 * 8


def _write_synthetic(tmp_path, n=2, shape=(100, 200, 200)):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        low = rng.normal(1.0, 0.3, size=shape).astype(np.float32)
        high = low + rng.normal(0, 0.05, size=shape).astype(np.float32)
        vol = np.stack([low, high])
        p = str(tmp_path / f"vol{i}.tif")
        tiff_io.imwrite(p, vol)
        paths.append(p)
    return paths


def test_patch_dataset_index_and_items(tmp_path):
    paths = _write_synthetic(tmp_path, n=1)
    ds = PatchDataset(96, paths)
    # 200x200x100 volume: XY starts [0,76,104]; Z tail rejected by the 80%
    # overlap guard (D=100 -> overlap 92 > 76) -> 9 patches
    assert len(ds) == 3 * 3 * 1
    high, kw = ds[0]
    assert high.shape == (96, 96, 96, 1)
    assert kw["low_res"].shape == (96, 96, 96, 1)
    # /4 normalisation applied
    vol = tiff_io.imread(paths[0])
    np.testing.assert_allclose(
        high[:, :, :, 0], vol[1][0:96, 0:96, 0:96] / 4.0, rtol=1e-6
    )


def test_patch_dataset_sharding(tmp_path):
    paths = _write_synthetic(tmp_path, n=3, shape=(96, 96, 96))
    all_ds = PatchDataset(96, paths)
    s0 = PatchDataset(96, paths, shard=0, num_shards=2)
    s1 = PatchDataset(96, paths, shard=1, num_shards=2)
    assert len(s0) + len(s1) == len(all_ds)
    # reference sharding is paths[shard:][::num_shards]
    assert s0.local_paths == paths[0:][::2]
    assert s1.local_paths == paths[1:][::2]


def test_load_data_generator(tmp_path):
    paths = _write_synthetic(tmp_path, n=1, shape=(96, 120, 120))
    it = load_data(
        data_dir=str(tmp_path), batch_size=2, image_size=96, seed=1
    )
    batch, cond = next(it)
    assert batch.shape == (2, 96, 96, 96, 1)
    assert cond["low_res"].shape == (2, 96, 96, 96, 1)
    batch2, _ = next(it)
    assert batch2.shape == (2, 96, 96, 96, 1)


def test_random_crop_mode(tmp_path):
    """Legacy oversampling path (reference image_datasets.py:337-389):
    random in-bounds crops, padded only when the volume is smaller than the
    patch."""
    import numpy as np

    from ddpm3d_tpu.data.dataset import PatchDataset
    from ddpm3d_tpu.data import tiff_io

    vol = np.random.default_rng(0).normal(size=(2, 12, 20, 20)).astype(
        np.float32)
    p = str(tmp_path / "v.tif")
    tiff_io.imwrite(p, vol.reshape(2 * 12, 20, 20))  # fallthrough: use npz
    p = str(tmp_path / "v.npz")
    np.savez(p, vol)
    ds = PatchDataset(8, [p], random_crop=True, seed=3)
    assert len(ds) == 1  # one entry per volume in random mode
    high, kw = ds[0]
    assert high.shape == (8, 8, 8, 1)
    assert kw["low_res"].shape == (8, 8, 8, 1)
    # crops come from inside the (divided-by-4) volume
    assert np.isfinite(high).all()
    a, _ = ds[0]
    b, _ = ds[0]
    assert np.abs(a - b).max() > 0  # random corners differ


def test_small_volume_random_crop_pads():
    import numpy as np

    from ddpm3d_tpu.data.dataset import PatchDataset

    class _FakeDs(PatchDataset):
        def _volume(self, file_idx):
            v = np.ones((4, 6, 6), np.float32)
            return v, v

    ds = _FakeDs.__new__(_FakeDs)
    ds.resolution = 8
    ds.random_crop = True
    ds._rng = np.random.default_rng(0)
    high, kw = ds._random_patch(np.ones((4, 6, 6), np.float32),
                                np.ones((4, 6, 6), np.float32))
    # crops clamp to the extents but the output pads to the full cube so
    # batches always stack (diverges from the reference's ragged clamp)
    assert high.shape == (8, 8, 8, 1)
    assert high[:4, :6, :6].min() == 1.0 and high[4:].max() == 0.0


def test_2d_crop_helpers():
    """center_crop_arr / random_crop_arr (reference
    image_datasets.py:424-465)."""
    import numpy as np
    from PIL import Image

    from ddpm3d_tpu.data.dataset import center_crop_arr, random_crop_arr

    img = Image.fromarray(
        (np.random.default_rng(1).random((97, 139, 3)) * 255).astype("uint8")
    )
    c = center_crop_arr(img, 32)
    assert c.shape == (32, 32, 3)
    r = random_crop_arr(img, 32, rng=np.random.default_rng(2))
    assert r.shape == (32, 32, 3)
