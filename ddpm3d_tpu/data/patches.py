"""Patch-grid planners and whole-volume reconstruction (Hann blending).

Clean-room equivalents of:
- training grid: XY stride 76 with 20-voxel overlap and an 80% overlap
  guard; Z = {0, D-96} (reference image_datasets.py:200-262)
- inference grid: fixed XY starts ([0, 52, 104] for 200/96/3) and
  Z = {0, D-96} (reference scripts/test.py:280-299)
- 3-D Hann-window weighted overlap blending (scripts/test.py:92-161,
  248-262)

All grids are computed on the host in plain numpy; they are static per
volume shape, so the device-side pipeline sees fixed shapes.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def train_xy_starts(dim_size: int, patch_size: int, overlap: int = 20) -> List[int]:
    """Training-time XY starts (reference image_datasets.py:200-242)."""
    stride = patch_size - overlap
    max_overlap = int(patch_size * 0.8)
    starts = [0]
    pos = stride
    while pos + patch_size <= dim_size:
        prev_end = starts[-1] + patch_size
        if max(0, prev_end - pos) > max_overlap:
            pos += stride
            continue
        starts.append(pos)
        pos += stride
    last_end = starts[-1] + patch_size
    if last_end < dim_size:
        last_start = dim_size - patch_size
        if last_start > starts[-1]:
            prev_end = starts[-1] + patch_size
            if max(0, prev_end - last_start) <= max_overlap:
                starts.append(last_start)
    return starts


def train_z_starts(dim_size: int, patch_size: int) -> List[int]:
    """Training-time Z starts (reference image_datasets.py:244-262)."""
    max_overlap = int(patch_size * 0.8)
    starts = [0]
    if dim_size > patch_size:
        second = dim_size - patch_size
        if second > 0 and max(0, patch_size - second) <= max_overlap:
            starts.append(second)
    return starts


def test_xy_starts(dim_size: int, patch_size: int, num_patches: int = 3) -> List[int]:
    """Inference-time fixed XY starts (reference scripts/test.py:280-291)."""
    if dim_size == 200 and patch_size == 96 and num_patches == 3:
        return [0, 52, 104]
    if num_patches == 1:
        return [0]
    step = (dim_size - patch_size) / (num_patches - 1)
    starts = [int(i * step) for i in range(num_patches)]
    starts[-1] = min(starts[-1], dim_size - patch_size)
    return starts


def test_z_starts(dim_size: int, patch_size: int) -> List[int]:
    """Inference-time Z starts (reference scripts/test.py:293-299)."""
    if dim_size <= patch_size:
        return [0]
    return [0, dim_size - patch_size]


def patch_grid(
    x_starts: Sequence[int], y_starts: Sequence[int], z_starts: Sequence[int]
) -> List[Tuple[int, int, int]]:
    """x-major, then y, then z — the reference's loop nesting order
    (scripts/test.py:215-230, image_datasets.py:191-194)."""
    return [
        (x, y, z) for x in x_starts for y in y_starts for z in z_starts
    ]


def extract_patches_zxy(
    vol_zxy: np.ndarray,
    grid: Sequence[Tuple[int, int, int]],
    patch_size: int,
) -> np.ndarray:
    """Cut (Z, X, Y)-indexed patches, zero-padding at the high ends to a full
    ``patch_size^3`` cube (reference scripts/test.py:213-230). Returns
    [P, Z, X, Y] float32."""
    from .. import native

    if native.available():
        out = native.extract_patches(
            np.asarray(vol_zxy, np.float32), list(grid), patch_size
        )
        if out is not None:
            return out

    Z, X, Y = vol_zxy.shape
    out = np.zeros((len(grid), patch_size, patch_size, patch_size), np.float32)
    for i, (x0, y0, z0) in enumerate(grid):
        xe = min(x0 + patch_size, X)
        ye = min(y0 + patch_size, Y)
        ze = min(z0 + patch_size, Z)
        patch = vol_zxy[z0:ze, x0:xe, y0:ye]
        out[i, : patch.shape[0], : patch.shape[1], : patch.shape[2]] = patch
    return out


def hann_window_3d(size: int) -> np.ndarray:
    """Separable 3-D Hann window normalised to max 1 (reference
    scripts/test.py:248-262). Note hanning(n) is zero at both ends, so
    un-overlapped volume borders receive zero weight — reference behavior."""
    h = np.hanning(size)
    w = h[:, None, None] * h[None, :, None] * h[None, None, :]
    return (w / w.max()).astype(np.float32)


def blend_patches_hann(
    patches_xyz: np.ndarray,
    grid: Sequence[Tuple[int, int, int]],
    out_shape_xyz: Tuple[int, int, int],
    patch_size: int,
    window: np.ndarray = None,
) -> np.ndarray:
    """Weighted overlap-add of denoised patches into the whole volume
    (reference scripts/test.py:109-146).

    ``patches_xyz``: [P, X, Y, Z] patches in grid order (x-major).
    Returns the blended (X, Y, Z) volume; zero-weight voxels stay 0 (the
    reference's ``np.divide(where=weight_arr > 0)``).
    """
    if window is None:
        window = hann_window_3d(patch_size)

    from .. import native

    if native.available():
        out = native.blend_hann(
            np.asarray(patches_xyz, np.float32), list(grid),
            tuple(out_shape_xyz), patch_size, window,
        )
        if out is not None:
            return out

    X, Y, Z = out_shape_xyz
    acc = np.zeros(out_shape_xyz, np.float32)
    weight = np.zeros(out_shape_xyz, np.float32)
    for patch, (x0, y0, z0) in zip(patches_xyz, grid):
        xe = min(x0 + patch_size, X)
        ye = min(y0 + patch_size, Y)
        ze = min(z0 + patch_size, Z)
        hx, wy, dz = xe - x0, ye - y0, ze - z0
        p = patch[:hx, :wy, :dz]
        w = window[:hx, :wy, :dz]
        acc[x0:xe, y0:ye, z0:ze] += p * w
        weight[x0:xe, y0:ye, z0:ze] += w
    return np.divide(acc, weight, out=np.zeros_like(acc), where=weight > 0)


def blend_patches_count(
    patches_xyz: np.ndarray,
    grid: Sequence[Tuple[int, int, int]],
    out_shape_xyz: Tuple[int, int, int],
    patch_size: int,
) -> Tuple[np.ndarray, int]:
    """Plain count-based averaging of overlapping patches — the backup
    script's reconstruction (reference scripts/test_backup.py:118-167).

    Returns (blended volume, number of voxels covered by no patch) — the
    backup script warns on uncovered voxels (test_backup.py:161-163).
    """
    X, Y, Z = out_shape_xyz
    acc = np.zeros(out_shape_xyz, np.float32)
    count = np.zeros(out_shape_xyz, np.float32)
    for patch, (x0, y0, z0) in zip(patches_xyz, grid):
        xe = min(x0 + patch_size, X)
        ye = min(y0 + patch_size, Y)
        ze = min(z0 + patch_size, Z)
        acc[x0:xe, y0:ye, z0:ze] += patch[: xe - x0, : ye - y0, : ze - z0]
        count[x0:xe, y0:ye, z0:ze] += 1.0
    uncovered = int((count == 0).sum())
    out = np.divide(acc, count, out=np.zeros_like(acc), where=count > 0)
    return out, uncovered
