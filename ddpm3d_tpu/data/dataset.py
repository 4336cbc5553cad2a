"""Training data pipeline: deterministic patch grids over TIFF volumes.

Clean-room equivalent of reference image_datasets.py:
- recursive file discovery (id:133-142)
- per-volume deterministic overlapping patch index (id:159-198)
- /4 normalisation and (D,H,W)->(H,W,D) handling (id:292-293)
- shard-by-rank file split ``paths[shard:][::num_shards]`` (id:151)
- infinite shuffled generator (id:66-75)

TPU-first differences: volumes are cached after first read (the reference
re-reads the TIFF per __getitem__, id:284), batches are assembled as NDHWC
numpy arrays ready for device put, and an async two-slot prefetcher overlaps
host IO with device compute.
"""

from __future__ import annotations

import os
import threading
import queue as queue_mod
from typing import Dict, Iterator, List, Sequence, Tuple

import numpy as np

from . import tiff_io
from .patches import patch_grid, train_xy_starts, train_z_starts

_IMAGE_EXTS = {"jpg", "jpeg", "png", "gif", "tif", "tiff", "npz", "npy"}


def list_image_files_recursively(data_dir: str) -> List[str]:
    """(reference image_datasets.py:133-142)"""
    results = []
    for entry in sorted(os.listdir(data_dir)):
        full_path = os.path.join(data_dir, entry)
        ext = entry.split(".")[-1]
        if "." in entry and ext.lower() in _IMAGE_EXTS:
            results.append(full_path)
        elif os.path.isdir(full_path):
            results.extend(list_image_files_recursively(full_path))
    return results


def load_volume_pair(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Read a volume file into (low, high) (D,H,W) float32 pairs.

    TIFF semantics match reference image_datasets.py:284-291: 3-D volumes
    condition on themselves; 4-D (C,D,H,W) stacks split channel 0 (low dose)
    and channel 1 (high dose). ``.npz``/``.npy`` are accepted as a
    dependency-free alternative with the same (C,D,H,W) convention.
    """
    ext = os.path.splitext(path)[1].lower()
    if ext in (".tif", ".tiff"):
        vol = tiff_io.imread(path)
    elif ext == ".npz":
        vol = np.load(path)["arr_0"]
    elif ext == ".npy":
        vol = np.load(path)
    else:
        raise ValueError(f"unsupported file type: {ext}")
    vol = np.asarray(vol)
    if vol.ndim == 3:
        return vol.astype(np.float32), vol.astype(np.float32)
    if vol.ndim == 4 and vol.shape[0] >= 2:
        return vol[0].astype(np.float32), vol[1].astype(np.float32)
    raise ValueError(f"unsupported volume shape {vol.shape} in {path}")


class PatchDataset:
    """Deterministic overlapping patch dataset over low/high-dose volumes.

    Yields (high, {"low_res": low}) with both patches shaped (D, H, W, 1)
    NDHWC float32, already /4-normalised (reference image_datasets.py:292).
    """

    def __init__(
        self,
        resolution: int,
        image_paths: Sequence[str],
        shard: int = 0,
        num_shards: int = 1,
        normalize_divisor: float = 4.0,
        cache_volumes: bool = True,
        random_crop: bool = False,
        seed: int = 0,
    ):
        self.resolution = resolution
        self.local_paths = list(image_paths)[shard:][::num_shards]
        self.normalize_divisor = normalize_divisor
        self.cache_volumes = cache_volumes
        self.random_crop = random_crop
        self._rng = np.random.default_rng(seed)
        self._cache: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        self._build_index()

    def _build_index(self):
        """(reference image_datasets.py:159-198) — the grid is computed on
        the transposed (H, W, D) sizes. In ``random_crop`` mode (the
        reference's legacy oversampling path, image_datasets.py:337-389)
        the index is one entry per volume; crop coordinates are drawn per
        __getitem__."""
        self.patch_info: List[Tuple[int, int, int, int]] = []
        if self.random_crop:
            for file_idx in range(len(self.local_paths)):
                self.patch_info.append((file_idx, -1, -1, -1))
            return
        for file_idx, path in enumerate(self.local_paths):
            try:
                low, _ = self._volume(file_idx)
            except Exception as e:  # skip unreadable, like the reference
                print(f"Error processing {path}: {e}")
                continue
            D, H, W = low.shape
            if H < self.resolution or W < self.resolution or D < self.resolution:
                print(
                    f"Warning: volume {path} too small ({H}x{W}x{D}), skipped"
                )
                continue
            xs = train_xy_starts(H, self.resolution)
            ys = train_xy_starts(W, self.resolution)
            zs = train_z_starts(D, self.resolution)
            for x0, y0, z0 in patch_grid(xs, ys, zs):
                self.patch_info.append((file_idx, x0, y0, z0))
        if not self.cache_volumes:
            self._cache.clear()

    def _volume(self, file_idx: int) -> Tuple[np.ndarray, np.ndarray]:
        if file_idx in self._cache:
            return self._cache[file_idx]
        low, high = load_volume_pair(self.local_paths[file_idx])
        low = low / self.normalize_divisor
        high = high / self.normalize_divisor
        if self.cache_volumes:
            self._cache[file_idx] = (low, high)
        return low, high

    def __len__(self) -> int:
        return len(self.patch_info)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
        file_idx, x0, y0, z0 = self.patch_info[idx]
        low, high = self._volume(file_idx)
        r = self.resolution
        D, H, W = low.shape
        if self.random_crop:
            return self._random_patch(low, high)
        xe, ye, ze = min(x0 + r, H), min(y0 + r, W), min(z0 + r, D)

        def cut(vol):
            # vol is (D,H,W); grid coords are in (H,W,D) space
            patch = vol[z0:ze, x0:xe, y0:ye]
            out = np.zeros((r, r, r), np.float32)
            out[: patch.shape[0], : patch.shape[1], : patch.shape[2]] = patch
            return out[..., None]  # (D,H,W,1)

        return cut(high), {"low_res": cut(low)}

    def _random_patch(self, low, high):
        """Legacy random-crop oversampling (reference
        image_datasets.py:337-389): uniform random corner; crop sizes clamp
        to the volume extents. Unlike the reference (whose clamped crops
        would produce ragged batches), the output is always zero-padded to
        the full (r, r, r) cube — the same contract as the grid path, so
        batches stack."""
        D, H, W = low.shape
        r = self.resolution
        size_xy = min(r, H, W)
        size_z = min(r, D)
        x0 = self._rng.integers(0, max(H - size_xy, 0) + 1)
        y0 = self._rng.integers(0, max(W - size_xy, 0) + 1)
        z0 = self._rng.integers(0, max(D - size_z, 0) + 1)

        def cut(vol):
            patch = vol[z0:z0 + size_z, x0:x0 + size_xy, y0:y0 + size_xy]
            out = np.zeros((r, r, r), np.float32)
            out[: patch.shape[0], : patch.shape[1], : patch.shape[2]] = patch
            return out[..., None]  # (D,H,W,1)

        return cut(high), {"low_res": cut(low)}


class WholeVolumeDataset:
    """Whole-volume (no patching) dataset — the reference's
    CustomImageDataset (image_datasets.py:93-130): each item is the full
    volume with the conditioner cloned into model kwargs."""

    def __init__(
        self,
        image_paths: Sequence[str],
        shard: int = 0,
        num_shards: int = 1,
        normalize_divisor: float = 1.0,
    ):
        self.local_paths = list(image_paths)[shard::num_shards]
        self.normalize_divisor = normalize_divisor

    def __len__(self) -> int:
        return len(self.local_paths)

    def __getitem__(self, idx: int):
        low, high = load_volume_pair(self.local_paths[idx])
        low = low / self.normalize_divisor
        high = high / self.normalize_divisor
        return high[..., None], {"low_res": low[..., None]}


def load_data(
    *,
    data_dir: str,
    batch_size: int,
    image_size: int,
    shard: int = 0,
    num_shards: int = 1,
    deterministic: bool = False,
    seed: int = 0,
    drop_last: bool = True,
    random_crop: bool = False,
) -> Iterator[Tuple[np.ndarray, Dict[str, np.ndarray]]]:
    """Infinite generator over shuffled batches (reference
    image_datasets.py:14-75). Batches are NDHWC numpy arrays.
    ``random_crop`` selects the legacy oversampling path
    (image_datasets.py:337-389) instead of the deterministic grid."""
    if not data_dir:
        raise ValueError("unspecified data directory")
    paths = list_image_files_recursively(data_dir)
    dataset = PatchDataset(
        image_size, paths, shard=shard, num_shards=num_shards,
        random_crop=random_crop, seed=seed,
    )
    if len(dataset) == 0:
        raise ValueError(f"no usable patches found under {data_dir}")
    rng = np.random.default_rng(seed)
    while True:
        order = (
            np.arange(len(dataset))
            if deterministic
            else rng.permutation(len(dataset))
        )
        for i in range(0, len(order), batch_size):
            idxs = order[i : i + batch_size]
            if len(idxs) < batch_size and drop_last:
                continue
            highs, lows = [], []
            for j in idxs:
                h, kw = dataset[int(j)]
                highs.append(h)
                lows.append(kw["low_res"])
            yield np.stack(highs), {"low_res": np.stack(lows)}


def center_crop_arr(pil_image, image_size: int) -> np.ndarray:
    """2-D center crop with quality-preserving progressive downsample
    (reference image_datasets.py:424-441, the upstream guided-diffusion
    ImageNet path): halve with BOX filtering while >= 2x target, bicubic to
    the final scale, then center-crop to image_size^2."""
    from PIL import Image

    while min(*pil_image.size) >= 2 * image_size:
        pil_image = pil_image.resize(
            tuple(x // 2 for x in pil_image.size), resample=Image.BOX
        )
    scale = image_size / min(*pil_image.size)
    pil_image = pil_image.resize(
        tuple(round(x * scale) for x in pil_image.size),
        resample=Image.BICUBIC,
    )
    arr = np.array(pil_image)
    cy = (arr.shape[0] - image_size) // 2
    cx = (arr.shape[1] - image_size) // 2
    return arr[cy:cy + image_size, cx:cx + image_size]


def random_crop_arr(
    pil_image, image_size: int,
    min_crop_frac: float = 0.8, max_crop_frac: float = 1.0,
    rng=None,
) -> np.ndarray:
    """2-D random-scale random crop (reference image_datasets.py:444-465).
    Uses an explicit ``rng`` (numpy Generator) instead of the global
    ``random`` module."""
    import math as _math

    from PIL import Image

    rng = rng or np.random.default_rng()
    min_s = _math.ceil(image_size / max_crop_frac)
    max_s = _math.ceil(image_size / min_crop_frac)
    smaller = int(rng.integers(min_s, max_s + 1))
    while min(*pil_image.size) >= 2 * smaller:
        pil_image = pil_image.resize(
            tuple(x // 2 for x in pil_image.size), resample=Image.BOX
        )
    scale = smaller / min(*pil_image.size)
    pil_image = pil_image.resize(
        tuple(round(x * scale) for x in pil_image.size),
        resample=Image.BICUBIC,
    )
    arr = np.array(pil_image)
    cy = int(rng.integers(0, arr.shape[0] - image_size + 1))
    cx = int(rng.integers(0, arr.shape[1] - image_size + 1))
    return arr[cy:cy + image_size, cx:cx + image_size]


def prefetch(iterator, size: int = 2):
    """Host-side prefetch: pull batches on a thread so TIFF IO overlaps with
    device compute (replaces the reference's DataLoader worker process,
    image_datasets.py:66-75)."""
    q: queue_mod.Queue = queue_mod.Queue(maxsize=size)
    sentinel = object()

    def producer():
        try:
            for item in iterator:
                q.put(item)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        yield item
