"""Generate synthetic 2-channel (low/high dose) PET-like TIFF volumes for
smoke tests and benchmarks.

Usage: python tools/make_synthetic_data.py OUT_DIR [--volumes N] [--shape Z H W]
"""

import argparse
import os
import sys

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np

from ddpm3d_tpu.data import tiff_io


def make_volume(rng, shape):
    """Smooth blobby 'anatomy' + Poisson-ish noise on the low-dose channel."""
    Z, H, W = shape
    zz, yy, xx = np.meshgrid(
        np.linspace(-1, 1, Z), np.linspace(-1, 1, H), np.linspace(-1, 1, W),
        indexing="ij",
    )
    high = np.zeros(shape, np.float32)
    for _ in range(6):
        cz, cy, cx = rng.uniform(-0.7, 0.7, 3)
        s = rng.uniform(0.1, 0.4)
        a = rng.uniform(0.5, 2.0)
        high += a * np.exp(
            -(((zz - cz) ** 2 + (yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
        ).astype(np.float32)
    low = high + rng.normal(0, 0.25, shape).astype(np.float32) * np.sqrt(
        np.maximum(high, 0.05)
    )
    return np.stack([low, high]).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--volumes", type=int, default=2)
    ap.add_argument("--shape", type=int, nargs=3, default=[100, 200, 200])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    for i in range(args.volumes):
        vol = make_volume(rng, tuple(args.shape))
        path = os.path.join(args.out_dir, f"synthetic_{i:03d}.tif")
        tiff_io.imwrite(path, vol)
        print(f"wrote {path} shape={vol.shape}")


if __name__ == "__main__":
    main()
