"""Evaluate denoised volumes: PSNR / SSIM / MAE / RMSE against a reference.

The paper reports PSNR/SSIM tables (reference README.md:37-44) but the
repo ships no metric code; this completes that surface and doubles as the
cross-framework comparison tool (reference .npz/.tif outputs vs ours).

Usage: python scripts/evaluate.py --reference clean.tif --test denoised.npz
"""

import argparse
import json
import os
import sys

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np

from ddpm3d_tpu.data import tiff_io
from ddpm3d_tpu.utils.metrics import volume_report


def load_any(path: str) -> np.ndarray:
    if path.endswith((".tif", ".tiff")):
        return np.asarray(tiff_io.imread(path), np.float32)
    if path.endswith(".npz"):
        z = np.load(path)
        return np.asarray(z[z.files[0]], np.float32)
    if path.endswith(".npy"):
        return np.asarray(np.load(path), np.float32)
    raise ValueError(f"unsupported file type: {path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", required=True, help="ground-truth volume")
    ap.add_argument("--test", required=True, help="volume under evaluation")
    ap.add_argument(
        "--test_layout", default="auto", choices=["auto", "zhw", "hwz"],
        help="axis order of --test (denoised .npz outputs are (H,W,Z); "
             "TIFFs are (Z,H,W))",
    )
    ap.add_argument("--data_range", type=float, default=None)
    args = ap.parse_args()

    ref = load_any(args.reference)
    test = load_any(args.test)
    layout = args.test_layout
    if layout == "auto":
        layout = "hwz" if args.test.endswith(".npz") else "zhw"
    if layout == "hwz":
        test = test.transpose(2, 0, 1)  # -> (Z,H,W)
    if ref.shape != test.shape:
        raise SystemExit(
            f"shape mismatch: reference {ref.shape} vs test {test.shape}"
        )
    report = volume_report(ref, test, data_range=args.data_range)
    report["shape"] = list(ref.shape)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
