"""Probe: can host-offloading the 96^2-level activations beat remat?

The flagship training step floor is ~471 ms with resolution-aware remat
(README round-3/4): blocks at ds<=2 rematerialize because their
activations are HBM-infeasible at 16 GB, costing ~46 ms/step of forward
recompute. The one untried alternative (round-4 verdict #7) is to keep
those activations but move them to host memory during the forward pass
and fetch them back in the backward (jax.checkpoint policy
``save_and_offload_only_these_names`` / pinned_host memory space).

Whether that can win is pure bandwidth math:

    offload bytes/step = sum of tagged activations x 2 (out + back)
    win iff bytes / host_link_bw < recompute_ms

The tagged set at the flagship config (96^3/128ch, 2 res blocks,
channel_mult 1,1,2,3,4): each full-res ResBlock holds two
(96^3, 128ch) bf16 interiors (~217 MiB each); level 0+1 remat 8 blocks
(in1_0, in2_0, in3_0@48^2 x2ch, out12..14 + up) — >= 3.4 GiB one-way
even offloading only the two interiors of the four 96^3 blocks.

This tool MEASURES the two inputs of that inequality on the real chip:

  1. device->pinned_host and pinned_host->device throughput for a
     217 MiB bf16 activation (jax.device_put with TransferToMemoryKind),
     amortized over repeats;
  2. the remat recompute cost it would have to beat, re-derived from the
     committed round-3 A/B (REMAT_DS=1 vs 2 deltas) rather than re-run.

Run on-chip:  python tools/probe_host_offload.py
Writes HOST_OFFLOAD_PROBE.json next to the repo root when --out is set.
"""

import argparse
import json
import os
import sys
import time

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=217.0,
                    help="activation size to probe (MiB); default = one "
                    "(96^3, 128) bf16 interior")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--recompute_ms", type=float, default=46.0,
                    help="the remat recompute this must beat (README "
                    "round-3: ds<=2 remat saves ~46 ms of low-res "
                    "recompute; the 96^2-level recompute is the cost)")
    ap.add_argument("--blocks", type=int, default=4,
                    help="full-res ResBlocks whose interiors would be "
                    "offloaded")
    ap.add_argument("--tensors_per_block", type=int, default=2)
    ap.add_argument("--out", type=str, default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    n = int(args.mb * 2 ** 20 / 2)  # bf16 elements
    x_host = np.zeros((n,), np.float16).view(np.uint16)  # raw 2B payload

    try:
        from jax._src.sharding_impls import TransferToMemoryKind

        to_host = TransferToMemoryKind("pinned_host")
        to_dev = TransferToMemoryKind("device")
        x_dev = jax.device_put(jnp.zeros((n,), jnp.bfloat16), dev)
        x_dev.block_until_ready()
        # warm both directions once
        h = jax.device_put(x_dev, to_host)
        h.block_until_ready()
        d = jax.device_put(h, to_dev)
        d.block_until_ready()

        def bw(fn, src):
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                y = fn(src)
                y.block_until_ready()
                best = min(best, time.perf_counter() - t0)
            return (n * 2) / best / 1e9, best * 1e3  # GB/s, ms

        d2h_gbs, d2h_ms = bw(lambda s: jax.device_put(s, to_host), x_dev)
        h2d_gbs, h2d_ms = bw(lambda s: jax.device_put(s, to_dev), h)
        mode = "pinned_host"
    except Exception as e:  # pragma: no cover - depends on runtime support
        print(f"pinned_host memory space unavailable ({e}); "
              "falling back to host numpy round-trip", flush=True)
        x_dev = jax.device_put(jnp.zeros((n,), jnp.bfloat16), dev)
        x_dev.block_until_ready()

        def bw_np(fn):
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t0)
            return (n * 2) / best / 1e9, best * 1e3

        d2h_gbs, d2h_ms = bw_np(lambda: np.asarray(x_dev))
        h2d_gbs, h2d_ms = bw_np(
            lambda: jax.device_put(x_host, dev).block_until_ready())
        mode = "host_numpy"

    tensors = args.blocks * args.tensors_per_block
    bytes_one_way = tensors * n * 2
    t_out = bytes_one_way / (d2h_gbs * 1e9) * 1e3
    t_back = bytes_one_way / (h2d_gbs * 1e9) * 1e3
    # offload transfers overlap compute at best; even with PERFECT overlap
    # the link must move the bytes within the recompute budget it replaces
    total_ms = t_out + t_back
    verdict = (
        "WIN possible (bandwidth < recompute; try the policy for real)"
        if total_ms < args.recompute_ms else
        "NEGATIVE: link bandwidth cannot beat recompute"
    )
    result = {
        "mode": mode,
        "probe_mib": args.mb,
        "d2h_gbps": round(d2h_gbs, 2),
        "h2d_gbps": round(h2d_gbs, 2),
        "d2h_ms_per_tensor": round(d2h_ms, 2),
        "h2d_ms_per_tensor": round(h2d_ms, 2),
        "offload_tensors": tensors,
        "offload_gib_one_way": round(bytes_one_way / 2 ** 30, 2),
        "transfer_ms_per_step_total": round(total_ms, 1),
        "remat_recompute_ms_to_beat": args.recompute_ms,
        "verdict": verdict,
    }
    print(json.dumps(result, indent=1), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
