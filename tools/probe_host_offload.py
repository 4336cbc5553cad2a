"""Probe: can host-offloading the 96^2-level activations beat remat?

The flagship training step floor is ~471 ms with resolution-aware remat
(README round-3/4): blocks at ds<=2 rematerialize because their
activations are HBM-infeasible at 16 GB, costing ~46 ms/step of forward
recompute. The one untried alternative (round-4 verdict #7) is to keep
those activations but move them to host memory during the forward pass
and fetch them back in the backward (``jax.checkpoint`` offload policies
/ ``memory_kind="pinned_host"`` shardings).

Whether that can win is pure bandwidth math:

    offload bytes/step = sum of tagged activations x 2 (out + back)
    win iff bytes / host_link_bw < recompute_ms

The tagged set at the flagship config (96^3/128ch, 2 res blocks,
channel_mult 1,1,2,3,4): each full-res ResBlock holds two
(96^3, 128ch) bf16 interiors (~217 MiB each); offloading only the two
interiors of the four 96^3 blocks is ~1.7 GiB each way per step.

This tool MEASURES device<->pinned_host bandwidth ON the device host
(not through any client relay): K transfer round-trips are compiled into
ONE jitted program via ``jax.device_put`` to a ``pinned_host``
memory-kind sharding with ``optimization_barrier`` between hops, so a
single dispatch times K round-trips and the per-call overhead amortizes
away. A K-scaling check (2K must take ~2x) guards against XLA eliding
the copies.

Run on-chip:  python tools/probe_host_offload.py --out HOST_OFFLOAD_PROBE.json
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
    ap.add_argument("--k", type=int, default=4,
                    help="round-trips fused into one timed program")
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--recompute_ms", type=float, default=46.0,
                    help="the remat recompute this must beat (README "
                    "round-3: resolution-aware remat attributes ~46 ms "
                    "of the 471 ms step to ds<=2 forward recompute)")
    ap.add_argument("--blocks", type=int, default=4,
                    help="full-res ResBlocks whose interiors would be "
                    "offloaded")
    ap.add_argument("--tensors_per_block", type=int, default=2)
    ap.add_argument("--out", type=str, default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    dev = jax.devices()[0]
    mesh = Mesh(np.array([dev]), ("d",))
    s_dev = NamedSharding(mesh, P(), memory_kind="device")
    try:
        s_host = NamedSharding(mesh, P(), memory_kind="pinned_host")
    except Exception as e:  # pragma: no cover — backend-dependent
        print(f"pinned_host memory kind unavailable: {e}", flush=True)
        return

    n = int(args.mb * 2 ** 20 / 2)  # bf16 elements
    x0 = jax.device_put(jnp.zeros((n,), jnp.bfloat16), s_dev)
    x0.block_until_ready()

    def make_roundtrip(k):
        @jax.jit
        def rt(x):
            for _ in range(k):
                h = jax.device_put(x, s_host)
                h = jax.lax.optimization_barrier(h)
                x = jax.device_put(h, s_dev)
                x = jax.lax.optimization_barrier(x)
            # force a real consumer so the last hop materializes
            return jnp.sum(x[:8].astype(jnp.float32))

        return rt

    def best_time(fn, x):
        float(fn(x))  # compile + warm
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(fn(x))
            best = min(best, time.perf_counter() - t0)
        return best

    tk = best_time(make_roundtrip(args.k), x0)
    t2k = best_time(make_roundtrip(2 * args.k), x0)
    # subtract the dispatch floor via two-point: extra K round-trips cost
    marginal = t2k - tk  # seconds for args.k EXTRA round-trips
    if marginal <= 0:
        print("WARNING: 2K program not slower than K — XLA likely elided "
              "the copies; numbers below are invalid", flush=True)
    per_rt = marginal / args.k           # one round-trip (out + back)
    bw_gbs = (2 * n * 2) / per_rt / 1e9  # bytes both ways / time

    tensors = args.blocks * args.tensors_per_block
    bytes_one_way = tensors * n * 2
    total_ms = (2 * bytes_one_way) / (bw_gbs * 1e9) * 1e3
    verdict = (
        "WIN possible (transfer fits the recompute budget; try the "
        "offload policy for real)"
        if total_ms < args.recompute_ms else
        "NEGATIVE: host link bandwidth cannot beat remat recompute"
    )
    result = {
        "probe_mib": args.mb,
        "k": args.k,
        "t_k_ms": round(tk * 1e3, 2),
        "t_2k_ms": round(t2k * 1e3, 2),
        "k_scaling_valid": bool(marginal > 0.25 * tk),
        "roundtrip_ms_per_tensor": round(per_rt * 1e3, 2),
        "effective_bidir_gbps": round(bw_gbs, 2),
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
