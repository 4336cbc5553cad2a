"""Microbenchmark: Pallas implicit-GEMM conv3d vs the XLA lowerings.

Runs the model's dominant conv shapes (reference unet.py:236-256 stack at
the anisotropic pyramid resolutions) on the attached TPU. Each measurement
chains N dependent conv calls inside ONE jitted program returning a scalar,
so relay dispatch/readback latency (~25 ms/roundtrip here) is amortized.

Run: python tools/profile_conv_mxu.py
"""

import os
import sys
import time

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import numpy as np

from ddpm3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from ddpm3d_tpu.ops.conv3d import conv3d_decomposed
from ddpm3d_tpu.ops.conv3d_mxu import conv3d_mxu, conv3d_mxu_applicable, _pick_blocks

N_CHAIN = 20


def time_chain(conv_fn, x, w, b, reps=3):
    """Time one conv call amortized over an N_CHAIN dependent chain."""

    def chain(x, w, b):
        def body(i, s):
            y = conv_fn(x * (1.0 + s).astype(x.dtype), w, b)
            # cheap scalar dependency: forces sequential execution without
            # a full extra pass over y
            return s + y[0, 0, 0, 0, :].astype(jnp.float32).sum() * 1e-30

        return jax.lax.fori_loop(0, N_CHAIN, body, jnp.float32(0.0))

    jitted = jax.jit(chain)
    float(jitted(x, w, b))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        float(jitted(x, w, b))
    return (time.perf_counter() - t0) / reps / N_CHAIN


def main():
    rng = np.random.default_rng(0)
    shapes = [
        # (B, D, H, W, Cin, Cout) — flagship hot shapes
        (1, 96, 96, 96, 128, 128),   # L0 encoder
        (1, 96, 96, 96, 256, 128),   # L0 decoder (concat input)
        (1, 96, 48, 48, 128, 128),   # L1 encoder
        (1, 96, 48, 48, 256, 128),   # L1 decoder
        (1, 96, 24, 24, 256, 256),   # L2
    ]
    dtype = jnp.bfloat16
    dec = lambda x, w, b: conv3d_decomposed(x, w) + b
    mxu = lambda x, w, b: conv3d_mxu(x, w, b)
    for (B, D, H, W, Cin, Cout) in shapes:
        x = jnp.asarray(rng.normal(size=(B, D, H, W, Cin)), dtype)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, Cin, Cout)) * 0.02, dtype)
        b = jnp.asarray(rng.normal(size=(Cout,)), jnp.float32)
        flops = 2 * 27 * Cin * Cout * B * D * H * W
        ok = conv3d_mxu_applicable(x.shape, w.shape, (1, 1, 1), dtype)
        blk = _pick_blocks(D, H, W, Cin, Cout, 2, 3, 3)
        t_dec = time_chain(dec, x, w, b)
        line = (
            f"[{B}x{D}x{H}x{W} {Cin}->{Cout}] decomposed "
            f"{t_dec*1e3:7.2f} ms ({flops/t_dec/1e12:6.1f} TF/s)"
        )
        if ok:
            t_mxu = time_chain(mxu, x, w, b)
            ref = jax.jit(dec)(x, w, b)
            got = jax.jit(mxu)(x, w, b)
            err = float(
                jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)))
            )
            line += (
                f" | mxu blk={blk} {t_mxu*1e3:7.2f} ms "
                f"({flops/t_mxu/1e12:6.1f} TF/s) maxerr={err:.2e}"
            )
        else:
            line += " | mxu: n/a"
        print(line, flush=True)


if __name__ == "__main__":
    main()
