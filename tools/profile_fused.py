"""Benchmark the fused ResBlock conv kernel vs the composed XLA path.

Compares, at the flagship hot shapes:
  (a) XLA composed: chanwise-GN normalize+SiLU -> decomposed conv3d
      -> bias -> skip add -> channel-stats reduce  (what the model does now)
  (b) ops/conv3d_fused.py: all of it in one Pallas kernel

Timing: dependent chains of length 8 and 24 inside single jitted programs;
the (t24-t8)/16 slope removes dispatch/readback overhead entirely.

Run: python tools/profile_fused.py
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
from ddpm3d_tpu.ops.conv3d_fused import conv3d_fused, conv3d_fused_applicable


def chain_time(step_fn, n, *args, reps=3):
    """Time a chain of n dependent applications of step_fn inside one jit."""

    def chain(*args):
        def body(i, carry):
            return step_fn(carry, i, *args)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    jitted = jax.jit(chain)
    float(jitted(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(jitted(*args))
    return (time.perf_counter() - t0) / reps


def slope(step_fn, *args):
    t8 = chain_time(step_fn, 8, *args)
    t24 = chain_time(step_fn, 24, *args)
    return (t24 - t8) / 16.0


def main():
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16
    shapes = [
        (1, 96, 96, 96, 128, 128),
        (1, 96, 96, 96, 256, 128),
        (1, 96, 48, 48, 128, 128),
        (1, 96, 48, 48, 256, 128),
        (1, 96, 24, 24, 256, 256),
    ]
    for (B, D, H, W, Cin, Cout) in shapes:
        x = jnp.asarray(rng.normal(size=(B, D, H, W, Cin)), dtype)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, Cin, Cout)) * 0.02, dtype)
        b = jnp.asarray(rng.normal(size=(Cout,)), jnp.float32)
        skip = jnp.asarray(rng.normal(size=(B, D, H, W, Cout)), dtype)
        g = jnp.asarray(rng.normal(size=(B, Cin)) * 0.2 + 1.0, jnp.float32)
        bt = jnp.asarray(rng.normal(size=(B, Cin)) * 0.1, jnp.float32)
        flops = 2 * 27 * Cin * Cout * B * D * H * W
        ok = conv3d_fused_applicable(x.shape, w.shape, dtype)

        def dep(s, x):
            return x * (1.0 + s * 1e-30).astype(x.dtype)

        def xla_step(s, i, x, w, b, skip, g, bt):
            xf = dep(s, x).astype(jnp.float32)
            xn = xf * g[:, None, None, None, :] + bt[:, None, None, None, :]
            xn = (xn * jax.nn.sigmoid(xn)).astype(x.dtype)
            y = conv3d_decomposed(xn, w)
            y = y + b.astype(y.dtype) + skip
            yf = y.astype(jnp.float32)
            s1 = yf.sum(axis=(1, 2, 3))
            s2 = (yf * yf).sum(axis=(1, 2, 3))
            return s + (s1.sum() + s2.sum()) * 1e-30 + \
                y[0, 0, 0, 0, :].astype(jnp.float32).sum() * 1e-30

        def fused_step(s, i, x, w, b, skip, g, bt):
            y, st = conv3d_fused(
                dep(s, x), w, b, prologue_g=g, prologue_b=bt,
                skip=skip, want_stats=True,
            )
            return s + st.sum() * 1e-30 + \
                y[0, 0, 0, 0, :].astype(jnp.float32).sum() * 1e-30

        t_xla = slope(xla_step, x, w, b, skip, g, bt)
        line = (f"[{B}x{D}x{H}x{W} {Cin}->{Cout}] xla-composed "
                f"{t_xla*1e3:7.2f} ms ({flops/t_xla/1e12:6.1f} TF/s eff)")
        if ok:
            t_f = slope(fused_step, x, w, b, skip, g, bt)
            # correctness spot check
            y_ref = None
            xf = x.astype(jnp.float32)
            xn = xf * g[:, None, None, None, :] + bt[:, None, None, None, :]
            xn = (xn * jax.nn.sigmoid(xn)).astype(x.dtype)
            y_ref = conv3d_decomposed(xn, w) + b.astype(dtype) + skip
            y_got, _ = jax.jit(
                lambda x, w, b, skip, g, bt: conv3d_fused(
                    x, w, b, prologue_g=g, prologue_b=bt, skip=skip,
                    want_stats=True)
            )(x, w, b, skip, g, bt)
            err = float(jnp.max(jnp.abs(
                y_got.astype(jnp.float32) - y_ref.astype(jnp.float32))))
            line += (f" | fused {t_f*1e3:7.2f} ms "
                     f"({flops/t_f/1e12:6.1f} TF/s eff) "
                     f"x{t_xla/t_f:.2f} maxerr={err:.2e}")
        else:
            line += " | fused: n/a"
        print(line, flush=True)


if __name__ == "__main__":
    main()
