"""Profile 3-D convolution strategies on the TPU.

Compares:
 a) native lax conv3d (NDHWC x DHWIO)
 b) depth-decomposed: sum over kd of a 2-D conv with (B*D) as batch
 c) native conv3d in bf16 vs f32

Run: python tools/profile_conv.py [size] [channels]
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


def conv3d_native(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def conv3d_decomposed(x, w):
    """y[:, d] = sum_kd conv2d(x[:, d+kd-1], w[kd]) with zero depth pads."""
    B, D, H, W, C = x.shape
    kd = w.shape[0]
    pad = kd // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0)))
    out = None
    for k in range(kd):
        xs = xp[:, k : k + D].reshape(B * D, H, W, C)
        y = jax.lax.conv_general_dilated(
            xs, w[k], window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        out = y if out is None else out + y
    return out.reshape(B, D, H, W, -1)


def timeit(fn, *args, reps=5):
    out = fn(*args)
    float(jnp.sum(out))  # compile + materialize
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        float(jnp.sum(out))
    return (time.perf_counter() - t0) / reps


def timeit_chain(conv, x, w, n_lo=8, n_hi=24):
    """Per-call time via two-point slope of an n-iteration jitted chain.

    The axon relay adds ~25-30 ms of dispatch/readback per isolated call,
    swamping sub-ms tail convs; chaining n data-dependent calls in one
    fori_loop and differencing two chain lengths cancels both the
    per-dispatch constant and the input-perturbation pass."""

    def chain(x, w, n):
        def body(i, acc):
            y = conv(x * (1.0 + acc * 1e-30 + i * 1e-6).astype(x.dtype), w)
            # depend on EVERY output element: a single-element dependence
            # lets XLA slice through the conv and compute one pixel
            # (observed: "native" at 1100+ TF/s, i.e. physically impossible)
            return acc + jnp.sum(y, dtype=jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    jc = jax.jit(chain)  # dynamic n: one compile serves both chain lengths
    ts = {}
    float(jc(x, w, jnp.int32(n_lo)))  # compile
    for n in (n_lo, n_hi):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(jc(x, w, jnp.int32(n)))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return max((ts[n_hi] - ts[n_lo]) / (n_hi - n_lo), 1e-9)


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    C = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    rng = np.random.default_rng(0)

    for dtype, name in [(jnp.bfloat16, "bf16"), (jnp.float32, "f32")]:
        x = jnp.asarray(rng.normal(size=(1, size, size, size, C)), dtype)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, C, C)) * 0.01, dtype)
        flops = 2 * 27 * C * C * size ** 3
        t_nat = timeit(jax.jit(conv3d_native), x, w)
        t_dec = timeit(jax.jit(conv3d_decomposed), x, w)
        print(
            f"[{name} {size}^3 C={C}] native: {t_nat*1000:.1f} ms "
            f"({flops/t_nat/1e12:.1f} TF/s) | decomposed: {t_dec*1000:.1f} ms "
            f"({flops/t_dec/1e12:.1f} TF/s)",
            flush=True,
        )


def sweep_model_shapes():
    """Per-shape table at the flagship model's actual conv shapes
    (folded BD=96): decomposed-folded vs native 5-D, bf16.

    Run: python tools/profile_conv.py sweep
    Feeds the per-shape dispatch decision (ops/conv3d.py): the tails
    (12^2/6^2) are where sub-85% MXU lives at the model level.
    """
    from ddpm3d_tpu.ops.conv3d import conv3d_folded

    rng = np.random.default_rng(0)
    D = 96
    shapes = [
        # (H, Cin, Cout) per pyramid level of the 128ch (1,1,2,3,4) model,
        # incl. the decoder pair-pop concat widths (Ci = up_ch + skip_ch)
        (96, 128, 128), (96, 256, 128),
        (48, 128, 128), (48, 256, 128), (48, 384, 128),
        (24, 256, 256), (24, 384, 256), (24, 512, 256), (24, 640, 256),
        (12, 384, 384), (12, 512, 384), (12, 768, 384), (12, 896, 384),
        (6, 512, 512), (6, 1024, 512),
    ]
    impls = ["taps", "native", "im2col"]
    print("| H=W | Cin->Cout | " + " | ".join(impls) + " | winner |")
    print("|---|" * (len(impls) + 3))
    for H, Ci, Co in shapes:
        x4 = jnp.asarray(rng.normal(size=(D, H, H, Ci)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, Ci, Co)) * 0.01, jnp.bfloat16)
        flops = 2 * 27 * Ci * Co * D * H * H
        cells, best = [], (None, float("inf"))
        for impl in impls:
            if impl == "im2col" and 27 * 2 * D * H * H * Ci > 2 * 2**30:
                cells.append("skip (mem)")
                continue
            t = timeit_chain(
                lambda a, b, i=impl: conv3d_folded(a, b, 1, impl=i), x4, w
            )
            cells.append(f"{t*1000:.2f} ms ({flops/t/1e12:.0f} TF/s)")
            if t < best[1]:
                best = (impl, t)
        print(
            f"| {H} | {Ci}->{Co} | " + " | ".join(cells) + f" | {best[0]} |",
            flush=True,
        )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "sweep":
        sweep_model_shapes()
    else:
        main()
