"""Per-shape int8 conv schedule sweep at the flagship model's conv shapes.

The round-3/4 bf16 sweep (tools/profile_conv.py sweep) showed the folded
tap lowering at 84-100% MXU for every shape — but the int8 step's conv
time (59.3 ms vs the ~45 ms s8 speed-of-light, README round-4 floor
analysis) says XLA's s8 convs run at only ~64-76% of the 2x MXU rate,
and nobody has measured WHERE. This sweep times, per flagship conv shape
(s8 x s8 -> s32):

  concat  - one NHWC conv, Cin=kd*C depth-concat (the serving default)
  taps    - kd separate convs + int32 adds (DDPM3D_INT8_IMPL=taps)
  im2col  - materialized patches @ s8 GEMM via dot_general (skipped when
            the patch tensor exceeds 2 GiB)
  dotref  - a bare s8 GEMM of identical (M,K,N): the achievable MXU
            ceiling for that shape, gather costs excluded

plus the bf16 folded conv for the realized-speedup column. Feeds the
per-site schedule table (DDPM3D_INT8_TAPS_SITES / ops/quant.py).

Run on-chip: python tools/profile_int8_sweep.py
"""

import sys
import os

import numpy as np
import jax
import jax.numpy as jnp

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.profile_conv import timeit_chain  # noqa: E402


def conv_s8(x, w, strides=(1, 1)):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def make_concat(Ci, Co):
    def f(x, w):  # x: (D,H,H,3Ci) s8, w: (3,3,3Ci,Co) s8
        return conv_s8(x, w)
    return f


def make_taps(Ci, Co):
    def f(x, w):  # x: (D,H,H,3Ci) s8, w: (3,3,3Ci,Co) viewed as 3 taps
        out = None
        for k in range(3):
            y = conv_s8(
                jax.lax.slice_in_dim(x, k * Ci, (k + 1) * Ci, axis=3),
                jax.lax.slice_in_dim(w, k * Ci, (k + 1) * Ci, axis=2),
            )
            out = y if out is None else out + y
        return out
    return f


def make_native(Ci, Co):
    """One 3-D s8 conv on the 5-D view (N=1): at batch 1 the depth taps
    ARE a window-3 conv over the folded axis — no shifted copies, no
    concat materialization. (batch>1 would need the crossing mask, which
    a plain conv can't express; serving is batch 1/chip.)"""

    def f(x, w):  # x: (D,H,H,3Ci) -> use first Ci as the 5-D activation
        x5 = jax.lax.slice_in_dim(x, 0, Ci, axis=3)[None]  # (1,D,H,H,Ci)
        w5 = w.reshape(3, 3, 3, Ci, Co)  # values irrelevant for timing
        return jax.lax.conv_general_dilated(
            x5, w5,
            window_strides=(1, 1, 1), padding="SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.int32,
        )
    return f


def make_pallas(D, H, Ci, Co):
    """The custom implicit-GEMM s8 Pallas kernel (ops/conv3d_s8.py) with
    its fused dequantize epilogue; rotated layout where H % 32 != 0
    (conv3d_s8_mode), which is every level below full-res."""
    from ddpm3d_tpu.ops.conv3d_s8 import conv3d_s8, conv3d_s8_mode

    mode = conv3d_s8_mode(
        (1, D, H, H, Ci), (3, 3, 3, Ci, Co), (1, 1, 1)
    )
    if mode is None:
        return None
    scale = jnp.full((Co,), 3e-4, jnp.float32)

    def f(x, w):  # x: (D,H,H,3Ci) -> use first Ci as the 5-D activation
        x5 = jax.lax.slice_in_dim(x, 0, Ci, axis=3)[None]
        w5 = w.reshape(3, 3, 3, Ci, Co)
        if mode == "transpose":
            x5 = jnp.transpose(x5, (0, 2, 3, 1, 4))
            w5 = jnp.transpose(w5, (1, 2, 0, 3, 4))
        return conv3d_s8(x5, w5, scale, out_dtype=jnp.bfloat16)
    return f


def make_im2col(D, H, Ci, Co):
    def f(x, w):  # x: (D,H,H,3Ci); patches over (3,3) HW window
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [
            jax.lax.dynamic_slice(xp, (0, dh, dw, 0), (D, H, H, 3 * Ci))
            for dh in range(3)
            for dw in range(3)
        ]
        pat = jnp.concatenate(cols, axis=-1).reshape(D * H * H, 27 * Ci)
        wm = jnp.transpose(w.reshape(3, 3, 3 * Ci, Co), (0, 1, 2, 3)).reshape(
            9 * 3 * Ci, Co
        )
        y = jax.lax.dot_general(
            pat, wm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return y.reshape(D, H, H, Co)
    return f


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument(
        "--hs", type=str, default="",
        help="comma list of H values to keep (compiles are expensive "
        "through the relay; e.g. --hs 48,24,12,6)")
    ap.add_argument(
        "--variants", type=str,
        default="concat,taps,native,im2col,pallas",
        help="comma subset of concat,taps,native,im2col,pallas (dotref "
        "always runs: it is the gather-free ceiling)")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    if args.smoke:  # CPU syntax/shape check
        D, shapes = 8, [(8, 16, 16)]
    else:
        D = 96
        shapes = [
            (96, 128, 128), (96, 256, 128),
            (48, 128, 128), (48, 256, 128), (48, 384, 128),
            (24, 256, 256), (24, 384, 256), (24, 512, 256), (24, 640, 256),
            (12, 384, 384), (12, 512, 384), (12, 768, 384), (12, 896, 384),
            (6, 512, 512), (6, 1024, 512),
        ]
    if args.hs:
        keep = {int(h) for h in args.hs.split(",")}
        shapes = [s for s in shapes if s[0] in keep]
    variants = [v for v in args.variants.split(",") if v]
    print(
        "| H | Cin->Cout | bf16 | s8 concat | s8 taps | s8 native |"
        " s8 im2col | s8 pallas | s8 dotref | best s8 speedup |"
    )
    print("|---|" * 10)
    from ddpm3d_tpu.ops.conv3d import conv3d_folded

    for H, Ci, Co in shapes:
        flops = 2 * 27 * Ci * Co * D * H * H
        x8 = jnp.asarray(
            rng.integers(-127, 128, size=(D, H, H, 3 * Ci)), jnp.int8
        )
        w8 = jnp.asarray(
            rng.integers(-127, 128, size=(3, 3, 3 * Ci, Co)), jnp.int8
        )
        xb = jnp.asarray(rng.normal(size=(D, H, H, Ci)), jnp.bfloat16)
        wb = jnp.asarray(rng.normal(size=(3, 3, 3, Ci, Co)) * 0.01,
                         jnp.bfloat16)
        t_bf = timeit_chain(lambda a, b: conv3d_folded(a, b, 1), xb, wb)
        cells = [f"{t_bf*1e3:.2f} ms ({flops/t_bf/1e12:.0f})"]
        ts = {}
        for name, fn in [
            ("concat", make_concat(Ci, Co)),
            ("taps", make_taps(Ci, Co)),
            ("native", make_native(Ci, Co)),
            ("im2col", make_im2col(D, H, Ci, Co)),
            ("pallas", make_pallas(D, H, Ci, Co)),
        ]:
            if name not in variants or fn is None or (
                name == "im2col" and 27 * D * H * H * Ci > 2 * 2**30
            ):
                cells.append("skip")
                continue
            t = timeit_chain(fn, x8, w8)
            ts[name] = t
            cells.append(f"{t*1e3:.2f} ms ({flops/t/1e12:.0f})")
        # dotref: bare GEMM, gather-free ceiling
        M, K = D * H * H, 27 * Ci
        if M * K <= 2 * 2**30:
            a = jnp.asarray(rng.integers(-127, 128, size=(M, K)), jnp.int8)
            b = jnp.asarray(rng.integers(-127, 128, size=(K, Co)), jnp.int8)
            t = timeit_chain(
                lambda a, b: jax.lax.dot_general(
                    a, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ),
                a, b,
            )
            cells.append(f"{t*1e3:.2f} ms ({flops/t/1e12:.0f})")
        else:
            cells.append("skip")
        best = min(ts.values())
        cells.append(f"{t_bf/best:.2f}x")
        print(f"| {H} | {Ci}->{Co} | " + " | ".join(cells) + " |",
              flush=True)


if __name__ == "__main__":
    main()
