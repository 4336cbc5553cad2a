"""Phase-decomposed upsample-conv: prototype + on-chip benchmark.

The decoder's up transitions compute ``conv3x3(nearest_up2_HW(x))``
(reference unet.py:81-110 Upsample, and ResBlock(up=True) h_upd->in_conv,
unet.py:207-260). On the upsampled grid every 2x2 output block reads the
same 2x2 neighbourhood of low-res pixels, so the 3x3 conv factors exactly
into FOUR 2x2 "phase" convs on the LOW-RES input:

    y[2i+a, 2j+b] = sum_{r,c in {0,1}} K_ab[r,c] . x[i+r-(1-a), j+c-(1-b)]
    K_ab = (A_a (x) A_b) w,   A_0 = [[1,0,0],[0,1,1]], A_1 = [[1,1,0],[0,0,1]]

(depth taps are unaffected: the anisotropic pyramid never resamples D).
This cuts the MACs 36/16 = 2.25x and never materialises the upsampled
input; the cost is a phase-interleave of the four outputs.

Run (TPU): python tools/profile_phase_up.py         # bench the 4 up shapes
           python tools/profile_phase_up.py check   # correctness only
"""

import os
import sys
import time

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np

import jax
import jax.numpy as jnp

from ddpm3d_tpu.ops.conv3d import conv3d_folded
from ddpm3d_tpu.ops.phase_up import phase_up_kernels, upsample_conv_folded


def upconv_ref(x, w):
    """Baseline: materialised nearest x2 upsample, then folded tap conv."""
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return conv3d_folded(up, w, batch=1)


def upconv_phase(x, w):
    return upsample_conv_folded(x, w, batch=1)


def timeit_chain(fn, x, w, n_lo=8, n_hi=24):
    """Two-point-slope timing of a jitted data-dependent chain (cancels the
    ~25-30 ms relay dispatch; depends on EVERY output element so XLA cannot
    slice through the conv — tools/profile_conv.py:60)."""

    def chain(x, w, n):
        def body(i, acc):
            y = fn(x * (1.0 + acc * 1e-30 + i * 1e-6).astype(x.dtype), w)
            return acc + jnp.sum(y, dtype=jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    jc = jax.jit(chain)
    float(jc(x, w, jnp.int32(n_lo)))
    ts = {}
    for n in (n_lo, n_hi):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(jc(x, w, jnp.int32(n)))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return max((ts[n_hi] - ts[n_lo]) / (n_hi - n_lo), 1e-9)


def check():
    # pinned to CPU: TPU f32 convs contract through the MXU (bf16x3), so
    # two algebraically identical lowerings differ at ~1e-3 rel — the
    # equivalence itself is exact (2.6e-6 on CPU f32)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        _check_impl()


def _check_impl():
    rng = np.random.default_rng(0)
    for BD, H, Cin, Cout in [(8, 6, 16, 8), (12, 5, 8, 8)]:
        x = jnp.asarray(rng.normal(size=(BD, H, H, Cin)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, Cin, Cout)) * 0.1,
                        jnp.float32)
        ref = np.asarray(upconv_ref(x, w))
        got = np.asarray(upconv_phase(x, w))
        err = np.max(np.abs(ref - got)) / (np.max(np.abs(ref)) + 1e-9)
        print(f"[{BD}x{H}^2 {Cin}->{Cout}] rel err {err:.2e} "
              f"{'OK' if err < 1e-5 else 'FAIL'}")
        assert err < 1e-5
    # batch>1: folded depth taps must not cross sample boundaries
    x = jnp.asarray(rng.normal(size=(2 * 7, 5, 5, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 8, 8)) * 0.1, jnp.float32)
    ref = np.stack([
        np.asarray(upconv_ref(x[i * 7:(i + 1) * 7], w)) for i in range(2)
    ]).reshape(14, 10, 10, 8)
    got = np.asarray(upsample_conv_folded(x, w, batch=2))
    err = np.max(np.abs(ref - got)) / (np.max(np.abs(ref)) + 1e-9)
    print(f"[batch=2 folded] rel err {err:.2e} {'OK' if err < 1e-5 else 'FAIL'}")
    assert err < 1e-5
    print("phase-up correctness: PASS")


def main():
    rng = np.random.default_rng(0)
    # the flagship's four up-transition conv shapes: the up-ResBlock sits
    # AFTER the level's concat ResBlocks, so its conv is equal-channel at
    # the level width (verified against the compiled-model trace)
    shapes = [
        (96, 48, 128, 128),
        (96, 24, 256, 256),
        (96, 12, 384, 384),
        (96, 6, 512, 512),
    ]
    print(f"{'shape':26s} {'ref ms':>8s} {'phase ms':>9s} {'win':>7s}")
    tot_ref = tot_ph = 0.0
    for BD, H, Cin, Cout in shapes:
        x = jnp.asarray(rng.normal(size=(BD, H, H, Cin)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, Cin, Cout)) * 0.02,
                        jnp.bfloat16)
        t_ref = timeit_chain(upconv_ref, x, w)
        t_ph = timeit_chain(upconv_phase, x, w)
        tot_ref += t_ref
        tot_ph += t_ph
        print(f"[{BD}x{H}^2 {Cin}->{Cout}]".ljust(26)
              + f" {t_ref*1e3:8.3f} {t_ph*1e3:9.3f} {t_ref/t_ph:6.2f}x")
    print(f"{'TOTAL (4 up convs)':26s} {tot_ref*1e3:8.3f} {tot_ph*1e3:9.3f} "
          f"{tot_ref/tot_ph:6.2f}x  (delta {1e3*(tot_ref-tot_ph):+.2f} ms/step)")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "check":
        check()
    else:
        check()
        main()
