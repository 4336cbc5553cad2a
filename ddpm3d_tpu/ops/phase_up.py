"""Phase-decomposed upsample-conv for the decoder's up transitions.

``conv3x3(nearest_up2_HW(x))`` — the reference's Upsample(use_conv) and
ResBlock(up=True) pattern (reference unet.py:81-110, 207-260) — factors
EXACTLY into four 2x2 "phase" convs on the low-res input: on the
upsampled grid, output position (2i+a, 2j+b) reads upsampled pixels whose
sources collapse to a 2x2 low-res neighbourhood, with kernel columns/rows
merged pairwise:

    row taps, phase a=0: [w0 @ i-1, (w1+w2) @ i]
    row taps, phase a=1: [(w0+w1) @ i, w2 @ i+1]

(and identically for columns). MACs drop 36/16 = 2.25x, the upsampled
input is never materialised (HBM write of the 4x activation saved), and
the depth taps of the anisotropic pyramid (D never resampled,
reference unet.py:102-105) pass through unchanged on the folded axis.

The phase outputs are interleaved with a reshape — XLA lowers the
[H,2,W,2] stack+reshape as the transpose it is; measured on v5e the whole
phase path still wins (see tools/profile_phase_up.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# phase combination matrices: A_0 merges kernel row taps (1,2), A_1 merges
# (0,1) — derived from floor((2i+a+u)/2), u in {-1,0,1}
_A = (
    np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 1.0]]),  # a=0: taps at {i-1, i}
    np.array([[1.0, 1.0, 0.0], [0.0, 0.0, 1.0]]),  # a=1: taps at {i, i+1}
)


def phase_up_kernels(kernel: jnp.ndarray):
    """(kd,3,3,Cin,Cout) -> dict[(a,b)] of (kd,2,2,Cin,Cout) phase kernels.

    Combination happens in f32 (bf16 tap sums would add rounding on top of
    the conv's own) and is a trace-time constant fold when ``kernel`` is a
    loaded parameter.
    """
    kd = kernel.shape[0]
    assert kernel.shape[1:3] == (3, 3), "phase decomposition needs 3x3 HW"
    k32 = kernel.astype(jnp.float32)
    out = {}
    for a in (0, 1):
        for b in (0, 1):
            Aa = jnp.asarray(_A[a], jnp.float32)
            Ab = jnp.asarray(_A[b], jnp.float32)
            # K_ab[k, r, c] = sum_{u,v} A_a[r,u] A_b[c,v] w[k,u,v]
            k_ab = jnp.einsum("ru,cv,kuvio->krcio", Aa, Ab, k32)
            out[(a, b)] = k_ab.astype(kernel.dtype)
    return out


def upsample_conv_folded(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    batch: int,
    preferred_dtype=None,
) -> jnp.ndarray:
    """conv3d(nearest_up2_HW(x)) on a folded [(B*D), H, W, C] activation.

    Equivalent to ``conv3d_folded(repeat(repeat(x,2,1),2,2), kernel)`` with
    SAME padding — verified to 1e-5 rel err (tests/test_phase_up.py) — at
    16/36 the MACs. Depth taps are shifted slices of the folded axis with
    batch-boundary masking, exactly as ops/conv3d.py:conv3d_folded.
    """
    BD, H, W, C = x.shape
    kd = kernel.shape[0]
    assert BD % batch == 0, (BD, batch)
    D = BD // batch
    pd = kd // 2
    phases = phase_up_kernels(kernel)

    xp = jnp.pad(x, ((pd, pd), (0, 0), (0, 0), (0, 0)))
    # phase padding: a=0 reads rows {i-1, i} -> pad lo; a=1 reads {i, i+1}
    # -> pad hi (same for columns)
    pad_for = {0: (1, 0), 1: (0, 1)}

    ys = {}
    for (a, b), k_ab in phases.items():
        acc = None
        for k in range(kd):
            delta = k - pd
            xs = jax.lax.slice_in_dim(xp, k, k + BD, axis=0)
            if batch > 1 and delta != 0:
                d_idx = np.arange(BD) % D
                valid = (d_idx + delta >= 0) & (d_idx + delta < D)
                xs = xs * jnp.asarray(valid, x.dtype).reshape(BD, 1, 1, 1)
            y = jax.lax.conv_general_dilated(
                xs,
                k_ab[k],
                window_strides=(1, 1),
                padding=(pad_for[a], pad_for[b]),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=preferred_dtype,
            )
            acc = y if acc is None else acc + y
        ys[(a, b)] = acc

    Cout = kernel.shape[-1]
    # interleave: out[2i+a, 2j+b] = y_ab[i, j]
    rows = jnp.stack(
        [
            jnp.stack([ys[(0, 0)], ys[(0, 1)]], axis=3),
            jnp.stack([ys[(1, 0)], ys[(1, 1)]], axis=3),
        ],
        axis=2,
    )  # [BD, H, 2, W, 2, Cout]
    return rows.reshape(BD, 2 * H, 2 * W, Cout)
