"""Fused ResBlock convolution: GN-normalize/FiLM/SiLU prologue + implicit-
GEMM conv3d + bias/skip epilogue + per-channel stats, one Pallas kernel.

Motivation (measured, tools/profile_step.py): the flagship 96^3 sampling
step spends ~120 ms in convs and ~28 ms in the elementwise/reduce traffic
AROUND them — the GN normalize+FiLM+SiLU write before each conv, the skip
adds after, and the GN stats reduction of each conv's output. Each of those
is a full HBM round-trip of a 96^3 activation. This kernel does all of it
in VMEM per block:

  prologue   xn = silu(x * g[c] + b[c])       (f32, per-channel affine —
             the folded GroupNorm(+FiLM) of models/nn.py:group_norm_f32;
             halo voxels are masked to zero so SAME zero-padding semantics
             match conv-after-normalize, reference unet.py:236-256)
  conv       acc = sum_taps xn @ W[tap]       (27 MXU matmuls, f32 acc)
  epilogue   y = acc + bias (+ skip)          (skip: the ResBlock residual)
  stats      s1[c] += sum(y), s2[c] += sum(y^2)   (for the NEXT GroupNorm)

The stats output lets consecutive ResBlocks chain without ever re-reading
activations for normalization: GroupNorm becomes a [C]-sized coefficient
fold between kernel calls (see models/unet.py fused path).

Inference-path only (sampling is the production hot loop); training keeps
the XLA path. Applicability mirrors ops/conv3d_mxu.py: stride 1, odd
kernel, Cin/Cout multiples of 128, W multiple of the sublane tile.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

from .conv3d_mxu import _pick_blocks, _sublane


def conv3d_fused_applicable(x_shape, kernel_shape, dtype) -> bool:
    if not _HAS_PALLAS or len(x_shape) != 5 or len(kernel_shape) != 5:
        return False
    B, D, H, W, Cin = x_shape
    kd, kh, kw, Cin2, Cout = kernel_shape
    if kd % 2 == 0 or kh % 2 == 0 or kw % 2 == 0 or max(kd, kh, kw) == 1:
        return False
    if Cin % 128 or Cout % 128:
        return False
    if W % _sublane(dtype):
        return False
    return True


def _fused_kernel(
    # inputs
    x_hbm, w_ref, b_ref, g_ref, beta_ref, skip_ref,
    # outputs
    out_ref, stats_ref,
    # scratch
    xbuf, sem,
    *,
    nD, nH, dblk, hblk, kd, kh, kw, D, H, W, Wp, Cin, Cout, nblocks,
    out_dtype, prologue, prologue_silu, add_skip, want_stats,
):
    pid = pl.program_id(0)
    Db = dblk + kd - 1
    Hb = hblk + kh - 1
    b_idx = pid // (nD * nH)
    r = pid % (nD * nH)
    di = r // nH
    hi = r % nH

    def dma(p, slot):
        bb = p // (nD * nH)
        rr = p % (nD * nH)
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds((rr // nH) * dblk, Db),
                     pl.ds((rr % nH) * hblk, Hb)],
            xbuf.at[slot],
            sem.at[slot],
        )

    slot = jax.lax.rem(pid, 2)

    @pl.when(pid == 0)
    def _():
        dma(pid, slot).start()

    @pl.when(pid + 1 < nblocks)
    def _():
        dma(pid + 1, jax.lax.rem(pid + 1, 2)).start()

    dma(pid, slot).wait()

    xb = xbuf[slot]  # (Db, Hb, Wp, Cin) raw, zero-padded halos
    if prologue:
        xf = xb.astype(jnp.float32)
        g = g_ref[b_idx].astype(jnp.float32)       # [Cin]
        bt = beta_ref[b_idx].astype(jnp.float32)   # [Cin]
        xf = xf * g[None, None, None, :] + bt[None, None, None, :]
        if prologue_silu:
            xf = xf * jax.nn.sigmoid(xf)
        # zero the halo voxels so padding behaves as conv-after-normalize:
        # global coords of this block's rows are (di*dblk + i - pad) etc.
        d0 = di * dblk
        h0 = hi * hblk
        ii = jax.lax.broadcasted_iota(jnp.int32, (Db, Hb, Wp, 1), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (Db, Hb, Wp, 1), 1)
        ww = jax.lax.broadcasted_iota(jnp.int32, (Db, Hb, Wp, 1), 2)
        mask = (
            (d0 + ii >= kd // 2) & (d0 + ii < D + kd // 2)
            & (h0 + jj >= kh // 2) & (h0 + jj < H + kh // 2)
            & (ww >= kw // 2) & (ww < W + kw // 2)
        )
        xf = jnp.where(mask, xf, 0.0)
        xb = xf.astype(xbuf.dtype)

    acc = jnp.zeros((dblk * hblk * W, Cout), jnp.float32)
    for kwi in range(kw):
        akw = xb[:, :, kwi:kwi + W, :]
        for kdi in range(kd):
            for khi in range(kh):
                a = akw[kdi:kdi + dblk, khi:khi + hblk]
                a = a.reshape(dblk * hblk * W, Cin)
                acc = acc + jnp.dot(
                    a, w_ref[kdi, khi, kwi],
                    preferred_element_type=jnp.float32,
                )
    acc = acc + b_ref[:].astype(jnp.float32)
    if add_skip:
        acc = acc + skip_ref[:].reshape(dblk * hblk * W, Cout).astype(
            jnp.float32)
    out_ref[:] = acc.reshape(1, dblk, hblk, W, Cout).astype(out_dtype)
    if want_stats:
        s1 = acc.sum(axis=0)
        s2 = (acc * acc).sum(axis=0)

        @pl.when(pid == 0)
        def _():
            stats_ref[:] = jnp.zeros_like(stats_ref)

        prev = stats_ref[b_idx]
        stats_ref[b_idx] = prev + jnp.stack([s1, s2])


def conv3d_fused(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    prologue_g: Optional[jnp.ndarray] = None,    # [B, Cin] f32
    prologue_b: Optional[jnp.ndarray] = None,    # [B, Cin] f32
    prologue_silu: bool = True,
    skip: Optional[jnp.ndarray] = None,          # [B, D, H, W, Cout]
    want_stats: bool = False,
    block_d: Optional[int] = None,
    block_h: Optional[int] = None,
    interpret: bool = False,
):
    """Fused normalize->conv->skip(+stats) (see module docstring).

    Returns ``out`` or ``(out, stats)`` where stats is [B, 2, Cout] f32
    per-channel (sum, sum-of-squares) of the final output — exactly what
    :func:`ddpm3d_tpu.models.nn.group_norm_f32` needs for the next GN.
    """
    B, D, H, W, Cin = x.shape
    kd, kh, kw, _, Cout = kernel.shape
    out_dtype = x.dtype
    prologue = prologue_g is not None

    # Pad the minor-most spatial dim to the dtype's sublane multiple (8 for
    # f32, 16 for bf16/f16) so VMEM scratch and DMA slices stay aligned to
    # the (sublane, 128) tile for 2-byte dtypes too.
    sub = _sublane(x.dtype)
    Wp = -(-(W + kw - 1) // sub) * sub
    xp = jnp.pad(
        x,
        ((0, 0), (kd // 2, kd // 2), (kh // 2, kh // 2),
         (kw // 2, Wp - W - kw // 2), (0, 0)),
    )
    kernel = kernel.astype(x.dtype)
    if bias is None:
        bias = jnp.zeros((Cout,), jnp.float32)
    bias2d = bias.reshape(1, Cout).astype(jnp.float32)
    if prologue_g is None:
        prologue_g = jnp.ones((B, Cin), jnp.float32)
        prologue_b = jnp.zeros((B, Cin), jnp.float32)
    add_skip = skip is not None
    if skip is None:
        skip = jnp.zeros((B, 1, 1, 1, Cout), out_dtype)

    if block_d is None or block_h is None:
        block_d, block_h = _pick_blocks(
            D, H, W, Cin, Cout, jnp.dtype(x.dtype).itemsize, kd, kh
        )
    dblk, hblk = block_d, block_h
    nD, nH = D // dblk, H // hblk
    nblocks = B * nD * nH
    Db, Hb = dblk + kd - 1, hblk + kh - 1

    flops = 2 * kd * kh * kw * Cin * Cout * B * D * H * W
    bytes_acc = (
        xp.size * xp.dtype.itemsize
        + kernel.size * kernel.dtype.itemsize
        + (1 + add_skip) * B * D * H * W * Cout * jnp.dtype(out_dtype).itemsize
    )

    grid_kernel = functools.partial(
        _fused_kernel,
        nD=nD, nH=nH, dblk=dblk, hblk=hblk, kd=kd, kh=kh, kw=kw,
        D=D, H=H, W=W, Wp=Wp, Cin=Cin, Cout=Cout, nblocks=nblocks,
        out_dtype=out_dtype, prologue=prologue, prologue_silu=prologue_silu,
        add_skip=add_skip, want_stats=want_stats,
    )
    if add_skip:
        skip_spec = pl.BlockSpec(
            (1, dblk, hblk, W, Cout),
            lambda p: (p // (nD * nH), (p % (nD * nH)) // nH, p % nH, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        skip_spec = pl.BlockSpec(memory_space=pl.ANY)
    out, stats = pl.pallas_call(
        grid_kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # x (manual halo DMA)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
            pl.BlockSpec(memory_space=pltpu.VMEM),  # prologue g
            pl.BlockSpec(memory_space=pltpu.VMEM),  # prologue b
            skip_spec,
        ],
        out_specs=[
            pl.BlockSpec(
                (1, dblk, hblk, W, Cout),
                lambda p: (p // (nD * nH), (p % (nD * nH)) // nH, p % nH,
                           0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (B, 2, Cout), lambda p: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, D, H, W, Cout), out_dtype),
            jax.ShapeDtypeStruct((B, 2, Cout), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, Db, Hb, Wp, Cin), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_acc, transcendentals=0
        ),
        interpret=interpret,
    )(xp, kernel, bias2d, prologue_g.astype(jnp.float32),
      prologue_b.astype(jnp.float32), skip)
    return (out, stats) if want_stats else out
