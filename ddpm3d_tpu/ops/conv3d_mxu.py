"""Implicit-GEMM 3-D convolution as a Pallas TPU kernel.

The production UNet spends ~85% of its FLOPs in stride-1 3x3x3 convolutions
at the two full-depth resolutions (96x96^2 and 96x48^2, 128-512 channels;
reference conv stack guided_diffusion/unet.py:236-256). XLA:TPU lowers the
native conv3d at ~40% MXU and the depth-decomposed conv2d form at ~53%
(ops/conv3d.py). This kernel formulates the conv as 27 MXU matmuls over a
VMEM-resident input block:

    for (kd, kh, kw):  acc += X[kd+di, kh+hi, kw+wi, :] @ W[kd, kh, kw]

with the block layout chosen so all tap slices except the three W-shifts are
free (major-dim offsets into the same VMEM tiles), and the W-shifts are
hoisted to one relayout per kw (3 total) instead of one per tap (27).

Structure per grid step (one output block of (dblk, hblk, W, Cout)):
  1. double-buffered DMA of the haloed input block
     (dblk+kd-1, hblk+kh-1, W+kw-1, Cin) from the pre-padded HBM array;
  2. 27 matmuls of (dblk*hblk*W, Cin) x (Cin, Cout) accumulating in f32;
  3. fused bias add, cast, write the output block.

Weights (kd,kh,kw,Cin,Cout) stay VMEM-resident for the whole call. The
f32 accumulator makes the kernel's numerics identical to the XLA paths
(which also accumulate f32 on the MXU).

Applicability (checked by :func:`conv3d_mxu_applicable`): stride 1, odd
kernel, Cin/Cout multiples of 128 (MXU lane width), W a multiple of the
sublane tile so the (d,h,W)->M reshape is layout-free. Callers fall back to
ops/conv3d.py otherwise. Gradients via custom VJP: dx reuses this kernel
with the spatially-flipped, in/out-transposed weights (exact for SAME
stride-1); dw/db fall back to XLA's filter-gradient conv.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

try:  # import is CPU-safe; the kernel itself runs on TPU (or interpreted)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _sublane(dtype) -> int:
    return 16 if jnp.dtype(dtype).itemsize == 2 else 8


def conv3d_mxu_applicable(
    x_shape: Tuple[int, ...],
    kernel_shape: Tuple[int, ...],
    strides: Tuple[int, int, int],
    dtype,
) -> bool:
    """True when this kernel supports the conv (else use ops/conv3d.py)."""
    if not _HAS_PALLAS or len(x_shape) != 5 or len(kernel_shape) != 5:
        return False
    B, D, H, W, Cin = x_shape
    kd, kh, kw, Cin2, Cout = kernel_shape
    if strides != (1, 1, 1):
        return False
    if kd % 2 == 0 or kh % 2 == 0 or kw % 2 == 0:
        return False
    if max(kd, kh, kw) == 1:  # 1x1x1: a plain matmul, XLA is optimal
        return False
    if Cin % 128 or Cout % 128:
        return False
    if W % _sublane(dtype):
        return False
    return True


def _pick_blocks(D: int, H: int, W: int, Cin: int, Cout: int,
                 itemsize: int, kd: int, kh: int) -> Tuple[int, int]:
    """Largest (dblk, hblk) dividing (D, H) whose working set fits VMEM."""
    budget = 11 * 2 ** 20  # leave headroom under the ~16 MB/core VMEM
    best = (1, 1)
    best_m = 0
    for dblk in (16, 12, 8, 6, 4, 3, 2, 1):
        if D % dblk:
            continue
        for hblk in (16, 12, 8, 6, 4, 3, 2, 1):
            if H % hblk:
                continue
            Db, Hb = dblk + kd - 1, hblk + kh - 1
            m = dblk * hblk * W
            xbuf = 2 * Db * Hb * (W + 2) * Cin * itemsize
            outb = 2 * dblk * hblk * W * Cout * itemsize
            acc = m * Cout * 4
            akw = Db * Hb * W * Cin * itemsize
            wts = kd * kh * 3 * Cin * Cout * itemsize
            if xbuf + outb + acc + akw + wts > budget:
                continue
            # prefer larger matmul M; break ties toward square-ish halo
            score = min(m, 8192) - (Db * Hb * (W + 2)) / (dblk * hblk * W)
            if score > best_m:
                best_m = score
                best = (dblk, hblk)
    return best


def _conv_kernel(
    x_hbm, w_ref, b_ref, out_ref, xbuf, sem, *,
    nD, nH, dblk, hblk, kd, kh, kw, W, Cin, Cout, nblocks, out_dtype,
):
    pid = pl.program_id(0)
    Db = dblk + kd - 1
    Hb = hblk + kh - 1

    def dma(p, slot):
        b = p // (nD * nH)
        r = p % (nD * nH)
        di = r // nH
        hi = r % nH
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(di * dblk, Db), pl.ds(hi * hblk, Hb)],
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

    xb = xbuf[slot]  # (Db, Hb, W + kw - 1, Cin)
    acc = jnp.zeros((dblk * hblk * W, Cout), jnp.float32)
    for kwi in range(kw):
        # one relayout per kw (sublane shift); kd/kh slices below are free
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
    out_ref[:] = acc.reshape(1, dblk, hblk, W, Cout).astype(out_dtype)


def _conv3d_mxu_impl(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    block_d: Optional[int],
    block_h: Optional[int],
    interpret: bool,
) -> jnp.ndarray:
    B, D, H, W, Cin = x.shape
    kd, kh, kw, _, Cout = kernel.shape
    out_dtype = x.dtype

    # W is padded past kw//2 up to the HBM tile boundary (8 sublanes): Mosaic
    # requires DMA'd extents along the second-minor dim to be tile-aligned.
    Wp = -(-(W + kw - 1) // 8) * 8
    xp = jnp.pad(
        x,
        ((0, 0), (kd // 2, kd // 2), (kh // 2, kh // 2),
         (kw // 2, Wp - W - kw // 2), (0, 0)),
    )
    kernel = kernel.astype(x.dtype)
    if bias is None:
        bias = jnp.zeros((Cout,), jnp.float32)
    bias2d = bias.reshape(1, Cout).astype(jnp.float32)

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
        + B * D * H * W * Cout * jnp.dtype(out_dtype).itemsize
    )

    grid_kernel = functools.partial(
        _conv_kernel,
        nD=nD, nH=nH, dblk=dblk, hblk=hblk, kd=kd, kh=kh, kw=kw,
        W=W, Cin=Cin, Cout=Cout, nblocks=nblocks, out_dtype=out_dtype,
    )
    return pl.pallas_call(
        grid_kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, dblk, hblk, W, Cout),
            lambda p: (p // (nD * nH), (p % (nD * nH)) // nH, p % nH, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, D, H, W, Cout), out_dtype),
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
    )(xp, kernel, bias2d)


def _xla_conv3d(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1, 1),
        padding=tuple((k // 2, k // 2) for k in kernel.shape[:3]),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def conv3d_mxu(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    block_d: Optional[int] = None,
    block_h: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Stride-1 SAME 3-D conv (NDHWC x DHWIO) on the MXU via Pallas.

    Check :func:`conv3d_mxu_applicable` first; this function assumes the
    shape contract holds.
    """
    return _conv3d_mxu_impl(x, kernel, bias, block_d, block_h, interpret)


def _conv3d_mxu_fwd(x, kernel, bias, block_d, block_h, interpret):
    out = _conv3d_mxu_impl(x, kernel, bias, block_d, block_h, interpret)
    return out, (x, kernel, bias is not None)


def _conv3d_mxu_bwd(block_d, block_h, interpret, res, dy):
    x, kernel, has_bias = res
    # dx: correlate dy with the spatially-flipped, in/out-swapped kernel —
    # exact for SAME padding at stride 1 with odd kernels.
    wt = jnp.flip(kernel, axis=(0, 1, 2)).swapaxes(3, 4)
    if conv3d_mxu_applicable(dy.shape, wt.shape, (1, 1, 1), dy.dtype):
        dx = _conv3d_mxu_impl(dy, wt, None, None, None, interpret)
    else:  # pragma: no cover - applicability is symmetric for this model
        dx = _xla_conv3d(dy, wt)
    # dw: XLA's filter-gradient conv (a huge-K GEMM XLA handles well).
    _, vjp = jax.vjp(lambda k: _xla_conv3d(x, k), kernel)
    (dw,) = vjp(dy.astype(x.dtype))
    db = dy.astype(jnp.float32).sum(axis=(0, 1, 2, 3)) if has_bias else None
    return dx, dw.astype(kernel.dtype), db


conv3d_mxu.defvjp(_conv3d_mxu_fwd, _conv3d_mxu_bwd)
