"""W8A8 implicit-GEMM 3-D convolution as a Pallas TPU kernel.

Round-4 measurement closed the XLA-side int8 schedule search at 87.4
ms/step with conv/matmul flat at 59.3 ms — XLA's s8 conv schedules run at
~64% of the v5e's 2x int8 MXU rate at the flagship shapes, and the folded
`concat` lowering that wins among them pays a kd*C channel-concat
materialisation per conv (README round-4 per-op floor analysis). This
kernel is the remaining lever: the 27-tap implicit-GEMM structure of
ops/conv3d_mxu.py (its bf16 twin, retired because XLA's *bf16* schedule
is strong) executed as s8 x s8 -> s32 MXU matmuls with the dequantize +
bias epilogue fused in-register:

    for (kd, kh, kw):  acc_i32 += X_s8[kd+di, kh+hi, kw+wi, :] @ W_s8[kd, kh, kw]
    out_bf16 = acc_i32 * (s_x * s_w[c]) + bias[c]

No shifted-tap copies, no channel-concat materialisation, no separate
dequantize pass: the taps are free major-dim offsets into the same VMEM
tiles (one relayout per kw shift, 3 total), and the only HBM traffic is
one haloed int8 read per block plus one bf16 write.

Worst-case accumulator magnitude 127*127*27*512 = 2.2e8 < 2^31: int32
accumulation is exact at every shape in the zoo (same bound as
ops/quant.py).

Applicability (:func:`conv3d_s8_applicable`): stride 1, odd kernel sizes
with max(k) > 1, Cin/Cout multiples of 128, W a multiple of 32 (the int8
sublane tile — (32, 128) per the TPU tiling table — so the (d,h,W)->M
reshape is layout-free). The flagship's full-resolution 96^3 convs
(128->128 and the 256->128 decoder skip-concat sites, ~2/3 of step conv
FLOPs) qualify; 48^2/24^2 sites (W % 32 != 0) and strided downsamples
fall back to the XLA `concat` lowering in ops/quant.py.

Inference-only: the int8 path refuses training (rounding has zero
gradient, ops/quant.py), so no VJP is defined. Built against the
reference's fp16 serving torso
(/root/reference/guided_diffusion/unet.py:671-685 convert_to_fp16).

**Measured verdict (round 5, S8_KERNEL_STUDY.md): benchmarked-off.**
XLA's s8 concat conv runs at 357-385 TOPS (91-98% of the v5e int8 MXU
ceiling) at every flagship shape; this kernel measures 160-284 TOPS in
both inner K-styles (``DDPM3D_S8_KSTYLE=im2col|taps27``) because a
Pallas matmul reads materialised operands — the 27-tap reduction pays
either 26 inter-matmul VPU int32 adds (taps27) or explicit VMEM patch
copies (im2col), while XLA's conv emitter streams overlapping windows
into the systolic array with neither. Step level: all_pallas 109.1
ms/step vs the 87.4 concat+taps default. Kept correctness-tested
(bit-exact vs the int32 XLA conv in both layouts,
tests/test_conv3d_s8.py) and env-gated, like the bf16 Pallas kernels.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

try:  # import is CPU-safe; the kernel itself runs on TPU (or interpreted)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_S8_SUBLANE = 32  # int8 VMEM tile is (32, 128)


def conv3d_s8_applicable(
    x_shape: Tuple[int, ...],
    kernel_shape: Tuple[int, ...],
    strides: Tuple[int, int, int],
) -> bool:
    """True when this kernel supports the conv directly (else see
    :func:`conv3d_s8_mode`). ``x_shape`` is the unfolded (B,D,H,W,C)."""
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
    if W % _S8_SUBLANE:
        return False
    if _pick_blocks(D, H, W, Cin, Cout, kd, kh, kw, "taps27") is None:
        return False  # not even a (1,1) block fits VMEM (huge-C middle)
    return True


def conv3d_s8_mode(
    x_shape: Tuple[int, ...],
    kernel_shape: Tuple[int, ...],
    strides: Tuple[int, int, int],
) -> Optional[str]:
    """``"direct"``, ``"transpose"``, or None (fall back to XLA).

    The anisotropic (1,2,2) pyramid keeps D=96 at EVERY level while H/W
    shrink to 48/24/12 — none a multiple of the 32-row int8 sublane
    tile. Rotating the layout (B,D,H,W,C) -> (B,H,W,D,C) puts the
    full-depth axis minor-most, so every stride-1 3x3x3 site in the
    flagship qualifies for the kernel; the rotation itself is an XLA
    transpose that fuses with the producing quantize pass.
    """
    if conv3d_s8_applicable(x_shape, kernel_shape, strides):
        return "direct"
    if len(x_shape) != 5 or len(kernel_shape) != 5:
        return None
    B, D, H, W, Cin = x_shape
    kd, kh, kw, Cin2, Cout = kernel_shape
    xt = (B, H, W, D, Cin)
    kt = (kh, kw, kd, Cin2, Cout)
    if strides == (1, 1, 1) and conv3d_s8_applicable(xt, kt, strides):
        return "transpose"
    return None


def _kstyle() -> str:
    """Inner accumulation structure (``DDPM3D_S8_KSTYLE``):

    - ``im2col`` (default): build the (m, kd*kh*kw*Cin) patch matrix in
      VMEM (27 aligned sub-block copies from the haloed input) and run
      ONE s8 matmul — the full 27-tap reduction rides the MXU's internal
      K accumulation, like XLA's winning ``concat`` schedule but without
      the kd*C HBM materialisation. Measured 375 vs 263 TOPS against the
      27-matmul variant at the flagship full-res shape (round 5).
    - ``taps27``: 27 small K=Cin matmuls with int32 adds between them —
      the adds are VPU work between MXU calls and cost ~1/3 of the
      kernel's time at K=128; kept for A/B and as the low-VMEM fallback.
    """
    import os

    return os.environ.get("DDPM3D_S8_KSTYLE", "im2col").lower()


def _pick_blocks(D: int, H: int, W: int, Cin: int, Cout: int,
                 kd: int, kh: int, kw: int = 3,
                 kstyle: Optional[str] = None) -> Optional[Tuple[int, int]]:
    """Largest (dblk, hblk) dividing (D, H) whose working set fits VMEM,
    or None when no block does (huge-channel middle convs: their weights
    alone blow the budget — negligible FLOPs, XLA keeps them).

    int8 x halves the input-buffer cost of the bf16 twin; under
    ``im2col`` the (m, kd*kh*kw*Cin) patch scratch dominates, so blocks
    are smaller in (d, h) than the ``taps27`` variant's.
    """
    kstyle = kstyle or _kstyle()
    budget = 11 * 2 ** 20
    best = None
    best_score = -1.0
    for dblk in (16, 12, 8, 6, 4, 3, 2, 1):
        if D % dblk:
            continue
        for hblk in (16, 12, 8, 6, 4, 3, 2, 1):
            if H % hblk:
                continue
            Db, Hb = dblk + kd - 1, hblk + kh - 1
            m = dblk * hblk * W
            xbuf = 2 * Db * Hb * (W + 2 * _S8_SUBLANE) * Cin  # int8
            outb = 2 * dblk * hblk * W * Cout * 2            # bf16
            acc = m * Cout * 4                                # f32
            akw = Db * Hb * W * Cin                           # relayout copy
            wts = kd * kh * 3 * Cin * Cout                    # int8 + copies
            patch = m * kd * kh * kw * Cin if kstyle == "im2col" else 0
            if xbuf + outb + acc + akw + wts + patch > budget:
                continue
            score = min(m, 8192) - (Db * Hb * (W + 2)) / (dblk * hblk * W)
            if score > best_score:
                best_score = score
                best = (dblk, hblk)
    return best


def _conv_kernel(
    x_hbm, w_ref, scale_ref, bias_ref, out_ref, xbuf, sem, *,
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

    xb = xbuf[slot]  # (Db, Hb, W + pad, Cin) int8
    acc = jnp.zeros((dblk * hblk * W, Cout), jnp.int32)
    for kwi in range(kw):
        # one relayout per kw (sublane shift); kd/kh slices below are free
        akw = xb[:, :, kwi:kwi + W, :]
        for kdi in range(kd):
            for khi in range(kh):
                a = akw[kdi:kdi + dblk, khi:khi + hblk]
                a = a.reshape(dblk * hblk * W, Cin)
                acc = acc + jax.lax.dot_general(
                    a, w_ref[kdi, khi, kwi],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
    # fused dequantize + bias epilogue: s_x is folded into scale_ref
    out = acc.astype(jnp.float32) * scale_ref[:] + bias_ref[:]
    out_ref[:] = out.reshape(1, dblk, hblk, W, Cout).astype(out_dtype)


def _conv_kernel_im2col(
    x_hbm, w_ref, scale_ref, bias_ref, out_ref, xbuf, patch, sem, *,
    nD, nH, dblk, hblk, kd, kh, kw, W, Cin, Cout, nblocks, out_dtype,
):
    """im2col K-style: fill a (dblk, hblk, W, kw*kd*kh*Cin) VMEM patch
    with 27 aligned sub-block copies (3 sublane-shift relayouts for kw,
    then major-offset copies), then ONE (m, 27*Cin) x (27*Cin, Cout) s8
    matmul — the whole tap reduction accumulates INSIDE the MXU instead
    of as 26 VPU int32 adds between K=Cin matmuls (the measured 263 vs
    375 TOPS gap of the taps27 variant, round 5). ``w_ref`` is the
    (kw*kd*kh*Cin, Cout) flattened kernel in matching column order."""
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

    xb = xbuf[slot]  # (Db, Hb, W + pad, Cin) int8
    for kwi in range(kw):
        akw = xb[:, :, kwi:kwi + W, :]  # one relayout per kw shift
        for kdi in range(kd):
            for khi in range(kh):
                idx = (kwi * kd + kdi) * kh + khi
                patch[:, :, :, idx * Cin:(idx + 1) * Cin] = (
                    akw[kdi:kdi + dblk, khi:khi + hblk]
                )
    m = dblk * hblk * W
    acc = jax.lax.dot_general(
        patch[:].reshape(m, kd * kh * kw * Cin), w_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * scale_ref[:] + bias_ref[:]
    out_ref[:] = out.reshape(1, dblk, hblk, W, Cout).astype(out_dtype)


def conv3d_s8(
    xq: jnp.ndarray,
    kq: jnp.ndarray,
    scale: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    out_dtype=jnp.bfloat16,
    block_d: Optional[int] = None,
    block_h: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Stride-1 SAME s8 3-D conv (NDHWC x DHWIO) with fused dequantize.

    ``xq`` (B,D,H,W,Cin) int8, ``kq`` (kd,kh,kw,Cin,Cout) int8,
    ``scale`` (Cout,) f32 = s_x * s_w (the static activation scale folded
    into the per-output-channel weight scales at trace time), ``bias``
    (Cout,) f32 or None. Returns (B,D,H,W,Cout) ``out_dtype`` =
    dequantized conv + bias. Check :func:`conv3d_s8_applicable` first.
    """
    B, D, H, W, Cin = xq.shape
    kd, kh, kw, _, Cout = kq.shape
    assert xq.dtype == jnp.int8 and kq.dtype == jnp.int8

    # Pad D/H by the halo and W past kw//2 up to the int8 tile boundary
    # (32 sublanes): Mosaic requires DMA'd extents along the second-minor
    # dim to be tile-aligned. XLA fuses this pad with the producing
    # quantize into one elementwise pass.
    Wp = -(-(W + kw - 1) // _S8_SUBLANE) * _S8_SUBLANE
    xp = jnp.pad(
        xq,
        ((0, 0), (kd // 2, kd // 2), (kh // 2, kh // 2),
         (kw // 2, Wp - W - kw // 2), (0, 0)),
    )
    if bias is None:
        bias = jnp.zeros((Cout,), jnp.float32)
    scale2d = scale.reshape(1, Cout).astype(jnp.float32)
    bias2d = bias.reshape(1, Cout).astype(jnp.float32)

    kstyle = _kstyle()
    if block_d is None or block_h is None:
        picked = _pick_blocks(D, H, W, Cin, Cout, kd, kh, kw, kstyle)
        if picked is None and kstyle == "im2col":
            kstyle = "taps27"  # patch scratch doesn't fit; small-K path
            picked = _pick_blocks(D, H, W, Cin, Cout, kd, kh, kw, kstyle)
        assert picked is not None, "check conv3d_s8_applicable first"
        block_d, block_h = picked
    dblk, hblk = block_d, block_h
    nD, nH = D // dblk, H // hblk
    nblocks = B * nD * nH
    Db, Hb = dblk + kd - 1, hblk + kh - 1

    flops = 2 * kd * kh * kw * Cin * Cout * B * D * H * W
    bytes_acc = (
        xp.size
        + kq.size
        + B * D * H * W * Cout * jnp.dtype(out_dtype).itemsize
    )

    if kstyle == "im2col":
        # column order (kwi, kdi, khi) matches the kernel's fill loop
        wk = jnp.transpose(kq, (2, 0, 1, 3, 4)).reshape(
            kw * kd * kh * Cin, Cout
        )
        grid_kernel = functools.partial(
            _conv_kernel_im2col,
            nD=nD, nH=nH, dblk=dblk, hblk=hblk, kd=kd, kh=kh, kw=kw,
            W=W, Cin=Cin, Cout=Cout, nblocks=nblocks, out_dtype=out_dtype,
        )
        scratch = [
            pltpu.VMEM((2, Db, Hb, Wp, Cin), jnp.int8),
            pltpu.VMEM((dblk, hblk, W, kd * kh * kw * Cin), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        wk = kq
        grid_kernel = functools.partial(
            _conv_kernel,
            nD=nD, nH=nH, dblk=dblk, hblk=hblk, kd=kd, kh=kh, kw=kw,
            W=W, Cin=Cin, Cout=Cout, nblocks=nblocks, out_dtype=out_dtype,
        )
        scratch = [
            pltpu.VMEM((2, Db, Hb, Wp, Cin), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    return pl.pallas_call(
        grid_kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, dblk, hblk, W, Cout),
            lambda p: (p // (nD * nH), (p % (nD * nH)) // nH, p % nH, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, D, H, W, Cout), out_dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_acc, transcendentals=0
        ),
        interpret=interpret,
    )(xp, wk, scale2d, bias2d)
