"""Depth-decomposed 3-D convolution for the TPU MXU.

XLA:TPU lowers a native 3-D convolution at ~40% MXU utilisation at this
model's shapes; rewriting it as a sum over the depth taps of 2-D
convolutions with (B*D) folded into the batch reaches ~53% (measured on
v5e: 78 -> 104 TF/s at 96^3 x 128ch). Identity-equal math: for SAME depth
padding and depth stride 1 (the anisotropic pyramid never strides depth,
reference unet.py:129),

    y[:, d] = sum_kd conv2d(x[:, d + kd - pad], w[kd])

The parameter layout is identical to a native conv ((kd, kh, kw, in, out)),
so checkpoints are interchangeable between implementations.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as fnn


def conv3d_decomposed(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    strides: Tuple[int, int, int] = (1, 1, 1),
    padding: Optional[Sequence[Tuple[int, int]]] = None,
    preferred_dtype=None,
) -> jnp.ndarray:
    """NDHWC x DHWIO 3-D conv via kd-many 2-D convs. Depth stride must be 1."""
    B, D, H, W, C = x.shape
    kd, kh, kw = kernel.shape[:3]
    sd, sh, sw = strides
    assert sd == 1, "depth stride must be 1 (anisotropic pyramid)"
    if padding is None:
        padding = ((kd // 2, kd // 2), (kh // 2, kh // 2), (kw // 2, kw // 2))
    (pd_lo, pd_hi), pad_h, pad_w = padding

    xp = jnp.pad(x, ((0, 0), (pd_lo, pd_hi), (0, 0), (0, 0), (0, 0)))
    D_out = xp.shape[1] - kd + 1
    out = None
    for k in range(kd):
        xs = xp[:, k : k + D_out].reshape(B * D_out, H, W, C)
        y = jax.lax.conv_general_dilated(
            xs,
            kernel[k],
            window_strides=(sh, sw),
            padding=(pad_h, pad_w),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=preferred_dtype,
        )
        out = y if out is None else out + y
    Ho, Wo = out.shape[1], out.shape[2]
    return out.reshape(B, D_out, Ho, Wo, -1)


def _fold_impl_table() -> dict:
    """Per-spatial-size lowering overrides from ``DDPM3D_FOLD_TAILS``.

    Format: ``"6=im2col,12=native"`` — at H(=W)=6 use the all-tap im2col
    GEMM, at 12 the unfold->native-5D path; unlisted sizes use the default
    shifted-tap lowering. Read at trace time (once per compiled shape).
    """
    import os

    table = {}
    for part in os.environ.get("DDPM3D_FOLD_TAILS", "").split(","):
        if "=" in part:
            h, impl = part.split("=", 1)
            table[int(h)] = impl.strip().lower()
    return table


def _folded_native(x, kernel, batch, strides_hw, padding_hw, preferred_dtype):
    """Unfold [(B*D),H,W,C] -> [B,D,H,W,C], run the native 5-D conv, refold.

    Candidate for pyramid tails where the folded-axis GEMM tiling is poor;
    per-sample depth SAME padding makes the batch-boundary mask unneeded.
    """
    BD, H, W, C = x.shape
    kd = kernel.shape[0]
    pd = kd // 2
    x5 = x.reshape(batch, BD // batch, H, W, C)
    y = jax.lax.conv_general_dilated(
        x5,
        kernel,
        window_strides=(1, *strides_hw),
        padding=((pd, pd), *padding_hw),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=preferred_dtype,
    )
    return y.reshape(BD, y.shape[2], y.shape[3], -1)


def _folded_im2col(x, kernel, batch, preferred_dtype):
    """All kd*kh*kw taps concatenated on the channel axis, then ONE 1x1
    GEMM with the (kd*kh*kw*Cin, Cout)-reshaped kernel.

    For small spatial tails the per-tap conv2d GEMMs have tiny M/K tiles;
    a single GEMM with K = kd*kh*kw*Cin amortizes the MXU pipeline at the
    cost of a kd*kh*kw-times-larger activation read (only viable where the
    activation is small). Stride-1 SAME only.
    """
    BD, H, W, C = x.shape
    kd, kh, kw = kernel.shape[:3]
    D = BD // batch
    pd, ph, pw = kd // 2, kh // 2, kw // 2
    xp = jnp.pad(x, ((pd, pd), (ph, ph), (pw, pw), (0, 0)))
    cols = []
    for k in range(kd):
        delta = k - pd
        xs = jax.lax.slice_in_dim(xp, k, k + BD, axis=0)
        if batch > 1 and delta != 0:
            d_idx = np.arange(BD) % D
            valid = (d_idx + delta >= 0) & (d_idx + delta < D)
            xs = xs * jnp.asarray(valid, x.dtype).reshape(BD, 1, 1, 1)
        for i in range(kh):
            for j in range(kw):
                cols.append(xs[:, i : i + H, j : j + W, :])
    big = jnp.concatenate(cols, axis=-1)
    y = jax.lax.dot_general(
        big.reshape(BD * H * W, kd * kh * kw * C),
        kernel.reshape(kd * kh * kw * C, -1),
        (((1,), (0,)), ((), ())),
        preferred_element_type=preferred_dtype,
    )
    return y.reshape(BD, H, W, -1)


def conv3d_folded(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    batch: int,
    strides_hw: Tuple[int, int] = (1, 1),
    padding_hw: Optional[Sequence[Tuple[int, int]]] = None,
    preferred_dtype=None,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """Depth-decomposed conv on a B*D-FOLDED activation [(B*D), H, W, C].

    The network-wide folded layout keeps every activation 4-D end-to-end
    (measured: 5-D activations make XLA's layout assignment flip between
    (2,128) and (8,128) tilings for batch>1, inserting copies worth ~3x the
    step time). Depth taps become shifted row-slices of the folded axis;
    rows whose shift crosses a batch boundary are zeroed with a precomputed
    0/1 mask (a no-op multiply for batch==1, where the mask is all-ones
    except the chain ends which replicate SAME zero padding).

    ``impl`` (or the ``DDPM3D_FOLD_TAILS`` per-size table, or the global
    ``DDPM3D_FOLD_IMPL`` default) selects an alternative lowering for this
    shape: ``"native"`` (unfold -> 5-D conv), ``"im2col"`` (single GEMM
    over all kd*kh*kw taps; stride-1 SAME only), or ``"dconcat"`` (depth
    taps concatenated on the channel axis -> ONE conv2d with the
    (kh,kw,kd*C,Cout) kernel — same math, one MXU dispatch, no tensor
    adds between taps).
    """
    BD, H, W, C = x.shape
    kd, kh, kw = kernel.shape[:3]
    assert BD % batch == 0, (BD, batch)
    D = BD // batch
    same_hw = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    if padding_hw is None:
        padding_hw = same_hw
    pd = kd // 2

    if impl is None:
        import os

        default = os.environ.get("DDPM3D_FOLD_IMPL", "taps").lower()
        impl = _fold_impl_table().get(H if H == W else -1, default)
    if impl == "native":
        return _folded_native(
            x, kernel, batch, strides_hw, padding_hw, preferred_dtype
        )
    if (
        impl == "im2col"
        and strides_hw == (1, 1)
        and tuple(padding_hw) == same_hw
    ):
        return _folded_im2col(x, kernel, batch, preferred_dtype)

    xp = jnp.pad(x, ((pd, pd), (0, 0), (0, 0), (0, 0)))
    taps = []
    for k in range(kd):
        delta = k - pd
        xs = jax.lax.slice_in_dim(xp, k, k + BD, axis=0)
        if batch > 1 and delta != 0:
            # zero rows whose depth neighbor belongs to another batch
            d_idx = np.arange(BD) % D
            valid = (d_idx + delta >= 0) & (d_idx + delta < D)
            mask = jnp.asarray(valid, x.dtype).reshape(BD, 1, 1, 1)
            xs = xs * mask
        taps.append(xs)
    if impl == "dconcat":
        # depth taps as channel groups of ONE conv: (kd,kh,kw,C,Co) ->
        # (kh,kw,kd*C,Co) matching the concat order — a single MXU
        # dispatch, no tensor adds between taps (same math: the channel
        # contraction sums the taps)
        kcat = jnp.transpose(kernel, (1, 2, 0, 3, 4)).reshape(
            kh, kw, kd * C, -1
        )
        return jax.lax.conv_general_dilated(
            jnp.concatenate(taps, axis=-1),
            kcat,
            window_strides=strides_hw,
            padding=padding_hw,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=preferred_dtype,
        )
    out = None
    for k in range(kd):
        y = jax.lax.conv_general_dilated(
            taps[k],
            kernel[k],
            window_strides=strides_hw,
            padding=padding_hw,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=preferred_dtype,
        )
        out = y if out is None else out + y
    return out


class Conv3DFolded(fnn.Module):
    """3-D conv over B*D-folded 4-D activations; params identical to
    :class:`Conv3D` (kernel (kd,kh,kw,in,out) + bias), so checkpoints are
    interchangeable across all three lowerings.

    ``upsample=True`` computes ``conv(nearest_up2_HW(x))`` via the exact
    phase decomposition (ops/phase_up.py): 2.25x fewer MACs than
    materialising the upsampled input, measured 2.2x faster on v5e at the
    flagship's four up-transition shapes (tools/profile_phase_up.py)."""

    features: int
    batch: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    padding: Optional[Sequence[Tuple[int, int]]] = None
    use_bias: bool = True
    kernel_init: Any = fnn.initializers.lecun_normal()
    bias_init: Any = fnn.initializers.zeros
    dtype: Any = None
    param_dtype: Any = jnp.float32
    upsample: bool = False

    @fnn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert x.ndim == 4, "Conv3DFolded expects [(B*D), H, W, C]"
        kd, kh, kw = self.kernel_size
        sd, sh, sw = self.strides
        assert sd == 1, "depth stride must be 1 (anisotropic pyramid)"
        C = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (kd, kh, kw, C, self.features),
            self.param_dtype,
        )
        dtype = self.dtype or x.dtype
        bias = (
            self.param("bias", self.bias_init, (self.features,), self.param_dtype)
            if self.use_bias
            else None
        )
        pad = self.padding
        qmode = "off"
        act_scale = None
        from .quant import calib_enabled, int8_excluded, int8_mode

        if int8_mode() != "off" or calib_enabled():
            try:
                path = "/".join(str(p) for p in self.path)
            except Exception:  # unbound / interactive use
                path = self.name or ""
            if calib_enabled():
                # record this site's fp activation range (max over calls —
                # i.e. over chain steps when the driver reuses the mutable
                # collection); tools/calibrate_int8.py turns it into a
                # static scale. Quantization stays off: ranges must be
                # measured on the unquantized network.
                self.sow(
                    "quant_calib", "act_absmax",
                    jnp.max(jnp.abs(x.astype(jnp.float32))),
                    reduce_fn=jnp.maximum,
                    init_fn=lambda: jnp.float32(0.0),
                )
            elif not int8_excluded(path):
                qmode = int8_mode()
                if self.has_variable("quant_scales", "act_scale"):
                    # per-time-bin scale for this site at the current
                    # chain step, threaded by the sampler as a Flax
                    # collection (ops/quant.py:quant_scales_collection);
                    # a traced scalar — overrides the whole-chain value
                    act_scale = self.get_variable(
                        "quant_scales", "act_scale"
                    )
                else:
                    from .quant import static_scale_for

                    act_scale = static_scale_for(path)
        if self.upsample:
            assert (kh, kw) == (3, 3) and (sh, sw) == (1, 1), (
                "phase upsample-conv requires 3x3 HW stride 1"
            )
            if qmode != "off":
                from .quant import upsample_conv_folded_int8

                y = upsample_conv_folded_int8(
                    x.astype(dtype), kernel, self.batch,
                    sim=(qmode == "sim"), act_scale=act_scale,
                )
            else:
                from .phase_up import upsample_conv_folded

                y = upsample_conv_folded(
                    x.astype(dtype), kernel.astype(dtype), self.batch
                )
            if bias is not None:
                y = y + bias.astype(y.dtype)
            return y
        if qmode != "off":
            from .quant import conv3d_folded_int8, conv3d_folded_sim

            # bias threads INTO the quantized lowering: it is applied in
            # f32 on the dequantized accumulator (fused into the pallas
            # kernel's epilogue; one elementwise pass fewer than adding
            # it to the bf16 output here). sim mirrors for equivalence.
            if qmode == "sim":
                y = conv3d_folded_sim(
                    x.astype(dtype), kernel, self.batch,
                    strides_hw=(sh, sw),
                    padding_hw=None if pad is None else tuple(pad)[1:],
                    act_scale=act_scale,
                    bias=bias,
                )
            else:
                y = conv3d_folded_int8(
                    x.astype(dtype), kernel, self.batch,
                    strides_hw=(sh, sw),
                    padding_hw=None if pad is None else tuple(pad)[1:],
                    act_scale=act_scale,
                    path=path,
                    bias=bias,
                )
            return y
        y = conv3d_folded(
            x.astype(dtype), kernel.astype(dtype), self.batch,
            strides_hw=(sh, sw),
            padding_hw=None if pad is None else tuple(pad)[1:],
        )
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


class Conv3D(fnn.Module):
    """Drop-in 3-D conv module with the decomposed TPU lowering.

    Same param names/shapes as ``flax.linen.Conv`` with a (kd,kh,kw) kernel,
    so state dicts interoperate with the native path and the torch importer.
    """

    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    padding: Optional[Sequence[Tuple[int, int]]] = None
    use_bias: bool = True
    kernel_init: Any = fnn.initializers.lecun_normal()
    bias_init: Any = fnn.initializers.zeros
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kd, kh, kw = self.kernel_size
        C = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (kd, kh, kw, C, self.features),
            self.param_dtype,
        )
        dtype = self.dtype or x.dtype
        bias = (
            self.param("bias", self.bias_init, (self.features,), self.param_dtype)
            if self.use_bias
            else None
        )
        xd = x.astype(dtype)
        if self._use_mxu_kernel(xd, kernel, dtype):
            from .conv3d_mxu import conv3d_mxu

            return conv3d_mxu(xd, kernel.astype(dtype), bias)
        y = conv3d_decomposed(
            xd, kernel.astype(dtype), strides=self.strides, padding=self.padding
        )
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y

    def _use_mxu_kernel(self, x, kernel, dtype) -> bool:
        """Pallas implicit-GEMM path: only for stride-1 symmetric-k//2
        convs at MXU-aligned shapes, gated by DDPM3D_CONV3D=mxu."""
        import os

        if os.environ.get("DDPM3D_CONV3D", "auto").lower() != "mxu":
            return False
        # compiled Pallas needs a real TPU; CPU-pinned traces (e.g. init
        # under jax.default_device(cpu)) take the decomposed path, which
        # creates identical params.
        try:
            if jax.default_backend() != "tpu":
                return False
            dev = jax.config.jax_default_device
            if dev is not None and getattr(dev, "platform", "tpu") != "tpu":
                return False
        except Exception:  # pragma: no cover
            return False
        if self.padding is not None and tuple(self.padding) != tuple(
            (k // 2, k // 2) for k in self.kernel_size
        ):
            return False
        from .conv3d_mxu import conv3d_mxu_applicable

        return conv3d_mxu_applicable(
            x.shape, kernel.shape, tuple(self.strides), dtype
        )
