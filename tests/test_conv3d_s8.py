"""Tests for the implicit-GEMM s8 Pallas conv kernel (ops/conv3d_s8.py).

Run in interpret mode on the CPU test mesh; the integer accumulation is
platform-independent, so interpret-mode equality against an int32 XLA
reference pins the same values the MXU produces on TPU (the same
strategy that validated ops/conv3d_mxu.py). Integration equality with
the XLA ``concat`` lowering is exact: all lowerings sum identical int32
products and share the f32 dequantize+bias epilogue.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm3d_tpu.ops.conv3d_s8 import (
    conv3d_s8,
    conv3d_s8_applicable,
    conv3d_s8_mode,
)
from ddpm3d_tpu.ops.quant import conv3d_folded_int8

jax.config.update("jax_enable_x64", False)


def _rand_s8(key, shape):
    return jax.random.randint(key, shape, -127, 128, jnp.int32).astype(
        jnp.int8
    )


def _ref_conv_s8(xq, kq, scale, bias, out_dtype):
    """int32 XLA reference: NDHWC SAME conv + f32 epilogue."""
    kd, kh, kw = kq.shape[:3]
    out = jax.lax.conv_general_dilated(
        xq, kq,
        window_strides=(1, 1, 1),
        padding=((kd // 2, kd // 2), (kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.int32,
    )
    y = out.astype(jnp.float32) * scale.reshape(1, 1, 1, 1, -1)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


class TestApplicability:
    def test_flagship_full_res_sites_qualify(self):
        # 96^3 @ 128ch and the 256->128 decoder skip-concat site
        assert conv3d_s8_applicable(
            (1, 96, 96, 96, 128), (3, 3, 3, 128, 128), (1, 1, 1))
        assert conv3d_s8_applicable(
            (1, 96, 96, 96, 256), (3, 3, 3, 256, 128), (1, 1, 1))

    def test_rejections(self):
        ok = ((1, 8, 8, 32, 128), (3, 3, 3, 128, 128), (1, 1, 1))
        assert conv3d_s8_applicable(*ok)
        # stride-2 downsample
        assert not conv3d_s8_applicable(ok[0], ok[1], (1, 2, 2))
        # 48^2 level: W % 32 != 0
        assert not conv3d_s8_applicable(
            (1, 96, 48, 48, 128), ok[1], (1, 1, 1))
        # narrow channels (I/O convs), 1x1x1 skip matmuls
        assert not conv3d_s8_applicable(
            (1, 8, 8, 32, 2), (3, 3, 3, 2, 128), (1, 1, 1))
        assert not conv3d_s8_applicable(
            ok[0], (1, 1, 1, 128, 128), (1, 1, 1))

    def test_mode_covers_every_flagship_level(self):
        """The (1,2,2) pyramid keeps D=96 at every level, so the rotated
        layout qualifies all stride-1 3x3x3 sites that fit VMEM."""
        k3 = (3, 3, 3)
        s1 = (1, 1, 1)
        assert conv3d_s8_mode(
            (1, 96, 96, 96, 128), k3 + (128, 128), s1) == "direct"
        assert conv3d_s8_mode(
            (1, 96, 48, 48, 128), k3 + (128, 128), s1) == "transpose"
        assert conv3d_s8_mode(
            (1, 96, 24, 24, 256), k3 + (256, 256), s1) == "transpose"
        assert conv3d_s8_mode(
            (1, 96, 12, 12, 384), k3 + (384, 384), s1) == "transpose"
        # strided downsamples and huge-channel middles fall back to XLA
        assert conv3d_s8_mode(
            (1, 96, 48, 48, 128), k3 + (128, 128), (1, 2, 2)) is None
        assert conv3d_s8_mode(
            (1, 96, 6, 6, 1024), k3 + (1024, 512), s1) is None


class TestKernelExact:
    @pytest.mark.parametrize("B,D,H,W,Cin,Cout", [
        (1, 4, 4, 32, 128, 128),
        (1, 6, 8, 32, 256, 128),
        (2, 4, 4, 32, 128, 256),
    ])
    def test_matches_int32_reference(self, B, D, H, W, Cin, Cout):
        """int32 accumulation + scale are bit-exact vs the XLA int32
        conv; with bias the kernel's in-register epilogue may contract
        mul+add into one FMA (a single rounding — tighter than the
        reference's two), so the bias case pins <= 1 ulp."""
        k1, k2, k3, k4 = jax.random.split(jax.random.key(0), 4)
        xq = _rand_s8(k1, (B, D, H, W, Cin))
        kq = _rand_s8(k2, (3, 3, 3, Cin, Cout))
        scale = jax.random.uniform(k3, (Cout,), jnp.float32, 1e-4, 1e-2)
        bias = jax.random.normal(k4, (Cout,), jnp.float32)
        out = conv3d_s8(xq, kq, scale, None, out_dtype=jnp.float32,
                        interpret=True)
        ref = _ref_conv_s8(xq, kq, scale, None, jnp.float32)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        out_b = conv3d_s8(xq, kq, scale, bias, out_dtype=jnp.float32,
                          interpret=True)
        ref_b = _ref_conv_s8(xq, kq, scale, bias, jnp.float32)
        np.testing.assert_allclose(np.asarray(out_b), np.asarray(ref_b),
                                   rtol=5e-6, atol=1e-4)

    def test_bf16_output_and_no_bias(self):
        k1, k2 = jax.random.split(jax.random.key(1))
        xq = _rand_s8(k1, (1, 4, 4, 32, 128))
        kq = _rand_s8(k2, (3, 3, 3, 128, 128))
        scale = jnp.full((128,), 3e-4, jnp.float32)
        out = conv3d_s8(xq, kq, scale, None, out_dtype=jnp.bfloat16,
                        interpret=True)
        ref = _ref_conv_s8(xq, kq, scale, None, jnp.bfloat16)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_explicit_blocks(self):
        """Forced small blocks exercise the multi-block DMA pipeline."""
        k1, k2 = jax.random.split(jax.random.key(2))
        xq = _rand_s8(k1, (1, 6, 6, 32, 128))
        kq = _rand_s8(k2, (3, 3, 3, 128, 128))
        scale = jnp.full((128,), 1e-3, jnp.float32)
        out = conv3d_s8(xq, kq, scale, None, out_dtype=jnp.float32,
                        block_d=2, block_h=3, interpret=True)
        ref = _ref_conv_s8(xq, kq, scale, None, jnp.float32)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


class TestFoldedIntegration:
    """conv3d_folded_int8 under DDPM3D_INT8_IMPL=pallas."""

    def _xk(self, key, batch, D, H, W, C, Co):
        kx, kk = jax.random.split(key)
        x = jax.random.normal(kx, (batch * D, H, W, C), jnp.float32)
        k = jax.random.normal(kk, (3, 3, 3, C, Co), jnp.float32) * 0.1
        return x, k

    @pytest.mark.parametrize("batch", [1, 2])
    @pytest.mark.parametrize("static", [True, False])
    def test_bit_identical_to_concat(self, batch, static, monkeypatch):
        """The pallas lowering is bit-identical to concat: same int32
        products, same f32 epilogue (dynamic scales only at batch 1 —
        per-sample scales can't fold into the per-channel vector)."""
        if not static and batch > 1:
            pytest.skip("dynamic per-sample scales: pallas falls back")
        x, k = self._xk(jax.random.key(3), batch, 4, 4, 32, 128, 128)
        act = 0.01 if static else None
        monkeypatch.setenv("DDPM3D_INT8_IMPL", "pallas")
        out = conv3d_folded_int8(x, k, batch, act_scale=act)
        monkeypatch.setenv("DDPM3D_INT8_IMPL", "concat")
        ref = conv3d_folded_int8(x, k, batch, act_scale=act)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_bias_matches_across_lowerings(self, monkeypatch):
        """bias applies in f32 pre-cast in every lowering. The XLA
        lowerings are bit-identical to each other; the pallas epilogue
        may FMA-contract the mul+add (one rounding instead of two), so
        pallas-vs-XLA pins <= 1 ulp."""
        x, k = self._xk(jax.random.key(4), 1, 4, 4, 32, 128, 128)
        bias = jax.random.normal(jax.random.key(5), (128,), jnp.float32)
        outs = {}
        for impl in ("pallas", "concat", "taps", "native"):
            monkeypatch.setenv("DDPM3D_INT8_IMPL", impl)
            outs[impl] = np.asarray(
                conv3d_folded_int8(x, k, 1, act_scale=0.01, bias=bias)
            )
        for impl in ("taps", "native"):
            np.testing.assert_array_equal(outs["concat"], outs[impl])
        np.testing.assert_allclose(outs["pallas"], outs["concat"],
                                   rtol=5e-6, atol=1e-5)

    def test_transpose_mode_bit_identical(self, monkeypatch):
        """A narrow-W, deep-D site (the 48/24/12-wide levels) routes
        through the rotated layout and stays bit-identical to concat."""
        x, k = self._xk(jax.random.key(8), 1, 32, 12, 12, 128, 128)
        assert conv3d_s8_mode(
            (1, 32, 12, 12, 128), (3, 3, 3, 128, 128), (1, 1, 1)
        ) == "transpose"
        monkeypatch.setenv("DDPM3D_INT8_IMPL", "pallas")
        out = conv3d_folded_int8(x, k, 1, act_scale=0.01)
        monkeypatch.setenv("DDPM3D_INT8_IMPL", "concat")
        ref = conv3d_folded_int8(x, k, 1, act_scale=0.01)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_inapplicable_site_falls_back(self, monkeypatch):
        """W=24 (not a 32-multiple) under impl=pallas falls back to
        concat rather than erroring — per-site applicability."""
        x, k = self._xk(jax.random.key(6), 1, 4, 4, 24, 128, 128)
        monkeypatch.setenv("DDPM3D_INT8_IMPL", "pallas")
        out = conv3d_folded_int8(x, k, 1, act_scale=0.01)
        monkeypatch.setenv("DDPM3D_INT8_IMPL", "concat")
        ref = conv3d_folded_int8(x, k, 1, act_scale=0.01)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_strided_falls_back(self, monkeypatch):
        x, k = self._xk(jax.random.key(7), 1, 4, 8, 32, 128, 128)
        monkeypatch.setenv("DDPM3D_INT8_IMPL", "pallas")
        out = conv3d_folded_int8(x, k, 1, strides_hw=(2, 2),
                                 act_scale=0.01)
        monkeypatch.setenv("DDPM3D_INT8_IMPL", "concat")
        ref = conv3d_folded_int8(x, k, 1, strides_hw=(2, 2),
                                 act_scale=0.01)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_pallas_sites_env(self, monkeypatch):
        from ddpm3d_tpu.ops.quant import int8_impl_for

        monkeypatch.delenv("DDPM3D_INT8_IMPL", raising=False)
        monkeypatch.setenv("DDPM3D_INT8_PALLAS_SITES", "in1_0/in_conv")
        monkeypatch.setenv("DDPM3D_INT8_TAPS_SITES", "in1_0,out13_0")
        # pallas sites take precedence over taps sites; native beats both
        assert int8_impl_for("unet/in1_0/in_conv") == "pallas"
        assert int8_impl_for("unet/out13_0/in_conv") == "taps"
        assert int8_impl_for("unet/out12_0/in_conv") == "concat"
        monkeypatch.setenv("DDPM3D_INT8_NATIVE_SITES", "in1_0/in_conv")
        assert int8_impl_for("unet/in1_0/in_conv") == "native"
