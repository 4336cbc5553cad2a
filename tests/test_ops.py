"""Tests for the Pallas fused ops (fallback path on CPU; the kernel path is
exercised on TPU by bench/integration)."""

import jax
import jax.numpy as jnp
import numpy as np

from ddpm3d_tpu.models.nn import group_norm_f32
from ddpm3d_tpu.ops import fused_group_norm_silu, reference_group_norm_silu


def test_reference_gn_matches_model_primitive(rng):
    """ops.reference_group_norm_silu (no FiLM, no SiLU) must equal the
    model-layer group_norm_f32 on flattened input."""
    B, D, H, W, C = 2, 3, 4, 4, 64
    x = jnp.asarray(rng.normal(size=(B, D, H, W, C)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
    a = group_norm_f32(x, scale, bias, num_groups=32)
    b = reference_group_norm_silu(
        x.reshape(B, -1, C), scale, bias, apply_silu=False, num_groups=32
    ).reshape(x.shape)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_fused_gn_silu_fallback_film(rng):
    """FiLM + SiLU fusion must equal the hand-computed chain."""
    B, N, C = 2, 128, 64
    x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
    fs = jnp.asarray(rng.normal(size=(B, C)) * 0.1, jnp.float32)
    fb = jnp.asarray(rng.normal(size=(B, C)) * 0.1, jnp.float32)

    out = fused_group_norm_silu(x, scale, bias, fs, fb, num_groups=32)

    gn = reference_group_norm_silu(
        x, scale, bias, apply_silu=False, num_groups=32
    )
    h = gn * (1.0 + fs[:, None, :]) + fb[:, None, :]
    expect = h * jax.nn.sigmoid(h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-5, atol=1e-6)


def test_fused_gn_silu_bf16_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(1, 64, 64)), jnp.bfloat16)
    scale = jnp.ones((64,), jnp.float32)
    bias = jnp.zeros((64,), jnp.float32)
    out = fused_group_norm_silu(x, scale, bias, num_groups=32)
    assert out.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out, np.float32)).all()
