"""Correctness of the fused normalize->conv->skip(+stats) Pallas kernel
against the composed XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm3d_tpu.models.nn import group_norm_f32
from ddpm3d_tpu.ops.conv3d import conv3d_decomposed
from ddpm3d_tpu.ops.conv3d_fused import conv3d_fused, conv3d_fused_applicable


def _data(B=1, D=4, H=4, W=16, Cin=128, Cout=128, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, D, H, W, Cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, Cin, Cout)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.normal(size=(Cout,)), jnp.float32)
    return x, w, b


def test_applicability():
    assert conv3d_fused_applicable((1, 4, 4, 16, 128), (3, 3, 3, 128, 128),
                                   jnp.float32)
    assert not conv3d_fused_applicable((1, 4, 4, 16, 64), (3, 3, 3, 64, 128),
                                       jnp.float32)
    assert not conv3d_fused_applicable((1, 4, 4, 15, 128), (3, 3, 3, 128, 128),
                                       jnp.float32)


def test_plain_conv_matches_decomposed():
    x, w, b = _data()
    got = conv3d_fused(x, w, b, interpret=True)
    ref = conv3d_decomposed(x, w) + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_prologue_matches_norm_then_conv():
    """silu(x*g+b) -> conv == the kernel's fused prologue, including
    zero-padding semantics (normalize BEFORE padding)."""
    x, w, b = _data(seed=1)
    B, Cin = x.shape[0], x.shape[-1]
    rng = np.random.default_rng(2)
    g = jnp.asarray(rng.normal(size=(B, Cin)) * 0.5 + 1.0, jnp.float32)
    beta = jnp.asarray(rng.normal(size=(B, Cin)) * 0.1, jnp.float32)

    got = conv3d_fused(x, w, b, prologue_g=g, prologue_b=beta,
                       prologue_silu=True, interpret=True)
    xn = x * g[:, None, None, None, :] + beta[:, None, None, None, :]
    xn = xn * jax.nn.sigmoid(xn)
    ref = conv3d_decomposed(xn, w) + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_skip_and_stats():
    x, w, b = _data(seed=3)
    B, D, H, W, _ = x.shape
    Cout = w.shape[-1]
    rng = np.random.default_rng(4)
    skip = jnp.asarray(rng.normal(size=(B, D, H, W, Cout)), jnp.float32)

    got, stats = conv3d_fused(x, w, b, skip=skip, want_stats=True,
                              interpret=True)
    ref = conv3d_decomposed(x, w) + b + skip
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
    rf = np.asarray(ref, np.float64)
    s1 = rf.sum(axis=(1, 2, 3))
    s2 = (rf ** 2).sum(axis=(1, 2, 3))
    np.testing.assert_allclose(np.asarray(stats)[:, 0], s1, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(stats)[:, 1], s2, rtol=1e-3)


def test_stats_feed_next_groupnorm():
    """The stats output folds into the next GroupNorm exactly: building the
    per-channel affine from (s1, s2) reproduces group_norm_f32."""
    x, w, b = _data(seed=5)
    out, stats = conv3d_fused(x, w, b, want_stats=True, interpret=True)
    B, D, H, W, C = out.shape
    n_spatial = D * H * W
    G = 32
    Cg = C // G
    scale = jnp.ones((C,), jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)

    # fold: per-group mean/var from the per-channel sums
    s1 = np.asarray(stats)[:, 0].reshape(B, G, Cg).sum(-1)
    s2 = np.asarray(stats)[:, 1].reshape(B, G, Cg).sum(-1)
    n = n_spatial * Cg
    mean = s1 / n
    var = np.maximum(s2 / n - mean ** 2, 0.0)
    rstd = 1.0 / np.sqrt(var + 1e-5)
    g_c = np.repeat(rstd, Cg, -1)
    b_c = -np.repeat(mean, Cg, -1) * g_c
    folded = np.asarray(out) * g_c[:, None, None, None, :] + \
        b_c[:, None, None, None, :]

    ref = group_norm_f32(out, scale, bias)
    np.testing.assert_allclose(folded, np.asarray(ref), atol=2e-3)


def test_batch2_prologue_per_sample():
    x, w, b = _data(B=2, seed=6)
    rng = np.random.default_rng(7)
    g = jnp.asarray(rng.normal(size=(2, 128)) * 0.3 + 1.0, jnp.float32)
    beta = jnp.asarray(rng.normal(size=(2, 128)) * 0.2, jnp.float32)
    got = conv3d_fused(x, w, b, prologue_g=g, prologue_b=beta,
                       interpret=True)
    xn = x * g[:, None, None, None, :] + beta[:, None, None, None, :]
    xn = xn * jax.nn.sigmoid(xn)
    ref = conv3d_decomposed(xn, w) + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_unet_fused_path_matches_normal(monkeypatch):
    """The whole-model fused inference path (DDPM3D_FUSED) is numerically
    equivalent to the standard path: same params, same output."""
    from ddpm3d_tpu.models import SuperResModel

    model = SuperResModel(
        in_channels=1, model_channels=128, out_channels=2, num_res_blocks=1,
        attention_resolutions=(), channel_mult=(1,), dims=3,
        use_scale_shift_norm=True, resblock_updown=True,
        middle_attention=False, dtype=jnp.float32,
    )
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(1, 4, 8, 16, 1)), jnp.float32)
    low = jnp.asarray(rng.normal(size=(1, 4, 8, 16, 1)), jnp.float32)
    t = jnp.asarray([3], jnp.int32)

    monkeypatch.setenv("DDPM3D_FUSED", "0")
    params = model.init(jax.random.key(0), x, t, low_res=low)
    ref = model.apply(params, x, t, low_res=low)

    monkeypatch.setenv("DDPM3D_FUSED", "interpret")
    # param trees must be identical between the two paths
    params2 = model.init(jax.random.key(0), x, t, low_res=low)
    p_paths = jax.tree_util.tree_structure(params)
    assert p_paths == jax.tree_util.tree_structure(params2)
    got = model.apply(params, x, t, low_res=low)

    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-3
    )


def test_unet_fused_two_levels(monkeypatch):
    """Fused path through a 2-level UNet: stats thread across same-level
    blocks, invalidate at up/down resampling, and concatenate with skip
    stats in the decoder."""
    from ddpm3d_tpu.models import SuperResModel

    model = SuperResModel(
        in_channels=1, model_channels=128, out_channels=2, num_res_blocks=1,
        attention_resolutions=(), channel_mult=(1, 1), dims=3,
        use_scale_shift_norm=True, resblock_updown=True,
        middle_attention=False, dtype=jnp.float32,
    )
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.normal(size=(1, 4, 16, 16, 1)), jnp.float32)
    low = jnp.asarray(rng.normal(size=(1, 4, 16, 16, 1)), jnp.float32)
    t = jnp.asarray([5], jnp.int32)

    monkeypatch.setenv("DDPM3D_FUSED", "0")
    params = model.init(jax.random.key(0), x, t, low_res=low)
    ref = model.apply(params, x, t, low_res=low)

    monkeypatch.setenv("DDPM3D_FUSED", "interpret")
    got = model.apply(params, x, t, low_res=low)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=5e-4, rtol=1e-3
    )
