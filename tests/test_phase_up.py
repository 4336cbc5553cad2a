"""Phase-decomposed upsample-conv (ops/phase_up.py): exact equivalence
with the materialised nearest-up2 + conv path, at the op level and through
the model's up-transition ResBlocks / Upsample modules (DDPM3D_PHASE_UP).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm3d_tpu.models import UNetModel
from ddpm3d_tpu.models.unet import ResBlock, Upsample
from ddpm3d_tpu.ops.conv3d import conv3d_folded
from ddpm3d_tpu.ops.phase_up import phase_up_kernels, upsample_conv_folded


def _ref_upconv(x, w, batch):
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return conv3d_folded(up, w, batch=batch)


@pytest.mark.parametrize("batch", [1, 2])
def test_upsample_conv_folded_matches_materialized(rng, batch):
    x = jnp.asarray(rng.normal(size=(batch * 5, 6, 7, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 8, 4)) * 0.1, jnp.float32)
    ref = np.asarray(_ref_upconv(x, w, batch))
    got = np.asarray(upsample_conv_folded(x, w, batch))
    assert got.shape == (batch * 5, 12, 14, 4)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_phase_kernels_shapes(rng):
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 4, 6)), jnp.float32)
    ks = phase_up_kernels(w)
    assert set(ks) == {(0, 0), (0, 1), (1, 0), (1, 1)}
    for k in ks.values():
        assert k.shape == (3, 2, 2, 4, 6)
    # tap sums: K_00[:,0,0] = w[:,0,0]; K_00[:,1,1] = sum of w rows/cols 1,2
    np.testing.assert_allclose(
        np.asarray(ks[(0, 0)][:, 0, 0]), np.asarray(w[:, 0, 0]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ks[(1, 1)][:, 1, 1]), np.asarray(w[:, 2, 2]), rtol=1e-6)


@pytest.mark.parametrize("use_conv_skip", [False, True])
def test_resblock_up_phase_matches_materialized(rng, monkeypatch,
                                                use_conv_skip):
    """ResBlock(up=True) on the folded layout: DDPM3D_PHASE_UP on/off give
    the same output from the same params (in_ch != out_ch exercises the
    commuted 1x1 / phase 3x3 skip paths)."""
    B, D, H, C_in, C_out = 2, 3, 8, 64, 32
    x = jnp.asarray(rng.normal(size=(B * D, H, H, C_in)), jnp.float32)
    emb = jnp.asarray(rng.normal(size=(B, 16)), jnp.float32)

    def build():
        return ResBlock(
            out_ch=C_out, use_scale_shift_norm=True, up=True,
            use_conv_skip=use_conv_skip, fold_batch=B,
        )

    monkeypatch.setenv("DDPM3D_PHASE_UP", "0")
    params = build().init(jax.random.key(0), x, emb)
    ref = np.asarray(build().apply(params, x, emb))
    monkeypatch.setenv("DDPM3D_PHASE_UP", "1")
    params_p = build().init(jax.random.key(0), x, emb)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        params, params_p,
    )
    got = np.asarray(build().apply(params, x, emb))
    assert got.shape == (B * D, 2 * H, 2 * H, C_out)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_upsample_module_phase_matches(rng, monkeypatch):
    x = jnp.asarray(rng.normal(size=(6, 5, 5, 4)), jnp.float32)

    def build():
        return Upsample(4, use_conv=True, fold_batch=2)

    monkeypatch.setenv("DDPM3D_PHASE_UP", "0")
    params = build().init(jax.random.key(0), x)
    ref = np.asarray(build().apply(params, x))
    monkeypatch.setenv("DDPM3D_PHASE_UP", "1")
    got = np.asarray(build().apply(params, x))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("resblock_updown", [True, False])
def test_unet_phase_up_matches(rng, monkeypatch, resblock_updown):
    """Whole-model forward: phase-up on/off equivalence on the folded
    layout, covering both the up-ResBlock and the plain Upsample wiring."""
    model = UNetModel(
        in_channels=1, model_channels=32, out_channels=2, num_res_blocks=1,
        attention_resolutions=(), channel_mult=(1, 2), dims=3,
        use_scale_shift_norm=True, resblock_updown=resblock_updown,
    )
    x = jnp.asarray(rng.normal(size=(2, 4, 16, 16, 1)), jnp.float32)
    t = jnp.array([2, 9], jnp.int32)
    monkeypatch.setenv("DDPM3D_PHASE_UP", "0")
    params = model.init(jax.random.key(0), x, t)
    ref = np.asarray(model.apply(params, x, t))
    monkeypatch.setenv("DDPM3D_PHASE_UP", "1")
    got = np.asarray(model.apply(params, x, t))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_unet_phase_up_gradients_match(rng, monkeypatch):
    model = UNetModel(
        in_channels=1, model_channels=32, out_channels=1, num_res_blocks=1,
        attention_resolutions=(), channel_mult=(1, 2), dims=3,
        use_scale_shift_norm=True, resblock_updown=True, use_checkpoint=True,
    )
    x = jnp.asarray(rng.normal(size=(1, 4, 8, 8, 1)), jnp.float32)
    t = jnp.array([3], jnp.int32)
    monkeypatch.setenv("DDPM3D_PHASE_UP", "0")
    params = model.init(jax.random.key(0), x, t)

    def loss(p):
        return jnp.sum(model.apply(p, x, t) ** 2)

    g_ref = jax.grad(loss)(params)
    monkeypatch.setenv("DDPM3D_PHASE_UP", "1")
    g_got = jax.grad(loss)(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4),
        g_ref, g_got,
    )
