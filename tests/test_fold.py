"""Network-wide B*D-folded activation layout: bit-level equivalence with
the 5-D path (same params, same outputs) across batch sizes, updown
resampling, FiLM modes, and attention."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm3d_tpu.models import SuperResModel, UNetModel
from ddpm3d_tpu.ops.conv3d import conv3d_decomposed, conv3d_folded


def _run_both(model, init_args, apply_args, monkeypatch):
    monkeypatch.setenv("DDPM3D_FOLD", "0")
    params = model.init(jax.random.key(0), *init_args)
    out_5d = model.apply(params, *apply_args)
    monkeypatch.setenv("DDPM3D_FOLD", "1")
    params_f = model.init(jax.random.key(0), *init_args)
    # param trees must be identical across layouts (checkpoint compat)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, params_f,
    )
    out_4d = model.apply(params, *apply_args)
    return np.asarray(out_5d), np.asarray(out_4d)


@pytest.mark.parametrize("batch", [1, 3])
def test_conv3d_folded_matches_decomposed(rng, batch):
    x = jnp.asarray(rng.normal(size=(batch, 5, 8, 8, 4)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 4, 6)) * 0.1, jnp.float32)
    ref = conv3d_decomposed(x, k)
    got = conv3d_folded(
        x.reshape(batch * 5, 8, 8, 4), k, batch
    ).reshape(batch, 5, 8, 8, 6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_conv3d_folded_strided(rng):
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 8, 4)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 4, 6)) * 0.1, jnp.float32)
    ref = conv3d_decomposed(x, k, strides=(1, 2, 2))
    got = conv3d_folded(
        x.reshape(8, 8, 8, 4), k, 2, strides_hw=(2, 2)
    ).reshape(2, 4, 4, 4, 6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("batch", [1, 2])
@pytest.mark.parametrize("scale_shift", [True, False])
def test_unet_folded_equals_5d(rng, monkeypatch, batch, scale_shift):
    model = UNetModel(
        in_channels=1, model_channels=32, out_channels=2, num_res_blocks=1,
        attention_resolutions=(), channel_mult=(1, 2), dims=3,
        use_scale_shift_norm=scale_shift, resblock_updown=True,
    )
    x = jnp.asarray(rng.normal(size=(batch, 4, 16, 16, 1)), jnp.float32)
    t = jnp.arange(batch, dtype=jnp.int32) + 2
    o5, o4 = _run_both(model, (x, t), (x, t), monkeypatch)
    assert o4.shape == o5.shape == (batch, 4, 16, 16, 2)
    np.testing.assert_allclose(o4, o5, rtol=2e-4, atol=2e-4)


def test_unet_folded_with_attention(rng, monkeypatch):
    model = UNetModel(
        in_channels=1, model_channels=32, out_channels=1, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), dims=3,
        num_head_channels=16, middle_attention=True,
        use_scale_shift_norm=True,
    )
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 8, 1)), jnp.float32)
    t = jnp.array([1, 5], jnp.int32)
    o5, o4 = _run_both(model, (x, t), (x, t), monkeypatch)
    np.testing.assert_allclose(o4, o5, rtol=2e-4, atol=2e-4)


def test_superres_folded_equals_5d(rng, monkeypatch):
    model = SuperResModel(
        in_channels=1, model_channels=32, out_channels=2, num_res_blocks=1,
        attention_resolutions=(), channel_mult=(1, 1, 2), dims=3,
        use_scale_shift_norm=True, resblock_updown=True,
        middle_attention=False,
    )
    x = jnp.asarray(rng.normal(size=(2, 4, 16, 16, 1)), jnp.float32)
    low = jnp.asarray(rng.normal(size=(2, 4, 16, 16, 1)), jnp.float32)
    t = jnp.array([3, 7], jnp.int32)

    def apply(m, p):
        return m.apply(p, x, t, low_res=low)

    monkeypatch.setenv("DDPM3D_FOLD", "0")
    params = model.init(jax.random.key(0), x, t, low_res=low)
    o5 = np.asarray(apply(model, params))
    monkeypatch.setenv("DDPM3D_FOLD", "1")
    o4 = np.asarray(apply(model, params))
    np.testing.assert_allclose(o4, o5, rtol=2e-4, atol=2e-4)


def test_folded_gradients_match(rng, monkeypatch):
    """Training path: gradients through the folded layout match the 5-D
    layout (remat'd ResBlocks included)."""
    model = UNetModel(
        in_channels=1, model_channels=32, out_channels=1, num_res_blocks=1,
        attention_resolutions=(), channel_mult=(1, 2), dims=3,
        use_scale_shift_norm=True, use_checkpoint=True,
    )
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 8, 1)), jnp.float32)
    t = jnp.array([1, 5], jnp.int32)
    monkeypatch.setenv("DDPM3D_FOLD", "0")
    params = model.init(jax.random.key(0), x, t)

    def loss(p):
        return jnp.sum(model.apply(p, x, t) ** 2)

    g5 = jax.grad(loss)(params)
    monkeypatch.setenv("DDPM3D_FOLD", "1")
    g4 = jax.grad(loss)(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4
        ),
        g5, g4,
    )


def test_resolution_aware_remat_equivalence(rng, monkeypatch):
    """DDPM3D_REMAT_DS selects WHICH blocks rematerialize — outputs and
    gradients must be identical for any threshold (remat is exact)."""
    from ddpm3d_tpu.models import UNetModel

    model = UNetModel(
        in_channels=1, model_channels=32, out_channels=1, num_res_blocks=1,
        attention_resolutions=(), channel_mult=(1, 2, 4), dims=3,
        use_scale_shift_norm=True, resblock_updown=True, use_checkpoint=True,
    )
    x = jnp.asarray(rng.normal(size=(1, 4, 16, 16, 1)), jnp.float32)
    t = jnp.array([3], jnp.int32)
    params = model.init(jax.random.key(0), x, t)

    def loss(p):
        return jnp.sum(model.apply(p, x, t) ** 2)

    outs = {}
    for thresh in ("1", "1000000"):
        monkeypatch.setenv("DDPM3D_REMAT_DS", thresh)
        outs[thresh] = (model.apply(params, x, t), jax.grad(loss)(params))
    np.testing.assert_array_equal(
        np.asarray(outs["1"][0]), np.asarray(outs["1000000"][0])
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        outs["1"][1], outs["1000000"][1],
    )


@pytest.mark.parametrize("impl", ["native", "im2col", "dconcat"])
@pytest.mark.parametrize("batch", [1, 3])
def test_fold_tail_impls_match_taps(rng, impl, batch):
    x = jnp.asarray(rng.normal(size=(batch * 5, 8, 8, 4)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 4, 6)) * 0.1, jnp.float32)
    ref = conv3d_folded(x, k, batch, impl="taps")
    got = conv3d_folded(x, k, batch, impl=impl)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("impl", ["native", "dconcat"])
def test_fold_tail_impl_strided(rng, impl):
    x = jnp.asarray(rng.normal(size=(8, 8, 8, 4)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 4, 6)) * 0.1, jnp.float32)
    ref = conv3d_folded(x, k, 2, strides_hw=(2, 2), impl="taps")
    got = conv3d_folded(x, k, 2, strides_hw=(2, 2), impl=impl)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fold_tails_env_dispatch(rng, monkeypatch):
    """DDPM3D_FOLD_TAILS selects impls per spatial size; outputs unchanged;
    im2col silently falls back to taps for strided convs."""
    monkeypatch.setenv("DDPM3D_FOLD_TAILS", "8=im2col,4=native")
    x = jnp.asarray(rng.normal(size=(10, 8, 8, 4)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 4, 6)) * 0.1, jnp.float32)
    ref = conv3d_folded(x, k, 2, impl="taps")
    np.testing.assert_allclose(
        np.asarray(conv3d_folded(x, k, 2)), np.asarray(ref),
        rtol=1e-5, atol=1e-5,
    )
    ref_s = conv3d_folded(x, k, 2, strides_hw=(2, 2), impl="taps")
    np.testing.assert_allclose(
        np.asarray(conv3d_folded(x, k, 2, strides_hw=(2, 2))),
        np.asarray(ref_s), rtol=1e-5, atol=1e-5,
    )


@pytest.mark.parametrize("fusion", ["add", "cat_conv", "midcat"])
def test_seg_folded_equals_5d(rng, monkeypatch, fusion):
    """The Seg family folds both branches (round 4: previously it ran the
    5-D path only, which silently bypassed the int8 serving gate)."""
    from ddpm3d_tpu.models.seg import SegUNetModel

    model = SegUNetModel(
        in_channels=1, cond_channels=1, model_channels=32, out_channels=2,
        num_res_blocks=1, attention_resolutions=(), channel_mult=(1, 2),
        dims=3, use_scale_shift_norm=True, resblock_updown=True,
        fusion=fusion,
    )
    x = jnp.asarray(rng.normal(size=(2, 4, 16, 16, 1)), jnp.float32)
    low = jnp.asarray(rng.normal(size=(2, 4, 16, 16, 1)), jnp.float32)
    t = jnp.array([3, 7], jnp.int32)
    monkeypatch.setenv("DDPM3D_FOLD", "0")
    params = model.init(jax.random.key(0), x, t, low_res=low)
    o5 = np.asarray(model.apply(params, x, t, low_res=low))
    monkeypatch.setenv("DDPM3D_FOLD", "1")
    params_f = model.init(jax.random.key(0), x, t, low_res=low)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, params_f,
    )
    o4 = np.asarray(model.apply(params, x, t, low_res=low))
    assert o4.shape == o5.shape == (2, 4, 16, 16, 2)
    np.testing.assert_allclose(o4, o5, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("pool", ["adaptive", "spatial", "spatial_v2"])
def test_encoder_folded_equals_5d(rng, monkeypatch, pool):
    from ddpm3d_tpu.models import EncoderUNetModel

    model = EncoderUNetModel(
        in_channels=1, model_channels=32, out_channels=6, num_res_blocks=1,
        attention_resolutions=(), channel_mult=(1, 2), dims=3,
        use_scale_shift_norm=True, resblock_updown=True, pool=pool,
    )
    x = jnp.asarray(rng.normal(size=(2, 4, 16, 16, 1)), jnp.float32)
    t = jnp.array([3, 7], jnp.int32)
    monkeypatch.setenv("DDPM3D_FOLD", "0")
    params = model.init(jax.random.key(0), x, t)
    o5 = np.asarray(model.apply(params, x, t))
    monkeypatch.setenv("DDPM3D_FOLD", "1")
    params_f = model.init(jax.random.key(0), x, t)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, params_f,
    )
    o4 = np.asarray(model.apply(params, x, t))
    assert o4.shape == o5.shape
    np.testing.assert_allclose(o4, o5, rtol=2e-4, atol=2e-4)


def test_encoder_folded_features_are_5d(rng, monkeypatch):
    """return_features keeps the public 5-D layout under the fold."""
    from ddpm3d_tpu.models import EncoderUNetModel

    model = EncoderUNetModel(
        in_channels=1, model_channels=32, out_channels=3, num_res_blocks=1,
        attention_resolutions=(), channel_mult=(1, 2), dims=3,
        include_middle=False,
    )
    x = jnp.asarray(rng.normal(size=(2, 4, 16, 16, 1)), jnp.float32)
    t = jnp.array([3, 7], jnp.int32)
    monkeypatch.setenv("DDPM3D_FOLD", "1")
    params = model.init(jax.random.key(0), x, t)
    feats, final = model.apply(params, x, t, return_features=True)
    for f in feats:
        assert f.ndim == 5 and f.shape[0] == 2 and f.shape[1] == 4, f.shape
    assert final.ndim == 5 and final.shape[:2] == (2, 4)
