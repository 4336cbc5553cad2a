"""Construct-and-run coverage for the reference by-name class aliases
(reference guided_diffusion/unet.py:1327, 1752, 1916, 2199, 2371)."""

import jax
import jax.numpy as jnp
import numpy as np

from ddpm3d_tpu.models import (
    EncoderUNetModelv2,
    EncoderUNetModelv3,
    SegModelv2_6c,
    SegModelv3_6c,
    UNetModel,
    UNetModelv2,
)

UNET_KW = dict(
    in_channels=1,
    model_channels=32,
    out_channels=2,
    num_res_blocks=1,
    attention_resolutions=(),
    channel_mult=(1, 2),
    dims=3,
    use_scale_shift_norm=True,
    resblock_updown=True,
)


def test_unetmodelv2_is_canonical_unet():
    """UNetModelv2's middle wiring resolves to the generic plan
    (reference unet.py:1474-1483): identical params and outputs."""
    m1 = UNetModelv2(**UNET_KW)
    m2 = UNetModel(**UNET_KW)
    x = jnp.ones((1, 4, 16, 16, 1))
    t = jnp.array([3])
    p1 = m1.init(jax.random.key(0), x, t)
    p2 = m2.init(jax.random.key(0), x, t)
    chex_eq = jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: bool((a == b).all()), p1, p2)
    )
    assert chex_eq
    np.testing.assert_array_equal(
        np.asarray(m1.apply(p1, x, t)), np.asarray(m2.apply(p2, x, t))
    )


def test_encoder_v2_features_and_final():
    enc = EncoderUNetModelv2(
        in_channels=1, model_channels=32, out_channels=3,
        num_res_blocks=1, attention_resolutions=(), channel_mult=(1, 2),
        dims=3, resblock_updown=True,
    )
    x = jnp.ones((1, 4, 16, 16, 1))
    t = jnp.array([3])
    params = enc.init(jax.random.key(0), x, t, return_features=True)
    feats, final = enc.apply(params, x, t, return_features=True)
    # middle block removed: final == last per-stage feature
    assert len(feats) >= 2
    np.testing.assert_array_equal(np.asarray(feats[-1]), np.asarray(final))
    assert "mid_0" not in str(jax.tree_util.tree_structure(params))


def test_encoder_v3_final_only():
    enc = EncoderUNetModelv3(
        in_channels=1, model_channels=32, out_channels=3,
        num_res_blocks=1, attention_resolutions=(), channel_mult=(1, 2),
        dims=3, resblock_updown=True,
    )
    x = jnp.ones((1, 4, 16, 16, 1))
    t = jnp.array([3])
    params = enc.init(jax.random.key(0), x, t, return_features=True)
    _, final = enc.apply(params, x, t, return_features=True)
    assert final.ndim == 5 and np.isfinite(np.asarray(final)).all()


def _seg_run(cls):
    model = cls(
        in_channels=1, model_channels=32, out_channels=2,
        num_res_blocks=1, attention_resolutions=(), channel_mult=(1, 2),
        dims=3, use_scale_shift_norm=True, resblock_updown=True,
    )
    x = jnp.zeros((1, 4, 16, 16, 1))
    low = jnp.ones((1, 4, 16, 16, 3))  # 3-channel aux conditioner
    t = jnp.array([2])
    params = model.init(jax.random.key(0), x, t, low_res=low)
    out = model.apply(params, x, t, low_res=low)
    assert out.shape == (1, 4, 16, 16, 2)
    assert np.isfinite(np.asarray(out)).all()
    return params


def test_segmodelv2_6c_runs():
    _seg_run(SegModelv2_6c)


def test_segmodelv3_6c_runs_with_fusion_convs():
    params = _seg_run(SegModelv3_6c)
    assert "fuse0" in str(jax.tree_util.tree_structure(params))
