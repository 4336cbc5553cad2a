"""Correctness of the depth-decomposed conv3d vs the native lowering."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm3d_tpu.ops.conv3d import Conv3D, conv3d_decomposed


def _native(x, w, strides, padding):
    return jax.lax.conv_general_dilated(
        x, w, (1,) + strides, padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


@pytest.mark.parametrize(
    "strides,shape", [((1, 1), (2, 5, 8, 8, 4)), ((2, 2), (1, 4, 8, 8, 4))]
)
def test_decomposed_matches_native(rng, strides, shape):
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 4, 6)) * 0.1, jnp.float32)
    pad = ((1, 1), (1, 1), (1, 1))
    a = _native(x, w, strides, pad)
    b = conv3d_decomposed(x, w, strides=(1,) + strides, padding=pad)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_decomposed_odd_depth_padding(rng):
    """kd=3 with D=1 exercises the degenerate depth case."""
    x = jnp.asarray(rng.normal(size=(1, 1, 8, 8, 4)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 4, 4)) * 0.1, jnp.float32)
    pad = ((1, 1), (1, 1), (1, 1))
    a = _native(x, w, (1, 1), pad)
    b = conv3d_decomposed(x, w, padding=pad)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_conv3d_module_param_compat(rng):
    """Conv3D params interoperate with flax Conv params (same names/shapes),
    so checkpoints swap between lowerings."""
    from flax import linen as fnn

    x = jnp.asarray(rng.normal(size=(1, 4, 8, 8, 4)), jnp.float32)
    pad = ((1, 1), (1, 1), (1, 1))
    native = fnn.Conv(6, (3, 3, 3), padding=pad)
    params = native.init(jax.random.key(0), x)
    decomposed = Conv3D(6, (3, 3, 3), padding=pad)
    a = native.apply(params, x)
    b = decomposed.apply(params, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_model_same_outputs_both_lowerings(rng):
    """Full tiny model forward agrees between native and decomposed conv
    paths with shared params."""
    from ddpm3d_tpu.models import SuperResModel

    kw = dict(
        in_channels=1, model_channels=32, out_channels=2, num_res_blocks=1,
        attention_resolutions=(), channel_mult=(1, 2), dims=3,
        use_scale_shift_norm=True, resblock_updown=True,
        middle_attention=False,
    )
    x = jnp.asarray(rng.normal(size=(1, 4, 16, 16, 1)), jnp.float32)
    t = jnp.array([3])
    model = SuperResModel(**kw)

    os.environ["DDPM3D_CONV3D"] = "native"
    try:
        params = model.init(jax.random.key(0), x, t, low_res=x)
        a = model.apply(params, x, t, low_res=x)
        os.environ["DDPM3D_CONV3D"] = "decomposed"
        b = model.apply(params, x, t, low_res=x)
    finally:
        os.environ["DDPM3D_CONV3D"] = "auto"
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
