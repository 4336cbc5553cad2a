"""Forward tests for the Flax UNet: shapes, anisotropy, and bitwise-level
parity against the PyTorch reference model via the weight importer."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm3d_tpu.models import EncoderUNetModel, SuperResModel, UNetModel

TINY = dict(
    model_channels=32,
    out_channels=2,
    num_res_blocks=1,
    attention_resolutions=(),
    channel_mult=(1, 2),
    dims=3,
    use_scale_shift_norm=True,
    resblock_updown=True,
    middle_attention=False,
)


def test_unet_shapes_and_anisotropy():
    """D is never resampled: odd, non-divisible D must work while H,W are
    halved per level (the (1,2,2) pyramid, reference unet.py:102-105,129)."""
    model = UNetModel(in_channels=2, **TINY)
    x = jnp.zeros((1, 5, 16, 16, 2))  # D=5 is indivisible by 2 on purpose
    t = jnp.array([3])
    params = model.init(jax.random.key(0), x, t)
    out = model.apply(params, x, t)
    assert out.shape == (1, 5, 16, 16, 2)


def test_superres_concat_conditioning():
    model = SuperResModel(in_channels=1, **TINY)
    x = jnp.zeros((2, 4, 8, 8, 1))
    low = jnp.ones((2, 4, 8, 8, 1))
    t = jnp.array([1, 2])
    params = model.init(jax.random.key(0), x, t, low_res=low)
    out = model.apply(params, x, t, low_res=low)
    assert out.shape == (2, 4, 8, 8, 2)
    with pytest.raises(AssertionError):
        model.apply(params, x, t)


def test_unet_with_attention_runs():
    model = UNetModel(
        in_channels=1,
        model_channels=32,
        out_channels=1,
        num_res_blocks=1,
        attention_resolutions=(1, 2),
        channel_mult=(1, 2),
        dims=3,
        num_head_channels=16,
        middle_attention=True,
        use_scale_shift_norm=True,
    )
    x = jnp.zeros((1, 4, 8, 8, 1))
    t = jnp.array([0])
    params = model.init(jax.random.key(0), x, t)
    out = model.apply(params, x, t)
    assert out.shape == (1, 4, 8, 8, 1)


def test_remat_matches_no_remat():
    kw = dict(in_channels=1, **TINY)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 4, 8, 8, 1)),
                    jnp.float32)
    t = jnp.array([5])
    m1 = UNetModel(use_checkpoint=False, **kw)
    m2 = UNetModel(use_checkpoint=True, **kw)
    params = m1.init(jax.random.key(0), x, t)
    o1 = m1.apply(params, x, t)
    o2 = m2.apply(params, x, t)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


def test_encoder_unet_pools():
    for pool in ["adaptive", "spatial", "spatial_v2", "attention"]:
        model = EncoderUNetModel(
            in_channels=1,
            model_channels=32,
            out_channels=7,
            num_res_blocks=1,
            attention_resolutions=(),
            channel_mult=(1, 2),
            dims=3,
            num_head_channels=16,
            pool=pool,
            use_scale_shift_norm=True,
        )
        x = jnp.zeros((2, 4, 8, 8, 1))
        t = jnp.array([0, 1])
        params = model.init(jax.random.key(0), x, t)
        out = model.apply(params, x, t)
        assert out.shape == (2, 7), pool


def test_encoder_unet_feature_taps():
    model = EncoderUNetModel(
        in_channels=1,
        model_channels=32,
        out_channels=7,
        num_res_blocks=1,
        attention_resolutions=(),
        channel_mult=(1, 2),
        dims=3,
        include_middle=False,
        use_scale_shift_norm=True,
    )
    x = jnp.zeros((1, 4, 8, 8, 1))
    t = jnp.array([0])
    params = model.init(jax.random.key(0), x, t, return_features=True)
    feats, h = model.apply(params, x, t, return_features=True)
    assert len(feats) == 4  # conv, res, down, res
    assert feats[0].shape == (1, 4, 8, 8, 32)
    assert feats[-1].shape == (1, 4, 4, 4, 64)


def _randomize_torch_weights(tm, seed=0):
    """Fill ALL weights (incl. the reference's zero-init output convs) with
    noise. Without this, both models output exactly 0 at init (the final
    head conv is zero_module'd, unet.py:665-669) and a forward comparison
    is vacuous."""
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in tm.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)


@pytest.mark.parametrize("new_order", [False, True])
def test_torch_parity_superres_noatt(new_order):
    """Import reference torch weights into the Flax model and compare full
    forward outputs on matched inputs — the definitive topology check."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    from guided_diffusion.unet import SuperResModel_noatt

    rng = np.random.default_rng(7)
    tm = SuperResModel_noatt(
        image_size=8,
        in_channels=1,
        model_channels=32,
        out_channels=2,
        num_res_blocks=1,
        attention_resolutions=(),
        channel_mult=(1, 2),
        dims=3,
        use_scale_shift_norm=True,
        resblock_updown=True,
        use_new_attention_order=new_order,
    )
    _randomize_torch_weights(tm, seed=1)
    tm.eval()

    from ddpm3d_tpu.utils.torch_import import torch_state_dict_to_params

    params = {"params": torch_state_dict_to_params(
        tm.state_dict(), wrap_superres=True
    )}

    jm = SuperResModel(in_channels=1, use_new_attention_order=new_order, **TINY)

    x = rng.normal(size=(2, 1, 4, 8, 8)).astype(np.float32)   # NCDHW
    low = rng.normal(size=(2, 1, 4, 8, 8)).astype(np.float32)
    t = np.array([3, 11], dtype=np.int64)

    with torch.no_grad():
        ref_out = tm(
            torch.from_numpy(x), torch.from_numpy(t),
            low_res=torch.from_numpy(low),
        ).numpy()

    ours = jm.apply(
        params,
        jnp.moveaxis(jnp.asarray(x), 1, -1),
        jnp.asarray(t),
        low_res=jnp.moveaxis(jnp.asarray(low), 1, -1),
    )
    ours_nchw = np.moveaxis(np.asarray(ours), -1, 1)
    # guard against the all-zeros trap: the outputs must be nontrivial
    assert np.abs(ref_out).max() > 1e-3
    np.testing.assert_allclose(ours_nchw, ref_out, rtol=1e-4, atol=1e-5)


def test_torch_parity_with_attention():
    """Same parity check with attention enabled (legacy head order) to pin
    the qkv layout and fp32-softmax behavior."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    from guided_diffusion.unet import UNetModel as TorchUNet

    rng = np.random.default_rng(3)
    tm = TorchUNet(
        image_size=8,
        in_channels=1,
        model_channels=32,
        out_channels=1,
        num_res_blocks=1,
        attention_resolutions=(2,),
        channel_mult=(1, 2),
        dims=3,
        num_head_channels=16,
        use_scale_shift_norm=True,
        resblock_updown=False,
    )
    _randomize_torch_weights(tm, seed=2)
    tm.eval()

    from ddpm3d_tpu.utils.torch_import import torch_state_dict_to_params

    params = {"params": torch_state_dict_to_params(tm.state_dict())}
    jm = UNetModel(
        in_channels=1,
        model_channels=32,
        out_channels=1,
        num_res_blocks=1,
        attention_resolutions=(2,),
        channel_mult=(1, 2),
        dims=3,
        num_head_channels=16,
        use_scale_shift_norm=True,
        resblock_updown=False,
        middle_attention=True,
    )
    x = rng.normal(size=(1, 1, 4, 8, 8)).astype(np.float32)
    t = np.array([5], dtype=np.int64)
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    ours = jm.apply(params, jnp.moveaxis(jnp.asarray(x), 1, -1), jnp.asarray(t))
    assert np.abs(ref_out).max() > 1e-3
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(ours), -1, 1), ref_out, rtol=1e-4, atol=1e-4
    )


def test_attention_remat_grads_match():
    """AttentionBlock is rematerialized (the reference hardwires attention
    checkpointing, unet.py:297); values and gradients must be unchanged."""
    kw = dict(
        in_channels=1, model_channels=32, out_channels=1, num_res_blocks=1,
        attention_resolutions=(1,), channel_mult=(1, 2), dims=3,
        num_head_channels=16, middle_attention=True,
        use_scale_shift_norm=True,
    )
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 4, 8, 8, 1)), jnp.float32)
    t = jnp.array([3])
    m1 = UNetModel(use_checkpoint=False, **kw)
    m2 = UNetModel(use_checkpoint=True, **kw)
    params = m1.init(jax.random.key(0), x, t)

    cot = jnp.asarray(rng.normal(size=(1, 4, 8, 8, 1)), jnp.float32)

    def loss(m):
        # linear loss: the zero-init output head would zero out d/dparams
        # of any loss whose gradient vanishes at out=0
        return lambda p: jnp.sum(m.apply(p, x, t) * cot)

    g1 = jax.grad(loss(m1))(params)
    g2 = jax.grad(loss(m2))(params)
    flat1 = jax.tree_util.tree_leaves(g1)
    flat2 = jax.tree_util.tree_leaves(g2)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat1)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
