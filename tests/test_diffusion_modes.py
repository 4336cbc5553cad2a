"""Coverage for the less-traveled diffusion modes: PREVIOUS_X mean,
KL/RESCALED_KL losses, FIXED_LARGE sampling, eta>0 DDIM, LEARNED variance,
2-D models — all present in the reference's enum surface
(gaussian_diffusion.py:65-98)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm3d_tpu.diffusion import (
    DiffusionConfig,
    LossType,
    MeanType,
    VarType,
    calc_bpd_loop,
    ddim_sample_loop,
    make_schedule,
    p_mean_variance,
    p_sample_loop,
    prior_bpd,
    q_posterior_mean_variance,
    q_sample,
    training_losses,
)

T = 8
SHAPE = (1, 2, 8, 8, 1)


def _sched():
    return make_schedule(np.linspace(1e-4, 0.02, T))


def test_previous_x_mean_type(rng):
    """PREVIOUS_X: the model output IS the reverse mean; pred_xstart is
    recovered through the posterior inversion (gd.py:300-304)."""
    sched = _sched()
    cfg = DiffusionConfig(MeanType.PREVIOUS_X, VarType.FIXED_SMALL,
                          LossType.MSE, original_num_steps=T)
    x0 = jnp.asarray(rng.normal(size=SHAPE) * 0.1, jnp.float32)
    eps = jnp.asarray(rng.normal(size=SHAPE), jnp.float32)
    t = jnp.array([4])
    xt = q_sample(sched, x0, t, eps)
    true_prev, _, _ = q_posterior_mean_variance(sched, x0, xt, t)
    out = p_mean_variance(
        lambda x, tt, **kw: true_prev, sched, cfg, xt, t, clip_denoised=False
    )
    np.testing.assert_allclose(
        np.asarray(out["mean"]), np.asarray(true_prev), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_xstart"]), np.asarray(x0), rtol=1e-2, atol=1e-3
    )
    # training target for PREVIOUS_X is the posterior mean (gd.py:803-809)
    terms = training_losses(
        jax.random.key(0),
        lambda x, tt, **kw: q_posterior_mean_variance(sched, x0, x, tt)[0],
        sched, cfg, x0, t, noise=eps,
    )
    np.testing.assert_allclose(np.asarray(terms["mse"]), 0.0, atol=1e-9)


def test_kl_loss_types(rng):
    sched = _sched()
    x0 = jnp.asarray(np.clip(rng.normal(size=SHAPE) * 0.2, -1, 1), jnp.float32)
    noise = jnp.asarray(rng.normal(size=SHAPE), jnp.float32)
    t = jnp.array([3])

    def model(x, tt, **kw):
        return jnp.concatenate([noise, jnp.zeros_like(x)], axis=-1)

    for lt, scale in [(LossType.KL, 1.0), (LossType.RESCALED_KL, T)]:
        cfg = DiffusionConfig(MeanType.EPSILON, VarType.LEARNED_RANGE, lt,
                              original_num_steps=T)
        terms = training_losses(
            jax.random.key(0), model, sched, cfg, x0, t, noise=noise
        )
        assert set(terms) == {"loss"}
        assert np.isfinite(np.asarray(terms["loss"])).all()
    # RESCALED_KL = KL * num_timesteps
    cfg_kl = DiffusionConfig(MeanType.EPSILON, VarType.LEARNED_RANGE,
                             LossType.KL, original_num_steps=T)
    cfg_rkl = DiffusionConfig(MeanType.EPSILON, VarType.LEARNED_RANGE,
                              LossType.RESCALED_KL, original_num_steps=T)
    a = training_losses(jax.random.key(0), model, sched, cfg_kl, x0, t, noise=noise)
    b = training_losses(jax.random.key(0), model, sched, cfg_rkl, x0, t, noise=noise)
    np.testing.assert_allclose(
        np.asarray(b["loss"]), np.asarray(a["loss"]) * T, rtol=1e-5
    )


def test_fixed_large_and_learned_sampling():
    sched = _sched()
    for var_type, double in [
        (VarType.FIXED_LARGE, False),
        (VarType.LEARNED, True),
    ]:
        cfg = DiffusionConfig(MeanType.EPSILON, var_type, LossType.MSE,
                              original_num_steps=T)

        def model(x, tt, **kw):
            if double:
                return jnp.concatenate(
                    [jnp.zeros_like(x), jnp.full_like(x, -4.0)], axis=-1
                )
            return jnp.zeros_like(x)

        out = p_sample_loop(jax.random.key(0), model, sched, cfg, shape=SHAPE)
        assert np.isfinite(np.asarray(out)).all()


def test_ddim_eta_nonzero():
    sched = _sched()
    cfg = DiffusionConfig(MeanType.EPSILON, VarType.FIXED_SMALL, LossType.MSE,
                          original_num_steps=T)
    model = lambda x, tt, **kw: jnp.zeros_like(x)
    a = ddim_sample_loop(jax.random.key(1), model, sched, cfg, shape=SHAPE, eta=1.0)
    b = ddim_sample_loop(jax.random.key(2), model, sched, cfg, shape=SHAPE, eta=1.0)
    # eta=1 is stochastic: different keys must differ
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-5


def test_bpd_loop_and_prior():
    sched = _sched()
    cfg = DiffusionConfig(MeanType.EPSILON, VarType.FIXED_SMALL, LossType.MSE,
                          original_num_steps=T)
    x0 = jnp.zeros(SHAPE)
    model = lambda x, tt, **kw: jnp.zeros_like(x)
    out = calc_bpd_loop(jax.random.key(0), model, sched, cfg, x0)
    assert out["vb"].shape == (1, T)
    assert out["total_bpd"].shape == (1,)
    assert np.isfinite(np.asarray(out["total_bpd"])).all()
    pb = prior_bpd(sched, x0)
    # x0 = 0: prior KL = 0.5*(-1 - log(1-acp) + (1-acp)) / log(2) per dim
    acp = float(sched.alphas_cumprod[-1])
    expect = 0.5 * (-1.0 - np.log(1 - acp) + (1 - acp)) / np.log(2.0)
    np.testing.assert_allclose(float(pb[0]), expect, rtol=1e-4)


def test_2d_model_forward():
    """dims=2 keeps the upstream image-model path alive (conv2d, full
    stride-2 pyramid)."""
    from ddpm3d_tpu.models import UNetModel

    model = UNetModel(
        in_channels=3, model_channels=32, out_channels=3, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), dims=2,
        num_head_channels=16, use_scale_shift_norm=True,
    )
    x = jnp.zeros((1, 16, 16, 3))
    t = jnp.array([1])
    params = model.init(jax.random.key(0), x, t)
    out = model.apply(params, x, t)
    assert out.shape == (1, 16, 16, 3)


def test_1d_model_forward():
    from ddpm3d_tpu.models import UNetModel

    model = UNetModel(
        in_channels=2, model_channels=32, out_channels=2, num_res_blocks=1,
        attention_resolutions=(), channel_mult=(1, 2), dims=1,
        use_scale_shift_norm=True,
    )
    x = jnp.zeros((1, 32, 2))
    t = jnp.array([0])
    params = model.init(jax.random.key(0), x, t)
    out = model.apply(params, x, t)
    assert out.shape == (1, 32, 2)
