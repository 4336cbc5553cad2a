"""Tests for the functional diffusion process against numpy float64 oracles
and self-consistency identities."""

import jax
import jax.numpy as jnp
import numpy as np

from ddpm3d_tpu.diffusion import (
    DiffusionConfig,
    LossType,
    MeanType,
    VarType,
    linear_beta_schedule,
    make_schedule,
    make_spaced_schedule,
    p_mean_variance,
    predict_eps_from_xstart,
    predict_xstart_from_eps,
    q_posterior_mean_variance,
    q_sample,
    space_timesteps,
    training_losses,
    normal_kl,
    discretized_gaussian_log_likelihood,
    vb_terms_bpd,
)
from ddpm3d_tpu.diffusion.process import model_timesteps

SHAPE = (2, 4, 8, 8, 1)  # NDHWC


def _sched(T=20):
    return make_schedule(linear_beta_schedule(T))


def test_q_sample_matches_oracle(rng):
    sched = _sched()
    x0 = jnp.asarray(rng.normal(size=SHAPE), dtype=jnp.float32)
    noise = jnp.asarray(rng.normal(size=SHAPE), dtype=jnp.float32)
    t = jnp.array([3, 17])
    xt = q_sample(sched, x0, t, noise)
    acp = np.cumprod(1 - linear_beta_schedule(20))
    for b, tb in enumerate([3, 17]):
        expect = np.sqrt(acp[tb]) * np.asarray(x0)[b] + np.sqrt(1 - acp[tb]) * np.asarray(noise)[b]
        np.testing.assert_allclose(np.asarray(xt)[b], expect, rtol=1e-5, atol=1e-6)


def test_eps_xstart_roundtrip(rng):
    """predict_xstart_from_eps and predict_eps_from_xstart are inverses."""
    sched = _sched()
    x0 = jnp.asarray(rng.normal(size=SHAPE), dtype=jnp.float32)
    eps = jnp.asarray(rng.normal(size=SHAPE), dtype=jnp.float32)
    t = jnp.array([5, 12])
    xt = q_sample(sched, x0, t, eps)
    x0_hat = predict_xstart_from_eps(sched, xt, t, eps)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), rtol=1e-3, atol=1e-4)
    eps_hat = predict_eps_from_xstart(sched, xt, t, x0_hat)
    np.testing.assert_allclose(np.asarray(eps_hat), np.asarray(eps), rtol=1e-2, atol=1e-3)


def test_posterior_collapses_at_t0(rng):
    """At t=0 the posterior mean must equal x_start exactly
    (coef1[0]=1, coef2[0]=0)."""
    sched = _sched()
    x0 = jnp.asarray(rng.normal(size=SHAPE), dtype=jnp.float32)
    xt = jnp.asarray(rng.normal(size=SHAPE), dtype=jnp.float32)
    t = jnp.zeros(2, dtype=jnp.int32)
    mean, var, _ = q_posterior_mean_variance(sched, x0, xt, t)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(x0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(var), 0.0, atol=1e-8)


def _eps_model(true_eps):
    def fn(x, t, **kw):
        return true_eps

    return fn


def test_p_mean_variance_epsilon_fixed_small(rng):
    """With the true eps as the model output and no clipping, the reverse
    mean must equal the true posterior mean around the true x0."""
    sched = _sched()
    cfg = DiffusionConfig(MeanType.EPSILON, VarType.FIXED_SMALL, LossType.MSE)
    x0 = jnp.asarray(rng.normal(size=SHAPE) * 0.1, dtype=jnp.float32)
    eps = jnp.asarray(rng.normal(size=SHAPE), dtype=jnp.float32)
    t = jnp.array([7, 15])
    xt = q_sample(sched, x0, t, eps)
    out = p_mean_variance(
        _eps_model(eps), sched, cfg, xt, t, clip_denoised=False
    )
    true_mean, true_var, true_logvar = q_posterior_mean_variance(sched, x0, xt, t)
    np.testing.assert_allclose(np.asarray(out["mean"]), np.asarray(true_mean), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["pred_xstart"]), np.asarray(x0), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["log_variance"])[:, 0, 0, 0, 0],
        np.asarray(true_logvar)[:, 0, 0, 0, 0],
        rtol=1e-5,
    )


def test_p_mean_variance_learned_range_interpolation(rng):
    """LEARNED_RANGE: var output -1 -> posterior (min), +1 -> beta (max)
    (reference gd.py:268-276)."""
    sched = _sched()
    cfg = DiffusionConfig(MeanType.EPSILON, VarType.LEARNED_RANGE, LossType.MSE)
    x = jnp.asarray(rng.normal(size=SHAPE), dtype=jnp.float32)
    t = jnp.array([10, 10])
    for v, table in [(-1.0, sched.posterior_log_variance_clipped), (1.0, sched.log_betas)]:
        def model(xx, tt, v=v, **kw):
            return jnp.concatenate(
                [jnp.zeros_like(xx), jnp.full_like(xx, v)], axis=-1
            )
        out = p_mean_variance(model, sched, cfg, x, t, clip_denoised=False)
        np.testing.assert_allclose(
            np.asarray(out["log_variance"]),
            float(table[10]) * np.ones(SHAPE),
            rtol=1e-5,
        )


def test_p_mean_variance_clip(rng):
    sched = _sched()
    cfg = DiffusionConfig(MeanType.START_X, VarType.FIXED_LARGE, LossType.MSE)
    x = jnp.asarray(rng.normal(size=SHAPE), dtype=jnp.float32)
    big = jnp.full(SHAPE, 5.0)
    out = p_mean_variance(lambda *a, **k: big, sched, cfg, x, jnp.array([3, 3]))
    assert float(jnp.max(out["pred_xstart"])) <= 1.0


def test_timestep_map_respaced():
    betas = linear_beta_schedule(1000)
    sp = make_spaced_schedule(betas, sorted(space_timesteps(1000, "ddim10")))
    cfg = DiffusionConfig(original_num_steps=1000)
    t = jnp.arange(10)
    mapped = model_timesteps(sp, cfg, t)
    np.testing.assert_array_equal(np.asarray(mapped), np.arange(0, 1000, 100))
    # with rescaling: floats scaled by 1000/original
    cfg_rs = DiffusionConfig(rescale_timesteps=True, original_num_steps=1000)
    mapped_rs = model_timesteps(sp, cfg_rs, t)
    np.testing.assert_allclose(np.asarray(mapped_rs), np.arange(0, 1000, 100.0))


def test_normal_kl_identities(rng):
    a = jnp.asarray(rng.normal(size=(8,)), dtype=jnp.float32)
    lv = jnp.asarray(rng.normal(size=(8,)) * 0.1, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(normal_kl(a, lv, a, lv)), 0.0, atol=1e-6)
    # KL(N(0,1)||N(0,e)) = 0.5*(-1 + 1 + e^{-1}) = 0.5*e^{-1} ... oracle:
    kl = normal_kl(0.0, 0.0, 0.0, 1.0)
    np.testing.assert_allclose(float(kl), 0.5 * (-1 + 1 + np.exp(-1.0)), rtol=1e-5)


def test_discretized_gaussian_ll_is_proper(rng):
    """Summing the discretized likelihood over all 255 bins ~ 1."""
    means = jnp.zeros((1,))
    log_scales = jnp.full((1,), np.log(0.3))
    xs = np.linspace(-1, 1, 256)
    probs = np.array(
        [
            float(
                jnp.exp(
                    discretized_gaussian_log_likelihood(
                        jnp.full((1,), x), means=means, log_scales=log_scales
                    )
                )[0]
            )
            for x in xs
        ]
    )
    np.testing.assert_allclose(probs.sum(), 1.0, rtol=1e-2)


def test_training_losses_mse_zero_for_perfect_model(rng):
    sched = _sched()
    cfg = DiffusionConfig(MeanType.EPSILON, VarType.FIXED_SMALL, LossType.MSE)
    x0 = jnp.asarray(rng.normal(size=SHAPE) * 0.1, dtype=jnp.float32)
    noise = jnp.asarray(rng.normal(size=SHAPE), dtype=jnp.float32)
    t = jnp.array([4, 9])
    terms = training_losses(
        jax.random.key(0), _eps_model(noise), sched, cfg, x0, t, noise=noise
    )
    np.testing.assert_allclose(np.asarray(terms["mse"]), 0.0, atol=1e-10)
    assert "vb" not in terms


def test_training_losses_learned_sigma_has_vb(rng):
    sched = _sched()
    cfg = DiffusionConfig(MeanType.EPSILON, VarType.LEARNED_RANGE, LossType.MSE)
    x0 = jnp.asarray(rng.normal(size=SHAPE) * 0.1, dtype=jnp.float32)
    noise = jnp.asarray(rng.normal(size=SHAPE), dtype=jnp.float32)
    t = jnp.array([4, 9])

    def model(x, tt, **kw):
        return jnp.concatenate([noise, jnp.zeros_like(x)], axis=-1)

    terms = training_losses(
        jax.random.key(0), model, sched, cfg, x0, t, noise=noise
    )
    assert "vb" in terms and "mse" in terms
    np.testing.assert_allclose(
        np.asarray(terms["loss"]),
        np.asarray(terms["mse"]) + np.asarray(terms["vb"]),
        rtol=1e-6,
    )
    assert np.isfinite(np.asarray(terms["loss"])).all()


def test_vb_frozen_mean_does_not_leak_gradient(rng):
    """The vb term must carry no gradient through the mean channels
    (reference's frozen_out, gd.py:788-797)."""
    sched = _sched()
    cfg = DiffusionConfig(MeanType.EPSILON, VarType.LEARNED_RANGE, LossType.MSE)
    x0 = jnp.asarray(rng.normal(size=SHAPE) * 0.1, dtype=jnp.float32)
    noise = jnp.asarray(rng.normal(size=SHAPE), dtype=jnp.float32)
    t = jnp.array([4, 9])

    def vb_of(eps_param):
        def model(x, tt, **kw):
            return jnp.concatenate(
                [jnp.broadcast_to(eps_param, x.shape), jnp.zeros_like(x)], axis=-1
            )

        terms = training_losses(
            jax.random.key(0), model, sched, cfg, x0, t, noise=noise
        )
        return terms["vb"].sum()

    g = jax.grad(vb_of)(jnp.float32(0.3))
    np.testing.assert_allclose(float(g), 0.0, atol=1e-8)


def test_vb_terms_t0_uses_decoder_nll(rng):
    sched = _sched()
    cfg = DiffusionConfig(MeanType.EPSILON, VarType.FIXED_SMALL, LossType.MSE)
    x0 = jnp.asarray(np.clip(rng.normal(size=SHAPE) * 0.3, -1, 1), dtype=jnp.float32)
    eps = jnp.asarray(rng.normal(size=SHAPE), dtype=jnp.float32)
    t = jnp.array([0, 5])
    xt = q_sample(sched, x0, t, eps)
    out = vb_terms_bpd(_eps_model(eps), sched, cfg, x0, xt, t, clip_denoised=False)
    assert out["output"].shape == (2,)
    assert np.isfinite(np.asarray(out["output"])).all()
