"""v-parameterization (MeanType.VELOCITY) — beyond-reference training
target (Salimans & Ho, Progressive Distillation, 2022).

Analytic ground truth: with a model that outputs the EXACT v (derived from
known x0/eps), every quantity must match the eps-parameterized equivalents
bit-for-bit up to f32 rounding, across p_mean_variance, training_losses,
and full sampler chains (DDPM / DDIM / DPM-Solver++)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm3d_tpu.diffusion import (
    DiffusionConfig,
    LossType,
    MeanType,
    VarType,
    ddim_sample_loop,
    dpm_solver_pp_sample_loop,
    extract,
    make_schedule,
    p_mean_variance,
    p_sample_loop,
    predict_v,
    predict_xstart_from_v,
    q_sample,
    training_losses,
)
from ddpm3d_tpu.models.factory import create_gaussian_diffusion

T = 10
SHAPE = (2, 2, 8, 8, 1)


def _sched():
    return make_schedule(np.linspace(1e-4, 0.05, T))


def _cfg(mean_type, var_type=VarType.FIXED_SMALL):
    return DiffusionConfig(mean_type, var_type, LossType.MSE,
                           original_num_steps=T)


def test_v_xstart_roundtrip(rng):
    """predict_xstart_from_v inverts predict_v exactly (algebraic identity
    alpha^2 + sigma^2 = 1 holds per-timestep)."""
    sched = _sched()
    x0 = jnp.asarray(rng.normal(size=SHAPE), jnp.float32)
    eps = jnp.asarray(rng.normal(size=SHAPE), jnp.float32)
    for t_s in range(T):
        t = jnp.full((SHAPE[0],), t_s, jnp.int32)
        xt = q_sample(sched, x0, t, eps)
        v = predict_v(sched, x0, t, eps)
        x0_rec = predict_xstart_from_v(sched, xt, t, v)
        np.testing.assert_allclose(
            np.asarray(x0_rec), np.asarray(x0), rtol=2e-5, atol=2e-5
        )


def _oracle_models(sched, x0):
    """Analytic models: given x_t and t, output the exact eps / v implied
    by the closed-form x0 (so the 'model' is perfect)."""

    def eps_model(x, t, **kw):
        nd = x.ndim
        a = extract(sched.sqrt_alphas_cumprod, t, nd)
        s = extract(sched.sqrt_one_minus_alphas_cumprod, t, nd)
        return (x - a * x0) / s

    def v_model(x, t, **kw):
        nd = x.ndim
        a = extract(sched.sqrt_alphas_cumprod, t, nd)
        s = extract(sched.sqrt_one_minus_alphas_cumprod, t, nd)
        eps = (x - a * x0) / s
        return a * eps - s * x0

    return eps_model, v_model


def test_p_mean_variance_velocity_matches_epsilon(rng):
    sched = _sched()
    x0 = jnp.asarray(np.clip(rng.normal(size=SHAPE) * 0.3, -1, 1), jnp.float32)
    eps = jnp.asarray(rng.normal(size=SHAPE), jnp.float32)
    eps_model, v_model = _oracle_models(sched, x0)
    t = jnp.array([6, 3])
    xt = q_sample(sched, x0, t, eps)
    out_e = p_mean_variance(eps_model, sched, _cfg(MeanType.EPSILON), xt, t)
    out_v = p_mean_variance(v_model, sched, _cfg(MeanType.VELOCITY), xt, t)
    np.testing.assert_allclose(
        np.asarray(out_v["pred_xstart"]), np.asarray(out_e["pred_xstart"]),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_v["mean"]), np.asarray(out_e["mean"]),
        rtol=1e-5, atol=1e-5,
    )


def test_training_losses_velocity_target(rng):
    """Loss is exactly zero when the model outputs the true v; and the v
    target equals sqrt(acp)*eps - sqrt(1-acp)*x0."""
    sched = _sched()
    x0 = jnp.asarray(rng.normal(size=SHAPE) * 0.3, jnp.float32)
    noise = jnp.asarray(rng.normal(size=SHAPE), jnp.float32)
    t = jnp.array([7, 2])
    cfg = _cfg(MeanType.VELOCITY)

    def perfect(x, tt, **kw):
        return predict_v(sched, x0, tt, noise)

    terms = training_losses(
        jax.random.key(0), perfect, sched, cfg, x0, t, noise=noise
    )
    np.testing.assert_allclose(np.asarray(terms["mse"]), 0.0, atol=1e-10)

    # learned-sigma variant: vb term present and finite
    cfg_ls = DiffusionConfig(MeanType.VELOCITY, VarType.LEARNED_RANGE,
                             LossType.RESCALED_MSE, original_num_steps=T)

    def perfect_ls(x, tt, **kw):
        v = predict_v(sched, x0, tt, noise)
        return jnp.concatenate([v, jnp.zeros_like(v)], axis=-1)

    terms = training_losses(
        jax.random.key(0), perfect_ls, sched, cfg_ls, x0, t, noise=noise
    )
    assert np.isfinite(np.asarray(terms["vb"])).all()
    np.testing.assert_allclose(np.asarray(terms["mse"]), 0.0, atol=1e-10)


@pytest.mark.parametrize("sampler", ["ddpm", "ddim", "dpm2m"])
def test_chain_equivalence_velocity_vs_epsilon(rng, sampler):
    """Full sampling chains driven by the v-oracle match the eps-oracle."""
    sched = _sched()
    x0 = jnp.asarray(np.clip(rng.normal(size=SHAPE) * 0.3, -1, 1), jnp.float32)
    eps_model, v_model = _oracle_models(sched, x0)
    key = jax.random.key(7)

    def run(model, mean_type):
        cfg = _cfg(mean_type)
        if sampler == "ddpm":
            return p_sample_loop(key, model, sched, cfg, shape=SHAPE)
        if sampler == "ddim":
            return ddim_sample_loop(key, model, sched, cfg, shape=SHAPE)
        return dpm_solver_pp_sample_loop(key, model, sched, cfg, shape=SHAPE)

    out_e = np.asarray(run(eps_model, MeanType.EPSILON))
    out_v = np.asarray(run(v_model, MeanType.VELOCITY))
    np.testing.assert_allclose(out_v, out_e, rtol=2e-4, atol=2e-4)


def test_factory_predict_v_flag():
    # tiny LINEAR schedules scale beta_end above 1; cosine is valid at any T
    kw = dict(steps=T, noise_schedule="cosine")
    _, cfg = create_gaussian_diffusion(predict_v=True, **kw)
    assert cfg.mean_type == MeanType.VELOCITY
    _, cfg = create_gaussian_diffusion(predict_v=True, predict_xstart=True, **kw)
    assert cfg.mean_type == MeanType.VELOCITY  # predict_v wins
    _, cfg = create_gaussian_diffusion(**kw)
    assert cfg.mean_type == MeanType.EPSILON
