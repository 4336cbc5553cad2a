"""Behavioral tests for classifier-guidance hooks (condition_mean /
condition_score — reference gaussian_diffusion.py:356-393) beyond the
API-surface import check: the oracle formulas, the zero-gradient identity,
and an end-to-end guided chain that verifiably steers the samples.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ddpm3d_tpu.diffusion import (
    DiffusionConfig, LossType, MeanType, VarType, linear_beta_schedule,
    make_schedule, p_sample_loop,
)
from ddpm3d_tpu.diffusion.process import (
    condition_mean, condition_score, extract, p_mean_variance,
    predict_eps_from_xstart, predict_xstart_from_eps,
    q_posterior_mean_variance,
)

SHAPE = (2, 3, 4, 4, 1)


def _setup(var_type=VarType.FIXED_SMALL):
    sched = make_schedule(linear_beta_schedule(20))
    cfg = DiffusionConfig(
        MeanType.EPSILON, var_type, LossType.MSE, original_num_steps=20
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=SHAPE), jnp.float32)
    t = jnp.array([3, 15])

    def model_fn(xx, tt, **kw):
        # deterministic pseudo-model: eps prediction from a fixed transform
        return 0.1 * xx + 0.01 * tt.reshape((-1,) + (1,) * (xx.ndim - 1))

    out = p_mean_variance(model_fn, sched, cfg, x, t, clip_denoised=False)
    return sched, cfg, x, t, out


def test_condition_mean_oracle():
    """new_mean == mean + variance * gradient, elementwise (gd.py:356-369)."""
    sched, cfg, x, t, out = _setup()
    g = jnp.full(SHAPE, 0.7, jnp.float32)
    new_mean = condition_mean(lambda xx, tt: g, sched, cfg, out, x, t)
    np.testing.assert_allclose(
        np.asarray(new_mean),
        np.asarray(out["mean"] + out["variance"] * g),
        rtol=1e-6,
    )


def test_condition_score_oracle():
    """eps' = eps - sqrt(1-abar)*g; x0' and mean re-derived (gd.py:371-393)."""
    sched, cfg, x, t, out = _setup()
    rng = np.random.default_rng(1)
    g = jnp.asarray(rng.normal(size=SHAPE), jnp.float32)
    new = condition_score(lambda xx, tt: g, sched, cfg, out, x, t)

    abar = extract(sched.alphas_cumprod, t, x.ndim)
    eps = predict_eps_from_xstart(sched, x, t, out["pred_xstart"])
    eps2 = eps - jnp.sqrt(1.0 - abar) * g
    x0 = predict_xstart_from_eps(sched, x, t, eps2)
    mean, _, _ = q_posterior_mean_variance(sched, x0, x, t)
    np.testing.assert_allclose(
        np.asarray(new["pred_xstart"]), np.asarray(x0), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(new["mean"]), np.asarray(mean), rtol=1e-5, atol=1e-6
    )
    # variance fields pass through untouched
    np.testing.assert_array_equal(
        np.asarray(new["log_variance"]), np.asarray(out["log_variance"])
    )


def test_zero_gradient_is_identity():
    """cond_fn == 0 must not perturb either hook (both reduce to the
    unconditional posterior)."""
    sched, cfg, x, t, out = _setup(VarType.FIXED_LARGE)
    zero = lambda xx, tt: jnp.zeros_like(xx)
    np.testing.assert_allclose(
        np.asarray(condition_mean(zero, sched, cfg, out, x, t)),
        np.asarray(out["mean"]),
        rtol=1e-6,
    )
    new = condition_score(zero, sched, cfg, out, x, t)
    np.testing.assert_allclose(
        np.asarray(new["mean"]), np.asarray(out["mean"]), rtol=1e-5, atol=1e-6
    )


def test_guided_chain_steers_samples():
    """End-to-end: a guidance gradient pulling toward +1 must raise the
    sample mean vs the unguided chain (same key, same pseudo-model)."""
    sched = make_schedule(np.linspace(1e-4, 0.05, 10))
    cfg = DiffusionConfig(
        MeanType.EPSILON, VarType.FIXED_SMALL, LossType.MSE,
        original_num_steps=10,
    )

    def model_fn(xx, tt, **kw):
        return 0.1 * xx

    key = jax.random.key(42)
    base = p_sample_loop(
        key, model_fn, sched, cfg, shape=SHAPE, clip_denoised=False
    )
    guided = p_sample_loop(
        key, model_fn, sched, cfg, shape=SHAPE, clip_denoised=False,
        cond_fn=lambda xx, tt, **kw: 5.0 * (1.0 - xx),
    )
    assert float(jnp.mean(guided)) > float(jnp.mean(base)) + 0.1
