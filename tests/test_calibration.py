"""Epsilon-scale calibration (diffusion/calibration.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from ddpm3d_tpu.diffusion import (
    DiffusionConfig,
    LossType,
    MeanType,
    VarType,
    ddim_sample_loop,
    linear_beta_schedule,
    make_schedule,
    make_spaced_schedule,
    space_timesteps,
)
from ddpm3d_tpu.diffusion import process
from ddpm3d_tpu.diffusion.calibration import (
    eps_corrected_model_fn,
    estimate_eps_scale,
)

SHAPE = (2, 4, 8, 8, 1)
T = 1000


def _setup():
    sched = make_schedule(linear_beta_schedule(T))
    cfg = DiffusionConfig(
        MeanType.EPSILON, VarType.LEARNED_RANGE, LossType.MSE,
        original_num_steps=T,
    )
    return sched, cfg


def _biased_model(sched, x0c, lam_true):
    """Perfect eps model scaled by a known lambda(t)."""

    def model_fn(x, t, **kw):
        acp = process.extract(sched.alphas_cumprod, t, x.ndim)
        eps = (x - jnp.sqrt(acp) * x0c) / jnp.sqrt(1.0 - acp)
        scale = lam_true[jnp.clip(t, 0, T - 1)].reshape(
            (-1,) + (1,) * (x.ndim - 1))
        return jnp.concatenate([eps * scale, -jnp.ones_like(x)], axis=-1)

    return model_fn


def test_estimate_recovers_known_bias():
    sched, cfg = _setup()
    rng = np.random.default_rng(0)
    x0c = jnp.asarray(np.clip(rng.normal(size=SHAPE) * 0.3, -1, 1),
                      jnp.float32)
    lam_true = jnp.asarray(
        1.0 + 0.01 * np.sin(np.arange(T) / 200.0), jnp.float32)
    model_fn = _biased_model(sched, x0c, lam_true)
    lam = estimate_eps_scale(
        jax.random.key(3), model_fn, sched, cfg, x0c, draws=3)
    # at mid/high t the fit should recover the injected bias closely
    for t in (300, 500, 800, 950):
        assert abs(float(lam[t]) - float(lam_true[t])) < 2e-3, (
            t, float(lam[t]), float(lam_true[t]))


def test_measured_correction_inverts_bias_functionally():
    """estimate -> correct composes to the UNBIASED model (so any
    downstream sampler behaves as if the bias never existed).

    Note: a chain-level version of this test is not meaningful on the
    analytic model — a deterministic-x0-consistent eps map self-corrects
    any scalar bias through the per-step feedback (eps is recomputed from
    the current x). Real trained models lack that fixed-point structure,
    which is exactly why their bias integrates (RESPACING.json)."""
    sched, cfg = _setup()
    rng = np.random.default_rng(1)
    x0c = jnp.asarray(np.clip(rng.normal(size=SHAPE) * 0.3, -1, 1),
                      jnp.float32)
    lam_true = jnp.asarray(
        1.0 + 0.02 * np.cos(np.arange(T) / 300.0), jnp.float32)
    biased_fn = _biased_model(sched, x0c, lam_true)
    clean_fn = _biased_model(sched, x0c, jnp.ones((T,), jnp.float32))

    lam = estimate_eps_scale(
        jax.random.key(5), biased_fn, sched, cfg, x0c, draws=3)
    corrected_fn = eps_corrected_model_fn(biased_fn, np.asarray(lam))

    x = jnp.asarray(rng.normal(size=SHAPE), jnp.float32)
    for t_s in (100, 500, 900):
        t = jnp.full((SHAPE[0],), t_s, jnp.int32)
        got = corrected_fn(x, t)
        want = clean_fn(x, t)
        C = SHAPE[-1]
        np.testing.assert_allclose(
            np.asarray(got[..., :C]), np.asarray(want[..., :C]),
            atol=5e-3, rtol=5e-3)

    # and the corrected chain still lands on x0 (sanity)
    sp = make_spaced_schedule(
        linear_beta_schedule(T), sorted(space_timesteps(T, "ddim50")))
    xT = jnp.asarray(rng.normal(size=SHAPE), jnp.float32)
    fixed = ddim_sample_loop(
        jax.random.key(0), corrected_fn, sp, cfg, noise=xT, eta=0.0)
    assert float(jnp.max(jnp.abs(fixed - x0c))) < 1e-2


def test_wrapper_preserves_variance_head():
    sched, cfg = _setup()
    rng = np.random.default_rng(2)
    x0c = jnp.asarray(rng.normal(size=SHAPE) * 0.2, jnp.float32)
    lam_true = jnp.asarray(np.full(T, 1.5), jnp.float32)
    model_fn = _biased_model(sched, x0c, lam_true)
    wrapped = eps_corrected_model_fn(model_fn, np.full(T, 1.5, np.float32))
    x = jnp.asarray(rng.normal(size=SHAPE), jnp.float32)
    t = jnp.asarray([100, 700], jnp.int32)
    raw = model_fn(x, t)
    out = wrapped(x, t)
    C = SHAPE[-1]
    np.testing.assert_allclose(
        np.asarray(out[..., C:]), np.asarray(raw[..., C:]))
    np.testing.assert_allclose(
        np.asarray(out[..., :C]), np.asarray(raw[..., :C]) / 1.5,
        rtol=1e-6)
