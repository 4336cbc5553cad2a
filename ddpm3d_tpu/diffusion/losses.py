"""Likelihood terms and training losses.

Clean-room equivalents of reference guided_diffusion/losses.py (KL / CDF /
discretized NLL) and gaussian_diffusion.py:709-894 (vb terms, training
losses, bpd loop), written as pure jittable functions.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import process
from .process import DiffusionConfig, LossType, MeanType, VarType
from .schedules import Schedule


def mean_flat(x: jnp.ndarray) -> jnp.ndarray:
    """Mean over all non-batch axes (reference nn.py:86-90)."""
    return x.mean(axis=tuple(range(1, x.ndim)))


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL(N(mean1, e^logvar1) || N(mean2, e^logvar2)) in nats
    (reference losses.py:12-39)."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    """tanh approximation of the standard normal CDF (losses.py:42-47)."""
    return 0.5 * (
        1.0 + jnp.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x ** 3))
    )


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of a Gaussian discretized to 1/255 bins
    (losses.py:50-77). Inputs assumed rescaled to [-1, 1]."""
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.maximum(cdf_plus, 1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.maximum(1.0 - cdf_min, 1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(
            x > 0.999, log_one_minus_cdf_min, jnp.log(jnp.maximum(cdf_delta, 1e-12))
        ),
    )


def vb_terms_bpd(
    model_fn,
    sched: Schedule,
    cfg: DiffusionConfig,
    x_start: jnp.ndarray,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    clip_denoised: bool = True,
    model_kwargs: Optional[Dict[str, Any]] = None,
) -> Dict[str, jnp.ndarray]:
    """Per-example VLB term in bits: KL except decoder NLL at t=0
    (reference gd.py:709-742)."""
    true_mean, _, true_log_var = process.q_posterior_mean_variance(
        sched, x_start, x_t, t
    )
    out = process.p_mean_variance(
        model_fn, sched, cfg, x_t, t,
        clip_denoised=clip_denoised, model_kwargs=model_kwargs,
    )
    kl = normal_kl(true_mean, true_log_var, out["mean"], out["log_variance"])
    kl = mean_flat(kl) / np.log(2.0)

    decoder_nll = -discretized_gaussian_log_likelihood(
        x_start, means=out["mean"], log_scales=0.5 * out["log_variance"]
    )
    decoder_nll = mean_flat(decoder_nll) / np.log(2.0)

    output = jnp.where(t == 0, decoder_nll, kl)
    return {"output": output, "pred_xstart": out["pred_xstart"]}


def training_losses(
    key: jax.Array,
    model_fn,
    sched: Schedule,
    cfg: DiffusionConfig,
    x_start: jnp.ndarray,
    t: jnp.ndarray,
    model_kwargs: Optional[Dict[str, Any]] = None,
    noise: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Per-example training losses for a batch of timesteps
    (reference gd.py:744-819).

    For MSE-family losses with learned variance, the VLB term sees a
    stop-gradient'd mean so variance learning cannot corrupt the eps
    prediction (the reference's ``frozen_out`` trick, gd.py:788-797).
    """
    model_kwargs = model_kwargs or {}
    if noise is None:
        noise = jax.random.normal(key, x_start.shape, dtype=x_start.dtype)
    x_t = q_sample_with(sched, x_start, t, noise)

    terms: Dict[str, jnp.ndarray] = {}
    if cfg.loss_type in (LossType.KL, LossType.RESCALED_KL):
        terms["loss"] = vb_terms_bpd(
            model_fn, sched, cfg, x_start, x_t, t,
            clip_denoised=False, model_kwargs=model_kwargs,
        )["output"]
        if cfg.loss_type == LossType.RESCALED_KL:
            terms["loss"] = terms["loss"] * sched.num_timesteps
    elif cfg.loss_type in (LossType.MSE, LossType.RESCALED_MSE):
        model_output = model_fn(
            x_t, process.model_timesteps(sched, cfg, t), **model_kwargs
        )
        if cfg.var_type in (VarType.LEARNED, VarType.LEARNED_RANGE):
            C = x_t.shape[-1]
            assert model_output.shape == x_t.shape[:-1] + (2 * C,)
            model_output, model_var_values = jnp.split(model_output, 2, axis=-1)
            frozen_out = jnp.concatenate(
                [jax.lax.stop_gradient(model_output), model_var_values], axis=-1
            )
            terms["vb"] = vb_terms_bpd(
                lambda *a, **k: frozen_out,
                sched, cfg, x_start, x_t, t, clip_denoised=False,
            )["output"]
            if cfg.loss_type == LossType.RESCALED_MSE:
                # Keep the VLB term from dominating the MSE (gd.py:798-801).
                terms["vb"] = terms["vb"] * (sched.num_timesteps / 1000.0)

        if cfg.mean_type == MeanType.PREVIOUS_X:
            target = process.q_posterior_mean_variance(sched, x_start, x_t, t)[0]
        elif cfg.mean_type == MeanType.START_X:
            target = x_start
        elif cfg.mean_type == MeanType.VELOCITY:
            # v-MSE == (SNR+1)-weighted x0-MSE, the "SNR+1" weighting of
            # Salimans & Ho 2022 — the fewer-step-robust parameterization.
            target = process.predict_v(sched, x_start, t, noise)
        else:
            target = noise
        assert model_output.shape == target.shape == x_start.shape
        terms["mse"] = mean_flat(
            (target.astype(jnp.float32) - model_output.astype(jnp.float32)) ** 2
        )
        terms["loss"] = terms["mse"] + terms["vb"] if "vb" in terms else terms["mse"]
    else:
        raise NotImplementedError(cfg.loss_type)
    return terms


def q_sample_with(sched, x_start, t, noise):
    return process.q_sample(sched, x_start, t, noise)


def prior_bpd(sched: Schedule, x_start: jnp.ndarray) -> jnp.ndarray:
    """Prior KL term in bits-per-dim (reference gd.py:821-837)."""
    B = x_start.shape[0]
    t = jnp.full((B,), sched.num_timesteps - 1, dtype=jnp.int32)
    qt_mean, _, qt_log_variance = process.q_mean_variance(sched, x_start, t)
    kl_prior = normal_kl(qt_mean, qt_log_variance, 0.0, 0.0)
    return mean_flat(kl_prior) / np.log(2.0)


def calc_bpd_loop(
    key: jax.Array,
    model_fn,
    sched: Schedule,
    cfg: DiffusionConfig,
    x_start: jnp.ndarray,
    clip_denoised: bool = True,
    model_kwargs: Optional[Dict[str, Any]] = None,
) -> Dict[str, jnp.ndarray]:
    """Full VLB evaluation over all timesteps as one ``lax.scan``
    (reference's Python loop, gd.py:839-894). Returns per-step stacks in
    reverse-time order (t = T-1 .. 0) matching the reference's iteration."""
    B = x_start.shape[0]
    T = sched.num_timesteps

    def body(carry_key, t_scalar):
        step_key, next_key = jax.random.split(carry_key)
        t = jnp.full((B,), t_scalar, dtype=jnp.int32)
        noise = jax.random.normal(step_key, x_start.shape, dtype=x_start.dtype)
        x_t = process.q_sample(sched, x_start, t, noise)
        out = vb_terms_bpd(
            model_fn, sched, cfg, x_start, x_t, t,
            clip_denoised=clip_denoised, model_kwargs=model_kwargs,
        )
        eps = process.predict_eps_from_xstart(sched, x_t, t, out["pred_xstart"])
        return next_key, (
            out["output"],
            mean_flat((out["pred_xstart"] - x_start) ** 2),
            mean_flat((eps - noise) ** 2),
        )

    ts = jnp.arange(T - 1, -1, -1)
    _, (vb, xstart_mse, mse) = jax.lax.scan(body, key, ts)
    vb = vb.T  # [B, T]
    xstart_mse = xstart_mse.T
    mse = mse.T
    prior = prior_bpd(sched, x_start)
    return {
        "total_bpd": vb.sum(axis=1) + prior,
        "prior_bpd": prior,
        "vb": vb,
        "xstart_mse": xstart_mse,
        "mse": mse,
    }
