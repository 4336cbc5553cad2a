"""Functional diffusion process math (forward q, posterior, reverse p).

Clean-room TPU-first redesign of the reference ``GaussianDiffusion`` class
(guided_diffusion/gaussian_diffusion.py:101-439): instead of a stateful class
holding numpy tables, every function here is pure over a ``Schedule`` pytree
and a static ``DiffusionConfig``, so everything composes with jit/scan/vmap.

Model callable contract: ``model_fn(x, t, **model_kwargs) -> out`` where
``x`` is NDHWC ``[B, D, H, W, C]`` (the TPU-native layout; the reference uses
NCDHW, gaussian_diffusion.py:260) and ``t`` is the *original-chain* timestep
``[B]`` (already passed through ``timestep_map`` and optional rescaling,
reference respace.py:116-128 + gaussian_diffusion.py:351-354).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, Callable, Dict, Optional

import jax.numpy as jnp

from .schedules import Schedule


class MeanType(enum.Enum):
    """What the model's mean head predicts (reference gd.py:65-72).

    ``VELOCITY`` is a beyond-reference parameterization (Salimans & Ho,
    "Progressive Distillation for Fast Sampling of Diffusion Models"):
    the model predicts v = sqrt(acp)*eps - sqrt(1-acp)*x0, which stays
    well-conditioned as t -> T (eps-prediction's x0 recovery divides by
    sqrt(acp) -> 0 there, amplifying model bias over respaced chains —
    the failure mode measured in tools/respacing_study.py)."""

    PREVIOUS_X = "previous_x"
    START_X = "start_x"
    EPSILON = "epsilon"
    VELOCITY = "velocity"


class VarType(enum.Enum):
    """How the reverse variance is determined (reference gd.py:75-86)."""

    LEARNED = "learned"
    FIXED_SMALL = "fixed_small"
    FIXED_LARGE = "fixed_large"
    LEARNED_RANGE = "learned_range"


class LossType(enum.Enum):
    """Training loss selection (reference gd.py:89-98)."""

    MSE = "mse"
    RESCALED_MSE = "rescaled_mse"
    KL = "kl"
    RESCALED_KL = "rescaled_kl"

    def is_vb(self) -> bool:
        return self in (LossType.KL, LossType.RESCALED_KL)


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    mean_type: MeanType = MeanType.EPSILON
    var_type: VarType = VarType.FIXED_LARGE
    loss_type: LossType = LossType.MSE
    rescale_timesteps: bool = False
    # Length of the *original* chain (≠ schedule length when respaced).
    original_num_steps: int = 1000


def extract(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep coefficients and broadcast over trailing dims.

    Equivalent of reference ``_extract_into_tensor`` (gd.py:897-910); the
    table is already float32.
    """
    out = table[t]
    return out.reshape(out.shape + (1,) * (ndim - 1))


def model_timesteps(sched: Schedule, cfg: DiffusionConfig, t: jnp.ndarray) -> jnp.ndarray:
    """Map internal (respaced) steps to what the model should be fed.

    Applies ``timestep_map`` then optional 0..1000 rescaling
    (reference respace.py:123-128, gd.py:351-354).
    """
    new_t = sched.timestep_map[t]
    if cfg.rescale_timesteps:
        return new_t.astype(jnp.float32) * (1000.0 / cfg.original_num_steps)
    return new_t


def q_mean_variance(sched: Schedule, x_start: jnp.ndarray, t: jnp.ndarray):
    """Moments of q(x_t | x_0) (reference gd.py:171-186)."""
    nd = x_start.ndim
    mean = extract(sched.sqrt_alphas_cumprod, t, nd) * x_start
    variance = extract(1.0 - sched.alphas_cumprod, t, nd)
    log_variance = extract(sched.log_one_minus_alphas_cumprod, t, nd)
    return mean, variance, log_variance


def q_sample(
    sched: Schedule, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
) -> jnp.ndarray:
    """Sample x_t ~ q(x_t | x_0) with caller-supplied noise (gd.py:188-206)."""
    assert noise.shape == x_start.shape
    nd = x_start.ndim
    return (
        extract(sched.sqrt_alphas_cumprod, t, nd) * x_start
        + extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * noise
    )


def q_posterior_mean_variance(
    sched: Schedule, x_start: jnp.ndarray, x_t: jnp.ndarray, t: jnp.ndarray
):
    """Moments of the posterior q(x_{t-1} | x_t, x_0) (gd.py:208-230)."""
    nd = x_t.ndim
    posterior_mean = (
        extract(sched.posterior_mean_coef1, t, nd) * x_start
        + extract(sched.posterior_mean_coef2, t, nd) * x_t
    )
    posterior_variance = extract(sched.posterior_variance, t, nd)
    posterior_log_variance = extract(sched.posterior_log_variance_clipped, t, nd)
    return posterior_mean, posterior_variance, posterior_log_variance


def predict_xstart_from_eps(sched, x_t, t, eps):
    """x̂_0 from predicted noise (gd.py:328-333)."""
    nd = x_t.ndim
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t
        - extract(sched.sqrt_recipm1_alphas_cumprod, t, nd) * eps
    )


def predict_xstart_from_xprev(sched, x_t, t, xprev):
    """x̂_0 from predicted x_{t-1} (gd.py:335-343)."""
    nd = x_t.ndim
    coef1 = extract(sched.posterior_mean_coef1, t, nd)
    coef2 = extract(sched.posterior_mean_coef2, t, nd)
    return xprev / coef1 - (coef2 / coef1) * x_t


def predict_xstart_from_v(sched, x_t, t, v):
    """x̂_0 from predicted velocity: x0 = sqrt(acp)*x_t - sqrt(1-acp)*v.

    Derived from x_t = sqrt(acp)*x0 + sqrt(1-acp)*eps and the definition
    v = sqrt(acp)*eps - sqrt(1-acp)*x0 (Salimans & Ho 2022, eq. 10-11)."""
    nd = x_t.ndim
    return (
        extract(sched.sqrt_alphas_cumprod, t, nd) * x_t
        - extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * v
    )


def predict_v(sched, x_start, t, noise):
    """Velocity training target v = sqrt(acp)*eps - sqrt(1-acp)*x0."""
    nd = x_start.ndim
    return (
        extract(sched.sqrt_alphas_cumprod, t, nd) * noise
        - extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * x_start
    )


def predict_eps_from_xstart(sched, x_t, t, pred_xstart):
    """Recover implied eps from x̂_0 (gd.py:345-349)."""
    nd = x_t.ndim
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t - pred_xstart
    ) / extract(sched.sqrt_recipm1_alphas_cumprod, t, nd)


ModelFn = Callable[..., jnp.ndarray]


def p_mean_variance(
    model_fn: ModelFn,
    sched: Schedule,
    cfg: DiffusionConfig,
    x: jnp.ndarray,
    t: jnp.ndarray,
    clip_denoised: bool = True,
    denoised_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    model_kwargs: Optional[Dict[str, Any]] = None,
) -> Dict[str, jnp.ndarray]:
    """Reverse-step distribution p(x_{t-1} | x_t) and x̂_0 (gd.py:232-326).

    Supports all four variance modes and all three mean modes of the
    reference. Returns dict with mean / variance / log_variance / pred_xstart
    (all shaped like x) plus the raw eps-channel output under ``model_output``.
    """
    model_kwargs = model_kwargs or {}
    B, C = x.shape[0], x.shape[-1]
    nd = x.ndim
    model_output = model_fn(x, model_timesteps(sched, cfg, t), **model_kwargs)

    if cfg.var_type in (VarType.LEARNED, VarType.LEARNED_RANGE):
        assert model_output.shape == x.shape[:-1] + (2 * C,), (
            f"expected learned-variance output {x.shape[:-1] + (2 * C,)}, got "
            f"{model_output.shape}"
        )
        model_output, model_var_values = jnp.split(model_output, 2, axis=-1)
        if cfg.var_type == VarType.LEARNED:
            model_log_variance = model_var_values.astype(jnp.float32)
            model_variance = jnp.exp(model_log_variance)
        else:
            # Interpolate log-variance between the posterior (min) and beta
            # (max) using the [-1, 1] model output (gd.py:268-276).
            min_log = extract(sched.posterior_log_variance_clipped, t, nd)
            max_log = extract(sched.log_betas, t, nd)
            frac = (model_var_values.astype(jnp.float32) + 1.0) / 2.0
            model_log_variance = frac * max_log + (1.0 - frac) * min_log
            model_variance = jnp.exp(model_log_variance)
    else:
        if cfg.var_type == VarType.FIXED_LARGE:
            model_variance = extract(sched.fixed_large_variance, t, nd)
            model_log_variance = extract(sched.fixed_large_log_variance, t, nd)
        else:  # FIXED_SMALL
            model_variance = extract(sched.posterior_variance, t, nd)
            model_log_variance = extract(sched.posterior_log_variance_clipped, t, nd)
        model_variance = jnp.broadcast_to(model_variance, x.shape)
        model_log_variance = jnp.broadcast_to(model_log_variance, x.shape)

    def process_xstart(x0):
        if denoised_fn is not None:
            x0 = denoised_fn(x0)
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        return x0

    model_output_f32 = model_output.astype(jnp.float32)
    if cfg.mean_type == MeanType.PREVIOUS_X:
        pred_xstart = process_xstart(
            predict_xstart_from_xprev(sched, x, t, model_output_f32)
        )
        model_mean = model_output_f32
    elif cfg.mean_type in (MeanType.START_X, MeanType.EPSILON, MeanType.VELOCITY):
        if cfg.mean_type == MeanType.START_X:
            pred_xstart = process_xstart(model_output_f32)
        elif cfg.mean_type == MeanType.VELOCITY:
            pred_xstart = process_xstart(
                predict_xstart_from_v(sched, x, t, model_output_f32)
            )
        else:
            pred_xstart = process_xstart(
                predict_xstart_from_eps(sched, x, t, model_output_f32)
            )
        model_mean, _, _ = q_posterior_mean_variance(sched, pred_xstart, x, t)
    else:
        raise NotImplementedError(cfg.mean_type)

    model_log_variance = jnp.broadcast_to(model_log_variance, x.shape)
    return {
        "mean": model_mean,
        "variance": model_variance,
        "log_variance": model_log_variance,
        "pred_xstart": pred_xstart,
        "model_output": model_output,
    }


def condition_mean(
    cond_fn, sched: Schedule, cfg: DiffusionConfig, p_mean_var, x, t, model_kwargs=None
):
    """Shift the reverse mean by variance * grad log p(y|x) (gd.py:356-369)."""
    model_kwargs = model_kwargs or {}
    gradient = cond_fn(x, model_timesteps(sched, cfg, t), **model_kwargs)
    return p_mean_var["mean"].astype(jnp.float32) + p_mean_var[
        "variance"
    ] * gradient.astype(jnp.float32)


def condition_score(
    cond_fn, sched: Schedule, cfg: DiffusionConfig, p_mean_var, x, t, model_kwargs=None
):
    """Song-style score conditioning: adjust eps, re-derive x̂_0 and the mean
    (gd.py:371-393)."""
    model_kwargs = model_kwargs or {}
    nd = x.ndim
    alpha_bar = extract(sched.alphas_cumprod, t, nd)
    eps = predict_eps_from_xstart(sched, x, t, p_mean_var["pred_xstart"])
    eps = eps - jnp.sqrt(1.0 - alpha_bar) * cond_fn(
        x, model_timesteps(sched, cfg, t), **model_kwargs
    )
    out = dict(p_mean_var)
    out["pred_xstart"] = predict_xstart_from_eps(sched, x, t, eps)
    out["mean"], _, _ = q_posterior_mean_variance(sched, out["pred_xstart"], x, t)
    return out
