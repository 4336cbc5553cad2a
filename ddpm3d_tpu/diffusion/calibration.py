"""Epsilon-scale calibration: measure and correct a model's systematic
eps bias so deterministic / fewer-step samplers work.

Motivation (RESPACING.json + tools/respacing_debug.py): trained
conditional denoisers can carry a small multiplicative eps bias
lambda(t) (here ~1.003-1.011 at t >= 500) that full-chain ancestral
sampling tolerates but every deterministic or respaced sampler (DDIM,
respaced DDPM, DPM-Solver++) integrates into collapse. The bias is a
per-timestep SCALAR, so it is cheaply measurable teacher-forced on
training/validation volumes and removable at sampling time:

    lambda(t) = <eps_hat, eps> / <eps, eps>     (fit over draws)
    eps_corrected(x, t) = eps_hat(x, t) / lambda(t)

This module estimates the lambda table and wraps a model function with
the correction (the variance head passes through untouched). A
beyond-the-reference capability.

Honest scope note (measured on the study checkpoint): lambda fitted on
TRAINING volumes came out ~1.000 while held-out volumes show 1.003-1.011
— i.e. that model's bias is per-volume generalization error, which an
offline global table cannot remove (verified: correction did not rescue
its respaced chains). The tool applies when a model has a genuine global
miscalibration; its estimator and wrapper are exact (tests inject a known
lambda(t) and recover it to 2e-3).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import process
from .process import DiffusionConfig
from .schedules import Schedule


def estimate_eps_scale(
    key: jax.Array,
    model_fn: Callable,
    sched: Schedule,
    cfg: DiffusionConfig,
    x0: jnp.ndarray,
    model_kwargs: Optional[Dict[str, Any]] = None,
    t_points: Optional[Sequence[int]] = None,
    draws: int = 4,
) -> np.ndarray:
    """Teacher-forced lambda(t) fit on clean data ``x0`` [B, ...].

    Returns a dense [T] float32 table (linear interpolation between the
    sampled t points). Use training/validation volumes, NOT the volume
    being denoised.
    """
    T = sched.num_timesteps
    if t_points is None:
        t_points = sorted({int(t) for t in np.linspace(0, T - 1, 17)})
    B = x0.shape[0]

    @jax.jit
    def lam_at(t_scalar, k):
        eps = jax.random.normal(k, x0.shape, jnp.float32)
        t = jnp.full((B,), t_scalar, jnp.int32)
        x_t = process.q_sample(sched, x0, t, eps)
        out = process.p_mean_variance(
            model_fn, sched, cfg, x_t, t,
            clip_denoised=False, model_kwargs=model_kwargs,
        )
        nd = x_t.ndim
        eps_hat = (
            process.extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t
            - out["pred_xstart"]
        ) / process.extract(sched.sqrt_recipm1_alphas_cumprod, t, nd)
        return jnp.sum(eps_hat * eps), jnp.sum(eps * eps)

    lams = []
    for t_s in t_points:
        num = den = 0.0
        for d in range(draws):
            n, dd = lam_at(jnp.asarray(t_s),
                           jax.random.fold_in(key, 10007 * t_s + d))
            num += float(n)
            den += float(dd)
        lams.append(num / max(den, 1e-12))
    table = np.interp(np.arange(T), np.asarray(t_points, np.float64),
                      np.asarray(lams, np.float64)).astype(np.float32)
    return table


def eps_corrected_model_fn(
    model_fn: Callable,
    lam_table: np.ndarray,
    learn_sigma: bool = True,
    rescale_timesteps: bool = False,
    original_num_steps: int = 1000,
) -> Callable:
    """Wrap ``model_fn`` so its eps output is divided by lambda(t).

    ``lam_table`` indexes ORIGINAL timesteps (the model's t domain), so
    the wrapper composes transparently with spaced schedules (which remap
    t before calling the model). With ``rescale_timesteps=True`` the model
    receives float t scaled to 0..1000 (process.model_timesteps); pass the
    matching flags so the wrapper inverts that scaling before indexing."""
    lam = jnp.asarray(lam_table, jnp.float32)

    def wrapped(x, t, **kw):
        out = model_fn(x, t, **kw)
        if rescale_timesteps:
            t_idx = jnp.round(t * (original_num_steps / 1000.0)).astype(jnp.int32)
        else:
            t_idx = t.astype(jnp.int32)
        scale = lam[jnp.clip(t_idx, 0, lam.shape[0] - 1)]
        scale = scale.reshape((-1,) + (1,) * (out.ndim - 1))
        if learn_sigma:
            C = out.shape[-1] // 2
            eps, var = out[..., :C], out[..., C:]
            return jnp.concatenate([eps / scale, var], axis=-1)
        return out / scale

    return wrapped
