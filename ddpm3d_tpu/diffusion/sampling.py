"""Single-program samplers: DDPM ancestral and DDIM, as ``lax.scan`` loops.

The reference drives 1000 reverse steps from Python, launching one graph per
step (gaussian_diffusion.py:487-535, 659-707). Here the whole chain compiles
to ONE XLA program: per-step coefficients are gathered from the ``Schedule``
tables inside the scan body and the t==0 noise mask is a ``jnp.where`` — no
shape-dependent Python control flow.

PRNG: explicit ``jax.random`` keys (replacing the reference's global
``th.manual_seed(10)``, scripts/test.py:44-49). Matched-noise parity with the
reference is available through the ``noise`` argument, mirroring gd.py:510-513.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from . import process
from .process import DiffusionConfig
from .schedules import Schedule


def _step_noise(key, x, sample_ids):
    """Per-step Gaussian noise; with ``sample_ids`` [B] the noise of each
    batch element is keyed individually, making results invariant to batch
    composition/chunking (e.g. identical on 1 chip or 8)."""
    if sample_ids is None:
        return jax.random.normal(key, x.shape, dtype=jnp.float32)
    return jax.vmap(
        lambda sid: jax.random.normal(
            jax.random.fold_in(key, sid), x.shape[1:], dtype=jnp.float32
        )
    )(sample_ids)


def p_sample(
    key: jax.Array,
    model_fn,
    sched: Schedule,
    cfg: DiffusionConfig,
    x: jnp.ndarray,
    t: jnp.ndarray,
    clip_denoised: bool = True,
    denoised_fn=None,
    cond_fn=None,
    model_kwargs: Optional[Dict[str, Any]] = None,
    sample_ids: Optional[jnp.ndarray] = None,
    noise_override: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """One DDPM ancestral step x_t -> x_{t-1} (reference gd.py:395-439).

    ``noise_override`` replaces the key-derived step noise — the exact-parity
    path for matching an external RNG stream (e.g. the reference's torch
    global RNG, gd.py:430)."""
    out = process.p_mean_variance(
        model_fn, sched, cfg, x, t,
        clip_denoised=clip_denoised, denoised_fn=denoised_fn,
        model_kwargs=model_kwargs,
    )
    noise = (
        noise_override if noise_override is not None
        else _step_noise(key, x, sample_ids)
    )
    nonzero_mask = (t != 0).astype(jnp.float32).reshape((-1,) + (1,) * (x.ndim - 1))
    if cond_fn is not None:
        out["mean"] = process.condition_mean(
            cond_fn, sched, cfg, out, x, t, model_kwargs=model_kwargs
        )
    sample = out["mean"] + nonzero_mask * jnp.exp(0.5 * out["log_variance"]) * noise
    return {"sample": sample, "pred_xstart": out["pred_xstart"]}


def ddim_sample(
    key: jax.Array,
    model_fn,
    sched: Schedule,
    cfg: DiffusionConfig,
    x: jnp.ndarray,
    t: jnp.ndarray,
    clip_denoised: bool = True,
    denoised_fn=None,
    cond_fn=None,
    model_kwargs: Optional[Dict[str, Any]] = None,
    eta: float = 0.0,
    sample_ids: Optional[jnp.ndarray] = None,
    noise_override: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """One DDIM step (reference gd.py:537-585)."""
    out = process.p_mean_variance(
        model_fn, sched, cfg, x, t,
        clip_denoised=clip_denoised, denoised_fn=denoised_fn,
        model_kwargs=model_kwargs,
    )
    if cond_fn is not None:
        out = process.condition_score(
            cond_fn, sched, cfg, out, x, t, model_kwargs=model_kwargs
        )
    nd = x.ndim
    eps = process.predict_eps_from_xstart(sched, x, t, out["pred_xstart"])
    alpha_bar = process.extract(sched.alphas_cumprod, t, nd)
    alpha_bar_prev = process.extract(sched.alphas_cumprod_prev, t, nd)
    sigma = (
        eta
        * jnp.sqrt((1.0 - alpha_bar_prev) / (1.0 - alpha_bar))
        * jnp.sqrt(1.0 - alpha_bar / alpha_bar_prev)
    )
    noise = (
        noise_override if noise_override is not None
        else _step_noise(key, x, sample_ids)
    )
    mean_pred = (
        out["pred_xstart"] * jnp.sqrt(alpha_bar_prev)
        + jnp.sqrt(1.0 - alpha_bar_prev - sigma ** 2) * eps
    )
    nonzero_mask = (t != 0).astype(jnp.float32).reshape((-1,) + (1,) * (nd - 1))
    sample = mean_pred + nonzero_mask * sigma * noise
    return {"sample": sample, "pred_xstart": out["pred_xstart"]}


def ddim_reverse_sample(
    model_fn,
    sched: Schedule,
    cfg: DiffusionConfig,
    x: jnp.ndarray,
    t: jnp.ndarray,
    clip_denoised: bool = True,
    denoised_fn=None,
    model_kwargs: Optional[Dict[str, Any]] = None,
) -> Dict[str, jnp.ndarray]:
    """Deterministic DDIM reverse-ODE step x_t -> x_{t+1} (gd.py:587-623)."""
    out = process.p_mean_variance(
        model_fn, sched, cfg, x, t,
        clip_denoised=clip_denoised, denoised_fn=denoised_fn,
        model_kwargs=model_kwargs,
    )
    nd = x.ndim
    eps = (
        process.extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x
        - out["pred_xstart"]
    ) / process.extract(sched.sqrt_recipm1_alphas_cumprod, t, nd)
    alpha_bar_next = process.extract(sched.alphas_cumprod_next, t, nd)
    mean_pred = (
        out["pred_xstart"] * jnp.sqrt(alpha_bar_next)
        + jnp.sqrt(1.0 - alpha_bar_next) * eps
    )
    return {"sample": mean_pred, "pred_xstart": out["pred_xstart"]}


def _scan_loop(step_fn, key, noise, num_steps, return_intermediates,
               t_hi=None, t_lo=0, noise_stream=None):
    """Run reverse steps t_hi-1 .. t_lo as a single lax.scan.

    Per-step keys are ``fold_in(key, t)``, so running the chain in segments
    (several calls covering [t_hi, t_lo) ranges) is bit-identical to one
    monolithic scan.

    ``noise_stream`` ([n_steps, *x.shape], ordered t_hi-1 .. t_lo) scans an
    explicit per-step noise next to the timesteps — the external-RNG parity
    path."""
    if t_hi is None:
        t_hi = num_steps

    def body(img, xs):
        t_scalar, step_noise = xs
        step_key = jax.random.fold_in(key, t_scalar)
        out = step_fn(step_key, img, t_scalar, step_noise)
        y = out["sample"] if return_intermediates else None
        return out["sample"], y

    ts = jnp.arange(t_hi - 1, t_lo - 1, -1)
    if noise_stream is None:
        stream = jnp.zeros((ts.shape[0], 0))  # unused placeholder
        final, ys = jax.lax.scan(
            lambda img, xs: body(img, (xs[0], None)), noise, (ts, stream)
        )
    else:
        final, ys = jax.lax.scan(body, noise, (ts, noise_stream))
    return (final, ys) if return_intermediates else final


def p_sample_loop(
    key: jax.Array,
    model_fn,
    sched: Schedule,
    cfg: DiffusionConfig,
    shape=None,
    noise: Optional[jnp.ndarray] = None,
    clip_denoised: bool = True,
    denoised_fn=None,
    cond_fn=None,
    model_kwargs: Optional[Dict[str, Any]] = None,
    return_intermediates: bool = False,
    sample_ids: Optional[jnp.ndarray] = None,
    t_hi: Optional[int] = None,
    t_lo: int = 0,
    noise_stream: Optional[jnp.ndarray] = None,
):
    """Full DDPM ancestral sampling chain compiled to one XLA program
    (replaces the Python loop of reference gd.py:441-535).

    ``noise_stream`` ([n_steps, *shape], ordered t=T-1..0) supplies explicit
    per-step noises, matching an external RNG stream exactly (parity with
    the reference's torch-global-RNG draws, gd.py:430).

    ``t_hi``/``t_lo`` run only the [t_hi-1 .. t_lo] segment of the chain
    (``noise`` is then x_{t_hi}); segment runs compose bit-identically to
    the monolithic chain because per-step noise keys fold on t.

    Exactly one of ``shape`` / ``noise`` must pin the sample shape; when
    ``noise`` is given it is used as x_T (parity path for matched-noise
    comparison against the reference). ``sample_ids`` [B] keys each batch
    element's noise individually — results then do not depend on how
    samples are batched/sharded."""
    if noise is None:
        assert shape is not None, "provide shape or noise"
        key, init_key = jax.random.split(key)
        noise = _step_noise(
            init_key, jnp.zeros(tuple(shape), jnp.float32), sample_ids
        )

    B = noise.shape[0]

    def step(step_key, img, t_scalar, step_noise=None):
        t = jnp.full((B,), t_scalar, dtype=jnp.int32)
        return p_sample(
            step_key, model_fn, sched, cfg, img, t,
            clip_denoised=clip_denoised, denoised_fn=denoised_fn,
            cond_fn=cond_fn, model_kwargs=model_kwargs,
            sample_ids=sample_ids, noise_override=step_noise,
        )

    return _scan_loop(
        step, key, noise, sched.num_timesteps, return_intermediates,
        t_hi=t_hi, t_lo=t_lo, noise_stream=noise_stream,
    )


def sample_chain_segment(
    key: jax.Array,
    model_fn,
    sched: Schedule,
    cfg: DiffusionConfig,
    img: jnp.ndarray,
    t_start: jnp.ndarray,
    num_steps: int,
    *,
    use_ddim: bool = False,
    eta: float = 0.0,
    clip_denoised: bool = True,
    denoised_fn=None,
    cond_fn=None,
    model_kwargs: Optional[Dict[str, Any]] = None,
    sample_ids: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Advance ``num_steps`` (static) reverse steps from traced ``t_start``:
    runs t = t_start-1 .. t_start-num_steps.

    One compilation serves every segment position because ``t_start`` is a
    traced scalar; per-step noise keys fold on t, so segment runs compose
    bit-identically to the monolithic :func:`p_sample_loop`. This bounds
    single-device-execution time for environments that watchdog-kill long
    program runs (e.g. 1000-step 96^3 chains through a TPU relay)."""
    B = img.shape[0]

    def body(carry, i):
        t_scalar = t_start - 1 - i
        step_key = jax.random.fold_in(key, t_scalar)
        t = jnp.full((B,), t_scalar, dtype=jnp.int32)
        fn = ddim_sample if use_ddim else p_sample
        extra = {"eta": eta} if use_ddim else {}
        out = fn(
            step_key, model_fn, sched, cfg, carry, t,
            clip_denoised=clip_denoised, denoised_fn=denoised_fn,
            cond_fn=cond_fn, model_kwargs=model_kwargs,
            sample_ids=sample_ids, **extra,
        )
        return out["sample"], None

    final, _ = jax.lax.scan(body, img, jnp.arange(num_steps))
    return final


def p_sample_loop_progressive(
    key: jax.Array,
    model_fn,
    sched: Schedule,
    cfg: DiffusionConfig,
    shape=None,
    noise: Optional[jnp.ndarray] = None,
    clip_denoised: bool = True,
    denoised_fn=None,
    cond_fn=None,
    model_kwargs: Optional[Dict[str, Any]] = None,
):
    """Host-driven generator yielding each reverse step's output dict —
    the reference's progressive API (gd.py:487-535) for visualization and
    step-wise inspection. The step function is jitted once; prefer
    :func:`p_sample_loop` (single fused scan) for production sampling."""
    if noise is None:
        assert shape is not None, "provide shape or noise"
        key, init_key = jax.random.split(key)
        noise = jax.random.normal(init_key, tuple(shape), dtype=jnp.float32)
    B = noise.shape[0]

    @jax.jit
    def step(img, t_scalar, step_key):
        t = jnp.full((B,), t_scalar, dtype=jnp.int32)
        return p_sample(
            step_key, model_fn, sched, cfg, img, t,
            clip_denoised=clip_denoised, denoised_fn=denoised_fn,
            cond_fn=cond_fn, model_kwargs=model_kwargs,
        )

    img = noise
    for i in range(sched.num_timesteps - 1, -1, -1):
        out = step(img, jnp.asarray(i), jax.random.fold_in(key, i))
        yield out
        img = out["sample"]


def ddim_sample_loop(
    key: jax.Array,
    model_fn,
    sched: Schedule,
    cfg: DiffusionConfig,
    shape=None,
    noise: Optional[jnp.ndarray] = None,
    clip_denoised: bool = True,
    denoised_fn=None,
    cond_fn=None,
    model_kwargs: Optional[Dict[str, Any]] = None,
    eta: float = 0.0,
    return_intermediates: bool = False,
    sample_ids: Optional[jnp.ndarray] = None,
    t_hi: Optional[int] = None,
    t_lo: int = 0,
    noise_stream: Optional[jnp.ndarray] = None,
):
    """Full DDIM chain as one XLA program (reference gd.py:625-707)."""
    if noise is None:
        assert shape is not None, "provide shape or noise"
        key, init_key = jax.random.split(key)
        noise = _step_noise(
            init_key, jnp.zeros(tuple(shape), jnp.float32), sample_ids
        )

    B = noise.shape[0]

    def step(step_key, img, t_scalar, step_noise=None):
        t = jnp.full((B,), t_scalar, dtype=jnp.int32)
        return ddim_sample(
            step_key, model_fn, sched, cfg, img, t,
            clip_denoised=clip_denoised, denoised_fn=denoised_fn,
            cond_fn=cond_fn, model_kwargs=model_kwargs, eta=eta,
            sample_ids=sample_ids, noise_override=step_noise,
        )

    return _scan_loop(
        step, key, noise, sched.num_timesteps, return_intermediates,
        t_hi=t_hi, t_lo=t_lo, noise_stream=noise_stream,
    )
