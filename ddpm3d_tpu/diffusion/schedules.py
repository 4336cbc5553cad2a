"""Beta schedules and precomputed diffusion coefficient tables.

Behavioral parity targets (clean-room reimplementation, cited for audit):
- linear/cosine schedules: reference guided_diffusion/gaussian_diffusion.py:18-62
- coefficient tables (float64 accuracy, then f32): gaussian_diffusion.py:118-169
- FIXED_LARGE variance table: gaussian_diffusion.py:278-289

All tables are computed on the host in float64 and stored as float32
``jnp`` arrays, matching the reference which computes in float64 numpy and
casts to float at extraction time (gaussian_diffusion.py:897-910).

The ``Schedule`` NamedTuple is a pytree of per-timestep arrays and can be
closed over by jitted functions; indexing with a traced timestep tensor is a
single dynamic gather which XLA folds into the sampling scan.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Sequence

import jax.numpy as jnp
import numpy as np


def linear_beta_schedule(num_timesteps: int) -> np.ndarray:
    """Linear schedule from Ho et al., scaled so any T behaves like T=1000."""
    scale = 1000.0 / num_timesteps
    return np.linspace(
        scale * 0.0001, scale * 0.02, num_timesteps, dtype=np.float64
    )


def cosine_beta_schedule(num_timesteps: int, max_beta: float = 0.999) -> np.ndarray:
    """Cosine schedule from Nichol & Dhariwal (improved DDPM)."""

    def alpha_bar(t: float) -> float:
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

    return betas_for_alpha_bar(num_timesteps, alpha_bar, max_beta=max_beta)


def betas_for_alpha_bar(num_timesteps, alpha_bar, max_beta: float = 0.999) -> np.ndarray:
    """Discretize a continuous alpha-bar function into per-step betas."""
    t = np.arange(num_timesteps, dtype=np.float64)
    a1 = np.array([alpha_bar(ti / num_timesteps) for ti in t])
    a2 = np.array([alpha_bar((ti + 1) / num_timesteps) for ti in t])
    return np.minimum(1.0 - a2 / a1, max_beta)


def get_named_beta_schedule(name: str, num_timesteps: int) -> np.ndarray:
    if name == "linear":
        return linear_beta_schedule(num_timesteps)
    if name == "cosine":
        return cosine_beta_schedule(num_timesteps)
    raise NotImplementedError(f"unknown beta schedule: {name}")


class Schedule(NamedTuple):
    """Per-timestep diffusion coefficient tables (float32, length T).

    ``timestep_map`` maps internal (possibly respaced) step indices back to
    original-chain indices for the model's timestep conditioning; it is the
    identity when no respacing is applied (reference respace.py:116-128).
    """

    betas: jnp.ndarray
    log_betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    alphas_cumprod_next: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    fixed_large_variance: jnp.ndarray
    fixed_large_log_variance: jnp.ndarray
    timestep_map: jnp.ndarray

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])


def make_schedule(
    betas: np.ndarray, timestep_map: Optional[Sequence[int]] = None
) -> Schedule:
    """Build all coefficient tables from a 1-D beta array (float64 math)."""
    betas = np.asarray(betas, dtype=np.float64)
    assert betas.ndim == 1, "betas must be 1-D"
    assert (betas > 0).all() and (betas <= 1).all()
    num_timesteps = betas.shape[0]

    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    alphas_cumprod_next = np.append(alphas_cumprod[1:], 0.0)

    posterior_variance = (
        betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    )
    # Clip the t=0 entry (which is exactly 0) before taking the log
    # (reference gaussian_diffusion.py:157-161).
    if num_timesteps > 1:
        posterior_log_variance_clipped = np.log(
            np.append(posterior_variance[1], posterior_variance[1:])
        )
        fixed_large_variance = np.append(posterior_variance[1], betas[1:])
    else:
        # Degenerate single-step chain: the reference would IndexError here;
        # fall back to beta itself so a 1-step respacing still samples.
        posterior_log_variance_clipped = np.log(np.maximum(betas, 1e-20))
        fixed_large_variance = betas.copy()
    fixed_large_log_variance = np.log(fixed_large_variance)

    if timestep_map is None:
        timestep_map = np.arange(num_timesteps, dtype=np.int32)
    timestep_map = np.asarray(timestep_map, dtype=np.int32)
    assert timestep_map.shape == (num_timesteps,)

    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    # beta can reach exactly 1.0 at the end of short linear chains (T=20
    # scales beta_end to 1.0), making acp=0 so 1/acp=inf; the reference
    # tables carry the same infs, so only the numpy warning is suppressed.
    with np.errstate(divide="ignore"):
        sqrt_recip = np.sqrt(1.0 / alphas_cumprod)
        sqrt_recipm1 = np.sqrt(1.0 / alphas_cumprod - 1.0)
    return Schedule(
        betas=f32(betas),
        log_betas=f32(np.log(betas)),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        alphas_cumprod_next=f32(alphas_cumprod_next),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(sqrt_recip),
        sqrt_recipm1_alphas_cumprod=f32(sqrt_recipm1),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(posterior_log_variance_clipped),
        posterior_mean_coef1=f32(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        ),
        posterior_mean_coef2=f32(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
        fixed_large_variance=f32(fixed_large_variance),
        fixed_large_log_variance=f32(fixed_large_log_variance),
        timestep_map=jnp.asarray(timestep_map),
    )


def space_timesteps(num_timesteps: int, section_counts) -> set:
    """Select a subset of an original diffusion chain's timesteps.

    Accepts a comma-separated per-section count string, a list of counts, or
    the special ``"ddimN"`` striding. Semantics match reference
    respace.py:7-60 exactly (including the fractional striding + round()).
    """
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired_count = int(section_counts[len("ddim"):])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired_count:
                    return set(range(0, num_timesteps, i))
            raise ValueError(
                f"cannot create exactly {desired_count} steps with an integer stride"
            )
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps = []
    for i, section_count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < section_count:
            raise ValueError(
                f"cannot divide section of {size} steps into {section_count}"
            )
        frac_stride = 1 if section_count <= 1 else (size - 1) / (section_count - 1)
        cur_idx = 0.0
        for _ in range(section_count):
            all_steps.append(start_idx + round(cur_idx))
            cur_idx += frac_stride
        start_idx += size
    return set(all_steps)


def make_spaced_schedule(betas: np.ndarray, use_timesteps) -> Schedule:
    """Respaced schedule: recompute betas for a retained timestep subset.

    For each retained step i the new beta is ``1 - acp[i]/acp[last_kept]``
    and ``timestep_map`` records the original index so the model still sees
    original-chain timesteps (reference respace.py:72-86, 116-128).
    """
    betas = np.asarray(betas, dtype=np.float64)
    use_timesteps = set(use_timesteps)
    alphas_cumprod = np.cumprod(1.0 - betas, axis=0)
    last_alpha_cumprod = 1.0
    new_betas = []
    timestep_map = []
    for i, acp in enumerate(alphas_cumprod):
        if i in use_timesteps:
            new_betas.append(1.0 - acp / last_alpha_cumprod)
            last_alpha_cumprod = acp
            timestep_map.append(i)
    return make_schedule(np.array(new_betas), timestep_map=timestep_map)
