"""Unit tests for beta schedules and coefficient tables vs float64 oracles.

The oracle formulas are derived independently from the DDPM posterior
definitions (Ho et al. 2020 eqs. 4, 6-7); the reference tables
(gaussian_diffusion.py:118-169) implement the same math, so matching the
oracle establishes parity.
"""

import numpy as np
import pytest

from ddpm3d_tpu.diffusion import schedules as S


def test_linear_schedule_endpoints():
    betas = S.linear_beta_schedule(1000)
    assert betas.shape == (1000,)
    assert betas.dtype == np.float64
    np.testing.assert_allclose(betas[0], 1e-4)
    np.testing.assert_allclose(betas[-1], 0.02)
    # scale-invariance: T=500 doubles the endpoints
    betas500 = S.linear_beta_schedule(500)
    np.testing.assert_allclose(betas500[0], 2e-4)
    np.testing.assert_allclose(betas500[-1], 0.04)


def test_cosine_schedule_bounds():
    betas = S.cosine_beta_schedule(1000)
    assert (betas > 0).all() and (betas <= 0.999).all()
    # cosine schedule: alpha_bar decreases monotonically
    acp = np.cumprod(1 - betas)
    assert (np.diff(acp) < 0).all()


def test_schedule_tables_match_float64_oracle():
    T = 100
    betas = S.linear_beta_schedule(T)
    sched = S.make_schedule(betas)

    alphas = 1.0 - betas
    acp = np.cumprod(alphas)
    acp_prev = np.append(1.0, acp[:-1])
    acp_next = np.append(acp[1:], 0.0)
    post_var = betas * (1.0 - acp_prev) / (1.0 - acp)

    np.testing.assert_allclose(sched.alphas_cumprod, acp, rtol=1e-6)
    np.testing.assert_allclose(sched.alphas_cumprod_prev, acp_prev, rtol=1e-6)
    np.testing.assert_allclose(sched.alphas_cumprod_next, acp_next, rtol=1e-6)
    np.testing.assert_allclose(sched.sqrt_alphas_cumprod, np.sqrt(acp), rtol=1e-6)
    np.testing.assert_allclose(
        sched.sqrt_one_minus_alphas_cumprod, np.sqrt(1 - acp), rtol=1e-6
    )
    np.testing.assert_allclose(
        sched.sqrt_recip_alphas_cumprod, np.sqrt(1 / acp), rtol=1e-6
    )
    np.testing.assert_allclose(
        sched.sqrt_recipm1_alphas_cumprod, np.sqrt(1 / acp - 1), rtol=1e-6
    )
    np.testing.assert_allclose(sched.posterior_variance, post_var, rtol=1e-6)
    np.testing.assert_allclose(
        sched.posterior_log_variance_clipped,
        np.log(np.append(post_var[1], post_var[1:])),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        sched.posterior_mean_coef1,
        betas * np.sqrt(acp_prev) / (1 - acp),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        sched.posterior_mean_coef2,
        (1 - acp_prev) * np.sqrt(alphas) / (1 - acp),
        rtol=1e-6,
    )
    # FIXED_LARGE table (reference gd.py:281-284)
    np.testing.assert_allclose(
        sched.fixed_large_variance, np.append(post_var[1], betas[1:]), rtol=1e-6
    )
    np.testing.assert_array_equal(sched.timestep_map, np.arange(T))


def test_space_timesteps_ddim():
    steps = S.space_timesteps(1000, "ddim10")
    assert steps == set(range(0, 1000, 100))
    assert len(steps) == 10


def test_space_timesteps_sections():
    # 300 steps in sections of [10, 15, 20]: each section is 100 steps
    steps = S.space_timesteps(300, [10, 15, 20])
    assert len(steps) == 45
    assert min(steps) == 0 and max(steps) < 300


def test_space_timesteps_full_identity():
    steps = S.space_timesteps(1000, [1000])
    assert steps == set(range(1000))


def test_space_timesteps_errors():
    with pytest.raises(ValueError):
        S.space_timesteps(10, "ddim7")  # no integer stride gives exactly 7
    with pytest.raises(ValueError):
        S.space_timesteps(10, [20])  # more steps than the section holds


def test_spaced_schedule_roundtrip_betas():
    """Respaced betas must reproduce the retained alpha-bar subsequence
    (the invariant behind reference respace.py:78-85)."""
    T = 1000
    betas = S.linear_beta_schedule(T)
    keep = sorted(S.space_timesteps(T, "ddim50"))
    sp = S.make_spaced_schedule(betas, keep)
    assert sp.num_timesteps == 50
    acp_full = np.cumprod(1 - betas)
    np.testing.assert_allclose(
        np.asarray(sp.alphas_cumprod), acp_full[keep], rtol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(sp.timestep_map), keep)


def test_spaced_schedule_identity_when_all_kept():
    T = 50
    betas = S.linear_beta_schedule(T)
    sp = S.make_spaced_schedule(betas, range(T))
    full = S.make_schedule(betas)
    np.testing.assert_allclose(
        np.asarray(sp.betas), np.asarray(full.betas), rtol=1e-6
    )
