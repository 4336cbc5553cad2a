"""Tests for the lax.scan samplers (DDPM / DDIM / reverse ODE)."""

import jax
import jax.numpy as jnp
import numpy as np

from ddpm3d_tpu.diffusion import (
    DiffusionConfig,
    LossType,
    MeanType,
    VarType,
    ddim_reverse_sample,
    ddim_sample_loop,
    linear_beta_schedule,
    make_schedule,
    make_spaced_schedule,
    p_sample_loop,
    space_timesteps,
)

SHAPE = (1, 4, 8, 8, 1)
T = 10


def _betas(n=T):
    # Small explicit betas: the scaled linear schedule is invalid for very
    # short chains (T=10 would scale beta_end to 2.0 > 1).
    return np.linspace(1e-4, 0.02, n)


def _setup(var_type=VarType.FIXED_SMALL):
    sched = make_schedule(_betas())
    cfg = DiffusionConfig(MeanType.EPSILON, var_type, LossType.MSE,
                          original_num_steps=T)
    return sched, cfg


def _zero_eps_model(x, t, **kw):
    return jnp.zeros_like(x)


def test_p_sample_loop_shape_and_determinism():
    sched, cfg = _setup()
    key = jax.random.key(7)
    s1 = p_sample_loop(key, _zero_eps_model, sched, cfg, shape=SHAPE)
    s2 = p_sample_loop(key, _zero_eps_model, sched, cfg, shape=SHAPE)
    assert s1.shape == SHAPE
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    assert np.isfinite(np.asarray(s1)).all()
    s3 = p_sample_loop(jax.random.key(8), _zero_eps_model, sched, cfg, shape=SHAPE)
    assert np.abs(np.asarray(s1) - np.asarray(s3)).max() > 1e-4


def test_p_sample_loop_matched_noise_entry():
    """Supplying `noise` pins x_T (the parity path, reference gd.py:510-513)."""
    sched, cfg = _setup()
    noise = jnp.ones(SHAPE) * 0.5
    out = p_sample_loop(jax.random.key(0), _zero_eps_model, sched, cfg, noise=noise)
    assert out.shape == SHAPE


def test_ddim_eta0_is_deterministic_in_key():
    sched, cfg = _setup()
    noise = jnp.asarray(
        np.random.default_rng(3).normal(size=SHAPE), dtype=jnp.float32
    )
    a = ddim_sample_loop(jax.random.key(1), _zero_eps_model, sched, cfg,
                         noise=noise, eta=0.0)
    b = ddim_sample_loop(jax.random.key(2), _zero_eps_model, sched, cfg,
                         noise=noise, eta=0.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_ddim_analytic_zero_eps():
    """With model eps == 0 and no clipping, DDIM(eta=0) maps x_T to
    x0_hat * prod-free closed form: each step sets
    x_{t-1} = sqrt(acp_{t-1}) * x_t / sqrt(acp_t); telescoping gives
    x_0 = x_T / sqrt(acp_{T-1})."""
    sched, cfg = _setup()
    noise = jnp.full(SHAPE, 0.25)
    out = ddim_sample_loop(
        jax.random.key(0), _zero_eps_model, sched, cfg,
        noise=noise, eta=0.0, clip_denoised=False,
    )
    acp = np.cumprod(1 - _betas())
    expect = 0.25 / np.sqrt(acp[-1])
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-3)


def test_respaced_ddim_runs():
    betas = linear_beta_schedule(100)
    sp = make_spaced_schedule(betas, sorted(space_timesteps(100, "ddim5")))
    cfg = DiffusionConfig(MeanType.EPSILON, VarType.FIXED_SMALL, LossType.MSE,
                          original_num_steps=100)
    out = ddim_sample_loop(
        jax.random.key(0), _zero_eps_model, sp, cfg, shape=SHAPE, eta=0.0
    )
    assert out.shape == SHAPE
    assert np.isfinite(np.asarray(out)).all()


def test_return_intermediates():
    sched, cfg = _setup()
    final, inter = p_sample_loop(
        jax.random.key(0), _zero_eps_model, sched, cfg, shape=SHAPE,
        return_intermediates=True,
    )
    assert inter.shape == (T,) + SHAPE
    np.testing.assert_array_equal(np.asarray(inter[-1]), np.asarray(final))


def test_ddim_reverse_inverts_forward():
    """eta=0 DDIM: reverse-ODE encode then decode approximately round-trips
    for a linear (zero-eps) model without clipping."""
    sched, cfg = _setup()
    x0 = jnp.full(SHAPE, 0.125)

    def encode(x):
        for t_scalar in range(T - 1):  # 0 .. T-2, matching x_t -> x_{t+1}
            t = jnp.full((1,), t_scalar, dtype=jnp.int32)
            x = ddim_reverse_sample(
                _zero_eps_model, sched, cfg, x, t, clip_denoised=False
            )["sample"]
        return x

    x_T = encode(x0)
    back = ddim_sample_loop(
        jax.random.key(0), _zero_eps_model, sched, cfg,
        noise=x_T, eta=0.0, clip_denoised=False,
    )
    np.testing.assert_allclose(np.asarray(back), np.asarray(x0), rtol=5e-2)


def test_segmented_chain_equals_monolithic():
    """sample_chain_segment runs compose bit-identically to p_sample_loop
    (per-step keys fold on t) — the relay-watchdog-safe execution mode."""
    from ddpm3d_tpu.diffusion import sample_chain_segment

    sched, cfg = _setup()
    model = lambda x, t, **kw: jnp.tanh(x) * 0.1
    key = jax.random.key(3)
    ids = jnp.arange(1, dtype=jnp.int32)
    noise = jax.random.normal(jax.random.key(9), SHAPE)
    mono = p_sample_loop(key, model, sched, cfg, noise=noise, sample_ids=ids)
    img = noise
    t_cur = T
    while t_cur > 0:
        n = min(3, t_cur)
        img = sample_chain_segment(
            key, model, sched, cfg, img, jnp.asarray(t_cur, jnp.int32), n,
            sample_ids=ids,
        )
        t_cur -= n
    np.testing.assert_array_equal(np.asarray(img), np.asarray(mono))


def test_p_sample_loop_jits_once():
    """The whole chain must be jittable as one program."""
    sched, cfg = _setup()

    @jax.jit
    def run(key):
        return p_sample_loop(key, _zero_eps_model, sched, cfg, shape=SHAPE)

    out = run(jax.random.key(0))
    assert out.shape == SHAPE


def test_noise_stream_matches_manual_chain():
    """An explicit per-step noise stream reproduces a hand-rolled chain
    using the same noises — the external-RNG (torch) parity path."""
    from ddpm3d_tpu.diffusion.sampling import p_sample

    sched, cfg = _setup(VarType.FIXED_SMALL)
    rng = np.random.default_rng(3)
    x_T = jnp.asarray(rng.normal(size=SHAPE).astype(np.float32))
    stream = jnp.asarray(rng.normal(size=(T,) + SHAPE).astype(np.float32))

    out = p_sample_loop(
        jax.random.key(0), _zero_eps_model, sched, cfg,
        noise=x_T, noise_stream=stream,
    )

    img = x_T
    for i, t_scalar in enumerate(range(T - 1, -1, -1)):
        step = p_sample(
            jax.random.key(999), _zero_eps_model, sched, cfg, img,
            jnp.full((SHAPE[0],), t_scalar, jnp.int32),
            noise_override=stream[i],
        )
        img = step["sample"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_noise_stream_ddim_eta1():
    """DDIM with eta=1 consumes the stream too (stochastic branch)."""
    sched, cfg = _setup(VarType.FIXED_SMALL)
    rng = np.random.default_rng(4)
    x_T = jnp.asarray(rng.normal(size=SHAPE).astype(np.float32))
    stream = jnp.asarray(rng.normal(size=(T,) + SHAPE).astype(np.float32))
    a = ddim_sample_loop(
        jax.random.key(0), _zero_eps_model, sched, cfg,
        noise=x_T, eta=1.0, noise_stream=stream,
    )
    b = ddim_sample_loop(
        jax.random.key(1), _zero_eps_model, sched, cfg,
        noise=x_T, eta=1.0, noise_stream=stream,
    )
    # stream overrides the key entirely: different keys, same output
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
