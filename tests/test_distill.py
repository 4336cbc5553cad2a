"""Progressive distillation (training/distill.py) — schedule halving
algebra, target exactness on analytic teachers, and a tiny end-to-end
phase on a real model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm3d_tpu.diffusion import (
    DiffusionConfig,
    LossType,
    MeanType,
    VarType,
    ddim_sample,
    extract,
    predict_v,
    q_sample,
)
from ddpm3d_tpu.diffusion.schedules import (
    cosine_beta_schedule,
    make_spaced_schedule,
)
from ddpm3d_tpu.training.distill import (
    distill_losses,
    distill_phase,
    distill_schedules,
    distill_targets,
    halve_timesteps,
    target_to_model_space,
)

T = 16
SHAPE = (2, 2, 8, 8, 1)


def _betas():
    return cosine_beta_schedule(T)


def test_halve_timesteps():
    assert halve_timesteps(range(10)) == [1, 3, 5, 7, 9]
    assert halve_timesteps([0, 5, 9, 15]) == [5, 15]
    with pytest.raises(ValueError):
        halve_timesteps([1, 2, 3])


def test_distill_schedules_acp_alignment():
    """Student acp[i] == teacher acp[2i+1]; student's DDIM predecessor acp
    == teacher acp[2i-1] (1.0 at i=0) — the two-teacher-steps contract."""
    t_sched, s_sched, s_ts = distill_schedules(_betas(), range(T))
    assert s_sched.num_timesteps == T // 2
    t_acp = np.asarray(t_sched.alphas_cumprod)
    s_acp = np.asarray(s_sched.alphas_cumprod)
    s_prev = np.asarray(s_sched.alphas_cumprod_prev)
    for i in range(T // 2):
        np.testing.assert_allclose(s_acp[i], t_acp[2 * i + 1], rtol=1e-6)
        expect_prev = 1.0 if i == 0 else t_acp[2 * i - 1]
        np.testing.assert_allclose(s_prev[i], expect_prev, rtol=1e-6)
    assert s_ts == sorted(s_ts)


def _oracle(sched, x0, mean_type):
    def model(x, t, **kw):
        nd = x.ndim
        a = extract(sched.sqrt_alphas_cumprod, sched_inv(sched)[t], nd)
        s = extract(sched.sqrt_one_minus_alphas_cumprod, sched_inv(sched)[t], nd)
        eps = (x - a * x0) / s
        if mean_type == MeanType.VELOCITY:
            return a * eps - s * x0
        return eps
    return model


def sched_inv(sched):
    """original-timestep -> internal-index inverse of timestep_map."""
    tm = np.asarray(sched.timestep_map)
    inv = np.zeros(int(tm.max()) + 1, np.int32)
    inv[tm] = np.arange(len(tm))
    return jnp.asarray(inv)


@pytest.mark.parametrize("mean_type", [MeanType.EPSILON, MeanType.VELOCITY])
def test_distill_target_exact_for_oracle_teacher(rng, mean_type):
    """A perfect teacher (always recovers the true x0) yields the true x0
    as distillation target — algebraic exactness of the inversion."""
    t_sched, s_sched, _ = distill_schedules(_betas(), range(T))
    cfg = DiffusionConfig(mean_type, VarType.FIXED_SMALL, LossType.MSE,
                          original_num_steps=T)
    x0 = jnp.asarray(np.clip(rng.normal(size=SHAPE) * 0.3, -1, 1), jnp.float32)
    noise = jnp.asarray(rng.normal(size=SHAPE), jnp.float32)
    teacher = _oracle(t_sched, x0, mean_type)
    for i_s in range(T // 2):
        i = jnp.full((SHAPE[0],), i_s, jnp.int32)
        x_t = q_sample(s_sched, x0, i, noise)
        x0_hat = distill_targets(
            jax.random.key(0), teacher, t_sched, s_sched, cfg, x_t, i,
            clip_denoised=True,
        )
        np.testing.assert_allclose(
            np.asarray(x0_hat), np.asarray(x0), rtol=5e-4, atol=5e-4
        )


def test_student_onestep_reproduces_teacher_twostep(rng):
    """The defining property: one student DDIM step using the target x̃0
    lands exactly on the teacher's two-step result z''."""
    t_sched, s_sched, _ = distill_schedules(_betas(), range(T))
    cfg = DiffusionConfig(MeanType.VELOCITY, VarType.FIXED_SMALL,
                          LossType.MSE, original_num_steps=T)
    x0 = jnp.asarray(np.clip(rng.normal(size=SHAPE) * 0.3, -1, 1), jnp.float32)
    noise = jnp.asarray(rng.normal(size=SHAPE), jnp.float32)
    teacher = _oracle(t_sched, x0, MeanType.VELOCITY)
    i = jnp.array([5, 2])
    x_t = q_sample(s_sched, x0, i, noise)

    # teacher two-step
    j = 2 * i + 1
    z1 = ddim_sample(jax.random.key(0), teacher, t_sched, cfg, x_t, j)["sample"]
    z2 = ddim_sample(jax.random.key(0), teacher, t_sched, cfg, z1, j - 1)["sample"]

    # student one-step with a model that outputs the converted target
    x0_hat = distill_targets(
        jax.random.key(0), teacher, t_sched, s_sched, cfg, x_t, i
    )
    v_target = target_to_model_space(s_sched, MeanType.VELOCITY, x_t, i, x0_hat)

    inv = sched_inv(s_sched)
    student = lambda x, t, **kw: v_target
    z_student = ddim_sample(
        jax.random.key(0), student, s_sched, cfg, x_t, i,
        clip_denoised=False,  # target may exceed [-1,1] slightly; keep exact
    )["sample"]
    np.testing.assert_allclose(
        np.asarray(z_student), np.asarray(z2), rtol=2e-4, atol=2e-4
    )


def test_distill_losses_zero_for_perfect_student(rng):
    t_sched, s_sched, _ = distill_schedules(_betas(), range(T))
    cfg = DiffusionConfig(MeanType.VELOCITY, VarType.FIXED_SMALL,
                          LossType.MSE, original_num_steps=T)
    x0 = jnp.asarray(np.clip(rng.normal(size=SHAPE) * 0.3, -1, 1), jnp.float32)

    inv_t = sched_inv(t_sched)

    # teacher AND student are the same oracle: model_apply keyed on params
    def model_apply(variables, x, t, **kw):
        nd = x.ndim
        idx = inv_t[t]
        a = extract(t_sched.sqrt_alphas_cumprod, idx, nd)
        s = extract(t_sched.sqrt_one_minus_alphas_cumprod, idx, nd)
        eps = (x - a * x0) / s
        return a * eps - s * x0

    i = jnp.array([3, 6])
    terms = distill_losses(
        jax.random.key(1), {}, {}, model_apply, t_sched, s_sched, cfg,
        x0, i, clip_denoised=True,
    )
    # oracle teacher's target == true x0 == what the oracle student encodes
    assert float(terms["mse"].max()) < 1e-6


def test_distill_phase_end_to_end(rng):
    """Tiny real model: one halving phase runs, loss finite, params move."""
    from ddpm3d_tpu.models import UNetModel

    model = UNetModel(
        in_channels=1, model_channels=32, out_channels=2, num_res_blocks=1,
        attention_resolutions=(), channel_mult=(1, 2), dims=3,
        use_scale_shift_norm=True, resblock_updown=True,
    )
    x = jnp.zeros((1, 2, 8, 8, 1))
    t0 = jnp.zeros((1,), jnp.int32)
    params = model.init(jax.random.key(0), x, t0)["params"]
    cfg = DiffusionConfig(MeanType.VELOCITY, VarType.LEARNED_RANGE,
                          LossType.MSE, original_num_steps=T)

    def data_gen():
        k = 0
        while True:
            arr = np.random.default_rng(k).normal(size=(2, 2, 8, 8, 1))
            yield jnp.asarray(np.clip(arr * 0.3, -1, 1), jnp.float32), {}
            k += 1

    student, s_ts = distill_phase(
        model.apply, params, _betas(), range(T), cfg, data_gen(),
        steps=3, lr=1e-3, ema_rate=0.0, vb_weight=0.001,
    )
    assert len(s_ts) == T // 2
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), params, student
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0.0
