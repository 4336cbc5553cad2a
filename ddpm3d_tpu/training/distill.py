"""Progressive distillation: halve the sampling chain, teacher -> student.

Beyond-reference capability (Salimans & Ho, "Progressive Distillation for
Fast Sampling of Diffusion Models", ICLR 2022), built to make the <2-minute
whole-volume target reachable: the reference's only sampler is the full
1000-step DDPM chain (gaussian_diffusion.py:514-535), whose per-step cost
bounds volume time above the target on any hardware. Distillation trains a
student whose N/2-step deterministic (DDIM) chain reproduces the teacher's
N-step chain; repeating halves 1000 -> 500 -> ... -> a few dozen steps at
quality the eps-parameterized respacing study showed plain respacing cannot
reach (tools/respacing_study.py, RESPACING.json).

Discrete-time formulation over the existing ``Schedule`` tables:

- teacher chain = spaced schedule over kept original steps K (sorted),
  |K| = 2N; student chain keeps the odd positions K[1::2] (|K|/2 steps).
  Student internal step i therefore has acp == teacher's internal 2i+1,
  and its DDIM predecessor acp == teacher's internal 2i-1 (or 1.0 at i=0)
  — exactly the two teacher DDIM steps the student must compress.
- the distillation target is expressed in x0-space: the x̃0 that makes ONE
  student DDIM step from x_t land on the teacher's two-step result z'':
      x̃0 = (z'' - (sig''/sig) x_t) / (alpha'' - (sig''/sig) alpha)
  then converted to the model's output parameterization (v / eps / x0);
  MSE in v-space equals the paper's recommended (SNR+1)-weighted x0 loss.

The student is initialized from the teacher and the procedure iterates
with the student as the next teacher. All phases train with the SAME model
architecture and the same t-conditioning domain (original-chain timesteps
via ``timestep_map``), so a distilled checkpoint is a drop-in for the
normal inference pipeline with ``--timestep_respacing`` set to its chain.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion import losses as dlosses
from ..diffusion import process
from ..diffusion.process import DiffusionConfig, MeanType, VarType
from ..diffusion.sampling import ddim_sample
from ..diffusion.schedules import Schedule, make_spaced_schedule
from ..parallel import mesh as pmesh
from ..utils import logger


def halve_timesteps(use_timesteps: Sequence[int]) -> list:
    """Student kept-step set: odd positions of the sorted teacher set.

    Keeps the final (highest-t) step so the student chain still starts at
    the same x_T marginal; the lowest kept step's DDIM predecessor is the
    clean image (acp_prev = 1) for both chains."""
    ts = sorted(use_timesteps)
    if len(ts) % 2:
        raise ValueError(f"teacher chain length {len(ts)} must be even")
    return ts[1::2]


def distill_schedules(
    betas: np.ndarray, teacher_use_timesteps: Sequence[int]
) -> Tuple[Schedule, Schedule, list]:
    """Build (teacher_sched, student_sched, student_use_timesteps)."""
    t_ts = sorted(teacher_use_timesteps)
    s_ts = halve_timesteps(t_ts)
    return (
        make_spaced_schedule(betas, t_ts),
        make_spaced_schedule(betas, s_ts),
        s_ts,
    )


def distill_targets(
    key: jax.Array,
    teacher_fn: Callable,
    teacher_sched: Schedule,
    student_sched: Schedule,
    cfg: DiffusionConfig,
    x_t: jnp.ndarray,
    i: jnp.ndarray,
    model_kwargs: Optional[Dict[str, Any]] = None,
    clip_denoised: bool = True,
) -> jnp.ndarray:
    """Teacher two-step DDIM from x_t at student step i -> x0-space target.

    ``i`` is the STUDENT-internal timestep index [B]; the matching teacher
    internal indices are 2i+1 then 2i.
    """
    nd = x_t.ndim
    j = 2 * i + 1
    out1 = ddim_sample(
        key, teacher_fn, teacher_sched, cfg, x_t, j,
        clip_denoised=clip_denoised, model_kwargs=model_kwargs, eta=0.0,
    )
    out2 = ddim_sample(
        key, teacher_fn, teacher_sched, cfg, out1["sample"], j - 1,
        clip_denoised=clip_denoised, model_kwargs=model_kwargs, eta=0.0,
    )
    z2 = out2["sample"]

    alpha = process.extract(student_sched.sqrt_alphas_cumprod, i, nd)
    sigma = process.extract(student_sched.sqrt_one_minus_alphas_cumprod, i, nd)
    acp_prev = process.extract(student_sched.alphas_cumprod_prev, i, nd)
    alpha_p = jnp.sqrt(acp_prev)
    sigma_p = jnp.sqrt(1.0 - acp_prev)
    ratio = sigma_p / sigma
    # denominator alpha_p - ratio*alpha > 0: acp_prev > acp along any chain
    return (z2 - ratio * x_t) / (alpha_p - ratio * alpha)


def target_to_model_space(
    sched: Schedule, mean_type: MeanType, x_t, i, x0_target
):
    """Convert an x0-space target into the model's output parameterization.

    v-space MSE == (SNR+1)-weighted x0 MSE — the paper's recommended
    weighting; eps-space MSE == SNR-weighted."""
    nd = x_t.ndim
    alpha = process.extract(sched.sqrt_alphas_cumprod, i, nd)
    sigma = process.extract(sched.sqrt_one_minus_alphas_cumprod, i, nd)
    if mean_type == MeanType.VELOCITY:
        return (alpha * x_t - x0_target) / sigma
    if mean_type == MeanType.EPSILON:
        return (x_t - alpha * x0_target) / sigma
    if mean_type == MeanType.START_X:
        return x0_target
    raise NotImplementedError(f"distillation with {mean_type}")


def distill_losses(
    key: jax.Array,
    student_params,
    teacher_params,
    model_apply: Callable,
    teacher_sched: Schedule,
    student_sched: Schedule,
    cfg: DiffusionConfig,
    x_start: jnp.ndarray,
    i: jnp.ndarray,
    model_kwargs: Optional[Dict[str, Any]] = None,
    noise: Optional[jnp.ndarray] = None,
    clip_denoised: bool = True,
    vb_weight: float = 0.0,
) -> Dict[str, jnp.ndarray]:
    """Per-example distillation loss at student timesteps ``i`` [B].

    With ``learn_sigma`` models the variance channels are excluded from the
    distillation MSE (the distilled chain samples deterministically; DDIM /
    DPM-Solver ignore them). ``vb_weight > 0`` additionally trains the
    variance head against the student schedule's VLB (frozen mean) so
    DDPM-ancestral sampling at the distilled step count stays calibrated.
    """
    model_kwargs = model_kwargs or {}
    if noise is None:
        key, nkey = jax.random.split(key)
        noise = jax.random.normal(nkey, x_start.shape, dtype=x_start.dtype)
    x_t = process.q_sample(student_sched, x_start, i, noise)

    teacher_fn = lambda x, t, **kw: model_apply(
        {"params": teacher_params}, x, t, **kw
    )
    x0_target = jax.lax.stop_gradient(
        distill_targets(
            key, teacher_fn, teacher_sched, student_sched, cfg, x_t, i,
            model_kwargs=model_kwargs, clip_denoised=clip_denoised,
        )
    )
    target = target_to_model_space(
        student_sched, cfg.mean_type, x_t, i, x0_target
    )

    s_out = model_apply(
        {"params": student_params},
        x_t, process.model_timesteps(student_sched, cfg, i), **model_kwargs,
    )
    terms: Dict[str, jnp.ndarray] = {}
    learned = cfg.var_type in (VarType.LEARNED, VarType.LEARNED_RANGE)
    if learned:
        C = x_t.shape[-1]
        s_mean, s_var = jnp.split(s_out, 2, axis=-1)
        if vb_weight > 0.0:
            frozen = jnp.concatenate(
                [jax.lax.stop_gradient(s_mean), s_var], axis=-1
            )
            terms["vb"] = vb_weight * dlosses.vb_terms_bpd(
                lambda *a, **k: frozen, student_sched, cfg,
                x_start, x_t, i, clip_denoised=False,
            )["output"]
        s_out = s_mean
    terms["mse"] = dlosses.mean_flat(
        (target.astype(jnp.float32) - s_out.astype(jnp.float32)) ** 2
    )
    terms["loss"] = terms["mse"] + terms.get("vb", 0.0)
    return terms


def make_distill_step(
    model_apply: Callable,
    teacher_sched: Schedule,
    student_sched: Schedule,
    cfg: DiffusionConfig,
    optimizer: optax.GradientTransformation,
    ema_rate: float = 0.0,
    clip_denoised: bool = True,
    vb_weight: float = 0.0,
):
    """Jittable ``step(opt_state, student, ema, teacher, batch, cond, key,
    step) -> (opt_state, student, ema, metrics)``.

    Data-parallel under a sharded batch exactly like the train step
    (training/train_loop.py): XLA inserts the gradient all-reduce."""
    N = student_sched.num_timesteps

    def loss_fn(student_params, teacher_params, batch, cond, i, key):
        terms = distill_losses(
            key, student_params, teacher_params, model_apply,
            teacher_sched, student_sched, cfg, batch, i,
            model_kwargs=cond, clip_denoised=clip_denoised,
            vb_weight=vb_weight,
        )
        return jnp.mean(terms["loss"]), terms

    def step_fn(opt_state, student, ema, teacher, batch, cond, key, step):
        B = batch.shape[0]
        t_key, l_key = jax.random.split(jax.random.fold_in(key, step))
        i = jax.random.randint(t_key, (B,), 0, N, dtype=jnp.int32)
        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            student, teacher, batch, cond, i, l_key
        )
        grad_norm = jnp.sqrt(sum(
            jnp.sum(jnp.square(g.astype(jnp.float32)))
            for g in jax.tree_util.tree_leaves(grads)
        ))
        finite = jnp.isfinite(grad_norm)
        safe = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        updates, new_opt = optimizer.update(safe, opt_state, student)
        new_student = optax.apply_updates(student, updates)
        new_student, new_opt = jax.tree_util.tree_map(
            lambda new, old: jnp.where(finite, new, old),
            (new_student, new_opt), (student, opt_state),
        )
        if ema_rate:
            new_ema = jax.tree_util.tree_map(
                lambda e, p: jnp.where(
                    finite, e * ema_rate + p * (1.0 - ema_rate), e
                ),
                ema, new_student,
            )
        else:
            new_ema = ema
        metrics = {
            "loss": loss,
            "mse": jnp.mean(terms["mse"]),
            "grad_norm": grad_norm,
            "skipped_nonfinite": 1.0 - finite.astype(jnp.float32),
        }
        if "vb" in terms:
            metrics["vb"] = jnp.mean(terms["vb"])
        return new_opt, new_student, new_ema, metrics

    return step_fn


def distill_phase(
    model_apply: Callable,
    teacher_params,
    betas: np.ndarray,
    teacher_use_timesteps: Sequence[int],
    cfg: DiffusionConfig,
    data,
    *,
    steps: int,
    lr: float = 1e-4,
    weight_decay: float = 0.0,
    ema_rate: float = 0.0,
    clip_denoised: bool = True,
    vb_weight: float = 0.0,
    mesh=None,
    seed: int = 0,
    log_every: int = 50,
):
    """One halving: train a student on the teacher's chain / 2.

    Returns ``(student_params, student_use_timesteps)``. ``data`` yields
    ``(batch, cond_dict)`` like the training loader.
    """
    t_sched, s_sched, s_ts = distill_schedules(betas, teacher_use_timesteps)
    first = next(data)
    if mesh is None:
        # the data-mesh size must divide the batch (same rule as TrainLoop)
        import math as _math

        n_data = _math.gcd(int(first[0].shape[0]), len(jax.devices()))
        mesh = pmesh.make_mesh(n_data=n_data)
    optimizer = optax.adamw(lr, weight_decay=weight_decay)

    step_fn = jax.jit(
        make_distill_step(
            model_apply, t_sched, s_sched, cfg, optimizer,
            ema_rate=ema_rate, clip_denoised=clip_denoised,
            vb_weight=vb_weight,
        ),
        donate_argnums=(0, 1, 2),
    )
    # student/ema/teacher must be DISTINCT buffers: student is donated, and
    # device_put of an already-placed array is a no-op (same buffer), so
    # copy each tree rather than re-replicating the same leaves.
    copy = lambda tree: jax.tree_util.tree_map(jnp.copy, tree)
    teacher = pmesh.replicate(mesh, teacher_params)
    student = pmesh.replicate(mesh, copy(teacher_params))
    # without EMA pass a scalar placeholder (returned unchanged)
    ema = (
        pmesh.replicate(mesh, copy(teacher_params))
        if ema_rate
        else pmesh.replicate(mesh, jnp.zeros(()))
    )
    opt_state = pmesh.replicate(mesh, optimizer.init(student))
    key = jax.random.key(seed)

    for step in range(steps):
        batch, cond = first if step == 0 else next(data)
        batch = pmesh.shard_batch(mesh, jnp.asarray(batch))
        cond = {
            k: pmesh.shard_batch(mesh, jnp.asarray(v)) for k, v in cond.items()
        }
        opt_state, student, ema, metrics = step_fn(
            opt_state, student, ema, teacher, batch, cond, key, step
        )
        if step % log_every == 0 or step == steps - 1:
            m = jax.device_get(metrics)
            logger.logkv("distill/steps_to", s_sched.num_timesteps)
            for k, v in m.items():
                logger.logkv_mean(f"distill/{k}", float(v))
            logger.logkv("distill/step", step)
            logger.dumpkvs()
    return jax.device_get(ema if ema_rate else student), s_ts


def progressive_distill(
    model_apply: Callable,
    params,
    betas: np.ndarray,
    cfg: DiffusionConfig,
    data,
    *,
    target_steps: int,
    steps_per_phase: int,
    start_use_timesteps: Optional[Sequence[int]] = None,
    lr: float = 1e-4,
    **phase_kwargs,
):
    """Iterate halvings until the chain is <= ``target_steps`` long.

    Yields ``(params, use_timesteps)`` after each phase so callers can
    checkpoint/evaluate intermediate students."""
    use_ts = (
        list(range(len(betas)))
        if start_use_timesteps is None
        else sorted(start_use_timesteps)
    )
    # validate the whole halving ladder up front (failing at phase 3 after
    # hours of training is rude): every intermediate length must be even
    n = len(use_ts)
    while n > target_steps:
        if n % 2:
            raise ValueError(
                f"halving ladder hits odd chain length {n} before reaching "
                f"{target_steps}; start from an even/power-of-two chain "
                f"(e.g. --start_respacing 512 or 256 for a 1000-step teacher)"
            )
        n //= 2
    while len(use_ts) > target_steps:
        logger.log(
            f"distilling {len(use_ts)} -> {len(use_ts) // 2} steps "
            f"({steps_per_phase} optimizer steps)"
        )
        params, use_ts = distill_phase(
            model_apply, params, betas, use_ts, cfg, data,
            steps=steps_per_phase, lr=lr, **phase_kwargs,
        )
        yield params, use_ts
