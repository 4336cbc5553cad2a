"""Training runtime: jitted train step + host driver loop.

Clean-room equivalent of reference train_util.py (TrainLoop) and
fp16_util.py (MixedPrecisionTrainer), redesigned TPU-first:

- ONE jitted ``train_step`` fuses: timestep sampling, q_sample, model
  fwd/bwd, grad-norm/NaN guard, AdamW, EMA (all rates), and the
  loss-aware-sampler update. The reference spreads this over Python
  (train_util.py:190-248).
- bf16 compute torso + fp32 master params replaces fp16 + dynamic loss
  scaling (fp16_util.py:148-233): bf16's exponent range needs no scaling;
  the grad_norm/param_norm metrics and the skip-step-on-nonfinite guard
  (fp16_util.py:193-197) are preserved.
- microbatch gradient accumulation is a ``lax.scan`` (reference slices
  batches in Python, train_util.py:198-232).
- data parallelism: batch arrays sharded over the mesh's ``data`` axis;
  XLA emits the gradient all-reduce (replacing DDP/NCCL,
  train_util.py:102-110).
- checkpoints keep the reference's filename contract
  (utils/checkpoint.py).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion import DiffusionConfig, Schedule, training_losses
from ..parallel import mesh as pmesh
from ..utils import checkpoint as ckpt
from ..utils import logger
from .resample import (
    LossSecondMomentState,
    init_loss_second_moment,
    sample_loss_second_moment,
    sample_uniform,
    update_loss_second_moment,
)

INITIAL_LOG_LOSS_SCALE = 20.0  # kept for CLI/metric parity (train_util.py:19)


class TrainState(NamedTuple):
    step: jnp.ndarray                      # i32 scalar
    params: Any                            # fp32 master params
    opt_state: Any
    ema_params: Tuple[Any, ...]            # one pytree per EMA rate
    sampler_state: Optional[LossSecondMomentState]
    # f32 scalar, only with fp16 dynamic loss scaling (fp16_util.py:165)
    lg_loss_scale: Optional[jnp.ndarray] = None


def make_optimizer(
    lr: float, weight_decay: float, lr_anneal_steps: int
) -> optax.GradientTransformation:
    """AdamW with the reference's linear anneal-to-zero
    (train_util.py:238-244)."""
    if lr_anneal_steps:
        schedule = lambda step: lr * jnp.maximum(
            0.0, 1.0 - step / lr_anneal_steps
        )
    else:
        schedule = lr
    return optax.adamw(
        schedule, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay
    )


def _global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves)
    )


def make_train_step(
    model_apply: Callable,
    sched: Schedule,
    cfg: DiffusionConfig,
    optimizer: optax.GradientTransformation,
    ema_rates: Tuple[float, ...],
    schedule_sampler: str = "uniform",
    microbatch: int = 0,
    dropout: bool = False,
    fp16_scaling: bool = False,
    fp16_scale_growth: float = 1e-3,
):
    """Build the pure train_step(state, batch, cond, key) -> (state, metrics).

    ``batch``/``cond['low_res']`` are NDHWC [B, D, H, W, 1]; with microbatch
    m > 0 and B % m == 0, gradients accumulate over B/m scan iterations
    (averaged, matching the reference's repeated backward()).

    ``fp16_scaling`` enables dynamic loss scaling with the reference's exact
    policy (fp16_util.py:176-208): loss scaled by 2^lg before backward,
    grads unscaled before the update; non-finite grads drop lg by 1 and skip
    the step, otherwise lg grows by ``fp16_scale_growth`` per step. bf16
    training does not need this (the default path); the switch exists for
    float16-torso models, matching the reference capability."""
    from ..ops.quant import int8_enabled

    if int8_enabled():
        raise RuntimeError(
            "DDPM3D_INT8=1 is inference-only: the int8 conv path rounds "
            "activations (zero gradient) and would silently break training. "
            "Unset it for train jobs."
        )
    use_lsm = schedule_sampler == "loss-second-moment"

    def loss_for(params, key, x, mkwargs, t, weights, loss_scale):
        noise_key, drop_key = jax.random.split(key)

        def model_fn(xx, tt, **kw):
            rngs = {"dropout": drop_key} if dropout else None
            return model_apply(
                {"params": params}, xx, tt, train=dropout, rngs=rngs, **kw
            )

        terms = training_losses(
            noise_key, model_fn, sched, cfg, x, t, model_kwargs=mkwargs
        )
        loss = jnp.mean(terms["loss"] * weights) * loss_scale
        return loss, terms

    def train_step(state: TrainState, batch, cond, key):
        B = batch.shape[0]
        t_key, loss_key = jax.random.split(jax.random.fold_in(key, state.step))

        if use_lsm:
            t, weights = sample_loss_second_moment(t_key, state.sampler_state, B)
        else:
            t, weights = sample_uniform(t_key, sched.num_timesteps, B)

        grad_fn = jax.grad(loss_for, has_aux=True)
        if fp16_scaling:
            loss_scale = jnp.exp2(state.lg_loss_scale)
        else:
            loss_scale = jnp.float32(1.0)

        m = microbatch if microbatch and microbatch > 0 else B
        if m >= B:
            grads, terms = grad_fn(
                state.params, loss_key, batch, cond, t, weights, loss_scale
            )
        else:
            assert B % m == 0, f"batch {B} not divisible by microbatch {m}"
            n_micro = B // m
            resh = lambda x: x.reshape((n_micro, m) + x.shape[1:])
            mb = jax.tree_util.tree_map(resh, (batch, cond, t, weights))
            mb = (jnp.arange(n_micro),) + mb

            def scan_body(carry, xs):
                acc = carry
                idx, xb, cb, tb, wb = xs
                g, terms_i = grad_fn(
                    state.params,
                    jax.random.fold_in(loss_key, idx),
                    xb, cb, tb, wb, loss_scale,
                )
                acc = jax.tree_util.tree_map(jnp.add, acc, g)
                return acc, terms_i

            zero = jax.tree_util.tree_map(
                lambda p: jnp.zeros_like(p, dtype=jnp.float32), state.params
            )
            grads, terms_stack = jax.lax.scan(scan_body, zero, mb)
            grads = jax.tree_util.tree_map(lambda g: g / n_micro, grads)
            terms = jax.tree_util.tree_map(
                lambda x: x.reshape((B,) + x.shape[2:]), terms_stack
            )

        if fp16_scaling:
            # unscale before the update; norms reported on unscaled grads
            # (the reference divides its logged norm by 2^lg the same way,
            # fp16_util.py:217-222)
            grads = jax.tree_util.tree_map(
                lambda g: g.astype(jnp.float32) / loss_scale, grads
            )
        grad_norm = _global_norm(grads)
        param_norm = _global_norm(state.params)
        finite = jnp.isfinite(grad_norm)

        # Skip the update on non-finite grads (the reference's NaN-skip,
        # fp16_util.py:193-197) — rare in bf16 but kept for robustness.
        safe_grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        updates, new_opt_state = optimizer.update(
            safe_grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        new_params, new_opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(finite, new, old),
            (new_params, new_opt_state),
            (state.params, state.opt_state),
        )

        new_ema = tuple(
            jax.tree_util.tree_map(
                lambda e, p: jnp.where(
                    finite, e * rate + p * (1.0 - rate), e
                ),
                ema,
                new_params,
            )
            for rate, ema in zip(ema_rates, state.ema_params)
        )

        new_sampler_state = state.sampler_state
        if use_lsm:
            new_sampler_state = update_loss_second_moment(
                state.sampler_state, t, jax.lax.stop_gradient(terms["loss"])
            )

        new_lg = state.lg_loss_scale
        if fp16_scaling:
            # backoff-by-1 on overflow, slow growth otherwise
            # (fp16_util.py:193-208)
            new_lg = jnp.where(
                finite,
                state.lg_loss_scale + fp16_scale_growth,
                state.lg_loss_scale - 1.0,
            )

        metrics = {
            "grad_norm": grad_norm,
            "param_norm": param_norm,
            "skipped_nonfinite": 1.0 - finite.astype(jnp.float32),
            "t": t,
        }
        if fp16_scaling:
            metrics["lg_loss_scale"] = new_lg
        for k, v in terms.items():
            metrics[k] = v * weights

        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema_params=new_ema,
            sampler_state=new_sampler_state,
            lg_loss_scale=new_lg,
        )
        return new_state, metrics

    return train_step


def log_loss_dict(num_timesteps: int, ts: np.ndarray, losses: Dict[str, np.ndarray]):
    """Mean + per-quartile loss logging (reference train_util.py:316-322)."""
    for key, values in losses.items():
        values = np.asarray(values)
        logger.logkv_mean(key, float(values.mean()))
        for sub_t, sub_loss in zip(np.asarray(ts), values):
            quartile = int(4 * sub_t / num_timesteps)
            logger.logkv_mean(f"{key}_q{quartile}", float(sub_loss))


class TrainLoop:
    """Host-side training driver (reference train_util.py:22-276)."""

    def __init__(
        self,
        *,
        model,
        sched: Schedule,
        cfg: DiffusionConfig,
        data,
        batch_size: int,
        microbatch: int,
        lr: float,
        ema_rate,
        log_interval: int,
        save_interval: int,
        resume_checkpoint: str = "",
        use_fp16: bool = True,  # accepted for CLI parity; bf16 is implied
        fp16_scale_growth: float = 1e-3,
        # opt-in float16 dynamic loss scaling (reference fp16_util.py
        # capability); bf16 (the TPU default) does not need it
        use_fp16_scaling: bool = False,
        schedule_sampler: str = "uniform",
        weight_decay: float = 0.0,
        lr_anneal_steps: int = 0,
        mesh=None,
        seed: int = 0,
        example_batch=None,
        example_cond=None,
        auto_resume: bool = False,
    ):
        self.model = model
        self.sched = sched
        self.cfg = cfg
        self.data = data
        self.batch_size = batch_size
        self.microbatch = microbatch if microbatch > 0 else batch_size
        self.lr = lr
        self.ema_rate = (
            [ema_rate]
            if isinstance(ema_rate, float)
            else [float(x) for x in str(ema_rate).split(",")]
        )
        self.log_interval = log_interval
        self.save_interval = save_interval
        if auto_resume and not resume_checkpoint:
            # preemption-safe restart: pick up the newest checkpoint in the
            # run directory (the reference's find_resume_checkpoint hook,
            # train_util.py:300-303, left unimplemented there)
            found = ckpt.latest_checkpoint(logger.get_dir() or "")
            if found:
                logger.log(f"auto-resuming from {found}")
                resume_checkpoint = found
        self.resume_checkpoint = resume_checkpoint
        self.schedule_sampler = schedule_sampler
        self.lr_anneal_steps = lr_anneal_steps
        if mesh is None:
            # the data-mesh size must divide the global batch; default to
            # the largest divisor of batch_size that fits the device count
            import math as _math

            n_data = _math.gcd(batch_size, len(jax.devices()))
            mesh = pmesh.make_mesh(n_data=n_data)
        self.mesh = mesh
        self.key = jax.random.key(seed)
        # batch_size is the GLOBAL batch under single-controller JAX (the
        # reference multiplies per-rank batch by world size,
        # train_util.py:68-73; here the sharded array already spans devices).
        self.global_batch = self.batch_size

        self.resume_step = 0
        self.use_fp16_scaling = use_fp16_scaling
        self.optimizer = make_optimizer(lr, weight_decay, lr_anneal_steps)
        if example_batch is None:
            example_batch, example_cond = next(self.data)
        self._init_state(example_batch, example_cond)

        self.train_step_fn = make_train_step(
            self.model.apply,
            sched,
            cfg,
            self.optimizer,
            tuple(self.ema_rate),
            schedule_sampler=schedule_sampler,
            microbatch=self.microbatch if self.microbatch < batch_size else 0,
            dropout=getattr(model, "dropout", 0.0) > 0,
            fp16_scaling=use_fp16_scaling,
            fp16_scale_growth=fp16_scale_growth,
        )
        self._jitted = jax.jit(self.train_step_fn, donate_argnums=(0,))
        self.step = 0
        self._pending_metrics = []  # (step, device metrics), drained lazily
        self._example = (example_batch, example_cond)

    def _init_state(self, example_batch, example_cond):
        init_key, self.key = jax.random.split(self.key)
        # init on CPU at minimal spatial size: params are spatial-size
        # invariant, eager init on the accelerator compiles each op
        # separately (very slow via remote compile), and full-resolution CPU
        # init is compute-bound. The replicate() below moves params to the
        # mesh.
        levels = len(getattr(self.model, "channel_mult", (1, 2)))
        hw = max(16, 2 ** (levels - 1))
        with jax.default_device(jax.devices("cpu")[0]):
            small = lambda a: jnp.zeros((1, 2, hw, hw, a.shape[-1]), a.dtype)
            xb = small(jnp.asarray(example_batch[:1]))
            cb = {
                k: small(jnp.asarray(v[:1])) for k, v in example_cond.items()
            }
            t0 = jnp.zeros((1,), jnp.int32)
            variables = self.model.init(
                {"params": init_key, "dropout": init_key}, xb, t0, **cb
            )
        params = variables["params"]

        if self.resume_checkpoint:
            self.resume_step = ckpt.parse_resume_step_from_filename(
                self.resume_checkpoint
            )
            logger.log(f"loading model from checkpoint: {self.resume_checkpoint}...")
            params = ckpt.load_pytree(self.resume_checkpoint, target=params)

        opt_state = self.optimizer.init(params)

        ema_params = []
        for rate in self.ema_rate:
            tree = jax.tree_util.tree_map(jnp.copy, params)
            if self.resume_checkpoint and self.resume_step:
                ema_path = ckpt.find_ema_checkpoint(
                    self.resume_checkpoint, self.resume_step, rate
                )
                if ema_path:
                    logger.log(f"loading EMA from checkpoint: {ema_path}...")
                    tree = ckpt.load_pytree(ema_path, target=tree)
            ema_params.append(tree)

        if self.resume_checkpoint and self.resume_step:
            opt_path = ckpt.find_opt_checkpoint(
                self.resume_checkpoint, self.resume_step
            )
            if opt_path:
                logger.log(f"loading optimizer state from checkpoint: {opt_path}")
                opt_state = ckpt.load_pytree(opt_path, target=opt_state)

        sampler_state = (
            init_loss_second_moment(self.sched.num_timesteps)
            if self.schedule_sampler == "loss-second-moment"
            else None
        )
        state = TrainState(
            step=jnp.asarray(self.resume_step, jnp.int32),
            params=params,
            opt_state=opt_state,
            ema_params=tuple(ema_params),
            sampler_state=sampler_state,
            lg_loss_scale=(
                jnp.asarray(INITIAL_LOG_LOSS_SCALE, jnp.float32)
                if self.use_fp16_scaling else None
            ),
        )
        self.state = pmesh.replicate(self.mesh, state)

        n_params = sum(
            int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params)
        )
        logger.log(f"parameters:{{{n_params}}}")

    def run_loop(self):
        """(reference train_util.py:169-188)"""
        while (
            not self.lr_anneal_steps
            or self.step + self.resume_step < self.lr_anneal_steps
        ):
            batch, cond = next(self.data)
            self.run_step(batch, cond)
            if self.step % self.log_interval == 0:
                self._drain_metrics()
                logger.dumpkvs()
            if self.step % self.save_interval == 0:
                self._drain_metrics()
                self.save()
                if os.environ.get("DIFFUSION_TRAINING_TEST", "") and self.step > 0:
                    return
            self.step += 1
        self._drain_metrics()
        if (self.step - 1) % self.save_interval != 0:
            self.save()

    def run_step(self, batch, cond):
        step_key, self.key = jax.random.split(self.key)
        batch_dev = pmesh.shard_batch(self.mesh, jnp.asarray(batch))
        cond_dev = {
            k: pmesh.shard_batch(self.mesh, jnp.asarray(v)) for k, v in cond.items()
        }
        self.state, metrics = self._jitted(self.state, batch_dev, cond_dev, step_key)
        # Defer the host readback: device_get here would block until the
        # step finishes, serializing every dispatch with the device (and,
        # through a tunneled runtime, adding a full round-trip per step).
        # Metrics stay on device and drain at log/save boundaries, letting
        # JAX's async dispatch pipeline consecutive steps.
        self._pending_metrics.append((self.step, metrics))

    def _drain_metrics(self):
        for step_i, metrics in self._pending_metrics:
            self._log_metrics(metrics, step_i)
        self._pending_metrics.clear()

    def _log_metrics(self, metrics, step_i):
        metrics = jax.device_get(metrics)
        ts = metrics.pop("t")
        logger.logkv_mean("grad_norm", float(metrics.pop("grad_norm")))
        logger.logkv_mean("param_norm", float(metrics.pop("param_norm")))
        if "lg_loss_scale" in metrics:
            logger.logkv("lg_loss_scale", float(metrics.pop("lg_loss_scale")))
        skipped = float(metrics.pop("skipped_nonfinite"))
        if skipped:
            logger.log(
                f"Found non-finite grads; skipped optimizer step {step_i}"
            )
        losses = {k: v for k, v in metrics.items()}
        log_loss_dict(self.sched.num_timesteps, ts, losses)
        logger.logkv("step", step_i + self.resume_step)
        logger.logkv(
            "samples", (step_i + self.resume_step + 1) * self.global_batch
        )

    def save(self):
        """(reference train_util.py:250-276)"""
        state = jax.device_get(self.state)
        step = self.step + self.resume_step
        directory = logger.get_dir()
        ema_by_rate = {
            str(rate): tree
            for rate, tree in zip(self.ema_rate, state.ema_params)
        }
        logger.log(f"saving model at step {step}...")
        ckpt.save_train_checkpoint(
            directory, step, state.params, ema_by_rate, state.opt_state
        )
