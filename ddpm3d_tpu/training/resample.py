"""Timestep schedule samplers as pure functions over explicit state.

Clean-room equivalent of reference guided_diffusion/resample.py:
- uniform sampling with unit weights (resample.py:61-67)
- loss-second-moment importance sampling with a 10-deep per-timestep loss
  history, sqrt(E[L^2]) weights, 0.001 uniform floor, and unbiased
  1/(T*p) loss weights (resample.py:124-154)

TPU-first redesign: the sampler state lives in the jitted train step and
updates from the *global* (sharded) batch, so the reference's two-round
``dist.all_gather`` synchronization (resample.py:83-104) disappears — every
process computes the identical update by construction.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class LossSecondMomentState(NamedTuple):
    """Shift-register loss history per timestep (resample.py:129-132)."""

    loss_history: jnp.ndarray  # [T, history_per_term] float32
    loss_counts: jnp.ndarray   # [T] int32

    @property
    def num_timesteps(self) -> int:
        return self.loss_history.shape[0]

    @property
    def history_per_term(self) -> int:
        return self.loss_history.shape[1]


def init_loss_second_moment(
    num_timesteps: int, history_per_term: int = 10
) -> LossSecondMomentState:
    return LossSecondMomentState(
        loss_history=jnp.zeros((num_timesteps, history_per_term), jnp.float32),
        loss_counts=jnp.zeros((num_timesteps,), jnp.int32),
    )


def _lsm_weights(state: LossSecondMomentState, uniform_prob: float) -> jnp.ndarray:
    """(resample.py:134-141); before warm-up the distribution is uniform."""
    T = state.num_timesteps
    warmed = jnp.all(state.loss_counts == state.history_per_term)
    w = jnp.sqrt(jnp.mean(state.loss_history ** 2, axis=-1))
    w = w / jnp.maximum(jnp.sum(w), 1e-20)
    w = w * (1.0 - uniform_prob) + uniform_prob / T
    return jnp.where(warmed, w, jnp.ones((T,), jnp.float32) / T)


def sample_uniform(
    key: jax.Array, num_timesteps: int, batch_size: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """UniformSampler.sample (resample.py:42-67): with uniform p the
    importance weights 1/(T*p) are exactly 1."""
    t = jax.random.randint(key, (batch_size,), 0, num_timesteps)
    return t, jnp.ones((batch_size,), jnp.float32)


def sample_loss_second_moment(
    key: jax.Array,
    state: LossSecondMomentState,
    batch_size: int,
    uniform_prob: float = 0.001,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Importance-sample t from the loss-history weights (resample.py:42-58)."""
    p = _lsm_weights(state, uniform_prob)
    t = jax.random.categorical(key, jnp.log(p), shape=(batch_size,))
    weights = 1.0 / (state.num_timesteps * p[t])
    return t, weights


def update_loss_second_moment(
    state: LossSecondMomentState,
    ts: jnp.ndarray,
    losses: jnp.ndarray,
) -> LossSecondMomentState:
    """Sequential shift-register update, one (t, loss) pair at a time —
    deterministic order matches the reference exactly (resample.py:143-151),
    including duplicate-t handling within a batch."""

    def body(i, carry):
        hist, counts = carry
        t = ts[i]
        loss = losses[i].astype(jnp.float32)
        cnt = counts[t]
        full = cnt == state.history_per_term
        row = hist[t]
        shifted = jnp.concatenate([row[1:], loss[None]])
        appended = jax.lax.dynamic_update_index_in_dim(
            row, loss, jnp.minimum(cnt, state.history_per_term - 1), 0
        )
        new_row = jnp.where(full, shifted, appended)
        hist = hist.at[t].set(new_row)
        counts = counts.at[t].set(jnp.where(full, cnt, cnt + 1))
        return hist, counts

    hist, counts = jax.lax.fori_loop(
        0, ts.shape[0], body, (state.loss_history, state.loss_counts)
    )
    return LossSecondMomentState(hist, counts)


def create_named_schedule_sampler(name: str, num_timesteps: int):
    """Factory parity (resample.py:8-20). Returns (init_state, sample_fn,
    update_fn); uniform has no state/update."""
    if name == "uniform":
        return (
            None,
            lambda key, state, bs: sample_uniform(key, num_timesteps, bs),
            lambda state, ts, losses: state,
        )
    if name == "loss-second-moment":
        return (
            init_loss_second_moment(num_timesteps),
            lambda key, state, bs: sample_loss_second_moment(key, state, bs),
            update_loss_second_moment,
        )
    raise NotImplementedError(f"unknown schedule sampler: {name}")
