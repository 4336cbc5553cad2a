"""Per-op device-time breakdown of the flagship TRAINING step.

Same trace methodology as tools/profile_step.py (exclusive XLA-op times
from a jax.profiler trace, categorized through the compiled HLO), applied
to the full jitted train step: q_sample, forward, backward, AdamW, EMA.
This is the ground truth behind the README's training-step number
(VERDICT "training throughput work").

Run: python tools/profile_train.py [n_steps_to_trace]
Env: PROF_PATCH (default 96), PROF_BATCH (default 1),
     PROF_REMAT=1 applies use_checkpoint remat (the memory-fit config).
"""

import os
import sys

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import numpy as np

from ddpm3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from profile_step import profile_and_report

from ddpm3d_tpu.diffusion import (
    DiffusionConfig, LossType, MeanType, VarType, linear_beta_schedule,
    make_schedule,
)
from ddpm3d_tpu.models import SuperResModel
from ddpm3d_tpu.training import TrainState, make_optimizer, make_train_step


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    patch = int(os.environ.get("PROF_PATCH", "96"))
    batch = int(os.environ.get("PROF_BATCH", "1"))
    remat = os.environ.get("PROF_REMAT", "1") == "1"
    model = SuperResModel(
        in_channels=1, model_channels=128, out_channels=2,
        num_res_blocks=2, attention_resolutions=(0,),
        channel_mult=(1, 1, 2, 3, 4), dims=3, use_scale_shift_norm=True,
        resblock_updown=True, middle_attention=False, dtype=jnp.bfloat16,
        use_checkpoint=remat,
    )
    betas = linear_beta_schedule(1000)
    sched = make_schedule(betas)
    cfg = DiffusionConfig(
        MeanType.EPSILON, VarType.LEARNED_RANGE, LossType.MSE,
        original_num_steps=1000,
    )
    with jax.default_device(jax.devices("cpu")[0]):
        xi = jnp.zeros((1, 2, 16, 16, 1), jnp.float32)
        params = model.init(
            jax.random.key(1), xi, jnp.zeros((1,), jnp.int32), low_res=xi
        )["params"]
    opt = make_optimizer(1e-4, 0.0, 0)
    state = TrainState(
        step=jnp.asarray(0, jnp.int32), params=params,
        opt_state=opt.init(params),
        ema_params=(jax.tree_util.tree_map(jnp.copy, params),),
        sampler_state=None,
    )
    state = jax.device_put(state, jax.devices()[0])

    step_fn = jax.jit(make_train_step(model.apply, sched, cfg, opt, (0.9999,)))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, patch, patch, patch, 1)),
                    jnp.float32)
    cond = {"low_res": jnp.asarray(
        rng.normal(size=(batch, patch, patch, patch, 1)), jnp.float32)}
    key = jax.random.key(0)

    hlo = step_fn.lower(state, x, cond, key).compile().as_text()
    state, metrics = step_fn(state, x, cond, key)  # warm/compile
    float(np.asarray(metrics["loss"]).mean())

    def run_once():
        s = state
        for i in range(n):
            s, m = step_fn(s, x, cond, jax.random.fold_in(key, i))
        return float(np.asarray(m["loss"]).mean())

    profile_and_report(hlo, run_once, n)


if __name__ == "__main__":
    main()
