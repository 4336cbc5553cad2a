"""Progressively distill a trained denoiser to a short sampling chain.

Beyond-reference capability (the reference only ships full-chain DDPM
sampling, guided_diffusion/gaussian_diffusion.py:514-535): halve the chain
teacher->student (Salimans & Ho 2022) until ``--target_steps``, saving one
checkpoint per phase as ``distilled_{N}steps.npz`` plus the kept-timestep
list, which plugs straight into ``--timestep_respacing`` at test time.

Typical flow (after scripts/train.py produced model*.npz):

  python scripts/distill.py --data_dir DATA --model_path RUN/model050000.npz \
      --result_folder RUN/distill --target_steps 50 \
      --steps_per_phase 2000 --lr 1e-4 [model/diffusion flags as in training]

Works best on models trained with ``--predict_v True``; eps-parameterized
teachers work too (the target conversion handles all three MeanTypes).
"""

import argparse
import os
import sys

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np

from ddpm3d_tpu.data import load_data, prefetch
from ddpm3d_tpu.diffusion import get_named_beta_schedule, space_timesteps
from ddpm3d_tpu.models.factory import sr_create_model_and_diffusion
from ddpm3d_tpu.parallel import maybe_initialize_distributed
from ddpm3d_tpu.training import progressive_distill
from ddpm3d_tpu.utils import checkpoint as ckpt
from ddpm3d_tpu.utils import logger
from ddpm3d_tpu.utils.config import (
    add_dict_to_argparser,
    args_to_dict,
    sr_model_and_diffusion_defaults,
)


def main():
    args = create_argparser().parse_args()

    maybe_initialize_distributed()
    logger.configure(args.result_folder)

    logger.log("creating model...")
    model, sched, cfg = sr_create_model_and_diffusion(
        **args_to_dict(args, sr_model_and_diffusion_defaults().keys())
    )
    import jax
    import jax.numpy as jnp

    from ddpm3d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    # init a param skeleton, then load the teacher checkpoint into it
    levels = len(model.channel_mult)
    hw = max(16, 2 ** (levels - 1))
    with jax.default_device(jax.devices("cpu")[0]):
        x = jnp.zeros((1, 2, hw, hw, 1), jnp.float32)
        t0 = jnp.zeros((1,), jnp.int32)
        variables = model.init(
            jax.random.key(0), x, t0, low_res=jnp.zeros_like(x)
        )
    params = ckpt.load_pytree(args.model_path, target=variables["params"])
    logger.log(f"loaded teacher from {args.model_path}")

    betas = get_named_beta_schedule(
        args.noise_schedule, args.diffusion_steps
    )
    # NOTE: use plain section counts (e.g. --start_respacing 512), not
    # ddimN — ddimN requires an integer stride of the original chain
    start_ts = sorted(
        space_timesteps(
            args.diffusion_steps,
            args.start_respacing or [args.diffusion_steps],
        )
    )

    data = prefetch(
        load_data(
            data_dir=args.data_dir,
            batch_size=args.batch_size,
            image_size=args.large_size,
            shard=jax.process_index(),
            num_shards=jax.process_count(),
        )
    )

    def data_iter():
        while True:
            batch, cond = next(data)
            yield jnp.asarray(batch), {
                k: jnp.asarray(v) for k, v in cond.items()
            }

    logger.log(
        f"distilling {len(start_ts)} -> {args.target_steps} steps, "
        f"{args.steps_per_phase} optimizer steps per phase"
    )
    for params, use_ts in progressive_distill(
        model.apply,
        params,
        betas,
        cfg,
        data_iter(),
        target_steps=args.target_steps,
        steps_per_phase=args.steps_per_phase,
        start_use_timesteps=start_ts,
        lr=args.lr,
        ema_rate=args.ema_rate,
        vb_weight=args.vb_weight,
        seed=args.seed,
    ):
        n = len(use_ts)
        out = os.path.join(logger.get_dir(), f"distilled_{n}steps.npz")
        ckpt.save_pytree(out, params)
        np.save(
            os.path.join(logger.get_dir(), f"distilled_{n}steps_ts.npy"),
            np.asarray(use_ts),
        )
        logger.log(f"saved {out} (sample with --timestep_respacing {n})")
    logger.log("distillation complete")


def create_argparser():
    defaults = dict(
        data_dir="",
        model_path="",
        result_folder="./distill",
        batch_size=1,
        lr=1e-4,
        ema_rate=0.0,
        target_steps=50,
        steps_per_phase=2000,
        vb_weight=0.0,
        # distill from a respaced teacher chain instead of all steps
        # (e.g. "256" distills 256 -> target); empty = full chain
        start_respacing="",
        seed=0,
    )
    defaults.update(sr_model_and_diffusion_defaults())
    defaults["large_size"] = 96
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, defaults)
    return parser


if __name__ == "__main__":
    main()
