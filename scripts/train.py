"""Train the conditional 3-D denoising diffusion model.

CLI-compatible rebuild of reference scripts/train.py: same flags, same
defaults, same logging contract (per-param shapes, total parameter count,
config echo). ``mpiexec`` fan-out is replaced by single-controller JAX over
a device mesh.
"""

import argparse
import os
import sys

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from ddpm3d_tpu.data import load_data, prefetch
from ddpm3d_tpu.models.factory import sr_create_model_and_diffusion
from ddpm3d_tpu.parallel import maybe_initialize_distributed
from ddpm3d_tpu.training import TrainLoop
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
    logger.log("attention_resolutions:{%s}" % args.attention_resolutions)
    logger.log("num_channels:{%s}" % str(args.num_channels))
    logger.log("num_res_blocks:{%s}" % str(args.num_res_blocks))
    logger.log("num_head_channels:{%s}" % str(args.num_head_channels))
    logger.log("channel_mult:{%s}" % str(model.channel_mult))

    logger.log("creating data loader...")
    import jax

    from ddpm3d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    data = prefetch(
        load_data(
            data_dir=args.data_dir,
            batch_size=args.batch_size,
            image_size=args.large_size,
            shard=jax.process_index(),
            num_shards=jax.process_count(),
        )
    )

    logger.log("training...")
    TrainLoop(
        model=model,
        sched=sched,
        cfg=cfg,
        data=data,
        batch_size=args.batch_size,
        microbatch=args.microbatch,
        lr=args.lr,
        ema_rate=args.ema_rate,
        log_interval=args.log_interval,
        save_interval=args.save_interval,
        resume_checkpoint=args.resume_checkpoint,
        use_fp16=args.use_fp16,
        fp16_scale_growth=args.fp16_scale_growth,
        use_fp16_scaling=args.use_fp16_scaling,
        schedule_sampler=args.schedule_sampler,
        weight_decay=args.weight_decay,
        lr_anneal_steps=args.lr_anneal_steps,
        auto_resume=args.auto_resume,
    ).run_loop()


def create_argparser():
    """(reference scripts/train.py:95-115)"""
    defaults = dict(
        data_dir="",
        schedule_sampler="uniform",
        lr=1e-4,
        weight_decay=0.0,
        lr_anneal_steps=0,
        batch_size=1,
        microbatch=-1,
        ema_rate="0.9999",
        log_interval=10,
        save_interval=10000,
        resume_checkpoint="",
        use_fp16=True,
        fp16_scale_growth=1e-3,
        # opt-in float16 torso + dynamic loss scaling (fp16_util.py:148-233);
        # the bf16 default needs no scaling
        use_fp16_scaling=False,
        result_folder=None,
        auto_resume=False,  # pick up the newest checkpoint in result_folder
    )
    defaults.update(sr_model_and_diffusion_defaults())
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, defaults)
    return parser


if __name__ == "__main__":
    main()
