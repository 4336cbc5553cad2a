"""Model + diffusion factories.

Clean-room equivalent of reference script_util.py:74-616: translates the
flat CLI-flag namespace into model modules and diffusion schedules. The
image-size -> channel_mult tables and attention-ds derivation are preserved
exactly, including the fallback branch that gives the shipped 96^3 config
its (1,1,2,3,4) multiplier (script_util.py:353-361).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..diffusion import (
    DiffusionConfig,
    LossType,
    MeanType,
    Schedule,
    VarType,
    get_named_beta_schedule,
    make_spaced_schedule,
    space_timesteps,
)
from ..utils.config import NUM_CLASSES
from .plan import attention_ds_from_resolutions
from .unet import EncoderUNetModel, SuperResModel, UNetModel


def _parse_channel_mult(channel_mult, image_size) -> Tuple[int, ...]:
    """(reference script_util.py:148-160)"""
    if channel_mult == "" or channel_mult is None:
        if image_size == 512:
            return (0.5, 1, 1, 2, 2, 4, 4)
        if image_size == 256:
            return (1, 1, 2, 2, 4, 4)
        if image_size == 128:
            return (1, 1, 2, 3, 4)
        if image_size == 64:
            return (1, 2, 3, 4)
        raise ValueError(f"unsupported image size: {image_size}")
    if isinstance(channel_mult, str):
        return tuple(int(m) for m in channel_mult.split(","))
    return tuple(channel_mult)


def create_model(
    image_size,
    num_channels,
    num_res_blocks,
    channel_mult="",
    learn_sigma=False,
    class_cond=False,
    use_checkpoint=False,
    attention_resolutions="16",
    num_heads=1,
    num_head_channels=-1,
    num_heads_upsample=-1,
    use_scale_shift_norm=False,
    dropout=0.0,
    resblock_updown=False,
    use_fp16=False,
    use_new_attention_order=False,
    dims=2,
    in_channels=3,
) -> UNetModel:
    """Unconditional/class-conditional UNet (reference script_util.py:130-184)."""
    channel_mult = _parse_channel_mult(channel_mult, image_size)
    attention_ds = attention_ds_from_resolutions(image_size, attention_resolutions)
    return UNetModel(
        in_channels=in_channels,
        model_channels=num_channels,
        out_channels=(in_channels if not learn_sigma else in_channels * 2),
        num_res_blocks=num_res_blocks,
        attention_resolutions=attention_ds,
        dropout=dropout,
        channel_mult=channel_mult,
        dims=dims,
        num_classes=(NUM_CLASSES if class_cond else None),
        num_heads=num_heads,
        num_head_channels=num_head_channels,
        num_heads_upsample=num_heads_upsample,
        use_scale_shift_norm=use_scale_shift_norm,
        resblock_updown=resblock_updown,
        use_new_attention_order=use_new_attention_order,
        middle_attention=True,
        use_checkpoint=use_checkpoint,
        dtype=jnp.bfloat16 if use_fp16 else jnp.float32,
    )


def sr_create_model(
    large_size,
    small_size,
    num_channels,
    num_res_blocks,
    learn_sigma,
    class_cond,
    use_checkpoint,
    attention_resolutions,
    num_heads,
    num_head_channels,
    num_heads_upsample,
    use_scale_shift_norm,
    dropout,
    resblock_updown,
    use_fp16,
) -> SuperResModel:
    """The production conditional 3-D denoiser: SuperResModel_noatt with
    in_channels=1 doubled by concat conditioning (reference
    script_util.py:334-450; active return at :432-450).

    ``use_fp16`` maps to a bfloat16 compute torso — the TPU-native
    replacement for fp16+loss-scaling (reference fp16_util.py).
    """
    _ = small_size  # kept for CLI parity (reference script_util.py:351)

    if large_size == 512:
        channel_mult = (1, 1, 2, 2, 4, 4)
    elif large_size == 256:
        channel_mult = (1, 1, 2, 2, 4, 4)
    elif large_size == 64:
        channel_mult = (1, 2, 3, 4)
    else:
        # the shipped 96^3 config lands here (script_util.py:360)
        channel_mult = (1, 1, 2, 3, 4)

    attention_ds = attention_ds_from_resolutions(large_size, attention_resolutions)

    return SuperResModel(
        in_channels=1,
        model_channels=num_channels,
        out_channels=(1 if not learn_sigma else 2),
        num_res_blocks=num_res_blocks,
        attention_resolutions=attention_ds,
        dropout=dropout,
        channel_mult=channel_mult,
        dims=3,
        num_classes=(NUM_CLASSES if class_cond else None),
        num_heads=num_heads,
        num_head_channels=num_head_channels,
        num_heads_upsample=num_heads_upsample,
        use_scale_shift_norm=use_scale_shift_norm,
        resblock_updown=resblock_updown,
        middle_attention=False,  # SuperResModel_noatt (unet.py:876-882)
        use_checkpoint=use_checkpoint,
        dtype=jnp.bfloat16 if use_fp16 else jnp.float32,
    )


def create_gaussian_diffusion(
    *,
    steps=1000,
    learn_sigma=False,
    sigma_small=False,
    noise_schedule="linear",
    use_kl=False,
    predict_xstart=False,
    predict_v=False,
    rescale_timesteps=False,
    rescale_learned_sigmas=False,
    timestep_respacing="",
) -> Tuple[Schedule, DiffusionConfig]:
    """(reference script_util.py:578-616 -> respace.py:63-86)

    ``predict_v`` (beyond-reference) selects the v-parameterization;
    it wins over ``predict_xstart`` if both are set."""
    betas = get_named_beta_schedule(noise_schedule, steps)
    if use_kl:
        loss_type = LossType.RESCALED_KL
    elif rescale_learned_sigmas:
        loss_type = LossType.RESCALED_MSE
    else:
        loss_type = LossType.MSE
    if not timestep_respacing:
        timestep_respacing = [steps]
    sched = make_spaced_schedule(
        betas, sorted(space_timesteps(steps, timestep_respacing))
    )
    cfg = DiffusionConfig(
        mean_type=(
            MeanType.VELOCITY
            if predict_v
            else (MeanType.EPSILON if not predict_xstart else MeanType.START_X)
        ),
        var_type=(
            (VarType.FIXED_LARGE if not sigma_small else VarType.FIXED_SMALL)
            if not learn_sigma
            else VarType.LEARNED_RANGE
        ),
        loss_type=loss_type,
        rescale_timesteps=rescale_timesteps,
        original_num_steps=steps,
    )
    return sched, cfg


def sr_create_model_and_diffusion(
    large_size,
    small_size,
    class_cond,
    learn_sigma,
    num_channels,
    num_res_blocks,
    num_heads,
    num_head_channels,
    num_heads_upsample,
    attention_resolutions,
    dropout,
    diffusion_steps,
    noise_schedule,
    timestep_respacing,
    use_kl,
    predict_xstart,
    rescale_timesteps,
    rescale_learned_sigmas,
    use_checkpoint,
    use_scale_shift_norm,
    resblock_updown,
    use_fp16,
    predict_v=False,
):
    """(reference script_util.py:280-331)"""
    model = sr_create_model(
        large_size,
        small_size,
        num_channels,
        num_res_blocks,
        learn_sigma=learn_sigma,
        class_cond=class_cond,
        use_checkpoint=use_checkpoint,
        attention_resolutions=attention_resolutions,
        num_heads=num_heads,
        num_head_channels=num_head_channels,
        num_heads_upsample=num_heads_upsample,
        use_scale_shift_norm=use_scale_shift_norm,
        dropout=dropout,
        resblock_updown=resblock_updown,
        use_fp16=use_fp16,
    )
    sched, cfg = create_gaussian_diffusion(
        steps=diffusion_steps,
        learn_sigma=learn_sigma,
        noise_schedule=noise_schedule,
        use_kl=use_kl,
        predict_xstart=predict_xstart,
        predict_v=predict_v,
        rescale_timesteps=rescale_timesteps,
        rescale_learned_sigmas=rescale_learned_sigmas,
        timestep_respacing=timestep_respacing,
    )
    return model, sched, cfg


def create_model_and_diffusion(
    image_size,
    class_cond,
    learn_sigma,
    num_channels,
    num_res_blocks,
    channel_mult,
    num_heads,
    num_head_channels,
    num_heads_upsample,
    attention_resolutions,
    dropout,
    diffusion_steps,
    noise_schedule,
    timestep_respacing,
    use_kl,
    predict_xstart,
    rescale_timesteps,
    rescale_learned_sigmas,
    use_checkpoint,
    use_scale_shift_norm,
    resblock_updown,
    use_fp16,
    use_new_attention_order,
    predict_v=False,
):
    """(reference script_util.py:74-127)"""
    model = create_model(
        image_size,
        num_channels,
        num_res_blocks,
        channel_mult=channel_mult,
        learn_sigma=learn_sigma,
        class_cond=class_cond,
        use_checkpoint=use_checkpoint,
        attention_resolutions=attention_resolutions,
        num_heads=num_heads,
        num_head_channels=num_head_channels,
        num_heads_upsample=num_heads_upsample,
        use_scale_shift_norm=use_scale_shift_norm,
        dropout=dropout,
        resblock_updown=resblock_updown,
        use_fp16=use_fp16,
        use_new_attention_order=use_new_attention_order,
    )
    sched, cfg = create_gaussian_diffusion(
        steps=diffusion_steps,
        learn_sigma=learn_sigma,
        noise_schedule=noise_schedule,
        use_kl=use_kl,
        predict_xstart=predict_xstart,
        predict_v=predict_v,
        rescale_timesteps=rescale_timesteps,
        rescale_learned_sigmas=rescale_learned_sigmas,
        timestep_respacing=timestep_respacing,
    )
    return model, sched, cfg


def create_classifier_and_diffusion(
    image_size,
    classifier_use_fp16,
    classifier_width,
    classifier_depth,
    classifier_attention_resolutions,
    classifier_use_scale_shift_norm,
    classifier_resblock_updown,
    classifier_pool,
    learn_sigma,
    diffusion_steps,
    noise_schedule,
    timestep_respacing,
    use_kl,
    predict_xstart,
    rescale_timesteps,
    rescale_learned_sigmas,
    predict_v=False,
):
    """(reference script_util.py:187-225)"""
    classifier = create_classifier(
        image_size,
        classifier_use_fp16,
        classifier_width,
        classifier_depth,
        classifier_attention_resolutions,
        classifier_use_scale_shift_norm,
        classifier_resblock_updown,
        classifier_pool,
    )
    sched, cfg = create_gaussian_diffusion(
        steps=diffusion_steps,
        learn_sigma=learn_sigma,
        noise_schedule=noise_schedule,
        use_kl=use_kl,
        predict_xstart=predict_xstart,
        predict_v=predict_v,
        rescale_timesteps=rescale_timesteps,
        rescale_learned_sigmas=rescale_learned_sigmas,
        timestep_respacing=timestep_respacing,
    )
    return classifier, sched, cfg


def create_classifier(
    image_size,
    classifier_use_fp16,
    classifier_width,
    classifier_depth,
    classifier_attention_resolutions,
    classifier_use_scale_shift_norm,
    classifier_resblock_updown,
    classifier_pool,
    dims=2,
    in_channels=3,
    out_channels=NUM_CLASSES,
) -> EncoderUNetModel:
    """Classifier for guidance (reference script_util.py:228-266)."""
    if image_size == 512:
        channel_mult = (0.5, 1, 1, 2, 2, 4, 4)
    elif image_size == 256:
        channel_mult = (1, 1, 2, 2, 4, 4)
    elif image_size == 128:
        channel_mult = (1, 1, 2, 3, 4)
    elif image_size == 64:
        channel_mult = (1, 2, 3, 4)
    else:
        raise ValueError(f"unsupported image size: {image_size}")

    attention_ds = attention_ds_from_resolutions(
        image_size, classifier_attention_resolutions
    )
    return EncoderUNetModel(
        in_channels=in_channels,
        model_channels=classifier_width,
        out_channels=out_channels,
        num_res_blocks=classifier_depth,
        attention_resolutions=attention_ds,
        channel_mult=channel_mult,
        dims=dims,
        num_head_channels=64,
        use_scale_shift_norm=classifier_use_scale_shift_norm,
        resblock_updown=classifier_resblock_updown,
        pool=classifier_pool,
        dtype=jnp.bfloat16 if classifier_use_fp16 else jnp.float32,
    )
