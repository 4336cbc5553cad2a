"""API-surface tests: the SURVEY.md §2 inventory components must exist and
basic smoke paths must work."""

import jax
import jax.numpy as jnp
import numpy as np


def test_inventory_imports():
    # C1-C3: diffusion core, samplers, respacing
    from ddpm3d_tpu.diffusion import (  # noqa: F401
        DiffusionConfig, LossType, MeanType, Schedule, VarType,
        calc_bpd_loop, condition_mean, condition_score,
        ddim_reverse_sample, ddim_sample, ddim_sample_loop,
        get_named_beta_schedule, make_schedule, make_spaced_schedule,
        p_mean_variance, p_sample, p_sample_loop, p_sample_loop_progressive,
        prior_bpd, q_posterior_mean_variance, q_sample, space_timesteps,
        training_losses, vb_terms_bpd,
    )
    # C4-C5: primitives + likelihoods
    from ddpm3d_tpu.models.nn import (  # noqa: F401
        GroupNorm32, avg_pool_nd, conv_nd, timestep_embedding, update_ema,
    )
    from ddpm3d_tpu.diffusion import (  # noqa: F401
        discretized_gaussian_log_likelihood, mean_flat, normal_kl,
    )
    # C6-C12: model families
    from ddpm3d_tpu.models import (  # noqa: F401
        AttentionBlock, AttentionPool, Downsample, EncoderUNetModel,
        ResBlock, SegModel_3d_noatt_midcat, SegModelv2, SegModelv2_3d_noatt,
        SegModelv3, SegUNetModel, SuperResModel, UNetModel, Upsample,
    )
    # C13-C16: training runtime
    from ddpm3d_tpu.training import (  # noqa: F401
        TrainLoop, TrainState, create_named_schedule_sampler,
        init_loss_second_moment, make_optimizer, make_train_step,
        sample_loss_second_moment, sample_uniform,
        update_loss_second_moment,
    )
    # C17-C18: data pipelines
    from ddpm3d_tpu.data import (  # noqa: F401
        PatchDataset, WholeVolumeDataset, blend_patches_count,
        blend_patches_hann, extract_patches_zxy, hann_window_3d, load_data,
        prefetch,
    )
    from ddpm3d_tpu.inference import (  # noqa: F401
        denoise_patches, denoise_volume, load_volume_for_denoising,
        save_outputs,
    )
    # C19: parallel layer
    from ddpm3d_tpu.parallel import (  # noqa: F401
        DATA_AXIS, SPATIAL_AXIS, make_mesh, maybe_initialize_distributed,
        shard_batch,
    )
    # C20-C22: logger, config, factories
    from ddpm3d_tpu.utils import logger  # noqa: F401
    from ddpm3d_tpu.utils.config import (  # noqa: F401
        classifier_and_diffusion_defaults, classifier_defaults,
        diffusion_defaults, model_and_diffusion_defaults,
        sr_model_and_diffusion_defaults,
    )
    from ddpm3d_tpu.models.factory import (  # noqa: F401
        create_classifier, create_classifier_and_diffusion, create_model,
        create_model_and_diffusion, create_gaussian_diffusion,
        sr_create_model, sr_create_model_and_diffusion,
    )
    # native tier + ops
    from ddpm3d_tpu import native  # noqa: F401
    from ddpm3d_tpu.ops import fused_group_norm_silu  # noqa: F401
    from ddpm3d_tpu.ops.conv3d import Conv3D, conv3d_decomposed  # noqa: F401


def test_seg_aliases_construct_and_run():
    from ddpm3d_tpu.models import SegModelv2_3d_noatt

    model = SegModelv2_3d_noatt(
        in_channels=1, cond_channels=1, model_channels=32, out_channels=2,
        num_res_blocks=1, attention_resolutions=(), channel_mult=(1, 2),
        use_scale_shift_norm=True, resblock_updown=True,
    )
    x = jnp.zeros((1, 4, 16, 16, 1))
    t = jnp.array([0])
    params = model.init(jax.random.key(0), x, t, low_res=x)
    out = model.apply(params, x, t, low_res=x)
    assert out.shape == (1, 4, 16, 16, 2)


def test_whole_volume_dataset(tmp_path):
    from ddpm3d_tpu.data import WholeVolumeDataset, tiff_io

    vol = np.random.default_rng(0).normal(size=(2, 6, 10, 10)).astype(np.float32)
    p = str(tmp_path / "v.tif")
    tiff_io.imwrite(p, vol)
    ds = WholeVolumeDataset([p], normalize_divisor=4.0)
    assert len(ds) == 1
    high, kw = ds[0]
    assert high.shape == (6, 10, 10, 1)
    np.testing.assert_allclose(high[..., 0], vol[1] / 4.0, rtol=1e-6)
    np.testing.assert_allclose(kw["low_res"][..., 0], vol[0] / 4.0, rtol=1e-6)


def test_progressive_sampler_yields_every_step():
    from ddpm3d_tpu.diffusion import (
        DiffusionConfig, LossType, MeanType, VarType, make_schedule,
        p_sample_loop, p_sample_loop_progressive,
    )

    T = 6
    sched = make_schedule(np.linspace(1e-4, 0.02, T))
    cfg = DiffusionConfig(MeanType.EPSILON, VarType.FIXED_SMALL, LossType.MSE,
                          original_num_steps=T)
    model = lambda x, t, **kw: jnp.zeros_like(x)
    noise = jnp.full((1, 2, 8, 8, 1), 0.3)
    outs = list(
        p_sample_loop_progressive(
            jax.random.key(5), model, sched, cfg, noise=noise
        )
    )
    assert len(outs) == T
    final = p_sample_loop(jax.random.key(5), model, sched, cfg, noise=noise)
    np.testing.assert_allclose(
        np.asarray(outs[-1]["sample"]), np.asarray(final), rtol=1e-5, atol=1e-6
    )
