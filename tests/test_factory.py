"""Tests for the config/factory layer (defaults dicts, CLI generation, model
construction parity with the reference factories)."""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm3d_tpu.models.factory import (
    create_classifier,
    create_gaussian_diffusion,
    sr_create_model,
    sr_create_model_and_diffusion,
)
from ddpm3d_tpu.diffusion import LossType, MeanType, VarType
from ddpm3d_tpu.utils.config import (
    add_dict_to_argparser,
    args_to_dict,
    sr_model_and_diffusion_defaults,
    str2bool,
)


def test_sr_defaults_match_reference_keys():
    """The defaults dict must contain exactly the reference's flag set
    (script_util.py:269-277 projected on the factory signature)."""
    d = sr_model_and_diffusion_defaults()
    assert d["large_size"] == 256 and d["small_size"] == 64
    expected = {
        "large_size", "small_size", "class_cond", "learn_sigma",
        "num_channels", "num_res_blocks", "num_heads", "num_head_channels",
        "num_heads_upsample", "attention_resolutions", "dropout",
        "diffusion_steps", "noise_schedule", "timestep_respacing", "use_kl",
        "predict_xstart", "rescale_timesteps", "rescale_learned_sigmas",
        "use_checkpoint", "use_scale_shift_norm", "resblock_updown",
        "use_fp16",
        # beyond-reference flag: v-parameterization training target
        "predict_v",
    }
    assert set(d.keys()) == expected


def test_argparser_generation_and_roundtrip():
    parser = argparse.ArgumentParser()
    defaults = sr_model_and_diffusion_defaults()
    add_dict_to_argparser(parser, defaults)
    args = parser.parse_args(
        ["--large_size", "96", "--learn_sigma", "True", "--use_fp16", "False"]
    )
    d = args_to_dict(args, defaults.keys())
    assert d["large_size"] == 96
    assert d["learn_sigma"] is True
    assert d["use_fp16"] is False


def test_str2bool():
    assert str2bool("True") and str2bool("yes") and str2bool("1")
    assert not str2bool("False") and not str2bool("n")
    with pytest.raises(argparse.ArgumentTypeError):
        str2bool("maybe")


def test_production_factory_config():
    """The shipped launch command (test_DDPM_3d_mpi.sh) must produce the
    production model: noatt, (1,1,2,3,4), 2ch in, learn-sigma out."""
    model, sched, cfg = sr_create_model_and_diffusion(
        large_size=96,
        small_size=64,
        class_cond=False,
        learn_sigma=True,
        num_channels=128,
        num_res_blocks=2,
        num_heads=4,
        num_head_channels=64,
        num_heads_upsample=-1,
        attention_resolutions="1000",
        dropout=0.0,
        diffusion_steps=1000,
        noise_schedule="linear",
        timestep_respacing="",
        use_kl=False,
        predict_xstart=False,
        rescale_timesteps=False,
        rescale_learned_sigmas=False,
        use_checkpoint=False,
        use_scale_shift_norm=True,
        resblock_updown=True,
        use_fp16=True,
    )
    assert model.channel_mult == (1, 1, 2, 3, 4)
    assert model.middle_attention is False
    assert model.attention_resolutions == (0,)  # 96 // 1000 = 0: disabled
    assert model.out_channels == 2
    assert model.dtype == jnp.bfloat16
    assert sched.num_timesteps == 1000
    assert cfg.mean_type == MeanType.EPSILON
    assert cfg.var_type == VarType.LEARNED_RANGE
    assert cfg.loss_type == LossType.MSE


def test_factory_loss_type_selection():
    _, cfg = create_gaussian_diffusion(steps=100, use_kl=True)
    assert cfg.loss_type == LossType.RESCALED_KL
    _, cfg = create_gaussian_diffusion(steps=100, rescale_learned_sigmas=True)
    assert cfg.loss_type == LossType.RESCALED_MSE
    sched, cfg = create_gaussian_diffusion(
        steps=100, timestep_respacing="ddim10"
    )
    assert sched.num_timesteps == 10


def test_param_count_matches_reference_model():
    """Total parameter count of the production architecture must equal the
    torch reference's (scripts/train.py:34 logs it at runtime)."""
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, "/root/reference")
    from guided_diffusion.unet import SuperResModel_noatt

    tm = SuperResModel_noatt(
        image_size=96, in_channels=1, model_channels=128, out_channels=2,
        num_res_blocks=2, attention_resolutions=(0,),
        channel_mult=(1, 1, 2, 3, 4), dims=3, use_scale_shift_norm=True,
        resblock_updown=True,
    )
    ref_count = sum(p.numel() for p in tm.parameters())

    model = sr_create_model(
        large_size=96, small_size=64, num_channels=128, num_res_blocks=2,
        learn_sigma=True, class_cond=False, use_checkpoint=False,
        attention_resolutions="1000", num_heads=4, num_head_channels=64,
        num_heads_upsample=-1, use_scale_shift_norm=True, dropout=0.0,
        resblock_updown=True, use_fp16=False,
    )
    xi = jnp.zeros((1, 2, 16, 16, 1))
    params = model.init(
        jax.random.key(0), xi, jnp.zeros((1,), jnp.int32), low_res=xi
    )["params"]
    our_count = sum(
        int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params)
    )
    assert our_count == ref_count, (our_count, ref_count)


def test_classifier_factory():
    # width must satisfy the head-channel divisibility the reference
    # asserts (num_head_channels=64 hardcoded, script_util.py:262)
    clf = create_classifier(
        image_size=64,
        classifier_use_fp16=False,
        classifier_width=128,
        classifier_depth=1,
        classifier_attention_resolutions="32",
        classifier_use_scale_shift_norm=True,
        classifier_resblock_updown=True,
        classifier_pool="attention",
        dims=2,
        in_channels=3,
        out_channels=10,
    )
    x = jnp.zeros((1, 64, 64, 3))
    t = jnp.zeros((1,), jnp.int32)
    params = clf.init(jax.random.key(0), x, t)
    out = clf.apply(params, x, t)
    assert out.shape == (1, 10)
