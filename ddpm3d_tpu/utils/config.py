"""Defaults dicts and CLI generation.

Clean-room equivalent of the reference's flag system
(script_util.py:11-71, 269-277, 619-644): layered defaults dicts are
projected onto factory signatures and auto-generate one typed argparse flag
per key. Every reference flag is preserved so launch commands port over
verbatim (including ``--num_samples``, which the reference's active test
script forgot to define — SURVEY.md §5.6).
"""

from __future__ import annotations

import argparse
import inspect
from typing import Any, Dict

NUM_CLASSES = 1000


def diffusion_defaults() -> Dict[str, Any]:
    """(reference script_util.py:11-24)"""
    return dict(
        learn_sigma=False,
        diffusion_steps=1000,
        noise_schedule="linear",
        timestep_respacing="",
        use_kl=False,
        predict_xstart=False,
        # beyond-reference: v-parameterization (Salimans & Ho 2022) — the
        # fewer-step-robust training target; see diffusion/process.py
        predict_v=False,
        rescale_timesteps=False,
        rescale_learned_sigmas=False,
    )


def classifier_defaults() -> Dict[str, Any]:
    """(reference script_util.py:27-40)"""
    return dict(
        image_size=64,
        classifier_use_fp16=False,
        classifier_width=128,
        classifier_depth=2,
        classifier_attention_resolutions="32,16,8",
        classifier_use_scale_shift_norm=True,
        classifier_resblock_updown=True,
        classifier_pool="attention",
    )


def model_and_diffusion_defaults() -> Dict[str, Any]:
    """(reference script_util.py:43-65)"""
    res = dict(
        image_size=64,
        num_channels=128,
        num_res_blocks=2,
        num_heads=4,
        num_heads_upsample=-1,
        num_head_channels=-1,
        attention_resolutions="16,8",
        channel_mult="",
        dropout=0.0,
        class_cond=False,
        use_checkpoint=False,
        use_scale_shift_norm=True,
        resblock_updown=False,
        use_fp16=False,
        use_new_attention_order=False,
    )
    res.update(diffusion_defaults())
    return res


def classifier_and_diffusion_defaults() -> Dict[str, Any]:
    res = classifier_defaults()
    res.update(diffusion_defaults())
    return res


def sr_model_and_diffusion_defaults() -> Dict[str, Any]:
    """Super-resolution (conditional denoiser) defaults, filtered to the
    factory signature (reference script_util.py:269-277)."""
    from ..models import factory

    res = model_and_diffusion_defaults()
    res["large_size"] = 256
    res["small_size"] = 64
    arg_names = inspect.getfullargspec(factory.sr_create_model_and_diffusion)[0]
    for k in list(res.keys()):
        if k not in arg_names:
            del res[k]
    return res


def str2bool(v) -> bool:
    """(reference script_util.py:633-644)"""
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("boolean value expected")


def add_dict_to_argparser(parser: argparse.ArgumentParser, default_dict: Dict):
    """One typed --flag per defaults key (reference script_util.py:619-626)."""
    for k, v in default_dict.items():
        v_type = type(v)
        if v is None:
            v_type = str
        elif isinstance(v, bool):
            v_type = str2bool
        parser.add_argument(f"--{k}", default=v, type=v_type)


def args_to_dict(args, keys) -> Dict[str, Any]:
    return {k: getattr(args, k) for k in keys}
