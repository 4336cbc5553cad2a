"""Inference runtime: whole-volume patch denoising pipeline."""

from .pipeline import (
    denoise_patches,
    denoise_volume,
    load_volume_for_denoising,
    save_outputs,
)
