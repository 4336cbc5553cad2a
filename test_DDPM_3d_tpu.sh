#!/usr/bin/env bash
# Canonical whole-volume denoising launch — the TPU equivalent of the
# reference's test_DDPM_3d_mpi.sh (same model flags; `mpiexec -n 6` process
# fan-out is replaced by single-controller JAX over all local TPU chips).
#
# Note: the reference's script passes --num_samples 6 which its active
# parser never defined (SURVEY.md §5.6); this CLI accepts it.
MODEL_FLAGS="--large_size 96 --num_channels 128 --learn_sigma True --use_fp16 True \
 --use_scale_shift_norm True --resblock_updown True \
 --attention_resolutions 1000 --num_head_channels 64"
DIFFUSION_FLAGS="--diffusion_steps 1000 --noise_schedule linear"
SAMPLE_FLAGS="--num_samples 6 --batch_size 1 --timestep_respacing \"\""

python scripts/test.py \
  --base_samples "${1:?usage: $0 input_volume.tif model.ckpt [out_dir]}" \
  --model_path "${2:?usage: $0 input_volume.tif model.ckpt [out_dir]}" \
  --save_dir "${3:-./denoised_out}" \
  $MODEL_FLAGS $DIFFUSION_FLAGS $SAMPLE_FLAGS
