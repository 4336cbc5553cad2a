"""ddpm3d_tpu: a TPU-native 3D denoising diffusion framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
Zachary-Luk/3D-Denoising-Diffusion-Model (a guided-diffusion fork specialised
for whole-body PET volume denoising), redesigned TPU-first:

- functional diffusion process over precomputed coefficient tables
  (reference: guided_diffusion/gaussian_diffusion.py)
- Flax 3D UNet with the reference's anisotropic (1,2,2) pyramid and
  pair-pop decoder wiring, in NDHWC layout for the TPU MXU
  (reference: guided_diffusion/unet.py)
- single-program `lax.scan` samplers instead of Python step loops
  (reference: gaussian_diffusion.py:441-707)
- bf16 compute + fp32 master params instead of fp16 loss scaling
  (reference: guided_diffusion/fp16_util.py)
- `jax.sharding.Mesh` data/spatial parallelism instead of MPI+NCCL
  (reference: guided_diffusion/dist_util.py)
"""

__version__ = "0.1.0"
