"""Diagnose the respaced-sampling quality collapse seen in
tools/respacing_study.py.

Loads the EMA checkpoint the study saved and runs:
  1. teacher-forced eps error vs t  — is the model accurate at every t?
  2. x0-prediction PSNR vs t        — same, in x0 space
  3. DDIM at FULL 1000 steps        — separates "DDIM broken" from
                                      "respacing broken"
  4. truncated ancestral chains     — start from q_sample(x0_clean, t0):
                                      does the chain hold up when it does
                                      not begin at pure noise?

Run: python tools/respacing_debug.py [--ckpt /tmp/respacing_ckpt.msgpack]
"""

import argparse
import os
import sys

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np

from e2e_learning_check import make_pair


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", type=str, default="/tmp/respacing_ckpt.msgpack")
    ap.add_argument("--size", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ddpm3d_tpu.diffusion import (
        DiffusionConfig, LossType, MeanType, VarType,
        ddim_sample_loop, linear_beta_schedule, make_schedule,
        make_spaced_schedule, p_sample_loop, space_timesteps,
    )
    from ddpm3d_tpu.diffusion import process
    from ddpm3d_tpu.models import SuperResModel
    from ddpm3d_tpu.utils import checkpoint as ckpt_io
    from ddpm3d_tpu.utils.cache import enable_compilation_cache
    from ddpm3d_tpu.utils.metrics import psnr, ssim

    enable_compilation_cache()
    S = args.size
    model = SuperResModel(
        in_channels=1, model_channels=32, out_channels=2, num_res_blocks=1,
        attention_resolutions=(), channel_mult=(1, 2), dims=3,
        use_scale_shift_norm=True, resblock_updown=True,
        middle_attention=False, dtype=jnp.bfloat16,
    )
    T = 1000
    betas = linear_beta_schedule(T)
    sched = make_schedule(betas)
    cfg = DiffusionConfig(
        MeanType.EPSILON, VarType.LEARNED_RANGE, LossType.MSE,
        original_num_steps=T,
    )
    with jax.default_device(jax.devices("cpu")[0]):
        xi = jnp.zeros((1, 2, 16, 16, 1), jnp.float32)
        target = model.init(
            jax.random.key(0), xi, jnp.zeros((1,), jnp.int32), low_res=xi
        )["params"]
    params = ckpt_io.load_pytree(args.ckpt, target=target)
    params = jax.device_put(params, jax.devices()[0])

    noisy, clean = make_pair(np.random.default_rng(123), (S, S, S))
    scale = lambda v: v * 2.0 - 1.0
    low = jnp.asarray(scale(noisy))[None, ..., None]
    x0 = jnp.asarray(scale(clean))[None, ..., None]

    def model_fn_of(p):
        return lambda x, t, **kw: model.apply({"params": p}, x, t, **kw)

    # 1+2: teacher-forced accuracy vs t
    @jax.jit
    def teacher(params, t_scalar, key):
        eps = jax.random.normal(key, x0.shape, jnp.float32)
        t = jnp.full((1,), t_scalar, jnp.int32)
        x_t = process.q_sample(sched, x0, t, eps)
        out = process.p_mean_variance(
            model_fn_of(params), sched, cfg, x_t, t,
            clip_denoised=True, model_kwargs={"low_res": low},
        )
        eps_hat = (
            process.extract(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim)
            * x_t - out["pred_xstart"]
        ) / process.extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)
        rel = jnp.mean((eps_hat - eps) ** 2) / jnp.mean(eps ** 2)
        return rel, out["pred_xstart"], out["log_variance"].mean()

    print("== teacher-forced accuracy vs t ==")
    print("   t   relMSE(eps)   PSNR(x0_hat)   mean logvar")
    for t_s in [5, 25, 50, 100, 200, 300, 400, 500, 600, 700, 800, 900, 950, 990]:
        rels, psnrs, lvs = [], [], []
        for k in range(3):
            rel, x0h, lv = teacher(
                params, jnp.asarray(t_s), jax.random.key(1000 * t_s + k)
            )
            rels.append(float(rel))
            x0h = np.clip((np.asarray(x0h)[0, ..., 0] + 1) / 2, 0, 1)
            psnrs.append(psnr(clean, x0h, data_range=1.0))
            lvs.append(float(lv))
        print(f"  {t_s:4d}   {np.mean(rels):10.4f}   {np.mean(psnrs):9.2f}"
              f"      {np.mean(lvs):8.3f}", flush=True)

    # 3: full-length DDIM
    def run_chain(respace, use_ddim):
        if respace == "full":
            sp = sched
        else:
            sp = make_spaced_schedule(
                betas, sorted(space_timesteps(T, respace)))
        loop = ddim_sample_loop if use_ddim else p_sample_loop
        kw = {"eta": 0.0} if use_ddim else {}
        xT = jax.random.normal(jax.random.key(77), x0.shape, jnp.float32)

        def run(p, key, low, noise):
            return loop(key, model_fn_of(p), sp, cfg, noise=noise,
                        model_kwargs={"low_res": low}, **kw)

        out = jax.jit(run)(params, jax.random.key(7), low, xT)
        out = np.clip((np.asarray(out)[0, ..., 0] + 1) / 2, 0, 1)
        return psnr(clean, out, data_range=1.0), ssim(clean, out, 1.0)

    print("\n== chains ==")
    for name, respace, ddim in [
        ("ddpm_full", "full", False),
        ("ddim_full", "full", True),
        ("ddpm250", "250", False),
        ("ddim250", "ddim250", True),
    ]:
        p, s = run_chain(respace, ddim)
        print(f"  {name:10s} PSNR {p:6.2f}  SSIM {s:.4f}", flush=True)

    # 4: truncated ancestral chains from a q-sampled start
    @jax.jit
    def trunc(params, t_hi, key):
        eps = jax.random.normal(key, x0.shape, jnp.float32)
        t = jnp.full((1,), t_hi - 1, jnp.int32)
        x_t = process.q_sample(sched, x0, t, eps)
        return x_t

    print("\n== truncated ancestral chains (start from q_sample(x0, t0-1)) ==")
    for t_hi in [100, 250, 500, 1000]:
        x_t = trunc(params, jnp.asarray(t_hi), jax.random.key(5))

        def run(p, key, low, img):
            return p_sample_loop(key, model_fn_of(p), sched, cfg, noise=img,
                                 model_kwargs={"low_res": low}, t_hi=t_hi)

        out = jax.jit(run, static_argnames=())(
            params, jax.random.key(7), low, x_t)
        out = np.clip((np.asarray(out)[0, ..., 0] + 1) / 2, 0, 1)
        print(f"  t0={t_hi:4d}: PSNR {psnr(clean, out, 1.0):6.2f} "
              f"SSIM {ssim(clean, out, 1.0):.4f}", flush=True)


if __name__ == "__main__":
    main()
