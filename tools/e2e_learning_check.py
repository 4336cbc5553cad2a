"""End-to-end learning check: train a small conditional denoiser on
synthetic volumes, then denoise a held-out volume and verify the output is
closer to the clean target than the noisy input (PSNR gain).

This is the functional-correctness proof the reference never ships (it has
no tests, SURVEY.md §4): training + sampling must actually *denoise*.

Run: python tools/e2e_learning_check.py [--steps N] [--size S]
Exits 0 and prints a JSON summary on success.
"""

import argparse
import json
import os
import sys
import time

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np


def make_pair(rng, shape, noise_sigma=0.35):
    Z, H, W = shape
    zz, yy, xx = np.meshgrid(
        np.linspace(-1, 1, Z), np.linspace(-1, 1, H), np.linspace(-1, 1, W),
        indexing="ij",
    )
    clean = np.zeros(shape, np.float32)
    for _ in range(5):
        cz, cy, cx = rng.uniform(-0.6, 0.6, 3)
        s = rng.uniform(0.15, 0.5)
        a = rng.uniform(0.4, 1.0)
        clean += a * np.exp(
            -(((zz - cz) ** 2 + (yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
        ).astype(np.float32)
    clean = clean / max(clean.max(), 1e-6)  # [0, 1]
    noisy = clean + rng.normal(0, noise_sigma, shape).astype(np.float32)
    return noisy, clean


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--diffusion_steps", type=int, default=64)
    ap.add_argument("--sample_respace", type=str, default="ddim16")
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--platform", type=str, default="")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from ddpm3d_tpu.diffusion import (
        DiffusionConfig, LossType, MeanType, VarType,
        ddim_sample_loop, make_schedule, make_spaced_schedule,
        cosine_beta_schedule, space_timesteps,
    )
    from ddpm3d_tpu.models import SuperResModel
    from ddpm3d_tpu.training import TrainState, make_optimizer, make_train_step
    from ddpm3d_tpu.utils.cache import enable_compilation_cache
    from ddpm3d_tpu.utils.metrics import psnr, ssim

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    S = args.size
    shape = (S, S, S)

    model = SuperResModel(
        in_channels=1, model_channels=32, out_channels=2, num_res_blocks=1,
        attention_resolutions=(), channel_mult=(1, 2), dims=3,
        use_scale_shift_norm=True, resblock_updown=True,
        middle_attention=False, dtype=jnp.bfloat16,
    )
    T = args.diffusion_steps
    betas = cosine_beta_schedule(T)
    sched = make_schedule(betas)
    cfg = DiffusionConfig(
        MeanType.EPSILON, VarType.LEARNED_RANGE, LossType.MSE,
        original_num_steps=T,
    )

    with jax.default_device(jax.devices("cpu")[0]):
        xi = jnp.zeros((1, 2, 16, 16, 1), jnp.float32)
        params = model.init(
            jax.random.key(0), xi, jnp.zeros((1,), jnp.int32), low_res=xi
        )["params"]
    opt = make_optimizer(args.lr, 0.0, 0)
    state = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        opt_state=opt.init(params),
        ema_params=(jax.tree_util.tree_map(jnp.copy, params),),
        sampler_state=None,
    )
    state = jax.device_put(state, jax.devices()[0])
    # EMA rate sized to the run: 0.999 over a few hundred steps would still
    # be ~2/3 initialization weights
    ema_rate = min(0.99, 1.0 - 10.0 / args.steps)
    step_fn = jax.jit(
        make_train_step(model.apply, sched, cfg, opt, (ema_rate,)),
        donate_argnums=(0,),
    )

    # fixed training set of paired patches, scaled to roughly [-1, 1]
    def scale(v):
        return v * 2.0 - 1.0

    train_pairs = [make_pair(rng, shape) for _ in range(32)]
    t0 = time.time()
    first_loss = last_loss = None
    for step in range(args.steps):
        idx = rng.integers(0, len(train_pairs), size=args.batch)
        noisy = np.stack([train_pairs[i][0] for i in idx])[..., None]
        clean = np.stack([train_pairs[i][1] for i in idx])[..., None]
        state, metrics = step_fn(
            state,
            jnp.asarray(scale(clean)),
            {"low_res": jnp.asarray(scale(noisy))},
            jax.random.key(step),
        )
        if step == 0 or step == args.steps - 1 or step % 100 == 0:
            loss = float(np.asarray(metrics["loss"]).mean())
            if first_loss is None:
                first_loss = loss
            last_loss = loss
            print(f"step {step}: loss {loss:.4f}", flush=True)
    train_time = time.time() - t0

    # held-out volume, respaced DDIM sampling (raw + EMA params)
    noisy, clean = make_pair(np.random.default_rng(123), shape)
    sp = make_spaced_schedule(betas, sorted(space_timesteps(T, args.sample_respace)))

    def run(params, key, low):
        model_fn = lambda x, t, **kw: model.apply({"params": params}, x, t, **kw)
        return ddim_sample_loop(
            key, model_fn, sp, cfg, shape=(1, S, S, S, 1),
            model_kwargs={"low_res": low}, eta=0.0,
        )

    def run_ddpm(params, key, low):
        from ddpm3d_tpu.diffusion import p_sample_loop

        model_fn = lambda x, t, **kw: model.apply({"params": params}, x, t, **kw)
        return p_sample_loop(
            key, model_fn, sched, cfg, shape=(1, S, S, S, 1),
            model_kwargs={"low_res": low},
        )

    jrun = jax.jit(run)
    jrun_ddpm = jax.jit(run_ddpm)
    low = jnp.asarray(scale(noisy))[None, ..., None]
    p_noisy = psnr(clean, noisy, data_range=1.0)
    s_noisy = ssim(clean, noisy, data_range=1.0)
    result = {
        "first_loss": round(first_loss, 4),
        "last_loss": round(last_loss, 4),
        "psnr_noisy_db": round(p_noisy, 2),
        "ssim_noisy": round(s_noisy, 4),
        "ema_rate": ema_rate,
        "train_steps": args.steps,
        "train_time_s": round(train_time, 1),
    }
    for name, p in [("raw", state.params), ("ema", state.ema_params[0])]:
        out = jrun(p, jax.random.key(7), low)
        denoised = np.clip((np.asarray(out)[0, ..., 0] + 1.0) / 2.0, 0, 1)
        result[f"psnr_{name}_db"] = round(psnr(clean, denoised, data_range=1.0), 2)
        result[f"ssim_{name}"] = round(ssim(clean, denoised, data_range=1.0), 4)
    # posterior-mean estimate: average several full-DDPM draws (the MMSE
    # estimator; single draws carry the generative variance, which is what
    # the paper's uncertainty maps quantify)
    draws = []
    for k in range(4):
        out = jrun_ddpm(state.ema_params[0], jax.random.key(100 + k), low)
        draws.append(np.clip((np.asarray(out)[0, ..., 0] + 1.0) / 2.0, 0, 1))
    avg = np.mean(draws, axis=0)
    result["psnr_avg4_db"] = round(psnr(clean, avg, data_range=1.0), 2)
    result["ssim_avg4"] = round(ssim(clean, avg, data_range=1.0), 4)
    print(json.dumps(result))
    ok = (
        last_loss < first_loss
        and max(
            result["psnr_raw_db"], result["psnr_ema_db"], result["psnr_avg4_db"]
        ) > p_noisy
    )
    print("E2E LEARNING CHECK:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
