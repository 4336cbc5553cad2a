"""int8 (W8A8) quality validation for the Seg* / EncoderUNetModel families.

The round-4 production guide documented seg/encoder int8 as "runs but
quality never measured" (docs/PRODUCTION.md). This closes it with the same
methodology as the flagship studies (tools/respacing_study.py), scaled to
the families' actual role — the reference's inactive experiment zoo
(SURVEY.md C12, reference unet.py:1698-1981):

- each fusion mode (add = SegModelv2, cat_conv = SegModelv3,
  midcat = SegModel_3d_noatt_midcat) trains a small v-pred conditional
  denoiser on synthetic paired volumes, then samples a matched-x_T
  ddpm chain in fp vs int8-sim (the value-exact fake-quant twin,
  ops/quant.py:conv3d_folded_sim) — chain PSNR vs clean for both, plus
  the mutual fp<->int8 PSNR;
- EncoderUNetModel trains as a 2-class classifier (the guidance role,
  reference script_util.py:228-266), then measures int8 logit drift and
  top-1 agreement on held-out volumes across timesteps.

Run (CPU): python tools/seg_int8_check.py --out SEG_INT8.json
"""

import argparse
import json
import os
import sys
import time

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np

from tools.e2e_learning_check import make_pair  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--size", type=int, default=24)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--channels", type=int, default=32)
    ap.add_argument("--diffusion_steps", type=int, default=1000)
    ap.add_argument("--respace", type=str, default="25")
    ap.add_argument("--n_eval", type=int, default=4)
    ap.add_argument("--platform", type=str, default="cpu")
    ap.add_argument("--out", type=str, default="SEG_INT8.json")
    args = ap.parse_args()

    os.environ.pop("DDPM3D_INT8", None)  # train fp; toggled per eval trace

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from ddpm3d_tpu.diffusion import (
        DiffusionConfig, LossType, MeanType, VarType, linear_beta_schedule,
        make_schedule, make_spaced_schedule, p_sample_loop, space_timesteps,
    )
    from ddpm3d_tpu.models.seg import (
        SegModel_3d_noatt_midcat, SegModelv2, SegModelv3,
    )
    from ddpm3d_tpu.models.unet import EncoderUNetModel
    from ddpm3d_tpu.training import TrainState, make_optimizer, make_train_step
    from ddpm3d_tpu.utils.cache import enable_compilation_cache
    from ddpm3d_tpu.utils.metrics import psnr

    enable_compilation_cache()
    S = args.size
    shape = (S, S, S)
    T = args.diffusion_steps
    betas = linear_beta_schedule(T)
    sched = make_schedule(betas)
    cfg = DiffusionConfig(
        MeanType.VELOCITY, VarType.LEARNED_RANGE, LossType.MSE,
        original_num_steps=T,
    )
    scale = lambda v: v * 2.0 - 1.0
    rng = np.random.default_rng(0)
    train_pairs = [make_pair(rng, shape) for _ in range(32)]
    evals = [make_pair(np.random.default_rng(500 + i), shape)
             for i in range(args.n_eval)]
    sp = make_spaced_schedule(
        betas, sorted(space_timesteps(T, args.respace)))

    results = {"protocol": {"argv": sys.argv[1:], "size": S,
                            "channels": args.channels, "steps": args.steps,
                            "respace": args.respace, "n_eval": args.n_eval,
                            "mean_type": "VELOCITY"},
               "fusions": {}, "encoder": {}}

    mk = dict(
        in_channels=1, cond_channels=1, model_channels=args.channels,
        out_channels=2, num_res_blocks=1, attention_resolutions=(),
        channel_mult=(1, 2), use_scale_shift_norm=True,
        resblock_updown=True, dtype=jnp.bfloat16,
    )
    ctors = {"add": SegModelv2, "cat_conv": SegModelv3,
             "midcat": SegModel_3d_noatt_midcat}

    for fusion, ctor in ctors.items():
        t0 = time.time()
        model = ctor(**mk)
        xi = jnp.zeros((1, 2, 16, 16, 1), jnp.float32)
        params = model.init(
            jax.random.key(0), xi, jnp.zeros((1,), jnp.int32), low_res=xi
        )["params"]
        opt = make_optimizer(2e-4, 0.0, 0)
        state = TrainState(
            step=jnp.asarray(0, jnp.int32), params=params,
            opt_state=opt.init(params),
            ema_params=(jax.tree_util.tree_map(jnp.copy, params),),
            sampler_state=None,
        )
        ema_rate = min(0.99, 1.0 - 10.0 / args.steps)
        step_fn = jax.jit(
            make_train_step(model.apply, sched, cfg, opt, (ema_rate,)),
            donate_argnums=(0,),
        )
        for step in range(args.steps):
            idx = rng.integers(0, len(train_pairs), size=args.batch)
            noisy = np.stack([train_pairs[i][0] for i in idx])[..., None]
            clean = np.stack([train_pairs[i][1] for i in idx])[..., None]
            state, _ = step_fn(
                state, jnp.asarray(scale(clean)),
                {"low_res": jnp.asarray(scale(noisy))}, jax.random.key(step),
            )
        ema = state.ema_params[0]

        def chain(params, key, low, noise):
            model_fn = lambda x, t, **kw: model.apply(
                {"params": params}, x, t, **kw)
            return p_sample_loop(key, model_fn, sp, cfg, noise=noise,
                                 model_kwargs={"low_res": low})

        ps_fp, ps_q, ps_mutual, ps_noisy = [], [], [], []
        for i, (noisy, clean) in enumerate(evals):
            low = jnp.asarray(scale(noisy))[None, ..., None]
            x_T = jnp.asarray(np.asarray(jax.random.normal(
                jax.random.key(900 + i), (1, S, S, S, 1), jnp.float32)))
            outs = {}
            for mode, env in (("fp", None), ("int8", "sim")):
                if env is None:
                    os.environ.pop("DDPM3D_INT8", None)
                else:
                    os.environ["DDPM3D_INT8"] = env
                # fresh lambda -> fresh trace under the current env
                out = jax.jit(lambda p, k, l, n: chain(p, k, l, n))(
                    ema, jax.random.key(7), low, x_T)
                outs[mode] = np.clip(
                    (np.asarray(out)[0, ..., 0] + 1.0) / 2.0, 0, 1)
            os.environ.pop("DDPM3D_INT8", None)
            ps_fp.append(psnr(clean, outs["fp"], data_range=1.0))
            ps_q.append(psnr(clean, outs["int8"], data_range=1.0))
            ps_mutual.append(psnr(outs["fp"], outs["int8"], data_range=1.0))
            ps_noisy.append(psnr(clean, noisy, data_range=1.0))
        row = {
            "psnr_noisy": round(float(np.mean(ps_noisy)), 2),
            "psnr_fp": round(float(np.mean(ps_fp)), 2),
            "psnr_int8": round(float(np.mean(ps_q)), 2),
            "delta_db": round(float(np.mean(ps_q) - np.mean(ps_fp)), 2),
            "psnr_fp_vs_int8": round(float(np.mean(ps_mutual)), 2),
            "train_s": round(time.time() - t0, 1),
        }
        results["fusions"][fusion] = row
        print(f"[{fusion}] {row}", flush=True)
        # incremental flush: a truncated run (CPU-starved boxes; this is
        # ~30 min/fusion on one core) keeps every completed fusion row
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)

    # ---- EncoderUNetModel as classifier: logits under int8 ----
    t0 = time.time()
    enc = EncoderUNetModel(
        in_channels=1, model_channels=args.channels, out_channels=2,
        num_res_blocks=1, attention_resolutions=(), channel_mult=(1, 2),
        use_scale_shift_norm=True, resblock_updown=True, pool="adaptive",
        dtype=jnp.bfloat16,
    )
    xi = jnp.zeros((1, 16, 16, 16, 1), jnp.float32)
    eparams = enc.init(
        jax.random.key(1), xi, jnp.zeros((1,), jnp.int32))["params"]
    import optax

    eopt = optax.adam(3e-4)
    eopt_state = eopt.init(eparams)

    # 2-class: does the clean volume's bright mass sit in the upper half?
    def label_of(clean):
        Z = clean.shape[0]
        return int(clean[: Z // 2].sum() < clean[Z // 2:].sum())

    def eloss(params, x, t, y):
        logits = enc.apply({"params": params}, x, t)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()

    @jax.jit
    def estep(params, opt_state, x, t, y):
        l, g = jax.value_and_grad(eloss)(params, x, t, y)
        updates, opt_state = eopt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, l

    # train on q_sample'd noisy versions across t (the guidance regime)
    from ddpm3d_tpu.diffusion import q_sample

    for step in range(args.steps):
        idx = rng.integers(0, len(train_pairs), size=args.batch)
        clean = np.stack([train_pairs[i][1] for i in idx])[..., None]
        ys = np.asarray([label_of(train_pairs[i][1]) for i in idx])
        t = rng.integers(0, T, size=args.batch)
        key = jax.random.key(10_000 + step)
        x_t = q_sample(sched, jnp.asarray(scale(clean)),
                       jnp.asarray(t, jnp.int32),
                       jax.random.normal(key, clean.shape))
        eparams, eopt_state, _ = estep(
            eparams, eopt_state, x_t, jnp.asarray(t, jnp.int32),
            jnp.asarray(ys))

    agree, drift, correct_fp, correct_q = [], [], [], []
    for i, (noisy, clean) in enumerate(evals):
        y = label_of(clean)
        for tt in (50, 300, 700):
            key = jax.random.key(7_000 + i * 10 + tt)
            x_t = q_sample(
                sched, jnp.asarray(scale(clean))[None, ..., None],
                jnp.asarray([tt], jnp.int32),
                jax.random.normal(key, (1, S, S, S, 1)))
            logits = {}
            for mode, env in (("fp", None), ("int8", "sim")):
                if env is None:
                    os.environ.pop("DDPM3D_INT8", None)
                else:
                    os.environ["DDPM3D_INT8"] = env
                logits[mode] = np.asarray(jax.jit(
                    lambda p, x, t: enc.apply({"params": p}, x, t)
                )(eparams, x_t, jnp.asarray([tt], jnp.int32)))[0]
            os.environ.pop("DDPM3D_INT8", None)
            agree.append(int(np.argmax(logits["fp"]) ==
                             np.argmax(logits["int8"])))
            drift.append(float(np.max(np.abs(logits["fp"] -
                                             logits["int8"]))))
            correct_fp.append(int(np.argmax(logits["fp"]) == y))
            correct_q.append(int(np.argmax(logits["int8"]) == y))
    results["encoder"] = {
        "top1_agreement": round(float(np.mean(agree)), 3),
        "max_logit_drift": round(float(np.max(drift)), 4),
        "mean_logit_drift": round(float(np.mean(drift)), 4),
        "acc_fp": round(float(np.mean(correct_fp)), 3),
        "acc_int8": round(float(np.mean(correct_q)), 3),
        "n_probes": len(agree),
        "train_s": round(time.time() - t0, 1),
    }
    print(f"[encoder] {results['encoder']}", flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
