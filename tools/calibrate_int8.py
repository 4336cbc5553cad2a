"""Calibrate static int8 activation scales over a real sampling chain.

The dynamic per-sample abs-max scales of the W8A8 torso (ops/quant.py)
cost ~9 ms/step on-chip — ~9% of the int8 step (README int8 breakdown).
This tool replaces them with per-conv-site STATIC scales measured
offline: it runs the actual respaced sampling chain with
``DDPM3D_INT8_CALIB=1`` (Conv3DFolded sows each site's fp abs-max into
the ``quant_calib`` collection), takes the max over every chain step and
calibration volume, and writes ``{"scales": {site: amax*margin/127}}``
JSON that ``DDPM3D_INT8_SCALES=<file>`` applies at trace time — the
abs-max reductions become constants and disappear from the step.

It also records the per-site spread of the per-step maxima
(max/min over chain steps): GroupNorm renormalizes every block, so
ranges should be nearly timestep-invariant — a large spread means a
global-over-t scale wastes resolution at small-range steps and the
site's quality impact should be checked (tools/respacing_study.py
--int8_sim with DDPM3D_INT8_SCALES set).

Run (study checkpoint):
  python tools/calibrate_int8.py --load_ckpt /tmp/vpred.msgpack \
      --respacing 25 --out /tmp/int8_scales.json
Random init (speed-profiling scale files only):
  python tools/calibrate_int8.py --allow_random --size 96 \
      --model_channels 128 --channel_mult 1,1,2,3,4 --num_res_blocks 2 \
      --respacing 2 --out /tmp/scales_flagship.json
"""

import argparse
import json
import os
import sys

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np


def flatten_calib(tree, prefix=()):
    """Flatten a quant_calib collection to {conv_path_string: float},
    using the same "/".join(module_path) keys Conv3DFolded matches on
    (the trailing sow name ``act_absmax`` is dropped)."""
    out = {}
    for k, v in tree.items():
        if k == "act_absmax":
            out["/".join(prefix)] = float(np.asarray(v))
        elif isinstance(v, dict):
            out.update(flatten_calib(v, prefix + (k,)))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--load_ckpt", type=str, default="",
                    help="EMA params msgpack (tools/respacing_study.py "
                         "--save_ckpt format)")
    ap.add_argument("--allow_random", action="store_true",
                    help="calibrate a random-init model (meaningless "
                         "scales — for speed-profiling files only)")
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--model_channels", type=int, default=32)
    ap.add_argument("--channel_mult", type=str, default="1,2")
    ap.add_argument("--num_res_blocks", type=int, default=1)
    ap.add_argument("--factory", action="store_true",
                    help="build the model through models/factory.py "
                         "sr_create_model with the production defaults "
                         "(channel_mult from --size) — REQUIRED when "
                         "calibrating a scripts/train.py checkpoint so "
                         "module paths match the serving CLI's")
    ap.add_argument("--respacing", type=str, default="25",
                    help="the chain to calibrate over — use the chain "
                         "you will serve (reference respace.py grammar)")
    ap.add_argument("--n_volumes", type=int, default=2,
                    help="synthetic calibration volumes (distinct seeds)")
    ap.add_argument("--margin", type=float, default=1.0,
                    help="scale headroom factor: s = amax*margin/127. "
                         ">1 trades resolution for saturation safety on "
                         "volumes outside the calibration set")
    ap.add_argument("--platform", type=str, default="")
    ap.add_argument("--sampler", type=str, default="ddpm",
                    choices=["ddpm", "ddim"],
                    help="chain whose activations are calibrated. Scales "
                    "are TRAJECTORY-SPECIFIC: ancestral-calibrated scales "
                    "collapse DDIM chains (31.7 dB vs 47.2 bf16, "
                    "RESPACING_PROD_R4_INT8.json) because the "
                    "deterministic trajectory exits the calibrated "
                    "activation ranges late in the chain — calibrate on "
                    "the sampler you serve")
    ap.add_argument("--time_bins", type=int, default=8,
                    help="ALSO emit per-time-bin scale tables "
                    "('scales_t': site -> [n_bins]): the chain's step "
                    "range splits into equal index bins, each getting "
                    "its own scale. The whole-chain calibration records "
                    "up to 38x per-site spread across steps "
                    "(INT8_SCALES_PROD.json) — one scale wastes up to 5 "
                    "bits of int8 resolution at small-range steps. "
                    "Serving picks them up automatically "
                    "(ops/quant.py:quant_scales_collection); 0 disables")
    ap.add_argument("--out", type=str, default="/tmp/int8_scales.json")
    args = ap.parse_args()
    assert args.load_ckpt or args.allow_random, (
        "calibration needs a trained checkpoint (--load_ckpt); "
        "--allow_random only for speed-profiling scale files"
    )
    # calibration must see UNQUANTIZED activations
    os.environ.pop("DDPM3D_INT8", None)
    os.environ["DDPM3D_INT8_CALIB"] = "1"

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from e2e_learning_check import make_pair

    from ddpm3d_tpu.diffusion import (
        DiffusionConfig, LossType, MeanType, VarType,
        ddim_sample, linear_beta_schedule, make_schedule,
        make_spaced_schedule, p_sample, space_timesteps,
    )
    from ddpm3d_tpu.models import SuperResModel
    from ddpm3d_tpu.utils import checkpoint as ckpt_io
    from ddpm3d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    S = args.size
    if args.factory:
        from ddpm3d_tpu.models.factory import sr_create_model

        model = sr_create_model(
            large_size=S, small_size=S,
            num_channels=args.model_channels,
            num_res_blocks=args.num_res_blocks,
            learn_sigma=True, class_cond=False, use_checkpoint=False,
            attention_resolutions="1000", num_heads=4,
            num_head_channels=64, num_heads_upsample=-1,
            use_scale_shift_norm=True, dropout=0.0,
            resblock_updown=True, use_fp16=True,
        )
    else:
        model = SuperResModel(
            in_channels=1, model_channels=args.model_channels,
            out_channels=2,
            num_res_blocks=args.num_res_blocks,
            attention_resolutions=(),
            channel_mult=tuple(
                int(m) for m in args.channel_mult.split(",")),
            dims=3, use_scale_shift_norm=True, resblock_updown=True,
            middle_attention=False, dtype=jnp.bfloat16,
        )
    T = 1000
    betas = linear_beta_schedule(T)
    # v-pred is the production recommendation, but the mean type only
    # shapes the chain trajectory, not which sites exist; calibrate with
    # the config you serve (flag below if eps checkpoints need it)
    cfg = DiffusionConfig(
        MeanType.VELOCITY, VarType.LEARNED_RANGE, LossType.MSE,
        original_num_steps=T,
    )
    sp = (
        make_schedule(betas) if args.respacing == "1000"
        else make_spaced_schedule(
            betas, sorted(space_timesteps(T, args.respacing)))
    )

    with jax.default_device(jax.devices("cpu")[0]):
        xi = jnp.zeros((1, 2, 16, 16, 1), jnp.float32)
        params = model.init(
            jax.random.key(0), xi, jnp.zeros((1,), jnp.int32), low_res=xi
        )["params"]
    if args.load_ckpt:
        params = ckpt_io.load_pytree(args.load_ckpt, target=params)
        print(f"loaded EMA params from {args.load_ckpt}", flush=True)
    params = jax.device_put(params, jax.devices()[0])

    def chain_step(params, x, t, key, low):
        # capture the sown collection from inside p_sample's single model
        # call; the closure dict is filled at trace time, so returning it
        # makes the maxima jit outputs
        cap = {}

        def model_fn(xx, tt, **kw):
            out, muts = model.apply(
                {"params": params}, xx, tt, mutable=["quant_calib"], **kw
            )
            cap["m"] = muts["quant_calib"]
            return out

        if args.sampler == "ddim":
            res = ddim_sample(
                key, model_fn, sp, cfg, x, t, eta=0.0,
                model_kwargs={"low_res": low},
            )
        else:
            res = p_sample(
                key, model_fn, sp, cfg, x, t, model_kwargs={"low_res": low}
            )
        return res["sample"], cap["m"]

    jstep = jax.jit(chain_step)

    amax_all = {}        # site -> max over steps+volumes
    step_min = {}        # site -> min over steps of the per-step max
    amax_bins = {}       # site -> (n_bins,) max within each step bin
    n_steps = sp.num_timesteps
    nb = max(args.time_bins, 0)
    for v in range(args.n_volumes):
        noisy, _ = make_pair(np.random.default_rng(321 + v), (S, S, S))
        low = jnp.asarray(noisy * 2.0 - 1.0)[None, ..., None]
        x = jax.random.normal(
            jax.random.key(900 + v), (1, S, S, S, 1), jnp.float32)
        for i in reversed(range(n_steps)):
            t = jnp.full((1,), i, jnp.int32)
            x, calib = jstep(
                params, x, t, jax.random.fold_in(jax.random.key(5), i), low
            )
            flat = flatten_calib(jax.device_get(calib))
            # same bin mapping serving uses (quant_scales_collection)
            b = min(i * nb // n_steps, nb - 1) if nb else 0
            for site, m in flat.items():
                amax_all[site] = max(amax_all.get(site, 0.0), m)
                step_min[site] = min(step_min.get(site, np.inf), m)
                if nb:
                    bins = amax_bins.setdefault(site, np.zeros(nb))
                    bins[b] = max(bins[b], m)
        print(f"volume {v}: calibrated {n_steps} steps, "
              f"{len(amax_all)} sites", flush=True)

    scales, spreads, scales_t = {}, {}, {}
    for site, amax in sorted(amax_all.items()):
        if amax <= 0.0:
            continue  # dead site: leave it on dynamic fallback
        scales[site] = amax * args.margin / 127.0
        spreads[site] = (
            float(amax / step_min[site]) if step_min[site] > 0 else np.inf
        )
        if nb:
            # bins the chain never filled (short chains, nb > n_steps)
            # fall back to the whole-chain max — never a 0 scale
            bins = np.where(amax_bins[site] > 0, amax_bins[site], amax)
            scales_t[site] = [
                float(b_ * args.margin / 127.0) for b_ in bins
            ]
    worst = sorted(spreads.items(), key=lambda kv: -kv[1])[:5]
    out = {
        "scales": scales,
        "meta": {
            "sampler": args.sampler,
            "respacing": args.respacing,
            "margin": args.margin,
            "n_volumes": args.n_volumes,
            "size": S,
            # model identity — serving validates these against the run
            # (ops/quant.py:validate_scales_file): scales are checkpoint-
            # and architecture-specific
            "model_channels": args.model_channels,
            "channel_mult": [int(m) for m in model.channel_mult],
            "num_res_blocks": args.num_res_blocks,
            "factory": args.factory,
            "ckpt": args.load_ckpt or "RANDOM-INIT (speed profiling only)",
            "time_bins": nb,
            "chain_steps": n_steps,
            "max_step_spread": worst[0][1] if worst else None,
            "worst_spread_sites": dict(worst),
            "per_site_step_spread": spreads,
        },
    }
    if scales_t:
        out["scales_t"] = scales_t
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {len(scales)} site scales to {args.out}")
    if worst:
        print("largest per-step range spreads (max/min over chain):")
        for site, sp_ in worst:
            print(f"  {sp_:7.2f}x  {site}")


if __name__ == "__main__":
    main()
