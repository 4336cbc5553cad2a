"""Whole-volume denoising (inference).

CLI-compatible rebuild of reference scripts/test.py: same flags (plus
``--num_samples``/``--eta`` which the reference's active script forgot to
define — SURVEY.md §5.6), same patch grid, Hann blending, output fidelity
(.npz of the (H,W,Z) volume + .tif of (Z,H,W)). The per-rank MPI loop +
all_gather is replaced by one sharded batched sampling chain.
"""

import argparse
import os
import sys

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np

from ddpm3d_tpu.models.factory import sr_create_model_and_diffusion
from ddpm3d_tpu.parallel import make_mesh, maybe_initialize_distributed
from ddpm3d_tpu.utils import checkpoint as ckpt
from ddpm3d_tpu.utils import logger
from ddpm3d_tpu.utils.config import (
    add_dict_to_argparser,
    args_to_dict,
    sr_model_and_diffusion_defaults,
)


def main():
    args = create_argparser().parse_args()

    if args.int8:
        if args.use_ddim or args.use_dpm_solver:
            # Deterministic chains integrate the signed quantization error
            # coherently, and ONE static scale per site across the chain's
            # per-step range spread collapses them: ddim25 measured
            # 31.7 dB vs 47.2 bf16 under whole-chain scales
            # (RESPACING_PROD_R4_INT8.json). PER-TIME-BIN scale tables fix
            # it — ddim25 int8 measured 43.89 vs 44.83 bf16 (−0.94 dB,
            # n=16, RESPACING_PROD_R5_INT8_25.json) — so --use_ddim is
            # allowed (with a warning) when the scales file carries
            # 'scales_t'; whole-chain files and --use_dpm_solver (never
            # re-measured; −2.07 dB even under dynamic scales at study
            # scale) stay refused. Same guard family as the
            # classifier-guidance refusal in ops/quant.py.
            def _has_time_bins(fname):
                if not fname or fname.startswith("const:"):
                    return False
                import json as _json

                try:
                    with open(fname) as f:
                        return bool(_json.load(f).get("scales_t"))
                except Exception:
                    return False

            if args.use_ddim and _has_time_bins(args.int8_scales):
                import warnings

                warnings.warn(
                    "--int8 --use_ddim with per-time-bin scales: measured "
                    "−0.94 dB vs bf16 at n=16 (RESPACING_PROD_R5_INT8_25."
                    "json); whole-chain static scales would collapse "
                    "(31.7 dB, round 4) — keep the scales file's bins."
                )
            else:
                which = "--use_ddim" if args.use_ddim else "--use_dpm_solver"
                raise SystemExit(
                    f"--int8 with {which} is refused: deterministic chains "
                    "accumulate quantization bias coherently (ddim25 "
                    "measured 31.7 dB vs 47.2 bf16 under whole-chain "
                    "static scales; dpm2m25 −2.07 dB at study scale). "
                    "Use ancestral respacing (--timestep_respacing "
                    "250/25), or for DDIM calibrate per-time-bin scales "
                    "(tools/calibrate_int8.py --time_bins) and pass them "
                    "via --int8_scales."
                )
        if args.int8_scales:
            # hard-error on checkpoint/model mismatch, loud warning on
            # sampler/respacing mismatch — a wrong scales file loads
            # silently otherwise and the measured cost is a 15.5 dB
            # collapse (ops/quant.py:validate_scales_file)
            from ddpm3d_tpu.ops.quant import validate_scales_file

            validate_scales_file(
                args.int8_scales,
                model_path=args.model_path,
                sampler="ddpm",  # ddim/dpm refused above
                respacing=args.timestep_respacing or "1000",
                model_config=dict(
                    size=args.large_size,
                    model_channels=args.num_channels,
                    num_res_blocks=args.num_res_blocks,
                ),
            )
        # must be set before any conv traces (trace-time gate)
        os.environ["DDPM3D_INT8"] = "1"
        if args.int8_scales:
            os.environ["DDPM3D_INT8_SCALES"] = args.int8_scales
    if args.platform:
        # JAX_PLATFORMS env cannot override the environment's preset
        # platform (sitecustomize pre-imports jax); the config API wins.
        # CPU smokes of this CLI must not touch a busy TPU.
        import jax

        jax.config.update("jax_platforms", args.platform)
    maybe_initialize_distributed()
    logger.configure(args.save_dir or None)

    import jax

    from ddpm3d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from ddpm3d_tpu.inference import (
        denoise_volume,
        load_volume_for_denoising,
        save_outputs,
    )

    logger.log("creating model...")
    model, sched, cfg = sr_create_model_and_diffusion(
        **args_to_dict(args, sr_model_and_diffusion_defaults().keys())
    )
    if args.timesteps_file:
        # explicit kept-timestep chain (scripts/distill.py writes
        # distilled_{N}steps_ts.npy): a distilled student's chain is the
        # odd positions of its teacher's, which --timestep_respacing's
        # stride grammar cannot express
        from ddpm3d_tpu.diffusion import (
            get_named_beta_schedule, make_spaced_schedule,
        )

        use_ts = sorted(int(t) for t in np.load(args.timesteps_file))
        betas = get_named_beta_schedule(
            args.noise_schedule, args.diffusion_steps
        )
        sched = make_spaced_schedule(betas, use_ts)
        logger.log(
            f"using explicit {len(use_ts)}-step chain from "
            f"{args.timesteps_file}"
        )

    logger.log(f"loading checkpoint {args.model_path}...")
    # init on CPU to get the target tree (eager init on TPU would compile
    # every op separately through the remote-compile service)
    x0 = np.zeros((1, 8, 16, 16, 1), np.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = model.init(
            jax.random.key(0), x0, np.zeros((1,), np.int32), low_res=x0
        )
    if args.model_path:
        params = ckpt.load_pytree(args.model_path, target=variables["params"])
    else:
        logger.log("WARNING: no --model_path given; using random init")
        params = variables["params"]

    # Multi-volume serving: --base_samples accepts a comma-separated list
    # (beyond-reference; the reference runs one volume per mpiexec launch,
    # /root/reference/scripts/test.py:185-246). One process amortizes the
    # ~2 min of fixed cost (imports, checkpoint load/upload, executable-
    # cache restore) across volumes; every volume re-derives its noise
    # from --seed + global patch ids exactly as a fresh process would, so
    # outputs are bit-identical to per-volume invocations
    # (tests/test_pipeline_cli.py).
    vol_paths = [p for p in args.base_samples.split(",") if p]
    mesh = make_mesh()
    for vi, vol_path in enumerate(vol_paths):
        logger.log("loading data...")
        vol = load_volume_for_denoising(vol_path)
        logger.log(
            "Using original data without normalization - "
            f"min: {vol.min():.4f}, max: {vol.max():.4f}, std: {vol.std():.4f}"
        )

        # Fixed seed parity with the reference (scripts/test.py:44-49) via
        # an explicit PRNG key (fresh per volume: volumes are independent).
        key = jax.random.key(args.seed)
        logger.log(f"Fixed seed set to {args.seed}")

        # Exact-parity path: replicate the reference's torch global-RNG
        # noise stream (scripts/test.py:44-49,62 + gd.py:430 draw order:
        # per patch, x_T then one draw per reverse step) and inject it.
        noise = noise_stream = None
        if args.torch_noise_seed >= 0:
            import torch as th

            from ddpm3d_tpu.data.patches import (
                patch_grid, test_xy_starts, test_z_starts,
            )

            Z, H, W = vol.shape
            ps = args.large_size
            n_patches = len(patch_grid(
                test_xy_starts(H, ps, 3), test_xy_starts(W, ps, 3),
                test_z_starts(Z, ps),
            ))
            T = sched.num_timesteps
            th.manual_seed(args.torch_noise_seed)
            consumed = {"next": 0}

            def noise_stream(lo, hi):
                # Memory-bounded provider: draws are generated per chunk in
                # the reference's exact order (per patch: x_T then one randn
                # per reverse step), so only one chunk's noises exist at a
                # time — the full array would be P*(T+1)*96^3*4 B ~ 64 GB at
                # production settings.
                assert lo == consumed["next"], (
                    "noise stream consumed in order")
                xTs, streams = [], []
                for _ in range(lo, hi):
                    xTs.append(th.randn(1, 1, ps, ps, ps).numpy()[0, 0])
                    streams.append(np.stack([
                        th.randn(1, 1, ps, ps, ps).numpy()[0, 0]
                        for _ in range(T)
                    ]))
                consumed["next"] = hi
                return (np.stack(xTs).astype(np.float32),
                        np.stack(streams).astype(np.float32))

            logger.log(
                f"torch-matched noise stream: seed {args.torch_noise_seed}, "
                f"{n_patches} patches x {T} steps (chunk-lazy)"
            )

        logger.log("creating samples...")
        result, stats = denoise_volume(
            key,
            model.apply,
            params,
            sched,
            cfg,
            vol,
            noise=noise,
            noise_stream=noise_stream,
            patch_size=args.large_size,
            use_ddim=args.use_ddim,
            eta=args.eta,
            use_dpm_solver=args.use_dpm_solver,
            dpm_order=args.dpm_order,
            clip_denoised=args.clip_denoised,
            mesh=mesh,
            per_device_batch=args.batch_size,
            blend=args.blend,
            normalize_div4=args.normalize_div4,
            num_samples=args.num_samples,
            segment_steps=args.segment_steps,
        )

        save_outputs(logger.get_dir(), vol_path, result)
        if "uncertainty_hwz" in stats and jax.process_index() == 0:
            from ddpm3d_tpu.data import tiff_io

            unc_path = os.path.join(
                logger.get_dir(),
                "uncertainty_"
                f"{os.path.basename(vol_path).rsplit('.', 1)[0]}.tif",
            )
            tiff_io.imwrite(
                unc_path,
                stats["uncertainty_hwz"].transpose(2, 0, 1).astype(
                    np.float32),
            )
            logger.log(f"Saved uncertainty map: {unc_path}")
        if len(vol_paths) > 1:
            # one parseable line per volume for harnesses
            # (tools/volume_quality.py reads the wall time back)
            logger.log(
                f"multi-volume [{vi + 1}/{len(vol_paths)}] "
                f"{os.path.basename(vol_path)}: sampling "
                f"{stats['sample_wall_s']:.1f}s wall"
            )
    logger.log("Full image denoising complete")


def create_argparser():
    """(reference scripts/test.py:264-278, + num_samples/eta/seed)"""
    defaults = dict(
        save_dir="",
        clip_denoised=True,
        batch_size=1,
        # single draw by default (the reference's active behavior);
        # >1 enables posterior-mean denoising + uncertainty maps
        num_samples=1,
        use_ddim=False,
        eta=0.0,
        # beyond-reference: DPM-Solver++(2M) ODE sampler
        # (diffusion/dpm_solver.py); pair with --timestep_respacing ddimN
        use_dpm_solver=False,
        dpm_order=2,
        # long chains run as N-step device calls (bit-identical to one
        # scan); relay/watchdog environments want ~25
        segment_steps=100,
        timestep_respacing="",
        base_samples="",
        model_path="",
        seed=10,
        # >=0: replicate the reference's torch-global-RNG noise stream for
        # exact output parity (tools/parity_pipeline.py)
        torch_noise_seed=-1,
        # backup-script variants (reference scripts/test_backup.py):
        blend="hann",          # hann | count (tb:118-167)
        normalize_div4=False,  # clip@4 then /4 input scaling (tb:266-267)
        # explicit kept-timestep chain (.npy; from scripts/distill.py)
        timesteps_file="",
        # beyond-reference: W8A8 int8 conv torso on the MXU (ops/quant.py);
        # 2x the bf16 FLOP rate, quality measured in RESPACING_*INT8.json
        int8=False,
        # static activation scales file (tools/calibrate_int8.py): removes
        # the dynamic abs-max reductions (~9 ms/step) from the int8 step
        int8_scales="",
        # force a jax platform (e.g. "cpu" for smokes); default: environment
        platform="",
    )
    defaults.update(sr_model_and_diffusion_defaults())
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, defaults)
    return parser


if __name__ == "__main__":
    main()
