"""Whole-step A/B of int8 lowering schedules on the real chip.

Per-op trace deltas are upper bounds (collapsed-name attribution
double-counts sibling fusions — README round-4 floor analysis), so
lowering choices are decided by timing the WHOLE flagship int8-static
sampling step under each candidate schedule. This tool builds the exact
program bench.py times (96^3/128ch SuperRes, 25-step ancestral chain,
static calibrated scales) and measures trace device ms/step per named
env configuration, recompiling between configs.

Run on-chip:  python tools/ab_int8_step.py [config ...]
Configs (default: all): control, all_native, native_fullres,
native_fullres_taps.  All schedules are bit-identical by construction
(tests/test_quant.py), so this is purely a speed decision.
"""

import os
import sys
import time

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

os.environ.setdefault("DDPM3D_INT8", "1")
os.environ.setdefault(
    "DDPM3D_INT8_SCALES",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "INT8_SCALES_PROD.json"),
)

import jax
import jax.numpy as jnp

from ddpm3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from ddpm3d_tpu.diffusion import (
    DiffusionConfig, LossType, MeanType, VarType,
    linear_beta_schedule, make_spaced_schedule, p_sample_loop,
    space_timesteps,
)
from ddpm3d_tpu.models import SuperResModel
from bench import measure_device_ms

# env deltas per named schedule; keys absent -> deleted (module defaults)
CONFIGS = {
    # serving default: concat + taps at out13_0/in_conv (87.4 ms r4)
    "control": {},
    "all_concat": {"DDPM3D_INT8_TAPS_SITES": ""},
    "all_native": {"DDPM3D_INT8_IMPL": "native",
                   "DDPM3D_INT8_TAPS_SITES": ""},
    # native only where the kd*C concat materialisation is largest
    # (the 96^2-resolution level: 128ch at 96^3 voxels), concat elsewhere
    "native_fullres": {
        "DDPM3D_INT8_NATIVE_SITES":
            "in1_0,in2_0,in3_0,out12_,out13_,out14_",
        "DDPM3D_INT8_TAPS_SITES": "",
    },
    # same + keep the measured taps win at out13_0/in_conv
    "native_fullres_taps": {
        "DDPM3D_INT8_NATIVE_SITES": "in1_0,in2_0,in3_0,out12_,out14_",
        "DDPM3D_INT8_TAPS_SITES": "out13_0/in_conv",
    },
    # round 5: the custom implicit-GEMM s8 Pallas kernel with fused
    # dequantize+bias epilogue (ops/conv3d_s8.py) at every applicable
    # stride-1 3x3x3 site (inapplicable sites fall back to concat)
    "all_pallas": {"DDPM3D_INT8_IMPL": "pallas",
                   "DDPM3D_INT8_TAPS_SITES": ""},
    # pallas only at the full-res level (largest convs, direct layout),
    # concat+taps default elsewhere
    "pallas_fullres": {
        "DDPM3D_INT8_PALLAS_SITES":
            "in1_0,in2_0,out12_,out13_,out14_",
        "DDPM3D_INT8_TAPS_SITES": "",
    },
    # pallas at full-res AND the rotated-layout lower levels explicitly
    "pallas_keep_taps": {
        "DDPM3D_INT8_IMPL": "pallas",
        "DDPM3D_INT8_TAPS_SITES": "out13_0/in_conv",
    },
    # NOT bit-identical to control (less quantization, never more error):
    # keep the 1x1 skip convs in bf16 — their FLOPs are 1/27 of a 3x3x3
    # conv but their quantize clamps showed up at ~6 ms in the per-op
    # floor analysis (README round 4), so int8 may be a net loss there.
    "exclude_skip": {"DDPM3D_INT8_EXCLUDE": "in0_0,head_conv,/skip"},
    # same question for the strided downsample convs (96^3-input
    # quantize for a stride-2 output) — in3_0 is the big one.
    "exclude_skip_down": {
        "DDPM3D_INT8_EXCLUDE": "in0_0,head_conv,/skip,in3_0",
    },
}
_AB_VARS = ("DDPM3D_INT8_IMPL", "DDPM3D_INT8_TAPS_SITES",
            "DDPM3D_INT8_NATIVE_SITES", "DDPM3D_INT8_PALLAS_SITES",
            "DDPM3D_INT8_EXCLUDE")


def main():
    names = [a for a in sys.argv[1:] if not a.startswith("-")] or list(CONFIGS)
    steps = int(os.environ.get("AB_STEPS", "25"))

    model = SuperResModel(
        in_channels=1, model_channels=128, out_channels=2, num_res_blocks=2,
        attention_resolutions=(0,), channel_mult=(1, 1, 2, 3, 4), dims=3,
        use_scale_shift_norm=True, resblock_updown=True,
        middle_attention=False, dtype=jnp.bfloat16,
    )
    betas = linear_beta_schedule(1000)
    sched = make_spaced_schedule(
        betas, sorted(space_timesteps(1000, f"ddim{steps}")))
    cfg = DiffusionConfig(MeanType.EPSILON, VarType.LEARNED_RANGE,
                          LossType.MSE, original_num_steps=1000)
    shape = (1, 96, 96, 96, 1)
    low = jnp.zeros(shape, jnp.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        xi = jnp.zeros((1, 2, 16, 16, 1), jnp.float32)
        params = model.init(jax.random.key(1), xi,
                            jnp.zeros((1,), jnp.int32), low_res=xi)
    params = jax.device_put(params, jax.devices()[0])
    key = jax.random.key(0)

    print(f"| schedule | device ms/step ({steps}-step chain) |", flush=True)
    print("|---|---|", flush=True)
    for name in names:
        delta = CONFIGS[name]
        for v in _AB_VARS:
            os.environ.pop(v, None)
        os.environ.update(delta)
        jax.clear_caches()

        def run(params, key, low):
            def model_fn(xx, tt, **kw):
                # same per-time-bin scale threading as serving/bench
                from ddpm3d_tpu.ops.quant import quant_scales_collection

                col = quant_scales_collection(jnp.reshape(tt, (-1,))[0])
                v = (
                    {**params, "quant_scales": col}
                    if col is not None else params
                )
                return model.apply(v, xx, tt, **kw)

            return p_sample_loop(key, model_fn, sched, cfg, shape=shape,
                                 model_kwargs={"low_res": low})

        jitted = jax.jit(run)
        try:
            t0 = time.perf_counter()
            float(jnp.sum(jitted(params, key, low)))  # compile + warm
            print(f"compile+warm {name}: {time.perf_counter()-t0:.0f}s",
                  file=sys.stderr, flush=True)
            dev = measure_device_ms(
                lambda: float(jnp.sum(jitted(
                    params, jax.random.fold_in(key, 9), low))))
            print(f"| {name} | {dev/steps:.2f} |", flush=True)
        except Exception as e:  # keep measuring the remaining schedules
            print(f"| {name} | FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]} |", flush=True)


if __name__ == "__main__":
    main()
