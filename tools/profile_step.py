"""Per-op breakdown of the flagship sampling step from a real TPU trace.

Captures a ``jax.profiler`` trace of the production 96^3 sampling chain
(the same program ``bench.py`` times), then aggregates device-plane op
durations by fusion category via ``jax.profiler.ProfileData``. This is the
ground-truth answer to "where do the milliseconds go" — unlike wall-clock
subtraction, it is immune to relay dispatch latency.

Run: python tools/profile_step.py [steps]
Env: DDPM3D_CONV3D / DDPM3D_GN_STATS select lowering variants.
"""

import collections
import glob
import os
import re
import sys
import tempfile

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp

from ddpm3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from ddpm3d_tpu.diffusion import (
    DiffusionConfig, LossType, MeanType, VarType,
    linear_beta_schedule, make_spaced_schedule,
    p_sample_loop, space_timesteps,
)
from ddpm3d_tpu.models import SuperResModel


def classify(name: str) -> str:
    """Bucket an XLA op/fusion name into a coarse category."""
    n = name.lower()
    if "conv" in n:
        return "conv"
    if n.startswith("dynamic-update-slice") or "dynamic_update" in n:
        return "dus"
    if "reduce" in n:
        return "reduce(GN-stats)"
    if "all-reduce" in n or "collective" in n:
        return "collective"
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "copy/layout"
    if "custom-call" in n or "pallas" in n or "tpu_custom_call" in n:
        return "pallas"
    if "fusion" in n:
        return "fusion(elementwise)"
    if "rng" in n:
        return "rng"
    return "other"


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    patch = int(os.environ.get("PROF_PATCH", "96"))
    batch = int(os.environ.get("PROF_BATCH", "1"))
    model = SuperResModel(
        in_channels=1, model_channels=128, out_channels=2,
        num_res_blocks=2, attention_resolutions=(0,),
        channel_mult=(1, 1, 2, 3, 4), dims=3, use_scale_shift_norm=True,
        resblock_updown=True, middle_attention=False, dtype=jnp.bfloat16,
    )
    betas = linear_beta_schedule(1000)
    sched = make_spaced_schedule(betas, sorted(space_timesteps(1000, f"ddim{steps}")))
    cfg = DiffusionConfig(
        MeanType.EPSILON, VarType.LEARNED_RANGE, LossType.MSE,
        original_num_steps=1000,
    )
    key = jax.random.key(0)
    shape = (batch, patch, patch, patch, 1)
    low = jnp.zeros(shape, jnp.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        xi = jnp.zeros((1, 2, 16, 16, 1), jnp.float32)
        params = model.init(jax.random.key(1), xi, jnp.zeros((1,), jnp.int32), low_res=xi)
    params = jax.device_put(params, jax.devices()[0])

    def run(params, key, low):
        model_fn = lambda xx, tt, **kw: model.apply(params, xx, tt, **kw)
        return p_sample_loop(key, model_fn, sched, cfg, shape=shape,
                             model_kwargs={"low_res": low})

    jitted = jax.jit(run)
    hlo = jitted.lower(params, key, low).compile().as_text()
    float(jnp.sum(jitted(params, key, low)))  # warm
    profile_and_report(
        hlo,
        lambda: float(jnp.sum(jitted(params, jax.random.fold_in(key, 7), low))),
        steps,
    )


def hlo_category_maps(hlo: str):
    """Map %fused_computation.N -> category by body contents,
    %fusion.N -> its computation via `calls=`, and op -> source metadata."""
    comp_cat = {}
    comp_meta = {}  # computation -> op_name metadata of its heaviest inner op
    cur = None
    body = []
    for ln in hlo.splitlines():
        m = re.match(r"%?([\w\.\-]*fused_computation[\w\.\-]*)\s.*\{", ln)
        if m:
            cur = m.group(1)
            body = []
            continue
        if cur is not None:
            body.append(ln)
            if ln.startswith("}"):
                text = "\n".join(body)
                if "convolution(" in text or " dot(" in text:
                    c = "conv/matmul"
                elif "reduce(" in text or "reduce-window(" in text:
                    c = "reduce(GN-stats)"
                else:
                    c = "elementwise/copy"
                comp_cat[cur] = c
                # source attribution: prefer the conv/dot/reduce line's
                # op_name metadata (the fusion root is often a nameless
                # convert); fall back to the first op_name in the body
                meta = None
                for pat in (r"(?:convolution|dot)\([^\n]*?op_name=\"([^\"]+)\"",
                            r"reduce\([^\n]*?op_name=\"([^\"]+)\"",
                            r"op_name=\"([^\"]+)\""):
                    mm = re.search(pat, text)
                    if mm:
                        meta = mm.group(1)
                        break
                comp_meta[cur] = meta
                cur = None
    op_comp = {}  # %fusion.N -> computation name
    for m in re.finditer(
        r"%?([\w\.\-]+)\s*=\s*[^=]*fusion\([^\n]*calls=%?([\w\.\-]+)", hlo
    ):
        op_comp[m.group(1)] = m.group(2)
    # direct (non-fusion) entry ops: map op -> its own metadata
    op_meta = {}
    for m in re.finditer(
        r"%?([\w\.\-]+)\s*=\s*[^\n]*?op_name=\"([^\"]+)\"", hlo
    ):
        op_meta.setdefault(m.group(1), m.group(2))
    return comp_cat, op_comp, comp_meta, op_meta


def profile_and_report(hlo: str, run_once, steps: int, top: int = 30):
    """Trace ``run_once`` (which must force a readback), aggregate the
    device plane's exclusive op times by HLO category, print the report.
    Returns (total_ms, per_category dict)."""
    comp_cat, op_comp, comp_meta, op_meta = hlo_category_maps(hlo)

    d = tempfile.mkdtemp(prefix="ddpm3d_prof_")
    jax.profiler.start_trace(d)
    run_once()
    jax.profiler.stop_trace()

    path = sorted(glob.glob(os.path.join(d, "**", "*.xplane.pb"), recursive=True))[-1]
    pd = jax.profiler.ProfileData.from_file(path)
    cat = collections.Counter()
    ops = collections.Counter()
    op_src = {}  # (category, collapsed name) -> (dur, source op_name)
    total = 0.0
    for plane in pd.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                nm = ev.name.split(" = ")[0].lstrip("%")
                if nm.startswith("while"):
                    continue  # loop wrapper: contains everything else
                dur = ev.duration_ns / 1e6
                if nm in op_comp:
                    c = comp_cat.get(op_comp[nm], "fusion?")
                elif "conv" in nm or "custom-call" in nm:
                    c = "conv/matmul"
                else:
                    c = classify(nm)
                cat[c] += dur
                key_name = (
                    ev.name[:140]
                    if os.environ.get("PROF_NO_COLLAPSE") == "1"
                    else re.sub(r"\.\d+", "", ev.name)[:140]
                )
                ops[(c, key_name)] += dur
                if nm in op_comp:
                    meta = comp_meta.get(op_comp[nm])
                else:
                    meta = op_meta.get(nm)
                if meta:
                    prev = op_src.get((c, key_name))
                    # attribute the collapsed key to its heaviest instance
                    if prev is None or dur > prev[0]:
                        op_src[(c, key_name)] = (dur, meta)
                total += dur
    print(f"trace: {path}")
    print(f"device total (exclusive ops): {total:.1f} ms over {steps} steps "
          f"=> {total/steps:.2f} ms/step\n")
    print("== by category (ms total / ms per step) ==")
    for k, v in cat.most_common():
        print(f"  {k:24s} {v:9.2f}  {v/steps:8.3f}")
    print(f"\n== top {top} ops ==")
    for (c, k), v in ops.most_common(top):
        print(f"  {v/steps:8.3f} ms/step [{c:16s}] {k}")
        src = op_src.get((c, k))
        if src:
            print(f"           src: {src[1][-130:]}")
    return total, dict(cat)


if __name__ == "__main__":
    main()
