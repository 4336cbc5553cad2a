"""int8 MXU inference path for the folded 3-D convolutions.

The v5e MXU runs int8 x int8 -> int32 at 2x the bf16 FLOP rate (394 vs
197 T/s), and the sampling step is ~85% conv time — so a weight+activation
int8 ("W8A8") conv path is the one remaining lever that can push the step
*below* the bf16 speed-of-light. This module implements it for the
B*D-folded lowering (ops/conv3d.py:conv3d_folded):

- weights: symmetric per-output-channel scales, quantized at trace time
  from the loaded parameter (a scan-invariant — XLA hoists the one-time
  quantization out of the sampler's step loop);
- activations: symmetric PER-SAMPLE dynamic scales (abs-max each call)
  by default; per-sample (not per-tensor) keeps sharded patches
  independent (see quantize_act). Optionally STATIC per-conv-site scales
  calibrated offline over a real sampling chain (tools/calibrate_int8.py
  -> DDPM3D_INT8_SCALES=<json>): the on-chip abs-max reductions — ~9
  ms/step of the measured int8 step — become trace-time constants.
  Per-site ranges are NOT timestep-invariant: the committed production
  calibration records up to 38x per-site spread across chain steps
  (INT8_SCALES_PROD.json meta), so one whole-chain scale wastes up to 5
  bits of int8 resolution at small-range steps (measured −1.2 dB at
  ddpm1000, and the mechanism behind the ddim collapse —
  RESPACING_PROD_R4_INT8*.json). Per-TIME-BIN tables
  (tools/calibrate_int8.py --time_bins → ``scales_t``; scale_tables /
  quant_scales_collection below) restore per-step resolution while
  keeping scales trace-time data;
- accumulation: int32 on the MXU; depth taps accumulate in int32 and
  dequantize ONCE (they share the activation scale);
- dequantize: y = y_i32 * (s_x * s_w[c]), fused by XLA into the bias add.

Worst-case accumulator magnitude 127*127*(kh*kw*Cin) = 1.5e8 for
Cin=1024 < 2^31: no overflow at any shape in the zoo.

Inference-only and env-gated (``DDPM3D_INT8=1``); training always runs
the bf16/f32 path. Replaces (faster than) the reference's fp16 inference
torso (/root/reference/guided_diffusion/unet.py:646 convert_to_fp16).
Quality at production shape is measured by tools/respacing_study.py
--int8 against the bf16 chain (see README; int8 is opt-in, not default).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def int8_mode() -> str:
    """Trace-time gate: ``off`` (default), ``int8`` (DDPM3D_INT8=1 — true
    W8A8 integer convs on the MXU), or ``sim`` (DDPM3D_INT8=sim —
    fake-quantization: quantize+dequantize both operands, convolve in f32).

    ``sim`` computes the SAME values as ``int8`` up to float rounding —
    dequantization is linear, so conv(q_x*s_x, q_w*s_w) ==
    s_x*s_w*conv(q_x, q_w) — but uses the fast fp conv kernels; XLA:CPU's
    integer conv is a ~70x-slower generic path, which makes chain-level
    quality studies infeasible in true int8 off-TPU (measured; see
    tests/test_quant.py::TestSimMode for the equivalence pin)."""
    v = os.environ.get("DDPM3D_INT8", "0")
    if v == "1":
        return "int8"
    if v == "sim":
        return "sim"
    return "off"


def int8_enabled() -> bool:
    """True when any quantized conv mode (int8 or sim) is active."""
    return int8_mode() != "off"


def calib_enabled() -> bool:
    """True under ``DDPM3D_INT8_CALIB=1``: Conv3DFolded runs the normal fp
    path but sows each site's activation abs-max into the ``quant_calib``
    collection (visible via ``model.apply(..., mutable=["quant_calib"])``).
    Used by tools/calibrate_int8.py; mutually exclusive with DDPM3D_INT8
    (calibration must see UNQUANTIZED ranges)."""
    return os.environ.get("DDPM3D_INT8_CALIB", "0") == "1"


_scales_cache: Tuple[Optional[str], dict] = (None, {})


def static_scales() -> dict:
    """Per-conv-site static activation scales from ``DDPM3D_INT8_SCALES``
    (a JSON file written by tools/calibrate_int8.py: ``{"scales": {path:
    s}}``). Empty dict when unset. Cached per env value so tests can
    repoint the file.

    The value ``const:<s>`` (e.g. ``const:0.05``) applies one scale to
    EVERY site — timing-identical to a calibrated file with no
    calibration run, for speed benches/profiling (bench.py) where output
    values don't matter. Never serve with it: real per-site ranges span
    orders of magnitude."""
    global _scales_cache
    fname = os.environ.get("DDPM3D_INT8_SCALES") or None
    if _scales_cache[0] == fname:
        return _scales_cache[1]
    table: dict = {}
    if fname and fname.startswith("const:"):
        table = {"__const__": float(fname[len("const:"):])}
    elif fname:
        import json

        with open(fname) as f:
            table = {
                str(k): float(v)
                for k, v in json.load(f)["scales"].items()
            }
    _scales_cache = (fname, table)
    return table


_tables_cache: Tuple[Optional[str], Optional[dict]] = (None, None)


def scale_tables() -> Optional[dict]:
    """Per-time-bin static scale tables from the ``DDPM3D_INT8_SCALES``
    file, or None when the file has no ``scales_t`` block (or none is
    set, or ``DDPM3D_INT8_NO_TIME_SCALES=1`` opts out).

    Returns ``{"n_bins": N, "chain_steps": T, "sites": {path: (N,)
    np.float32 array}}``. Written by ``tools/calibrate_int8.py
    --time_bins N``: the committed whole-chain calibration records up to
    38x per-site activation spread across the chain
    (INT8_SCALES_PROD.json meta) — one scale per site wastes up to
    5 bits of int8 resolution at small-range steps, the measured cost
    being −1.2 dB at ddpm1000. Binning the chain restores per-step
    resolution while keeping scales trace-time data (a (N,)-table gather
    on the traced step index — no abs-max reductions return to the hot
    path)."""
    global _tables_cache
    fname = os.environ.get("DDPM3D_INT8_SCALES") or None
    if fname and fname.startswith("const:"):
        return None
    if os.environ.get("DDPM3D_INT8_NO_TIME_SCALES") == "1":
        return None
    if _tables_cache[0] == fname:
        return _tables_cache[1]
    tab: Optional[dict] = None
    if fname:
        import json

        with open(fname) as f:
            data = json.load(f)
        st = data.get("scales_t")
        meta = data.get("meta") or {}
        if st:
            tab = {
                "n_bins": int(meta["time_bins"]),
                "chain_steps": int(meta["chain_steps"]),
                "sites": {
                    str(k): np.asarray(v, np.float32)
                    for k, v in st.items()
                },
            }
    _tables_cache = (fname, tab)
    return tab


def quant_scales_collection(t_scalar) -> Optional[dict]:
    """Build the ``quant_scales`` Flax collection for chain step
    ``t_scalar`` (the respaced chain index the samplers pass to
    model_fn — may be traced), or None when no per-bin tables exist.

    The returned nested dict mirrors the module tree ({...module path:
    {"act_scale": scalar}}); pass it alongside params:
    ``model.apply({"params": p, "quant_scales": col}, x, t, ...)`` and
    Conv3DFolded reads its own entry in preference to the whole-chain
    :func:`static_scale_for` value. The per-site (N,) tables are closed
    over as constants; only the N-entry gather depends on t.
    """
    tab = scale_tables()
    if tab is None:
        return None
    import jax.numpy as jnp

    idx = jnp.clip(
        jnp.asarray(t_scalar, jnp.int32) * tab["n_bins"]
        // tab["chain_steps"],
        0, tab["n_bins"] - 1,
    )
    col: dict = {}
    for path, arr in tab["sites"].items():
        node = col
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = {"act_scale": jnp.asarray(arr)[idx]}
    return col


def static_scale_for(path: str) -> Optional[float]:
    """The calibrated scale for a conv site, or None (-> dynamic abs-max).
    Missing sites fall back to dynamic quantization rather than erroring —
    but loudly (once per trace): a silent fallback would hide a
    calibration/model mismatch and quietly keep the abs-max reductions on
    the hot path."""
    table = static_scales()
    if not table:
        return None
    if "__const__" in table:
        return table["__const__"]
    s = table.get(path)
    if s is None:
        import warnings

        warnings.warn(
            f"DDPM3D_INT8_SCALES has no entry for conv site '{path}' — "
            "falling back to dynamic abs-max for it (was the scales file "
            "calibrated on this model config?)"
        )
    return s


def validate_scales_file(
    fname: str,
    *,
    model_path: str = "",
    sampler: str = "",
    respacing: str = "",
    model_config: Optional[dict] = None,
) -> None:
    """Check a calibration file's ``meta`` block against the serving run.

    Static scales are trajectory- and checkpoint-specific: a file
    calibrated on the wrong checkpoint or sampler loads silently through
    :func:`static_scales` (which reads only ``["scales"]``) and the
    measured failure mode is a 15.5 dB collapse
    (RESPACING_PROD_R4_INT8.json ddim25). This validator is called by
    serving entry points (scripts/test.py) BEFORE the env gate is set:

    - **hard error** on checkpoint or model-config mismatch (wrong
      weights ⇒ wrong activation ranges at every site);
    - **loud warning** on sampler/respacing mismatch (ancestral scales
      measured −1.2 dB on longer ancestral chains but collapse DDIM —
      the caller may know better, e.g. respacing sweeps);
    - **loud warning** when the file predates meta enrichment (no
      ``meta`` block or missing fields — tools/calibrate_int8.py now
      records all of them).

    ``model_config`` keys checked when present in both: ``size``,
    ``model_channels``, ``channel_mult``, ``num_res_blocks``.
    """
    import json
    import warnings

    if fname.startswith("const:"):
        warnings.warn(
            "DDPM3D_INT8_SCALES=const:<s> applies ONE scale to every "
            "site — a speed-profiling mode, never a serving config "
            "(real per-site ranges span orders of magnitude)."
        )
        return
    with open(fname) as f:
        data = json.load(f)
    meta = data.get("meta") or {}
    if not meta:
        warnings.warn(
            f"int8 scales file {fname} has no 'meta' block (predates "
            "tools/calibrate_int8.py meta enrichment) — cannot verify "
            "it matches this checkpoint/sampler. Recalibrate."
        )
        return
    if model_path and meta.get("ckpt"):
        want = os.path.basename(model_path)
        got = os.path.basename(str(meta["ckpt"]))
        if got != want:
            raise ValueError(
                f"int8 scales file {fname} was calibrated on checkpoint "
                f"'{got}' but this run serves '{want}' — activation "
                "ranges are checkpoint-specific (recalibrate with "
                "tools/calibrate_int8.py --load_ckpt <this checkpoint>)"
            )
    for key in ("size", "model_channels", "channel_mult",
                "num_res_blocks"):
        if model_config and key in model_config and key in meta:
            if list(np.ravel(meta[key])) != list(
                    np.ravel(model_config[key])):
                raise ValueError(
                    f"int8 scales file {fname} was calibrated on a "
                    f"model with {key}={meta[key]} but this run uses "
                    f"{key}={model_config[key]}"
                )
    if sampler and meta.get("sampler") and meta["sampler"] != sampler:
        import warnings

        warnings.warn(
            f"int8 scales file {fname} was calibrated on the "
            f"'{meta['sampler']}' chain but this run samples with "
            f"'{sampler}' — static scales are trajectory-specific "
            "(ancestral-calibrated scales collapsed ddim25 by 15.5 dB, "
            "RESPACING_PROD_R4_INT8.json)."
        )
    if respacing and meta.get("respacing") and str(
            meta["respacing"]) != str(respacing):
        import warnings

        warnings.warn(
            f"int8 scales file {fname} was calibrated over the "
            f"'{meta['respacing']}' respacing but this run uses "
            f"'{respacing}' — per-step activation ranges spread up to "
            f"{meta.get('max_step_spread', 'N/A')}x across the chain "
            "(file meta); verify quality at this respacing."
        )


_EXCLUDE_DEFAULT = "in0_0,head_conv"


def int8_excluded(path: str) -> bool:
    """True if a module path matches DDPM3D_INT8_EXCLUDE (comma-separated
    substrings). Defaults to the I/O convs (``in0_0``, ``head_conv``):
    they are 2->C / C->2 channels (negligible FLOPs) and keeping them in
    bf16 recovers 0.1-0.6 dB chain PSNR (measured, README int8 table).
    Set DDPM3D_INT8_EXCLUDE="" (empty) to quantize everything."""
    pats = [
        p
        for p in os.environ.get(
            "DDPM3D_INT8_EXCLUDE", _EXCLUDE_DEFAULT
        ).split(",")
        if p
    ]
    return any(p in path for p in pats)


def quantize_act(
    x: jnp.ndarray, batch: int = 1, static_scale: Optional[float] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric PER-SAMPLE int8 quantization with dynamic abs-max scales.

    ``x`` is a folded [(B*D), H, W, C] activation with ``batch`` samples of
    D consecutive rows each; each sample gets its own scale. At batch 1
    this is plain per-tensor quantization; at batch > 1 it keeps every
    sample's quantization independent — under the sharded inference mesh a
    global abs-max would couple patches across chips (one collective per
    conv AND a topology-dependent scale, breaking the pipeline's
    single-device/sharded bit-identity property, tests/test_parallel.py).

    ``static_scale`` (a calibrated per-site constant, see static_scales)
    replaces the dynamic abs-max entirely: no reduction is emitted, the
    scale is a trace-time scalar shared by every sample (trivially
    sharding-safe), and out-of-range values saturate at +-127.

    Returns ``(q, scale)``: ``q`` int8 like ``x``; ``scale`` f32 broadcast
    against ``x`` (shape (B*D,1,1,1) — rows of one sample share their
    scale — or a scalar in the static case). An all-zero sample maps to
    scale=1 (q=0).
    """
    x32 = x.astype(jnp.float32)
    if static_scale is not None:
        # asarray (not jnp.float32(...)): static_scale may be a traced
        # scalar under per-time-bin tables (quant_scales_collection)
        scale = jnp.asarray(static_scale, jnp.float32)
        q = jnp.clip(jnp.round(x32 / scale), -127, 127)
        return q.astype(jnp.int8), scale
    BD = x.shape[0]
    assert BD % max(batch, 1) == 0, (BD, batch)
    amax = jnp.max(
        jnp.abs(x32.reshape(batch, -1)), axis=1
    )  # (B,)
    scale_b = jnp.where(amax > 0, amax / 127.0, 1.0)
    scale = jnp.repeat(scale_b, BD // max(batch, 1)).reshape(
        BD, *([1] * (x.ndim - 1))
    )
    q = jnp.clip(jnp.round(x32 / scale), -127, 127)
    return q.astype(jnp.int8), scale


def quantize_kernel(kernel: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-OUTPUT-channel int8 weight quantization.

    ``kernel`` is (..., Cin, Cout); returns ``(q, s_w)`` with ``s_w`` of
    shape (Cout,) f32 and ``kernel ~= q * s_w`` broadcast over Cout.
    """
    k32 = kernel.astype(jnp.float32)
    axes = tuple(range(k32.ndim - 1))
    amax = jnp.max(jnp.abs(k32), axis=axes)
    s_w = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(k32 / s_w), -127, 127)
    return q.astype(jnp.int8), s_w


def conv3d_folded_sim(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    batch: int,
    strides_hw: Tuple[int, int] = (1, 1),
    padding_hw: Optional[Sequence[Tuple[int, int]]] = None,
    act_scale: Optional[float] = None,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Fake-quant twin of :func:`conv3d_folded_int8`: both operands are
    quantized and DEQUANTIZED, then convolved with the fast fp kernels in
    f32. By linearity of dequantization this equals the int8 path up to
    f32 rounding (pinned by TestSimMode); the per-tap sum commutes with
    the shared activation scale. ``bias`` (Cout,) is added in f32 before
    the output cast, mirroring the int8 path's fused epilogue."""
    from .conv3d import conv3d_folded

    xq, s_x = quantize_act(x, batch, static_scale=act_scale)
    kq, s_w = quantize_kernel(kernel)
    xd = xq.astype(jnp.float32) * s_x
    kd = kq.astype(jnp.float32) * s_w
    y = conv3d_folded(
        xd, kd, batch, strides_hw=strides_hw, padding_hw=padding_hw,
        preferred_dtype=jnp.float32,
    )
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def int8_impl() -> str:
    """Depth-tap lowering for the int8 convs: ``concat`` (default: the kd
    depth-shifted int8 slices are concatenated on the channel axis and
    convolved ONCE with the (kh,kw,kd*C,Cout)-reshaped kernel),
    ``DDPM3D_INT8_IMPL=taps`` (one int8 conv2d per depth tap, int32
    tensor adds between them), ``DDPM3D_INT8_IMPL=native`` (un-fold to
    (B,D,H,W,C) and run ONE 5-D NDHWC s8 conv — the conv's batch axis
    prevents depth crossings with no masks, no shifted copies, and no
    concat materialisation), or ``DDPM3D_INT8_IMPL=pallas`` (the custom
    implicit-GEMM s8 Pallas kernel, ops/conv3d_s8.py: 27 s8 MXU matmuls
    over a VMEM-resident haloed block with the dequantize epilogue fused
    in-register; falls back to ``concat`` per call where
    conv3d_s8_applicable is False — strided/narrow/odd-channel sites).
    All four are bit-identical — one int32 accumulation over the same
    products — but schedule differently.
    Measured on-chip at the flagship int8-static step (round 4,
    tools/ab_int8_step.py): concat+taps-mix 87.4, all-concat 88.1,
    all-taps 91.6 — and native LOSES decisively at step level despite
    skipping the tap-building elementwise: all-native 315.2, native at
    the full-res sites only 129.4/114.9 ms/step. XLA's 5-D NDHWC s8
    conv schedule is the bottleneck, not the concat materialisation.
    The ``pallas`` lowering was the round-5 attempt to beat ``concat``
    and measured a decisive NEGATIVE (S8_KERNEL_STUDY.md): all_pallas
    109.1 ms/step vs 87.4, because XLA's isolated s8 concat convs
    already run at 91-98% of the int8 MXU ceiling. It stays as
    benchmarked-off infrastructure."""
    return os.environ.get("DDPM3D_INT8_IMPL", "concat").lower()


def int8_impl_for(path: Optional[str]) -> str:
    """Per-site lowering choice: ``DDPM3D_INT8_NATIVE_SITES`` (checked
    first) and ``DDPM3D_INT8_TAPS_SITES`` (comma-separated substrings)
    force the ``native`` / ``taps`` lowering at matching module paths
    while the global default (``concat``) serves the rest. All lowerings
    are bit-identical (same int32 accumulation, different schedule), so
    this is purely a tuning knob. Default sites: the flagship's widest
    skip-concat decoder conv (``out13_0/in_conv``, kd*C=768-channel
    concat materialisation at 96^3), where an A/B on the real chip
    measured the whole int8-static step at 87.4 ms with taps there vs
    88.1 all-concat. NOTE the per-op trace projected a bigger win (~7 ms:
    17.4 concat vs 10.4 taps on that site) that does NOT materialise at
    step level — the collapsed-name per-op attribution double-counts
    sibling fusions, so per-op deltas are upper bounds; trust whole-step
    A/Bs. Adding ``in1_0/in_conv`` measured 87.9 — worse — so the
    single-site default stands. Set the env to the empty string to force
    all-concat, or to a comma list to tune other models/shapes."""
    if path:
        native_sites = [
            s for s in os.environ.get(
                "DDPM3D_INT8_NATIVE_SITES", ""
            ).split(",") if s
        ]
        if any(s in path for s in native_sites):
            return "native"
        pallas_sites = [
            s for s in os.environ.get(
                "DDPM3D_INT8_PALLAS_SITES", ""
            ).split(",") if s
        ]
        if any(s in path for s in pallas_sites):
            return "pallas"
    sites = [
        s for s in os.environ.get(
            "DDPM3D_INT8_TAPS_SITES", "out13_0/in_conv"
        ).split(",")
        if s
    ]
    if path and any(s in path for s in sites):
        return "taps"
    return int8_impl()


def conv3d_folded_int8(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    batch: int,
    strides_hw: Tuple[int, int] = (1, 1),
    padding_hw: Optional[Sequence[Tuple[int, int]]] = None,
    act_scale: Optional[float] = None,
    path: Optional[str] = None,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """W8A8 variant of ops/conv3d.py:conv3d_folded (shifted-tap lowering).

    Same math up to quantization: depth taps are shifted row slices of the
    folded [(B*D),H,W,C] activation, batch-crossing rows zeroed by a 0/1
    mask (exact in int8 — symmetric quantization has no zero point), each
    tap an NHWC int8 conv2d accumulating int32, summed in int32, then one
    dequantize by ``s_x * s_w[c]``. Output dtype follows ``x``.
    Under the default ``concat`` impl the taps instead become channel
    groups of ONE int8 conv (see :func:`int8_impl`) — bit-identical
    output, different schedule; ``path`` lets DDPM3D_INT8_TAPS_SITES /
    DDPM3D_INT8_PALLAS_SITES force a lowering per site
    (:func:`int8_impl_for`). The ``pallas`` lowering runs the custom
    implicit-GEMM s8 kernel (ops/conv3d_s8.py) where applicable
    (stride 1, SAME, C%128==0, W%32==0, per-tensor activation scale)
    and silently falls back to ``concat`` elsewhere.

    ``act_scale``: calibrated static activation scale (no abs-max reduce).
    ``bias``: optional (Cout,) bias added in f32 BEFORE the output cast —
    under the pallas lowering it fuses into the kernel epilogue; the XLA
    lowerings add it to the f32 dequantized output. One fewer bf16 HBM
    round-trip than a caller-side add. The int32 accumulation and the
    scale multiply stay bit-identical across all lowerings; the bias add
    may FMA-contract inside the pallas epilogue (one rounding instead of
    two — <= 1 ulp, tests/test_conv3d_s8.py).
    """
    BD, H, W, C = x.shape
    kd, kh, kw = kernel.shape[:3]
    assert BD % batch == 0, (BD, batch)
    D = BD // batch
    if padding_hw is None:
        padding_hw = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    pd = kd // 2

    xq, s_x = quantize_act(x, batch, static_scale=act_scale)
    kq, s_w = quantize_kernel(kernel)

    impl = int8_impl_for(path)
    if impl == "pallas":
        from .conv3d_s8 import conv3d_s8, conv3d_s8_mode

        same_pad = tuple(tuple(p) for p in padding_hw) == (
            (kh // 2, kh // 2), (kw // 2, kw // 2)
        )
        # per-tensor scale required to fold s_x into the (Cout,) epilogue
        # vector: static scales are scalars; dynamic per-sample scales
        # are one scalar only at batch 1.
        x5 = (batch, D, H, W, C)
        mode = (
            conv3d_s8_mode(x5, kq.shape, (1,) + tuple(strides_hw))
            if same_pad and (act_scale is not None or batch == 1)
            else None
        )
        if mode is not None:
            if act_scale is not None:
                scale = jnp.asarray(act_scale, jnp.float32) * s_w
            else:
                # dynamic at batch 1: every folded row repeats the one
                # per-sample scale (quantize_act) — take it as a scalar
                scale = s_x.reshape(-1)[0].astype(jnp.float32) * s_w
            bias_f = None if bias is None else bias.astype(jnp.float32)
            interp = jax.default_backend() != "tpu"
            if mode == "direct":
                out5 = conv3d_s8(
                    xq.reshape(x5), kq, scale, bias=bias_f,
                    out_dtype=x.dtype, interpret=interp,
                )
                return out5.reshape(BD, H, W, -1)
            # "transpose": rotate the full-depth axis minor-most —
            # (B,D,H,W,C)->(B,H,W,D,C) — so 48/24/12-wide levels meet
            # the 32-row int8 tile; the rotation fuses with the
            # producing quantize. Conv is layout-equivariant under the
            # matching kernel rotation (kd,kh,kw)->(kh,kw,kd).
            xt = jnp.transpose(xq.reshape(x5), (0, 2, 3, 1, 4))
            kt = jnp.transpose(kq, (1, 2, 0, 3, 4))
            out5 = conv3d_s8(
                xt, kt, scale, bias=bias_f,
                out_dtype=x.dtype, interpret=interp,
            )
            out5 = jnp.transpose(out5, (0, 3, 1, 2, 4))
            return out5.reshape(BD, H, W, -1)
        impl = "concat"
    if impl == "native":
        # Un-fold to (B, D, H, W, C): the 5-D conv's batch axis enforces
        # the no-depth-crossing invariant that the folded lowerings need
        # masks for, and SAME depth padding reproduces the zero-padded
        # taps — no shifted copies or concat materialisation at all.
        out5 = jax.lax.conv_general_dilated(
            xq.reshape(batch, D, H, W, C),
            kq,
            window_strides=(1,) + tuple(strides_hw),
            padding=((pd, pd),) + tuple(tuple(p) for p in padding_hw),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.int32,
        )
        out = out5.reshape((batch * out5.shape[1],) + out5.shape[2:])
        scale = (s_x * s_w).astype(jnp.float32)
        y = out.astype(jnp.float32) * scale
        if bias is not None:
            y = y + bias.astype(jnp.float32)
        return y.astype(x.dtype)

    xp = jnp.pad(xq, ((pd, pd), (0, 0), (0, 0), (0, 0)))
    taps = []
    for k in range(kd):
        delta = k - pd
        xs = jax.lax.slice_in_dim(xp, k, k + BD, axis=0)
        if batch > 1 and delta != 0:
            d_idx = np.arange(BD) % D
            valid = (d_idx + delta >= 0) & (d_idx + delta < D)
            mask = jnp.asarray(valid, jnp.int8).reshape(BD, 1, 1, 1)
            xs = xs * mask
        taps.append(xs)
    if impl == "concat":
        # (kd,kh,kw,C,Cout) -> (kh,kw,kd*C,Cout), matching the tap order
        # of the channel concat.
        kcat = jnp.transpose(kq, (1, 2, 0, 3, 4)).reshape(
            kh, kw, kd * C, -1
        )
        out = jax.lax.conv_general_dilated(
            jnp.concatenate(taps, axis=-1),
            kcat,
            window_strides=strides_hw,
            padding=tuple(padding_hw),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
    else:
        out = None
        for k in range(kd):
            y = jax.lax.conv_general_dilated(
                taps[k],
                kq[k],
                window_strides=strides_hw,
                padding=tuple(padding_hw),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            out = y if out is None else out + y
    # (BD,1,1,1) x (Cout,) -> broadcast over rows and channels
    scale = (s_x * s_w).astype(jnp.float32)
    y = out.astype(jnp.float32) * scale
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def upsample_conv_folded_int8(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    batch: int,
    sim: bool = False,
    act_scale: Optional[float] = None,
) -> jnp.ndarray:
    """W8A8 variant of ops/phase_up.py:upsample_conv_folded.

    The four 2x2 phase kernels are derived (tap sums in f32) and THEN
    quantized, each with its own per-channel scales — the sums, not the
    raw taps, are what multiply activations. All phases share the one
    activation scale, so phase outputs interleave after dequantization
    without seam artifacts.

    ``sim=True`` runs the fake-quant twin: identical quantization
    decisions (per-phase kernel scales included), fp convs on the
    dequantized operands — equal up to f32 rounding.
    """
    from .phase_up import phase_up_kernels

    BD, H, W, C = x.shape
    kd = kernel.shape[0]
    assert BD % batch == 0, (BD, batch)
    D = BD // batch
    pd = kd // 2
    phases = phase_up_kernels(kernel.astype(jnp.float32))

    xq, s_x = quantize_act(x, batch, static_scale=act_scale)
    if sim:
        xq = xq.astype(jnp.float32) * s_x
    xp = jnp.pad(xq, ((pd, pd), (0, 0), (0, 0), (0, 0)))
    pad_for = {0: (1, 0), 1: (0, 1)}

    ys = {}
    for (a, b), k_ab in phases.items():
        kq, s_w = quantize_kernel(k_ab)
        kk = kq.astype(jnp.float32) * s_w if sim else kq
        acc = None
        for k in range(kd):
            delta = k - pd
            xs = jax.lax.slice_in_dim(xp, k, k + BD, axis=0)
            if batch > 1 and delta != 0:
                d_idx = np.arange(BD) % D
                valid = (d_idx + delta >= 0) & (d_idx + delta < D)
                xs = xs * jnp.asarray(valid, xs.dtype).reshape(BD, 1, 1, 1)
            y = jax.lax.conv_general_dilated(
                xs,
                kk[k],
                window_strides=(1, 1),
                padding=(pad_for[a], pad_for[b]),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=(
                    jnp.float32 if sim else jnp.int32
                ),
            )
            acc = y if acc is None else acc + y
        if sim:
            ys[(a, b)] = acc.astype(x.dtype)
        else:
            ys[(a, b)] = (
                acc.astype(jnp.float32) * (s_x * s_w)
            ).astype(x.dtype)

    Cout = kernel.shape[-1]
    rows = jnp.stack(
        [
            jnp.stack([ys[(0, 0)], ys[(0, 1)]], axis=3),
            jnp.stack([ys[(1, 0)], ys[(1, 1)]], axis=3),
        ],
        axis=2,
    )
    return rows.reshape(BD, 2 * H, 2 * W, Cout)
