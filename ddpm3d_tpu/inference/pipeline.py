"""Whole-volume denoising pipeline: patch grid -> sharded sampling -> Hann
blend -> .npz/.tif outputs.

Clean-room equivalent of the reference's inference driver
(scripts/test.py:19-299), redesigned TPU-first:

- The 18-patch grid is stacked into ONE batch, padded to a multiple of the
  device count, and sampled under a single jitted ``lax.scan`` chain with
  the batch dim sharded over the mesh's ``data`` axis. This replaces the
  reference's per-rank Python loop with a per-patch ``all_gather`` every
  yield (scripts/test.py:51-80) — and designs away its
  deadlock-on-ragged-count hazard (SURVEY.md §2).
- Patches can additionally be batched per device (the reference runs
  batch=1 per rank), which improves MXU utilisation.
- Output fidelity: (H, W, Z) float32 ``.npz`` + (Z, H, W) ``.tif``
  matching scripts/test.py:168-179, including the noise-reduction stats
  (scripts/test.py:154-161).
"""

from __future__ import annotations

import os
import os.path as osp
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import DiffusionConfig, Schedule
from ..diffusion.sampling import _step_noise, sample_chain_segment
from ..data import tiff_io
from ..data.patches import (
    blend_patches_count,
    blend_patches_hann,
    extract_patches_zxy,
    patch_grid,
    test_xy_starts,
    test_z_starts,
)
from ..parallel import mesh as pmesh
from ..utils import logger


def log_stage_stats(stage: str, arr: np.ndarray) -> None:
    """min/max/mean/std line after each pipeline stage — the backup
    script's stage-by-stage instrumentation (test_backup.py:61,81,104,
    140,168,207), kept in the active pipeline as debugging/parity aid."""
    a = np.asarray(arr)
    logger.log(
        f"[stage:{stage}] shape={tuple(a.shape)} min={a.min():.4f} "
        f"max={a.max():.4f} mean={a.mean():.4f} std={a.std():.4f}"
    )


def load_volume_for_denoising(
    path: str, enforce_contract: bool = True
) -> np.ndarray:
    """Load a (Z, H, W) volume; the active reference script applies NO
    normalization (scripts/test.py:201-203) and asserts the scanner's
    200x200x[90..130] shape contract (scripts/test.py:197-199)."""
    ext = osp.splitext(path)[1].lower()
    if ext in (".tif", ".tiff"):
        vol = tiff_io.imread(path)
    elif ext == ".npz":
        vol = np.load(path)["arr_0"]
    elif ext == ".npy":
        vol = np.load(path)
    else:
        raise ValueError(f"unsupported input type: {ext}")
    vol = np.asarray(vol)
    if vol.ndim == 4 and vol.shape[0] == 1:
        vol = vol[0]
    assert vol.ndim == 3, f"expected 3-D volume, got {vol.shape}"
    if enforce_contract:
        D, H, W = vol.shape
        assert H == 200 and W == 200, (
            f"Expected 200x200 XY dimensions, got {H}x{W}"
        )
        assert 90 <= D <= 130, f"Expected Z dimension 90-130, got {D}"
    vol = vol.astype(np.float32)
    log_stage_stats("load", vol)
    return vol


_TRANSIENT_MARKERS = ("INTERNAL", "UNAVAILABLE", "DEADLINE_EXCEEDED")


def _retry_transient(fn, attempts: int = 4, base_sleep: float = 20.0):
    """Run ``fn`` with retries on transient device/runtime faults.

    Inference chunks are pure functions of (params, patch ids): per-step
    noise is derived from the global sample id (diffusion/sampling.py:
    _step_noise), so re-running a failed chunk reproduces the exact same
    output. Only error strings carrying a transient status marker are
    retried; determinism bugs and OOMs re-raise immediately. Backoff is
    linear (20/40/60 s — observed relay faults can wedge for minutes)."""
    for i in range(attempts):
        try:
            return fn()
        except jax.errors.JaxRuntimeError as e:
            transient = any(m in str(e) for m in _TRANSIENT_MARKERS)
            if i == attempts - 1 or not transient:
                raise
            wait = base_sleep * (i + 1)
            logger.log(
                f"transient device error, retrying chunk in {wait:.0f}s "
                f"(attempt {i + 1}/{attempts}): {str(e).splitlines()[0]}"
            )
            time.sleep(wait)


def denoise_patches(
    key: jax.Array,
    model_apply,
    params,
    sched: Schedule,
    cfg: DiffusionConfig,
    low_patches: np.ndarray,
    *,
    use_ddim: bool = False,
    eta: float = 0.0,
    use_dpm_solver: bool = False,
    dpm_order: int = 2,
    clip_denoised: bool = True,
    mesh=None,
    per_device_batch: Optional[int] = None,
    noise: Optional[np.ndarray] = None,
    noise_stream: Optional[np.ndarray] = None,
    progress_cb=None,
    segment_steps: Optional[int] = 100,
) -> np.ndarray:
    """Run the full reverse chain on a stack of conditioner patches.

    ``use_dpm_solver`` selects the DPM-Solver++(2M) ODE sampler
    (diffusion/dpm_solver.py — beyond-reference capability; use a spaced
    schedule for the step count).

    ``low_patches``: [P, Z, X, Y] float32. Returns denoised [P, Z, X, Y].

    The patch dim is padded to a multiple of the data-mesh size and sharded;
    each jit call processes n_devices * per_device_batch patches as one
    batched scan over timesteps.

    Long chains are executed in ``segment_steps``-sized device calls
    (bit-identical to one monolithic scan — per-step keys fold on t); this
    keeps single executions under relay/watchdog limits. ``None`` or a value
    >= the chain length runs monolithically.

    ``noise_stream`` supplies explicit per-step noises per patch — the
    external-RNG parity path for matching the reference's torch-global-RNG
    chain exactly (runs monolithically). Either an array
    [P, T, Z, X, Y] ordered t=T-1..0 (requires ``noise`` for x_T), or a
    callable ``(lo, hi) -> (x_T [n,Z,X,Y], stream [n,T,Z,X,Y])`` invoked
    with increasing patch ranges — the memory-bounded form: only one
    chunk's noises exist at a time (the full array at production settings
    is ~64 GB).
    """
    mesh = mesh if mesh is not None else pmesh.make_mesh()
    mesh_shape = dict(zip(mesh.axis_names, mesh.devices.shape))
    n_data = mesh_shape.get(pmesh.DATA_AXIS, 1)
    n_spatial = mesh_shape.get(pmesh.SPATIAL_AXIS, 1)
    # Pin the weights to the mesh ONCE (replicated). Checkpoint loading
    # (utils/checkpoint.load_pytree) returns host numpy arrays; passing
    # those into a jitted call re-uploads the full parameter set on EVERY
    # dispatch — measured at ~50 s/chunk for the 128ch flagship (828 MB)
    # through the TPU relay, dwarfing the ~3 s of device compute per
    # 25-step chain. One explicit placement makes later dispatches reuse
    # the on-device buffers.
    from jax.sharding import NamedSharding as _NS, PartitionSpec as _P
    params = jax.device_put(params, _NS(mesh, _P()))
    P = low_patches.shape[0]
    per_device_batch = per_device_batch or 1
    chunk = n_data * per_device_batch

    T = sched.num_timesteps
    seg = segment_steps if segment_steps and segment_steps < T else T

    def init_noise(chunk_key, low_chunk, noise_chunk, ids):
        if noise_chunk is not None:
            return noise_chunk
        # x_T key: fold on a sentinel far above any timestep index
        return _step_noise(
            jax.random.fold_in(chunk_key, 2**31 - 1),
            jnp.zeros_like(low_chunk), ids,
        )

    def _vars(params, t):
        # per-time-bin int8 scales, when the scales file carries them:
        # a Flax collection keyed on the (traced) chain step — the (N,)
        # tables are trace-time constants, only an N-entry gather
        # depends on t (ops/quant.py:quant_scales_collection)
        from ..ops.quant import quant_scales_collection

        col = quant_scales_collection(jnp.reshape(t, (-1,))[0])
        if col is None:
            return {"params": params}
        return {"params": params, "quant_scales": col}

    def run_segment(params, chunk_key, img, low_chunk, ids, t_start, n_steps):
        # params are an ARGUMENT, not a closure: closed-over weights would
        # be baked into the HLO as constants (gigabyte-scale programs).
        # ``ids`` key each patch's noise by its GLOBAL index, so outputs are
        # identical regardless of device count / chunking; ``t_start`` is
        # traced so one compile serves every segment position.
        model_fn = lambda x, t, **kw: model_apply(_vars(params, t), x, t, **kw)
        return sample_chain_segment(
            chunk_key, model_fn, sched, cfg, img, t_start, n_steps,
            use_ddim=use_ddim, eta=eta, clip_denoised=clip_denoised,
            model_kwargs={"low_res": low_chunk}, sample_ids=ids,
        )

    jitted_segment = jax.jit(run_segment, static_argnums=(6,))
    # With a spatial mesh axis, additionally shard the X (height) axis of
    # each patch: XLA SPMD inserts the conv halo exchanges over ICI — true
    # spatial parallelism the reference lacks (SURVEY.md §5.7).
    sharding = pmesh.data_sharding(
        mesh, spatial_dim=2 if n_spatial > 1 else None
    )

    # Per-step noise streams are [T, B, Z, X, Y, 1] (batch on axis 1 after
    # the swapaxes below); shard that axis over ``data`` like the images so
    # a production-scale chunk's stream (~28 GB at 96^3/T=1000/chunk=8)
    # splits across HBMs instead of landing on one device.
    from jax.sharding import NamedSharding, PartitionSpec as _PS
    stream_spec = [None, pmesh.DATA_AXIS, None, None, None, None]
    if n_spatial > 1:
        stream_spec[3] = pmesh.SPATIAL_AXIS
    stream_sharding = NamedSharding(mesh, _PS(*stream_spec))

    padded = pmesh.pad_to_multiple(P, chunk)
    pad = padded - P
    low = np.concatenate([low_patches] + [low_patches[-1:]] * pad)[..., None]
    stream_fn = noise_stream if callable(noise_stream) else None
    if stream_fn is not None:
        noise_stream = None
    if noise is not None:
        noise = np.concatenate(
            [noise, noise[-1:].repeat(pad, axis=0)] if pad else [noise]
        )[..., None]
    if noise_stream is not None and stream_fn is None:
        assert noise is not None, "noise_stream requires explicit x_T noise"
        assert noise_stream.shape[1] == T, (
            f"noise_stream has {noise_stream.shape[1]} steps, chain has {T}"
        )
        noise_stream = np.concatenate(
            [noise_stream, noise_stream[-1:].repeat(pad, axis=0)]
            if pad else [noise_stream]
        )[..., None]

    from ..diffusion.dpm_solver import dpm_solver_pp_sample_loop
    from ..diffusion.sampling import ddim_sample_loop, p_sample_loop

    def run_dpm(params, img, low_chunk):
        model_fn = lambda x, t, **kw: model_apply(
            _vars(params, t), x, t, **kw)
        return dpm_solver_pp_sample_loop(
            key, model_fn, sched, cfg, noise=img,
            clip_denoised=clip_denoised,
            model_kwargs={"low_res": low_chunk}, order=dpm_order,
        )

    jitted_dpm = jax.jit(run_dpm)

    # external-RNG parity path (jitted ONCE; chunk shapes are uniform)
    def run_stream(params, img, low_chunk, stream):
        model_fn = lambda x, t, **kw: model_apply(
            _vars(params, t), x, t, **kw)
        loop = ddim_sample_loop if use_ddim else p_sample_loop
        kw = {"eta": eta} if use_ddim else {}
        return loop(
            key, model_fn, sched, cfg, noise=img,
            clip_denoised=clip_denoised,
            model_kwargs={"low_res": low_chunk},
            noise_stream=stream, **kw,
        )

    jitted_stream = jax.jit(run_stream)

    # Depth-2 software pipeline (DDPM3D_PIPELINE, default on): dispatch
    # chunk N, then read back chunk N-1 while N computes on-device. The
    # measured production run (25-step chain) spends ~3.2 s/patch on the
    # device but ~4.2 s/patch end-to-end — the ~1 s of host work (uploads,
    # readback round-trip, dispatch latency) overlaps with the next
    # chunk's compute. Chunks are pure functions of (params, patch ids),
    # so a failed in-flight chunk is re-run synchronously, bit-identical.
    pipelined = os.environ.get(
        "DDPM3D_PIPELINE", "auto"
    ).lower() in ("auto", "1")

    def _drain(entry):
        img, run_sync = entry
        if img is not None:
            try:
                return np.asarray(jax.device_get(img))
            except jax.errors.JaxRuntimeError as e:
                if not any(m in str(e) for m in _TRANSIENT_MARKERS):
                    raise
                logger.log(
                    "transient fault on in-flight chunk; re-running "
                    f"synchronously: {str(e).splitlines()[0]}"
                )
        return _retry_transient(run_sync)

    outs = []
    pending = []
    done = 0

    def _finish(entry):
        nonlocal done
        outs.append(_drain(entry)[..., 0])
        done += chunk
        if progress_cb is not None:
            progress_cb(min(done, P), P)

    last_xT = last_st = None
    for start in range(0, padded, chunk):
        low_chunk = jax.device_put(
            jnp.asarray(low[start : start + chunk]), sharding
        )
        # noise is keyed per GLOBAL patch index (sample_ids) inside the
        # sampler, so outputs are identical on any device count / chunking
        ids = jax.device_put(
            jnp.arange(start, start + chunk, dtype=jnp.int32),
            pmesh.data_sharding(mesh),
        )
        if stream_fn is not None:
            lo, hi = start, start + chunk
            n_real = max(0, min(hi, P) - lo)
            if n_real:
                xT_np, stream_np = stream_fn(lo, lo + n_real)
                last_xT, last_st = xT_np[-1], stream_np[-1]
            else:
                xT_np = np.empty((0,) + last_xT.shape, last_xT.dtype)
                stream_np = np.empty((0,) + last_st.shape, last_st.dtype)
            pad_n = (hi - lo) - xT_np.shape[0]
            if pad_n:
                xT_np = np.concatenate(
                    [xT_np, np.repeat(last_xT[None], pad_n, axis=0)])
                stream_np = np.concatenate(
                    [stream_np, np.repeat(last_st[None], pad_n, axis=0)])
            assert stream_np.shape[1] == T
            noise_chunk = jax.device_put(
                jnp.asarray(xT_np[..., None]), sharding)
            stream = jax.device_put(
                np.ascontiguousarray(np.swapaxes(stream_np[..., None], 0, 1)),
                stream_sharding,
            )
        else:
            noise_chunk = (
                jax.device_put(
                    jnp.asarray(noise[start : start + chunk]), sharding)
                if noise is not None
                else None
            )
            stream = (
                jax.device_put(
                    np.ascontiguousarray(
                        np.swapaxes(noise_stream[start : start + chunk], 0, 1)
                    ),
                    stream_sharding,
                )
                if noise_stream is not None
                else None
            )
        def dispatch(low_chunk=low_chunk, noise_chunk=noise_chunk,
                     ids=ids, stream=stream):
            # returns the (async) device array — no readback
            img = init_noise(key, low_chunk, noise_chunk, ids)
            if stream is not None:
                img = jitted_stream(params, img, low_chunk, stream)
            elif use_dpm_solver:
                img = jitted_dpm(params, img, low_chunk)
            else:
                t_cur = T
                while t_cur > 0:
                    n_steps = min(seg, t_cur)
                    img = jitted_segment(
                        params, key, img, low_chunk, ids,
                        jnp.asarray(t_cur, jnp.int32), n_steps,
                    )
                    t_cur -= n_steps
            return img

        def run_sync(dispatch=dispatch):
            return np.asarray(jax.device_get(dispatch()))

        # noise is keyed by global patch id, so a retried chunk is
        # bit-identical — safe to restart from x_T on transient device
        # errors (observed: one-off INTERNAL relay faults mid-volume).
        # The external-noise-stream (parity) path stays synchronous:
        # depth-2 would keep TWO chunks' stream buffers alive (~28 GB
        # each at production scale) — the ADVICE-flagged HBM hazard.
        if not pipelined or stream is not None:
            _finish((None, run_sync))
            continue
        try:
            in_flight = dispatch()
        except jax.errors.JaxRuntimeError as e:
            if not any(m in str(e) for m in _TRANSIENT_MARKERS):
                raise
            in_flight = None  # retried synchronously at drain time
        pending.append((in_flight, run_sync))
        if len(pending) > 1:
            _finish(pending.pop(0))
    for entry in pending:
        _finish(entry)
    return np.concatenate(outs)[:P]


def denoise_volume(
    key: jax.Array,
    model_apply,
    params,
    sched: Schedule,
    cfg: DiffusionConfig,
    volume_zxy: np.ndarray,
    *,
    patch_size: int = 96,
    num_xy_patches: int = 3,
    use_ddim: bool = False,
    eta: float = 0.0,
    use_dpm_solver: bool = False,
    dpm_order: int = 2,
    clip_denoised: bool = True,
    mesh=None,
    per_device_batch: Optional[int] = None,
    blend: str = "hann",
    normalize_div4: bool = False,
    num_samples: int = 1,
    noise: Optional[np.ndarray] = None,
    noise_stream: Optional[np.ndarray] = None,
    segment_steps: Optional[int] = 100,
) -> Tuple[np.ndarray, Dict[str, float]]:
    """Denoise a whole (Z, H, W) volume; returns ((H, W, Z) result, stats).

    Mirrors scripts/test.py end-to-end: fixed patch grid, full reverse
    chain per patch, 3-D Hann blending, noise-reduction stats.

    ``blend="count"`` selects the backup script's plain count averaging
    (test_backup.py:118-167); ``normalize_div4`` applies the backup
    script's clip-at-4-then-/4 input normalization (test_backup.py:266-267)
    and rescales the output back by 4.

    ``num_samples > 1`` draws that many independent reverse chains and
    returns their posterior mean, with the per-voxel std exposed in stats
    under ``uncertainty_hwz`` — the paper's uncertainty maps (reference
    README.md:44; the launch script's dangling --num_samples flag). The
    mean is the MMSE estimate and empirically dominates single draws.
    """
    Z, H, W = volume_zxy.shape
    if normalize_div4:
        volume_zxy = np.clip(volume_zxy, None, 4.0) / 4.0
    xs = test_xy_starts(H, patch_size, num_xy_patches)
    ys = test_xy_starts(W, patch_size, num_xy_patches)
    zs = test_z_starts(Z, patch_size)
    grid = patch_grid(xs, ys, zs)
    logger.log(
        f"Patch grid: X {xs}, Y {ys}, Z {zs} -> {len(grid)} patches"
    )

    low = extract_patches_zxy(volume_zxy, grid, patch_size)  # [P,Z,X,Y]
    log_stage_stats("patches", low)

    def blend_one(denoised):
        log_stage_stats("sampled", denoised)
        # [P,Z,X,Y] -> [P,X,Y,Z] for the (H,W,Z)-indexed blender
        patches_xyz = np.transpose(denoised, (0, 2, 3, 1))
        if blend == "count":
            out, uncovered = blend_patches_count(
                patches_xyz, grid, (H, W, Z), patch_size
            )
            if uncovered:
                logger.log(f"WARNING: {uncovered} voxels covered by no patch")
        else:
            out = blend_patches_hann(patches_xyz, grid, (H, W, Z), patch_size)
        return out * 4.0 if normalize_div4 else out

    S = max(1, num_samples)
    if noise is not None or noise_stream is not None:
        assert S == 1, "explicit noise implies a single draw"
    # All draws ride ONE sharded patch batch (S*P work items) instead of S
    # sequential full passes: on an 8-chip mesh, 4-draw uncertainty maps
    # take ceil(4*18/8) = 9 chain rounds instead of 4*ceil(18/8) = 12.
    # Per-draw noise stays keyed by the global work-item id (sample_ids), so
    # results are identical to the sequential form on any device count.
    low_all = np.concatenate([low] * S) if S > 1 else low
    t0 = time.monotonic()
    denoised_all = denoise_patches(
        jax.random.fold_in(key, 1000003), model_apply, params, sched, cfg,
        low_all,
        use_ddim=use_ddim, eta=eta, use_dpm_solver=use_dpm_solver,
        dpm_order=dpm_order, clip_denoised=clip_denoised,
        mesh=mesh, per_device_batch=per_device_batch,
        noise=noise, noise_stream=noise_stream,
        segment_steps=segment_steps,
        progress_cb=lambda done, total: logger.log(
            f"denoised {done}/{total} patch-draws "
            f"[{time.monotonic() - t0:.1f}s]"
        ),
    )
    sample_wall_s = time.monotonic() - t0
    P = low.shape[0]
    draws = [blend_one(denoised_all[s * P:(s + 1) * P]) for s in range(S)]
    result = np.mean(draws, axis=0) if len(draws) > 1 else draws[0]
    uncertainty = np.std(draws, axis=0) if len(draws) > 1 else None
    log_stage_stats("blended", result)

    original_std = float(volume_zxy.std())
    denoised_std = float(result.std())
    stats = {
        "original_std": original_std,
        "denoised_std": denoised_std,
        "sample_wall_s": sample_wall_s,
        "noise_reduction_pct": (
            (original_std - denoised_std) / original_std * 100.0
            if original_std > 0
            else 0.0
        ),
    }
    if uncertainty is not None:
        stats["uncertainty_hwz"] = uncertainty
        stats["mean_uncertainty"] = float(uncertainty.mean())
        logger.log(
            f"uncertainty map over {num_samples} draws: "
            f"mean sigma {stats['mean_uncertainty']:.4f}"
        )
    logger.log(
        f"Full image denoising: original std {original_std:.4f}, "
        f"denoised std {denoised_std:.4f}, "
        f"noise reduction {stats['noise_reduction_pct']:.1f}% "
        f"(sampling {sample_wall_s:.1f}s wall)"
    )
    return result, stats


def save_outputs(
    out_dir: str, base_samples: str, result_hwz: np.ndarray
) -> Tuple[str, Optional[str]]:
    """Write the .npz (and .tif for TIFF inputs) outputs, process-0 only
    (reference scripts/test.py:168-179)."""
    if jax.process_index() != 0:
        return "", None
    os.makedirs(out_dir, exist_ok=True)
    base = osp.basename(base_samples)
    for ext in (".tif", ".tiff", ".npz", ".npy"):
        if base.endswith(ext):
            base = base[: -len(ext)]
            break
    npz_path = osp.join(out_dir, f"denoised_{base}.npz")
    np.savez(npz_path, result_hwz)
    logger.log(f"saving to {npz_path}")
    tif_path = None
    if base_samples.endswith((".tif", ".tiff")):
        tif_path = npz_path.replace(".npz", ".tif")
        tiff_io.imwrite(tif_path, result_hwz.transpose(2, 0, 1).astype(np.float32))
        logger.log(f"Saved denoised TIFF: {tif_path}")
    return npz_path, tif_path
