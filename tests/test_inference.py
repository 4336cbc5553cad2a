"""Tests for the whole-volume inference pipeline (grid, blending, sampling,
uncertainty maps)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm3d_tpu.diffusion import (
    DiffusionConfig, LossType, MeanType, VarType, make_schedule,
)
from ddpm3d_tpu.inference import denoise_volume, load_volume_for_denoising
from ddpm3d_tpu.models import SuperResModel
from ddpm3d_tpu.parallel import make_mesh


def _setup():
    model = SuperResModel(
        in_channels=1, model_channels=32, out_channels=2,
        num_res_blocks=1, attention_resolutions=(), channel_mult=(1, 2),
        dims=3, use_scale_shift_norm=True, resblock_updown=True,
        middle_attention=False,
    )
    sched = make_schedule(np.linspace(1e-4, 0.02, 3))
    cfg = DiffusionConfig(
        MeanType.EPSILON, VarType.LEARNED_RANGE, LossType.MSE,
        original_num_steps=3,
    )
    x0 = jnp.zeros((1, 4, 16, 16, 1))
    params = model.init(
        jax.random.key(0), x0, jnp.zeros((1,), jnp.int32), low_res=x0
    )["params"]
    return model, sched, cfg, params


def test_denoise_volume_end_to_end(rng):
    model, sched, cfg, params = _setup()
    vol = rng.normal(size=(20, 40, 40)).astype(np.float32)  # (Z,H,W)
    result, stats = denoise_volume(
        jax.random.key(0), model.apply, params, sched, cfg, vol,
        patch_size=16, num_xy_patches=3, mesh=make_mesh(),
    )
    assert result.shape == (40, 40, 20)  # (H, W, Z)
    assert np.isfinite(result).all()
    assert "noise_reduction_pct" in stats
    assert "uncertainty_hwz" not in stats


def test_denoise_volume_uncertainty(rng):
    model, sched, cfg, params = _setup()
    vol = rng.normal(size=(16, 32, 32)).astype(np.float32)
    result, stats = denoise_volume(
        jax.random.key(0), model.apply, params, sched, cfg, vol,
        patch_size=16, num_xy_patches=2, mesh=make_mesh(),
        num_samples=3,
    )
    assert result.shape == (32, 32, 16)
    unc = stats["uncertainty_hwz"]
    assert unc.shape == (32, 32, 16)
    # different draws must differ somewhere covered by patches
    assert float(unc.max()) > 0
    assert stats["mean_uncertainty"] >= 0


def test_load_volume_contract(tmp_path, rng):
    from ddpm3d_tpu.data import tiff_io

    good = rng.normal(size=(100, 200, 200)).astype(np.float32)
    p = str(tmp_path / "good.tif")
    tiff_io.imwrite(p, good)
    v = load_volume_for_denoising(p)
    assert v.shape == (100, 200, 200)

    bad = rng.normal(size=(100, 64, 64)).astype(np.float32)
    pb = str(tmp_path / "bad.tif")
    tiff_io.imwrite(pb, bad)
    with pytest.raises(AssertionError):
        load_volume_for_denoising(pb)
    # contract can be relaxed for non-scanner volumes
    v2 = load_volume_for_denoising(pb, enforce_contract=False)
    assert v2.shape == (100, 64, 64)


def test_normalize_div4_roundtrip(rng):
    """normalize_div4 scales inputs into the model and rescales outputs by
    4 (reference test_backup.py:266-267)."""
    model, sched, cfg, params = _setup()
    vol = np.abs(rng.normal(2.0, 1.0, size=(16, 32, 32))).astype(np.float32)
    r1, _ = denoise_volume(
        jax.random.key(0), model.apply, params, sched, cfg, vol,
        patch_size=16, num_xy_patches=2, mesh=make_mesh(),
        normalize_div4=True,
    )
    assert np.isfinite(r1).all()


def test_noise_stream_callable_equals_array(rng):
    """The chunk-lazy noise_stream provider produces the same output as the
    materialized array form (incl. padded-chunk handling)."""
    from ddpm3d_tpu.inference.pipeline import denoise_patches

    model, sched, cfg, params = _setup()
    T = sched.num_timesteps
    P, ps = 3, 16
    low = rng.normal(size=(P, 4, ps, ps)).astype(np.float32)
    xT = rng.normal(size=(P, 4, ps, ps)).astype(np.float32)
    stream = rng.normal(size=(P, T, 4, ps, ps)).astype(np.float32)

    out_array = denoise_patches(
        jax.random.key(0), model.apply, params, sched, cfg, low,
        mesh=make_mesh(), noise=xT, noise_stream=stream,
    )

    consumed = {"next": 0}

    def provider(lo, hi):
        assert lo == consumed["next"]
        consumed["next"] = hi
        return xT[lo:hi], stream[lo:hi]

    out_callable = denoise_patches(
        jax.random.key(0), model.apply, params, sched, cfg, low,
        mesh=make_mesh(), noise_stream=provider,
    )
    np.testing.assert_allclose(out_array, out_callable, atol=1e-5)


def test_denoise_volume_dpm_solver(rng):
    model, sched, cfg, params = _setup()
    vol = rng.normal(size=(20, 40, 40)).astype(np.float32)
    result, stats = denoise_volume(
        jax.random.key(0), model.apply, params, sched, cfg, vol,
        patch_size=16, num_xy_patches=3, mesh=make_mesh(),
        use_dpm_solver=True,
    )
    assert result.shape == (40, 40, 20)
    assert np.isfinite(result).all()


def test_retry_transient_reruns_on_internal_error():
    """_retry_transient: transient INTERNAL faults are retried (chunks are
    deterministic, so a rerun is bit-identical); other errors re-raise."""
    import jax
    from ddpm3d_tpu.inference.pipeline import _retry_transient

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise jax.errors.JaxRuntimeError("INTERNAL: TPU backend error")
        return 42

    assert _retry_transient(flaky, attempts=3, base_sleep=0.0) == 42
    assert calls["n"] == 2

    def fatal():
        raise jax.errors.JaxRuntimeError("INVALID_ARGUMENT: shape mismatch")

    import pytest

    with pytest.raises(jax.errors.JaxRuntimeError):
        _retry_transient(fatal, attempts=3, base_sleep=0.0)


def test_pipelined_chunks_match_sync(rng, monkeypatch):
    """The depth-2 dispatch/drain pipeline (DDPM3D_PIPELINE) is a pure
    scheduling change: multi-chunk outputs are bit-identical to the
    synchronous path (noise is keyed per global patch id)."""
    from ddpm3d_tpu.inference.pipeline import denoise_patches

    model, sched, cfg, params = _setup()
    P, ps = 5, 16  # 5 patches over an 8-device mesh -> 1 padded chunk;
    low = rng.normal(size=(P, 4, ps, ps)).astype(np.float32)

    def run():
        return denoise_patches(
            jax.random.key(0), model.apply, params, sched, cfg, low,
            mesh=make_mesh(), per_device_batch=1, segment_steps=2,
        )

    monkeypatch.setenv("DDPM3D_PIPELINE", "0")
    out_sync = run()
    monkeypatch.setenv("DDPM3D_PIPELINE", "1")
    out_pipe = run()
    np.testing.assert_array_equal(out_sync, out_pipe)


def test_pipelined_many_chunks(rng, monkeypatch):
    """>2 chunks exercises steady-state dispatch-ahead + final drain, with
    progress callbacks still monotonically covering every patch."""
    from jax.sharding import Mesh
    from ddpm3d_tpu.inference.pipeline import denoise_patches

    model, sched, cfg, params = _setup()
    # 1-device data mesh -> chunk=1 -> 7 chunks through the pipeline
    mesh1 = Mesh(np.array(jax.devices()[:1]), ("data",))
    P, ps = 7, 16
    low = rng.normal(size=(P, 4, ps, ps)).astype(np.float32)
    seen = []

    monkeypatch.setenv("DDPM3D_PIPELINE", "1")
    out = denoise_patches(
        jax.random.key(0), model.apply, params, sched, cfg, low,
        mesh=mesh1, progress_cb=lambda done, total: seen.append((done, total)),
    )
    assert out.shape == (P, 4, ps, ps)
    assert np.isfinite(out).all()
    assert seen[-1] == (P, P)
    assert [d for d, _ in seen] == sorted(d for d, _ in seen)

    monkeypatch.setenv("DDPM3D_PIPELINE", "0")
    out_sync = denoise_patches(
        jax.random.key(0), model.apply, params, sched, cfg, low,
        mesh=mesh1,
    )
    np.testing.assert_array_equal(out, out_sync)


def test_denoise_volume_per_time_bin_scales(rng, tmp_path, monkeypatch):
    """The serving pipeline threads per-time-bin int8 scales (scales_t)
    through the quant_scales collection on the TRACED chain step
    (pipeline._vars / ops/quant.py:quant_scales_collection): the per-bin
    values must actually reach the convs — a run with distinct per-bin
    scales must differ from the whole-chain-scale run, and both must be
    finite. Runs in sim mode (value-identical fake-quant twin)."""
    import json
    import os

    model, sched, cfg, params = _setup()
    # zero-init head conv (reference semantics) makes a random-init
    # model output identically 0, which would trivially equalize every
    # comparison below — perturb all params off their init
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jax.random.normal(
            jax.random.key(hash(str(p.shape)) % (2**31)), p.shape, p.dtype
        ),
        params,
    )
    vol = rng.normal(size=(20, 40, 40)).astype(np.float32)

    # discover real conv-site paths via the calibration collection
    monkeypatch.setenv("DDPM3D_INT8_CALIB", "1")
    x0 = jnp.zeros((1, 4, 16, 16, 1))
    _, muts = model.apply(
        {"params": params}, x0, jnp.zeros((1,), jnp.int32),
        mutable=["quant_calib"], low_res=x0,
    )
    monkeypatch.delenv("DDPM3D_INT8_CALIB")

    def flatten(tree, prefix=()):
        out = {}
        for k, v in tree.items():
            if k == "act_absmax":
                out["/".join(prefix)] = float(np.asarray(v))
            elif isinstance(v, dict):
                out.update(flatten(v, prefix + (k,)))
        return out

    sites = flatten(muts["quant_calib"])
    assert sites, "no conv sites sown"
    n_steps = sched.num_timesteps
    # realistic whole-chain scales from the sown abs-maxima; per-bin
    # tables with strong contrast at bins>0 so the gather provably
    # reaches the convs (bin 0 == the whole-chain value)
    scales = {s: max(a, 1e-3) / 127.0 for s, a in sites.items()}
    scales_t = {s: [scales[s] * (25.0 ** b) for b in range(n_steps)]
                for s in sites}
    f = tmp_path / "scales_t.json"
    f.write_text(json.dumps({
        "scales": scales, "scales_t": scales_t,
        "meta": {"time_bins": n_steps, "chain_steps": n_steps},
    }))

    def run():
        return denoise_volume(
            jax.random.key(0), model.apply, params, sched, cfg, vol,
            patch_size=16, num_xy_patches=2, mesh=make_mesh(),
        )[0]

    monkeypatch.setenv("DDPM3D_INT8", "sim")
    monkeypatch.setenv("DDPM3D_INT8_SCALES", str(f))
    out_binned = run()
    assert np.isfinite(out_binned).all()

    # same file minus scales_t -> whole-chain scales; must differ
    f2 = tmp_path / "scales_flat.json"
    f2.write_text(json.dumps({
        "scales": scales,
        "meta": {"time_bins": 0, "chain_steps": n_steps},
    }))
    monkeypatch.setenv("DDPM3D_INT8_SCALES", str(f2))
    out_flat = run()
    assert np.isfinite(out_flat).all()
    assert np.abs(out_binned - out_flat).max() > 1e-4
