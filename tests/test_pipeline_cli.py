"""scripts/test.py CLI plumbing tests.

The multi-volume serving mode (``--base_samples a.tif,b.tif``) must be
bit-identical to per-volume invocations: the denoise loop re-derives each
volume's PRNG key from ``--seed`` exactly as a fresh process would, and
the real compute below it keys noise by global patch id
(inference/pipeline.py), so the only thing to pin here is the CLI
plumbing itself — per-volume key freshness, output naming, and the
parseable per-volume wall-time lines tools/volume_quality.py reads back.
``denoise_volume`` is stubbed (the full 200x200x[90..130] contract volume
through a real chain is an on-chip workload); the stub records the keys
the CLI passes and returns a deterministic function of the input volume.
"""

import importlib.util
import os
import os.path as osp
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.abspath(osp.join(osp.dirname(__file__), "..")))

from ddpm3d_tpu.data import tiff_io  # noqa: E402


def _load_cli():
    spec = importlib.util.spec_from_file_location(
        "ddpm3d_scripts_test_mv",
        osp.join(osp.dirname(__file__), "..", "scripts", "test.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture
def two_volumes(tmp_path):
    rng = np.random.default_rng(7)
    paths = []
    for i in range(2):
        v = rng.normal(1.0, 0.3, (90, 200, 200)).astype(np.float32)
        p = tmp_path / f"vol_{i}.tif"
        tiff_io.imwrite(str(p), v)
        paths.append(str(p))
    return paths


def _run(monkeypatch, argv, captured):
    import jax

    import ddpm3d_tpu.inference as inf

    def fake_denoise_volume(key, model_apply, params, sched, cfg, vol, **kw):
        captured.append(np.asarray(jax.random.key_data(key)).tolist())
        # deterministic function of the input so outputs are comparable
        result_hwz = (vol * 2.0 + 1.0).transpose(1, 2, 0)
        return result_hwz, {"sample_wall_s": 1.5}

    monkeypatch.setattr(inf, "denoise_volume", fake_denoise_volume)
    mod = _load_cli()
    monkeypatch.setattr(sys, "argv", ["test.py"] + argv)
    mod.main()


def _common(save_dir):
    return [
        "--save_dir", save_dir,
        "--large_size", "96", "--num_channels", "32",
        "--num_res_blocks", "1", "--learn_sigma", "True",
        "--diffusion_steps", "1000", "--timestep_respacing", "2",
        "--platform", "cpu", "--seed", "10",
    ]


def test_multi_volume_matches_per_volume(tmp_path, monkeypatch, two_volumes):
    a, b = two_volumes

    keys_single = []
    for i, p in enumerate(two_volumes):
        _run(monkeypatch,
             ["--base_samples", p] + _common(str(tmp_path / f"s{i}")),
             keys_single)

    keys_multi = []
    _run(monkeypatch,
         ["--base_samples", f"{a},{b}"] + _common(str(tmp_path / "m")),
         keys_multi)

    # fresh per-volume keys: multi-volume keys equal the per-process ones
    assert keys_multi == keys_single

    # outputs land flat in save_dir under the per-volume stem names and
    # equal the per-volume invocations' outputs exactly
    for i, p in enumerate(two_volumes):
        stem = osp.splitext(osp.basename(p))[0]
        single = tiff_io.imread(
            str(tmp_path / f"s{i}" / f"denoised_{stem}.tif"))
        multi = tiff_io.imread(str(tmp_path / "m" / f"denoised_{stem}.tif"))
        np.testing.assert_array_equal(single, multi)

    # the per-volume wall lines volume_quality.py parses
    log = (tmp_path / "m" / "log.txt").read_text()
    assert "multi-volume [1/2] vol_0.tif: sampling 1.5s wall" in log
    assert "multi-volume [2/2] vol_1.tif: sampling 1.5s wall" in log


def test_single_volume_no_multi_lines(tmp_path, monkeypatch, two_volumes):
    keys = []
    _run(monkeypatch,
         ["--base_samples", two_volumes[0]] + _common(str(tmp_path / "one")),
         keys)
    log = (tmp_path / "one" / "log.txt").read_text()
    assert "multi-volume" not in log
    assert (tmp_path / "one" / "denoised_vol_0.tif").exists()
