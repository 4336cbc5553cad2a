"""Integration tests for the host TrainLoop: run_loop, checkpoint save,
resume-from-checkpoint (the DIFFUSION_TRAINING_TEST-style smoke,
reference train_util.py:182-184)."""

import itertools
import os

import jax
import numpy as np
import pytest

from ddpm3d_tpu.models import SuperResModel
from ddpm3d_tpu.diffusion import make_schedule
from ddpm3d_tpu.models.factory import create_gaussian_diffusion
from ddpm3d_tpu.training import TrainLoop
from ddpm3d_tpu.utils import checkpoint as ckpt
from ddpm3d_tpu.utils import logger


def _data_gen(rng, batch=2, shape=(8, 16, 16)):
    while True:
        high = rng.normal(size=(batch, *shape, 1)).astype(np.float32) * 0.2
        low = high + rng.normal(size=high.shape).astype(np.float32) * 0.05
        yield high, {"low_res": low}


def _model():
    return SuperResModel(
        in_channels=1, model_channels=32, out_channels=2, num_res_blocks=1,
        attention_resolutions=(), channel_mult=(1, 2), dims=3,
        use_scale_shift_norm=True, resblock_updown=True,
        middle_attention=False,
    )


def _loop(tmp_path, rng, resume="", steps=3, sampler="uniform"):
    sched, cfg = create_gaussian_diffusion(
        steps=16, learn_sigma=True, noise_schedule="cosine"
    )
    logger.configure(str(tmp_path), format_strs=["log"])
    return TrainLoop(
        model=_model(),
        sched=sched,
        cfg=cfg,
        data=_data_gen(rng),
        batch_size=2,
        microbatch=-1,
        lr=1e-3,
        ema_rate="0.999,0.9999",
        log_interval=1,
        save_interval=2,
        resume_checkpoint=resume,
        schedule_sampler=sampler,
        lr_anneal_steps=steps,
    )


def test_run_loop_trains_and_saves(tmp_path, rng):
    loop = _loop(tmp_path, rng, steps=3)
    loop.run_loop()
    files = sorted(os.listdir(tmp_path))
    # save at step 0, step 2 (interval), each with model + 2 EMA + opt
    assert "model000000.msgpack" in files
    assert "model000002.msgpack" in files
    assert "ema_0.999_000002.msgpack" in files
    assert "ema_0.9999_000002.msgpack" in files
    assert "opt000002.msgpack" in files
    assert int(loop.state.step) == 3


def test_resume_from_checkpoint(tmp_path, rng):
    loop = _loop(tmp_path / "a", rng, steps=3)
    loop.run_loop()
    ref_leaf = np.asarray(
        jax.tree_util.tree_leaves(jax.device_get(loop.state.params))[0]
    )

    resume = str(tmp_path / "a" / "model000002.msgpack")
    assert ckpt.parse_resume_step_from_filename(resume) == 2
    # resume with the SAME schedule config (a different lr_anneal_steps
    # regime would change the optax state structure, as in the reference
    # where the optimizer must be constructed identically to load opt*.pt)
    loop2 = _loop(tmp_path / "b", rng, resume=resume, steps=3)
    assert loop2.resume_step == 2
    # EMA and optimizer found next to the model file
    assert ckpt.find_ema_checkpoint(resume, 2, "0.999")
    assert ckpt.find_opt_checkpoint(resume, 2)
    got = np.asarray(
        jax.tree_util.tree_leaves(jax.device_get(loop2.state.params))[0]
    )
    # loaded params equal the step-2 snapshot, not the step-3 final state
    saved = ckpt.load_pytree(resume)
    saved_leaf = np.asarray(jax.tree_util.tree_leaves(saved)[0])
    np.testing.assert_array_equal(got, saved_leaf)


def test_training_test_env_stops_after_first_save(tmp_path, rng, monkeypatch):
    monkeypatch.setenv("DIFFUSION_TRAINING_TEST", "1")
    loop = _loop(tmp_path, rng, steps=50)
    loop.run_loop()
    # stops at the first post-zero save interval rather than running 50 steps
    assert loop.step <= 4


def test_auto_resume_picks_latest(tmp_path, rng):
    """auto_resume finds the newest model checkpoint in the log dir — the
    preemption-recovery path."""
    loop = _loop(tmp_path, rng, steps=3)
    loop.run_loop()
    sched, cfg = create_gaussian_diffusion(
        steps=16, learn_sigma=True, noise_schedule="cosine"
    )
    logger.configure(str(tmp_path), format_strs=["log"])
    loop2 = TrainLoop(
        model=_model(), sched=sched, cfg=cfg, data=_data_gen(rng),
        batch_size=2, microbatch=-1, lr=1e-3, ema_rate="0.999,0.9999",
        log_interval=1, save_interval=2, resume_checkpoint="",
        schedule_sampler="uniform", lr_anneal_steps=3, auto_resume=True,
    )
    assert loop2.resume_step == 2


def test_loss_aware_sampler_in_loop(tmp_path, rng):
    loop = _loop(tmp_path, rng, steps=2, sampler="loss-second-moment")
    loop.run_loop()
    assert int(loop.state.sampler_state.loss_counts.sum()) == 2 * 2
