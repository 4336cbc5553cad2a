"""Pluggable blob-storage checkpoint IO (reference blobfile usage,
train_util.py:250-276)."""

import numpy as np
import pytest

from ddpm3d_tpu.utils import blobio
from ddpm3d_tpu.utils import checkpoint as ckpt


def test_mem_scheme_roundtrip():
    blobio.write_bytes("mem://bucket/a/b.bin", b"hello")
    assert blobio.exists("mem://bucket/a/b.bin")
    assert blobio.read_bytes("mem://bucket/a/b.bin") == b"hello"
    assert "b.bin" in blobio.listdir("mem://bucket/a")


def test_local_scheme_atomic_write(tmp_path):
    p = str(tmp_path / "x" / "y.bin")
    blobio.write_bytes(p, b"data")
    assert blobio.read_bytes(p) == b"data"
    assert not blobio.exists(p + ".tmp")


def test_unknown_scheme_rejected():
    with pytest.raises(ValueError):
        blobio.read_bytes("s3+missing://x/y")


def test_checkpoint_on_mem_store():
    """The full checkpoint contract (save/find/latest/resume-step parsing)
    works against blob URLs, like the reference's blobfile paths."""
    tree = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    ema = {"0.9999": {"w": np.ones((2, 3), np.float32)}}
    opt = {"mu": np.zeros((2, 3), np.float32)}
    d = "mem://ckpts/run1"
    written = ckpt.save_train_checkpoint(d, 42, tree, ema, opt)
    assert written[0] == "mem://ckpts/run1/model000042.msgpack"
    latest = ckpt.latest_checkpoint(d)
    assert latest == written[0]
    assert ckpt.parse_resume_step_from_filename(latest) == 42
    loaded = ckpt.load_pytree(latest, target={"w": np.zeros((2, 3), np.float32)})
    np.testing.assert_array_equal(loaded["w"], tree["w"])
    assert ckpt.find_ema_checkpoint(latest, 42, "0.9999") == (
        "mem://ckpts/run1/ema_0.9999_000042.msgpack"
    )
    assert ckpt.find_opt_checkpoint(latest, 42) == (
        "mem://ckpts/run1/opt000042.msgpack"
    )


def test_gs_scheme_clear_error():
    with pytest.raises((RuntimeError, Exception)):
        blobio.read_bytes("gs://bucket/missing")
