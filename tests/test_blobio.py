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


def test_gs_scheme_clear_error(monkeypatch):
    """With neither etils nor google-cloud-storage importable, gs:// must
    fail with the actionable install hint, not an arbitrary error."""
    import builtins
    import sys

    real_import = builtins.__import__

    def blocked(name, *a, **kw):
        if name.startswith("etils") or name.startswith("google"):
            raise ImportError(name)
        return real_import(name, *a, **kw)

    for mod in list(sys.modules):
        if mod.startswith("etils") or mod.startswith("google.cloud"):
            monkeypatch.delitem(sys.modules, mod, raising=False)
    monkeypatch.setattr(builtins, "__import__", blocked)
    with pytest.raises(RuntimeError, match="gs:// paths need"):
        blobio.read_bytes("gs://bucket/missing")


def test_file_scheme_strips_prefix(tmp_path):
    url = f"file://{tmp_path}/sub/x.bin"
    blobio.write_bytes(url, b"abc")
    # the bytes land at the real filesystem path, not a literal 'file:' dir
    assert (tmp_path / "sub" / "x.bin").read_bytes() == b"abc"
    assert blobio.read_bytes(url) == b"abc"
    assert blobio.exists(url)
