"""Checkpoint save/resume preserving the reference's filename contracts.

The reference writes ``model{step:06d}.pt``, ``ema_{rate}_{step:06d}.pt``
and ``opt{step:06d}.pt``, and resumes by parsing the step out of the
filename (train_util.py:250-313). This module keeps those conventions with
``.msgpack`` flax-serialized pytrees, adds single-writer (process-0)
semantics, and can also ingest the reference's ``.pt`` files via
:mod:`ddpm3d_tpu.utils.torch_import`.

The msgpack format is deliberate: every state here is replicated under
single-controller data parallelism (params fp32 ~620 MB at the flagship
config), so a host-gathered byte blob is optimal; a sharded-checkpoint
layer (Orbax-style) would only pay off for model-parallel param sharding,
which this model family does not use.

All paths go through :mod:`ddpm3d_tpu.utils.blobio`, so checkpoint
directories may live on blob storage (``gs://...``, ``mem://...``) exactly
like the reference's blobfile-backed writes (train_util.py:250-276).
"""

from __future__ import annotations

import os.path as osp
import re
from typing import Any, Dict, List, Optional

import jax
import numpy as np
from flax import serialization

from . import blobio


def parse_resume_step_from_filename(filename: str) -> int:
    """path/to/modelNNNNNN.* -> NNNNNN (reference train_util.py:278-290)."""
    split = filename.split("model")
    if len(split) < 2:
        return 0
    split1 = split[-1].split(".")[0]
    try:
        return int(split1)
    except ValueError:
        return 0


def find_ema_checkpoint(
    main_checkpoint: Optional[str], step: int, rate
) -> Optional[str]:
    """(reference train_util.py:306-313)"""
    if main_checkpoint is None:
        return None
    base = blobio.dirname(main_checkpoint)
    for ext in (".msgpack", ".pt"):
        path = blobio.join(base, f"ema_{rate}_{step:06d}{ext}")
        if blobio.exists(path):
            return path
    return None


def find_opt_checkpoint(main_checkpoint: str, step: int) -> Optional[str]:
    base = blobio.dirname(main_checkpoint)
    for ext in (".msgpack", ".pt"):
        path = blobio.join(base, f"opt{step:06d}{ext}")
        if blobio.exists(path):
            return path
    return None


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_pytree(path: str, tree: Any) -> None:
    """Serialize a pytree; only process 0 writes (single-writer policy,
    reference train_util.py:253-267). ``path`` may be a blob URL."""
    if jax.process_index() != 0:
        return
    data = serialization.to_bytes(_to_host(tree))
    blobio.write_bytes(path, data)


def load_pytree(path: str, target: Any = None) -> Any:
    """Restore a pytree. ``.pt`` files go through the torch importer so
    reference checkpoints load transparently. ``path`` may be a blob URL."""
    if path.endswith(".pt"):
        from .torch_import import load_torch_checkpoint

        return load_torch_checkpoint(path)
    data = blobio.read_bytes(path)
    if target is not None:
        return serialization.from_bytes(target, data)
    # state_dict restore without a target: raw nested dict of ndarrays
    return serialization.msgpack_restore(data)


def save_train_checkpoint(
    directory: str,
    step: int,
    params: Any,
    ema_params: Dict[str, Any],
    opt_state: Any,
) -> List[str]:
    """Write model/EMA/opt files for ``step`` (reference train_util.py:250-276).

    ``ema_params`` maps rate-string -> pytree (one file per rate)."""
    written = []
    model_path = blobio.join(directory, f"model{step:06d}.msgpack")
    save_pytree(model_path, params)
    written.append(model_path)
    for rate, tree in ema_params.items():
        p = blobio.join(directory, f"ema_{rate}_{step:06d}.msgpack")
        save_pytree(p, tree)
        written.append(p)
    opt_path = blobio.join(directory, f"opt{step:06d}.msgpack")
    save_pytree(opt_path, opt_state)
    written.append(opt_path)
    return written


def latest_checkpoint(directory: str) -> Optional[str]:
    """Find the newest model checkpoint in a run directory (the auto-resume
    hook the reference leaves unimplemented, train_util.py:300-303)."""
    if not directory or not blobio.isdir(directory):
        return None
    best = None
    best_step = -1
    for name in blobio.listdir(directory):
        m = re.fullmatch(r"model(\d+)\.(msgpack|pt)", name)
        if m and int(m.group(1)) > best_step:
            best_step = int(m.group(1))
            best = blobio.join(directory, name)
    return best
