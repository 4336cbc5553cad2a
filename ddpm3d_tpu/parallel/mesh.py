"""Device mesh construction and sharding helpers.

TPU-native replacement for the reference's distributed layer
(dist_util.py): ``jax.distributed.initialize`` supersedes the MPI
bootstrap + rank->GPU pinning (dist_util.py:22-47); XLA collectives over a
``jax.sharding.Mesh`` supersede NCCL; single-controller array semantics
supersede the chunked MPI checkpoint broadcast (dist_util.py:58-78) and
``sync_params`` (dist_util.py:81-87) — a replicated array IS synchronized.

Mesh axes:
- ``data``: patch/batch data parallelism (the reference's only strategy)
- ``spatial``: optional sharding of the H axis of one volume across chips,
  with XLA SPMD inserting the conv halo exchanges — capability beyond the
  reference (SURVEY.md §5.7).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def maybe_initialize_distributed() -> None:
    """Multi-host bootstrap: coordinator/process env comes from the launcher
    (the analog of the reference's MPI rank/hostname exchange,
    dist_util.py:22-47). No-op single-host."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS") and jax.process_count() == 1:
        jax.distributed.initialize()


def make_mesh(
    n_data: Optional[int] = None,
    n_spatial: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, spatial) mesh over the available devices.

    Axis order puts ``data`` outermost so data-parallel collectives ride the
    slowest links (DCN between slices) while spatial halo exchange stays on
    ICI — the standard mesh-ordering recipe.
    """
    devices = list(devices if devices is not None else jax.devices())
    total = len(devices)
    if n_data is None:
        assert total % n_spatial == 0, (total, n_spatial)
        n_data = total // n_spatial
    assert n_data * n_spatial <= total
    arr = np.array(devices[: n_data * n_spatial]).reshape(n_data, n_spatial)
    return Mesh(arr, (DATA_AXIS, SPATIAL_AXIS))


def data_sharding(mesh: Mesh, *, spatial_dim: Optional[int] = None) -> NamedSharding:
    """Shard batch dim over ``data`` (and optionally one spatial dim over
    ``spatial``); everything else replicated."""
    if spatial_dim is None:
        return NamedSharding(mesh, P(DATA_AXIS))
    spec = [DATA_AXIS] + [None] * 4
    spec[spatial_dim] = SPATIAL_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, spatial_dim: Optional[int] = None):
    """Device-put a host batch with the batch dim split over ``data``."""
    sh = data_sharding(mesh, spatial_dim=spatial_dim)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(n: int, k: int) -> int:
    """Smallest multiple of k >= n. Used to pad patch batches so gathers are
    never ragged (designing away the reference's per-patch all_gather
    deadlock hazard, scripts/test.py:74-78 + SURVEY.md §2)."""
    return ((n + k - 1) // k) * k
