"""Export ddpm3d_tpu param pytrees as PyTorch reference checkpoints.

The exact inverse of :mod:`ddpm3d_tpu.utils.torch_import`: a Flax NDHWC
param tree becomes a ``model{step:06d}.pt``-style state dict the
reference's torch models load directly (reference train_util.py:250-276
naming, unet.py module layout). Together the pair gives two-way
migration — train here, serve there, or vice versa.

Name mapping (flax path -> torch key) and weight layout conversion are
the importer's tables inverted:
  time_embed_{0,2}        -> time_embed.{0,2}
  label_emb.embedding     -> label_emb.weight
  in{i}_{j}.<inner'>      -> input_blocks.i.j.<inner>
  mid_{j}.<inner'>        -> middle_block.j.<inner>
  out{i}_{j}.<inner'>     -> output_blocks.i.j.<inner>
  head_norm / head_conv   -> out.0 / out.2
  fuse{i}                 -> conv_down.i         (SegModelv3 fusions)
  encoder.<path>          -> encoder.<path>      (Seg dual-branch)
  ConvNd (*k, in, out) -> (out, in, *k);  Linear (in, out) -> (out, in);
  GroupNorm scale/bias -> weight/bias;  Embedding -> weight.

Coverage matches the importer: the UNet/SuperRes/Encoder/Seg families
whose parameters exist in the reference's naming scheme. Params from
beyond-reference modules raise ``KeyError`` rather than exporting a
checkpoint the reference cannot load.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

from .torch_import import _NORM_MODULES

# inverse of torch_import._RESBLOCK_MAP plus the attention/resample inners
_INNER_INV = {
    "in_norm": ("in_layers", "0"),
    "in_conv": ("in_layers", "2"),
    "emb": ("emb_layers", "1"),
    "out_norm": ("out_layers", "0"),
    "out_conv": ("out_layers", "3"),
    "skip": ("skip_connection",),
    "norm": ("norm",),
    "qkv": ("qkv",),
    "proj": ("proj_out",),
    "op": ("op",),
    "conv": ("conv",),
}

_IN_RE = re.compile(r"^in(\d+)_(\d+)$")
_OUT_RE = re.compile(r"^out(\d+)_(\d+)$")
_MID_RE = re.compile(r"^mid_(\d+)$")
_TE_RE = re.compile(r"^time_embed_(\d+)$")
_FUSE_RE = re.compile(r"^fuse(\d+)$")


def _leaf_to_torch(module: str, leaf: str) -> str:
    if module in _NORM_MODULES:
        return {"scale": "weight", "bias": "bias"}[leaf]
    if leaf == "embedding":
        return "weight"
    if leaf == "kernel":
        return "weight"
    return leaf


def _value_to_torch(leaf: str, value: np.ndarray) -> np.ndarray:
    if leaf == "kernel":
        if value.ndim >= 3:  # conv: (*k, in, out) -> (out, in, *k)
            axes = (value.ndim - 1, value.ndim - 2) + tuple(
                range(value.ndim - 2)
            )
            return value.transpose(axes)
        if value.ndim == 2:  # linear: (in, out) -> (out, in)
            return value.T
    return value


def flax_path_to_torch_key(path: Tuple[str, ...]) -> str:
    """Map a flax param path (tuple of names ending in the leaf) to the
    reference torch state-dict key. Inverse of
    :func:`torch_import.torch_key_to_flax_path`."""
    if path[0] == "encoder":
        return "encoder." + flax_path_to_torch_key(path[1:])
    head, leaf = path[0], path[-1]
    m = _FUSE_RE.match(head)
    if m:
        return f"conv_down.{m.group(1)}.{_leaf_to_torch(head, leaf)}"
    m = _TE_RE.match(head)
    if m:
        return f"time_embed.{m.group(1)}.{_leaf_to_torch(head, leaf)}"
    if head == "label_emb":
        return "label_emb.weight"
    if head == "head_norm":
        return f"out.0.{_leaf_to_torch(head, leaf)}"
    if head == "head_conv":
        return f"out.2.{_leaf_to_torch(head, leaf)}"
    for regex, torch_name in (
        (_IN_RE, "input_blocks"),
        (_OUT_RE, "output_blocks"),
        (_MID_RE, "middle_block"),
    ):
        m = regex.match(head)
        if not m:
            continue
        stage = (
            f"{torch_name}.{m.group(1)}"
            if torch_name == "middle_block"
            else f"{torch_name}.{m.group(1)}.{m.group(2)}"
        )
        if len(path) == 2:  # bare conv stage (e.g. input_blocks.0.0)
            return f"{stage}.{_leaf_to_torch(head, leaf)}"
        inner = path[1]
        if inner not in _INNER_INV:
            raise KeyError(
                f"no reference-side module for flax path {path} "
                f"(beyond-reference parameter?)"
            )
        mod = ".".join(_INNER_INV[inner])
        return f"{stage}.{mod}.{_leaf_to_torch(inner, leaf)}"
    raise KeyError(f"unrecognized flax param path: {path}")


def params_to_torch_state_dict(
    params: Dict, unwrap_superres: bool = True
) -> Dict[str, np.ndarray]:
    """Convert a flax ``params`` dict to a reference torch state dict
    (numpy arrays; pass through ``torch.from_numpy`` / ``torch.save`` to
    produce a loadable ``.pt``)."""
    tree = params.get("params", params)
    if unwrap_superres and set(tree.keys()) == {"unet"}:
        tree = tree["unet"]

    out: Dict[str, np.ndarray] = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
            return
        key = flax_path_to_torch_key(path)
        assert key not in out, f"duplicate torch key {key} from {path}"
        out[key] = _value_to_torch(path[-1], np.asarray(node, np.float32))

    walk(tree, ())
    return out


def save_torch_checkpoint(
    params: Dict, path: str, unwrap_superres: bool = True
) -> None:
    """Write ``params`` as a reference-loadable ``.pt`` state dict."""
    import torch

    sd = {
        k: torch.from_numpy(np.array(v, copy=True))
        for k, v in params_to_torch_state_dict(
            params, unwrap_superres=unwrap_superres
        ).items()
    }
    torch.save(sd, path)
