"""Import PyTorch reference checkpoints into ddpm3d_tpu param pytrees.

The reference saves ``model{step:06d}.pt`` / ``ema_{rate}_{step:06d}.pt``
state dicts of its torch UNet (train_util.py:250-276). This module maps
those names and NCDHW weight layouts onto this framework's Flax NDHWC
param tree so existing trained checkpoints can be served on TPU.

Name mapping (torch -> flax path):
  time_embed.{0,2}.*          -> time_embed_{0,2}
  label_emb.weight            -> label_emb.embedding
  input_blocks.i.j.<inner>    -> in{i}_{j}.<inner'>
  middle_block.j.<inner>      -> mid_{j}.<inner'>
  output_blocks.i.j.<inner>   -> out{i}_{j}.<inner'>
  out.0.* / out.2.*           -> head_norm / head_conv
with inner ResBlock modules (reference unet.py:182-222):
  in_layers.0 -> in_norm, in_layers.2 -> in_conv, emb_layers.1 -> emb,
  out_layers.0 -> out_norm, out_layers.3 -> out_conv,
  skip_connection -> skip
attention (unet.py:285-294): norm -> norm, qkv -> qkv, proj_out -> proj
resampling: op -> op (Downsample), conv -> conv (Upsample)

Weight layout conversion:
  ConvNd  (out, in, *k)  -> (*k, in, out)
  Linear  (out, in)      -> (in, out)
  GroupNorm weight/bias  -> scale/bias (unchanged)
  Embedding              -> embedding (unchanged)
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

_RESBLOCK_MAP = {
    ("in_layers", "0"): "in_norm",
    ("in_layers", "2"): "in_conv",
    ("emb_layers", "1"): "emb",
    ("out_layers", "0"): "out_norm",
    ("out_layers", "3"): "out_conv",
    ("skip_connection",): "skip",
}

_NORM_MODULES = {"in_norm", "out_norm", "norm", "head_norm", "sp_norm"}


def _translate_inner(rest: Tuple[str, ...]) -> Tuple[str, ...]:
    """Translate the within-stage torch module path."""
    if rest[0] in ("in_layers", "emb_layers", "out_layers"):
        mod = _RESBLOCK_MAP[(rest[0], rest[1])]
        return (mod, rest[2])
    if rest[0] == "skip_connection":
        return ("skip", rest[1])
    if rest[0] in ("norm", "qkv"):
        return (rest[0], rest[1])
    if rest[0] == "proj_out":
        return ("proj", rest[1])
    if rest[0] in ("op", "conv"):
        return (rest[0], rest[1])
    if len(rest) == 1:
        # bare conv stage (e.g. input_blocks.0.0.weight)
        return (rest[0],)
    raise KeyError(f"unrecognized torch module path: {rest}")


def torch_key_to_flax_path(key: str) -> Optional[Tuple[str, ...]]:
    """Map a torch state-dict key to a flax param path (tuple of names).

    Returns None for keys with no parameters on our side (none known).
    """
    parts = tuple(key.split("."))
    if parts[0] == "encoder":
        # Seg* dual-branch conditioner encoder (reference unet.py:1706-1725):
        # same naming scheme, nested under the 'encoder' submodule
        inner = torch_key_to_flax_path(".".join(parts[1:]))
        return ("encoder",) + inner if inner else None
    if parts[0] == "conv_down":
        # SegModelv3's per-stage 1x1 fusion convs (unet.py:1940-1952)
        return (f"fuse{parts[1]}", parts[2])
    if parts[0] == "time_embed":
        return (f"time_embed_{parts[1]}", parts[2])
    if parts[0] == "label_emb":
        return ("label_emb", "embedding")
    if parts[0] == "out":
        return {
            "0": ("head_norm", parts[2]),
            "2": ("head_conv", parts[2]),
        }[parts[1]]
    if parts[0] in ("input_blocks", "middle_block", "output_blocks"):
        if parts[0] == "middle_block":
            stage = f"mid_{parts[1]}"
            rest = parts[2:]
        else:
            prefix = "in" if parts[0] == "input_blocks" else "out"
            stage = f"{prefix}{parts[1]}_{parts[2]}"
            rest = parts[3:]
        return (stage,) + _translate_inner(rest)
    raise KeyError(f"unrecognized torch key: {key}")


def _leaf_name(flax_path: Tuple[str, ...], torch_leaf: str) -> str:
    module = flax_path[-2] if len(flax_path) >= 2 else flax_path[0]
    if module in _NORM_MODULES:
        return {"weight": "scale", "bias": "bias"}[torch_leaf]
    if torch_leaf == "weight":
        return "kernel"
    return torch_leaf


def _convert_value(flax_path: Tuple[str, ...], value: np.ndarray) -> np.ndarray:
    leaf = flax_path[-1]
    if leaf == "embedding":
        return value
    if leaf == "kernel":
        if value.ndim >= 3:  # conv: (out, in, *k) -> (*k, in, out)
            axes = tuple(range(2, value.ndim)) + (1, 0)
            return value.transpose(axes)
        if value.ndim == 2:  # linear: (out, in) -> (in, out)
            return value.T
    return value


def torch_state_dict_to_params(
    state_dict: Dict[str, "np.ndarray"],
    wrap_superres: bool = False,
) -> Dict:
    """Convert a reference torch state dict to a flax ``params`` dict.

    ``wrap_superres`` nests everything under ``unet`` to match the
    :class:`ddpm3d_tpu.models.SuperResModel` wrapper's tree.
    """
    params: Dict = {}
    for key, val in state_dict.items():
        arr = np.asarray(
            val.detach().cpu().numpy() if hasattr(val, "detach") else val,
            dtype=np.float32,
        )
        path = torch_key_to_flax_path(key)
        if path is None:
            continue
        path = path[:-1] + (_leaf_name(path, path[-1]),)
        arr = _convert_value(path, arr)
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = arr
    if wrap_superres:
        return {"unet": params}
    return params


def load_torch_checkpoint(path: str, wrap_superres: bool = True) -> Dict:
    """Load a reference ``.pt`` checkpoint file into a flax params dict."""
    import torch

    state_dict = torch.load(path, map_location="cpu")
    return torch_state_dict_to_params(state_dict, wrap_superres=wrap_superres)
