"""Utilities: logging, checkpointing, config/CLI, torch import, caches."""

from . import checkpoint, config, logger
from .cache import enable_compilation_cache
from .torch_import import (
    load_torch_checkpoint,
    torch_key_to_flax_path,
    torch_state_dict_to_params,
)
