"""JAX persistent compilation cache setup.

Flagship-model compiles go through a remote compile service on this TPU
topology and cost minutes; the local persistent cache keyed on HLO makes
them one-time. Called by bench.py and the CLI scripts.
"""

import os

_DEFAULT = os.path.expanduser("~/.cache/ddpm3d_tpu_jax")


def enable_compilation_cache(path: str = _DEFAULT) -> None:
    import jax

    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
