"""Persistent XLA compilation cache.

The axon/TPU remote compile of the counting graph costs ~2 minutes; the
persistent cache makes every later process pay ~0 (measured: 143s ->
0.05s steady-state).  Called by the CLI, bench, and graft entry points.
"""

from __future__ import annotations

import os
from pathlib import Path

_DEFAULT = os.path.expanduser("~/.cache/shannon_tpu/jax")


def enable_compilation_cache(path: str | None = None) -> str:
    import jax

    cache_dir = path or os.environ.get("SHANNON_TPU_JAX_CACHE", _DEFAULT)
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
