"""Persistent XLA compilation cache setup.

TPU compiles in this deployment go through a remote compile service at
~20 s-20 min per program; the persistent cache cuts warm starts to
seconds (measured 18.3 s -> 1.8 s on a toy program). Call once before
building any jitted function. Safe to call multiple times.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_compilation_cache(cache_dir: str = DEFAULT_CACHE_DIR) -> None:
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
