"""Persistent XLA compilation cache setup (compile once per shape, ever)."""

from __future__ import annotations

import os

_DONE = False


def enable_compilation_cache(path: str | None = None):
    global _DONE
    if _DONE:
        return
    _DONE = True
    import jax

    path = path or os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(path))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
