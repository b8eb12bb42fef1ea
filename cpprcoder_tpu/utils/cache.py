"""Persistent XLA compilation cache setup (compile once per shape, ever).

CPU runs get a HOST-KEYED subdirectory: XLA:CPU cache entries are AOT
machine code specialized to the compiling host's CPU features, and loading
an entry produced on a different machine type can SIGILL/segfault (the
loader only warns — observed as intermittent test-suite crashes when this
repo's cache directory travels between machines). TPU (axon) entries are
device code and stay in the shared directory."""

from __future__ import annotations

import hashlib
import os
import platform

_DONE = False


def _host_tag() -> str:
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    h = hashlib.sha1((platform.machine() + feats).encode()).hexdigest()[:10]
    return f"cpu-{h}"


def enable_compilation_cache(path: str | None = None):
    global _DONE
    if _DONE:
        return
    _DONE = True
    import jax

    path = path or os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")
    if "cpu" in (jax.config.jax_platforms or ""):
        path = os.path.join(path, _host_tag())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(path))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
