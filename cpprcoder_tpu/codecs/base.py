"""Shared codec-module helpers: backend selection.

Each codec has two interchangeable backends producing identical containers:
  - "jax": the TPU path (ops/*, jit/Pallas)
  - "ref": the host oracle (reference/*)
"""

from __future__ import annotations


def pick_backend(backend: str | None, jax_fn, ref_fn):
    if backend in (None, "jax"):
        return jax_fn if jax_fn is not None else ref_fn
    if backend == "ref":
        return ref_fn
    raise ValueError(f"unknown backend {backend!r}")
