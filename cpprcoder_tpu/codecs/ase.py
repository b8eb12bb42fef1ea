"""CT-ASE1 adaptive symbol encoder codec (reference parity: ASE,
cppase.h:71-324 — 64-entry recency list, 9-bit literals, LSB-first bits)."""

from __future__ import annotations

from cpprcoder_tpu.codecs import register
from cpprcoder_tpu.codecs.base import pick_backend
from cpprcoder_tpu.reference import ase_ref


def encode(data, backend: str | None = None, lanes: int | None = None) -> bytes:
    from cpprcoder_tpu.ops import ase_ops
    fn = pick_backend(backend, ase_ops.ase_encode_jax, ase_ref.ase_encode)
    return fn(data, lanes=lanes)


def decode(blob, backend: str | None = None) -> bytes:
    from cpprcoder_tpu.ops import ase_ops
    fn = pick_backend(backend, ase_ops.ase_decode_jax, ase_ref.ase_decode)
    return fn(blob)


CODEC = register("ase", 7, encode, decode)
