"""CT-RC1 static range coder codec (reference parity: RangeEncoder,
cpprcoder.h:321-619)."""

from __future__ import annotations

from cpprcoder_tpu.codecs import register
from cpprcoder_tpu.codecs.base import pick_backend
from cpprcoder_tpu.reference import rc_ref


def encode(data, backend: str | None = None, lanes: int | None = None) -> bytes:
    from cpprcoder_tpu.ops import range_ops
    fn = pick_backend(backend, range_ops.static_encode_jax, rc_ref.static_encode)
    return fn(data, lanes=lanes)


def decode(blob, backend: str | None = None) -> bytes:
    from cpprcoder_tpu.ops import range_ops
    fn = pick_backend(backend, range_ops.static_decode_jax, rc_ref.static_decode)
    return fn(blob)


CODEC = register("static_range", 0, encode, decode)
