"""CT-RLE0 zero-run-length codec stage (bzip2-style ZRLE; no reference
equivalent — its BWT pipeline feeds zlib/zstd raw, test/main.cpp:968-987).
Intended between mtf1 and an entropy coder in Config-4 pipelines."""

from __future__ import annotations

from cpprcoder_tpu.codecs import register
from cpprcoder_tpu.codecs.base import pick_backend
from cpprcoder_tpu.reference import rle0_ref


def encode(data, backend: str | None = None) -> bytes:
    from cpprcoder_tpu.ops import rle0_ops
    fn = pick_backend(backend, rle0_ops.rle0_encode_jax, rle0_ref.rle0_encode)
    return fn(data)


def decode(blob, backend: str | None = None) -> bytes:
    from cpprcoder_tpu.ops import rle0_ops
    fn = pick_backend(backend, rle0_ops.rle0_decode_jax, rle0_ref.rle0_decode)
    return fn(blob)


CODEC = register("rle0", 12, encode, decode)
