"""CT-MTF1 move-to-front codecs: plain MTF and the reference's MTF-1
variant (blksort.h:663-793)."""

from __future__ import annotations

from cpprcoder_tpu.codecs import register
from cpprcoder_tpu.codecs.base import pick_backend
from cpprcoder_tpu.reference import mtf_ref


def _encode(mtf1):
    def encode(data, backend: str | None = None) -> bytes:
        from cpprcoder_tpu.ops import mtf_ops
        fn = pick_backend(backend, mtf_ops.mtf_encode_jax, mtf_ref.mtf_encode)
        return fn(data, mtf1)
    return encode


def decode(blob, backend: str | None = None) -> bytes:
    from cpprcoder_tpu.ops import mtf_ops
    fn = pick_backend(backend, mtf_ops.mtf_decode_jax, mtf_ref.mtf_decode)
    return fn(blob)


CODEC = register("mtf", 5, _encode(False), decode)
CODEC1 = register("mtf1", 8, _encode(True), decode)
