"""CT-ANS2 adaptive interleaved rANS codec (beyond reference — cppans.h has
only a static-table rANS; this adds CT-RC2-style adaptation with a
deferred-summation model, division-free decode, and no frequency header)."""

from __future__ import annotations

from cpprcoder_tpu.codecs import register
from cpprcoder_tpu.codecs.base import pick_backend
from cpprcoder_tpu.reference import ans2_ref


def encode(data, backend: str | None = None, lanes: int | None = None,
           inc: int | None = None, limit_log2: int | None = None,
           refresh_log2: int | None = None) -> bytes:
    from cpprcoder_tpu.ops import ans2_ops
    fn = pick_backend(backend, ans2_ops.ans2_encode_jax, ans2_ref.ans2_encode)
    kw = dict(lanes=lanes, refresh_log2=refresh_log2)
    if inc is not None:
        kw["inc"] = inc
    if limit_log2 is not None:
        kw["limit_log2"] = limit_log2
    return fn(data, **kw)


def decode(blob, backend: str | None = None) -> bytes:
    from cpprcoder_tpu.ops import ans2_ops
    fn = pick_backend(backend, ans2_ops.ans2_decode_jax, ans2_ref.ans2_decode)
    return fn(blob)


CODEC = register("adaptive_rans", 13, encode, decode)
