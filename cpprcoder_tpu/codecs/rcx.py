"""CT-RCX context-conditioned quantized adaptive range coder codec.

The ratio+throughput flagship: CT-RCQ's division-free quantized window
model (models/qmodel.py) conditioned on an order-1 context — the top
`cbits` bits of each lane's previous byte (models/cxmodel.py), with a
CHUNKED lane layout so the context is the true preceding byte. This is a
capability the reference does not have (its AdaptiveFrequencyTable is
order-0, cpprcoder.h:256-298); CT-RCX beats the reference adaptive coder's
ratio on every Canterbury file (bench/rcx_sim.py sweep, BENCH_DETAILS).
Format: reference/rcx_ref.py. Backends: "jax" (XLA scan), "pallas" (TPU
kernel), "ref" (host oracle); all produce byte-identical containers.
"""

from __future__ import annotations

from cpprcoder_tpu.codecs import register
from cpprcoder_tpu.codecs.base import pick_backend
from cpprcoder_tpu.reference import rcx_ref


def encode(data, backend: str | None = None, lanes: int | None = None,
           inc: int | None = None, climit_log2: int | None = None,
           cbits: int | None = None, mode: str = "balanced",
           wlog: int | None = None) -> bytes:
    if mode != "balanced" and lanes is None and cbits is None:
        from cpprcoder_tpu.models.cxmodel import rcx_params

        lanes, _, _, cbits = rcx_params(len(data), mode=mode)
        if wlog is None:
            wlog = 0          # ratio preset: per-step requant (best ratio)
    if backend == "pallas":
        from cpprcoder_tpu.ops import rcx_pallas

        return rcx_pallas.rcx_encode_pallas(
            data, lanes=lanes, inc=inc, climit_log2=climit_log2,
            cbits=cbits, wlog=wlog)
    from cpprcoder_tpu.ops import rcx_ops

    fn = pick_backend(backend, rcx_ops.rcx_encode_jax, rcx_ref.rcx_encode)
    return fn(data, lanes=lanes, inc=inc, climit_log2=climit_log2,
              cbits=cbits, wlog=wlog)


def decode(blob, backend: str | None = None) -> bytes:
    if backend == "pallas":
        from cpprcoder_tpu.ops import rcx_pallas

        return rcx_pallas.rcx_decode_pallas(blob)
    from cpprcoder_tpu.ops import rcx_ops

    fn = pick_backend(backend, rcx_ops.rcx_decode_jax, rcx_ref.rcx_decode)
    return fn(blob)


CODEC = register("rcx", 15, encode, decode)
