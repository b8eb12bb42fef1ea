"""CT-PIPE: first-class codec composition.

The reference composes transforms only in its harness (blocksort→zlib at
test/main.cpp:968-987, ASE→zlib/lz4 at 611-787); here pipelines are codecs
themselves, e.g. Pipeline(["blocksort", "mtf1", "adaptive_range"]) for the
BASELINE Config 4 path.
"""

from __future__ import annotations

from cpprcoder_tpu.codecs import get_codec, get_codec_by_id, register
from cpprcoder_tpu.core.bytesutil import ByteReader, ByteWriter


def pipeline_encode(data, stages: list[str] | None = None, backend=None,
                    **opts) -> bytes:
    stages = stages or ["blocksort", "mtf1", "adaptive_range"]
    buf = data
    ids = []
    for name in stages:
        codec = get_codec(name)
        buf = codec.encode(buf, backend=backend)
        ids.append(codec.codec_id)
    w = ByteWriter().u8(len(ids))
    for i in ids:
        w.u8(i)
    w.raw(buf if isinstance(buf, bytes) else bytes(buf))
    return w.getvalue()


def pipeline_decode(blob, backend=None, **opts) -> bytes:
    r = ByteReader(blob)
    n_stages = r.u8()
    ids = [r.u8() for _ in range(n_stages)]
    buf = bytes(r.rest().tobytes())
    for cid in reversed(ids):
        buf = get_codec_by_id(cid).decode(buf, backend=backend)
    return buf


CODEC = register("pipeline", 9, pipeline_encode, pipeline_decode)


def make_pipeline(stages: list[str]):
    """Convenience: a named pipeline codec closure."""
    def encode(data, backend=None, **opts):
        return pipeline_encode(data, stages=stages, backend=backend)
    return encode, pipeline_decode
