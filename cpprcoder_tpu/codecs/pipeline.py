"""CT-PIPE: first-class codec composition.

The reference composes transforms only in its harness (blocksort→zlib at
test/main.cpp:968-987, ASE→zlib/lz4 at 611-787); here pipelines are codecs
themselves, e.g. Pipeline(["blocksort", "mtf1", "adaptive_range"]) for the
BASELINE Config 4 path.
"""

from __future__ import annotations

from cpprcoder_tpu.codecs import get_codec, get_codec_by_id, register
from cpprcoder_tpu.core.bytesutil import ByteReader, ByteWriter


def pipeline_encode(data, stages: list | None = None, backend=None,
                    **opts) -> bytes:
    """Each stage is a codec name or a (name, encode_opts_dict) pair —
    encode-side options only; every CT container is self-describing, so
    decode needs just the codec ids."""
    stages = stages or [("blocksort", {"block_log2": 19}), "mtf1", "rle0",
                        "adaptive_range"]
    buf = data
    ids = []
    for stage in stages:
        name, stage_opts = stage if isinstance(stage, tuple) else (stage, {})
        codec = get_codec(name)
        buf = codec.encode(buf, backend=backend, **stage_opts)
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
