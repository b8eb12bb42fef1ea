"""CT-SB: superblock streaming container.

Splits large inputs into fixed superblocks (default 32 MiB), encodes each
independently with any registered codec, and concatenates the per-superblock
containers behind a size table. This bounds device memory for arbitrarily
large streams, gives block-granular resume (SURVEY.md §5 checkpoint/resume),
and is the unit of data-parallel distribution.

Layout:
    u8  codec_id
    u8  sb_log2
    u32 n_superblocks
    n × u32 container sizes
    n containers
"""

from __future__ import annotations

from cpprcoder_tpu.codecs import get_codec, get_codec_by_id, register
from cpprcoder_tpu.core.bytesutil import ByteReader, ByteWriter, as_u8


def stream_encode(data, codec: str = "rans", sb_log2: int = 25,
                  backend=None, **opts) -> bytes:
    x = as_u8(data)
    c = get_codec(codec)
    sb = 1 << sb_log2
    blobs = []
    for i in range(0, max(len(x), 1), sb):
        blobs.append(c.encode(x[i:i + sb], backend=backend, **opts))
    w = ByteWriter().u8(c.codec_id).u8(sb_log2).u32(len(blobs))
    w.u32s([len(b) for b in blobs])
    for b in blobs:
        w.raw(b)
    return w.getvalue()


def stream_decode(blob, backend=None, **opts) -> bytes:
    r = ByteReader(blob)
    c = get_codec_by_id(r.u8())
    r.u8()
    n_sb = r.u32()
    sizes = r.u32s(n_sb)
    parts = []
    for i in range(n_sb):
        parts.append(c.decode(r.raw(int(sizes[i])).tobytes(), backend=backend))
    return b"".join(parts)


CODEC = register("stream", 10, stream_encode, stream_decode)
