"""Oracle (host, exact) implementation of CT-ANS1 (FORMATS.md).

K-lane interleaved rANS with one shared u16-word stream — the reference's
8-state SIMD interleave (cppans.h:567-649) generalized to K lanes. ProbBits
= 14 (cppans.h:27), state lower bound 2^16, u16-word renormalization with at
most one word per symbol in either direction. Encoding walks the input
backwards (cppans.h:497-530); the emitted words, reversed, are exactly the
decoder's forward read order.
"""

from __future__ import annotations

import numpy as np

from cpprcoder_tpu.config import ANS_LOW, ANS_PROB_BITS, ANS_TOTAL, pick_lanes
from cpprcoder_tpu.core.bytesutil import ByteReader, ByteWriter, as_u8
from cpprcoder_tpu.models.freq_header import pack_freqs, read_freqs
from cpprcoder_tpu.models.static_table import exclusive_cumsum, normalize_freqs

MASK = ANS_TOTAL - 1


def _lane_desc(k: int) -> int:
    return k.bit_length() - 1


def rans_encode(data, lanes: int | None = None) -> bytes:
    x = as_u8(data)
    n = len(x)
    k = lanes or pick_lanes(n)
    w = ByteWriter().u32(n)
    if n == 0:
        return w.u8(_lane_desc(k)).getvalue()
    counts = np.bincount(x, minlength=256)
    freqs = normalize_freqs(counts, ANS_PROB_BITS)
    cums = exclusive_cumsum(freqs)
    states = [ANS_LOW] * k
    emitted: list[int] = []
    for i in range(n - 1, -1, -1):
        j = i % k
        s = int(x[i])
        f = int(freqs[s])
        c = int(cums[s])
        st = states[j]
        if st >= (f << 18):          # renorm: emit low 16 bits
            emitted.append(st & 0xFFFF)
            st >>= 16
        states[j] = ((st // f) << ANS_PROB_BITS) | ((st % f) + c)
    words = emitted[::-1]            # decoder read order
    w.u8(_lane_desc(k)).raw(pack_freqs(freqs))
    w.u32s(states)
    w.u32(len(words))
    w.u16s(words)
    return w.getvalue()


def rans_decode(blob) -> bytes:
    r = ByteReader(blob)
    n = r.u32()
    k = 1 << r.u8()
    if n == 0:
        return b""
    freqs = read_freqs(r, ANS_TOTAL)
    cums = exclusive_cumsum(freqs)
    states = [int(v) for v in r.u32s(k)]
    n_words = r.u32()
    words = r.u16s(n_words)
    cum2sym = np.repeat(np.arange(256, dtype=np.uint8), freqs)
    out = bytearray(n)
    pos = 0
    for i in range(n):
        j = i % k
        st = states[j]
        slot = st & MASK
        s = int(cum2sym[slot])
        out[i] = s
        st = int(freqs[s]) * (st >> ANS_PROB_BITS) + slot - int(cums[s])
        if st < ANS_LOW:
            word = int(words[pos]) if pos < n_words else 0
            pos += 1
            st = (st << 16) | word
        states[j] = st
    return bytes(out)
