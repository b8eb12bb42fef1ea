"""Oracle (host, exact) implementation of CT-LZ4 (FORMATS.md).

LZ4 block format (bit-compatible with test/slz4.h:237-358,520-592 and the
public LZ4 spec), produced by a deterministic parse that both backends
implement identically:

  candidate c(i) = max{ j < i in the same segment : bytes4(j) == bytes4(i) }
  valid(i)  ⟺  c(i) exists ∧ i-c(i) ≤ 65535 ∧ lcp(i,c(i)) ≥ 4 ∧ i ≤ L-12
  mlen(i)   = min(lcp(i, c(i)), LCP_CAP, L - 5 - i)
  greedy: from pos 0, take the match if valid else advance one literal.
  lazy (default): at a valid i, defer by one literal when valid(i+1) and
  mlen(i+1) > mlen(i) — a position-local rule, so it stays data-parallel.

LCP_CAP = 4096 bounds the rank-doubling depth on device (longer repeats
chain through consecutive capped matches at ~6 bytes per 4 KiB — negligible).

Unlike the reference's 16K single-probe hash dictionary (test/slz4.h:204-234,
which loses matches to collisions and replacement), candidates here are
exact, so the parse never misses the nearest 4-byte match. Matches never
cross segment boundaries; concatenated segment blocks form one valid LZ4
block (offsets stay in-segment).
"""

from __future__ import annotations

import numpy as np

from cpprcoder_tpu.core.bytesutil import ByteReader, ByteWriter, as_u8

MAX_DISTANCE = 65535
MIN_MATCH = 4
END_LITERALS = 5
LAST_MATCH_GUARD = 12
LCP_CAP = 4096


def parse_segment(seg: np.ndarray, lazy: bool = True):
    """Parse per spec. Returns tokens as a list of
    (lit_start, lit_len, match_len, offset); final token has match_len == 0."""
    L = len(seg)
    tokens = []
    last: dict[bytes, int] = {}
    i = 0
    lit_start = 0
    bs = seg.tobytes()
    # candidate map must observe EVERY position < current, including skipped
    # ones, so advance it position-by-position
    next_to_index = 0

    def index_up_to(p):
        nonlocal next_to_index
        while next_to_index < p and next_to_index + MIN_MATCH <= L:
            last[bs[next_to_index:next_to_index + MIN_MATCH]] = next_to_index
            next_to_index += 1

    def match_at(p):
        """(mlen, offset) of the valid match at p, or (0, 0)."""
        if p > L - LAST_MATCH_GUARD:
            return 0, 0
        index_up_to(p)
        j = last.get(bs[p:p + MIN_MATCH])
        if j is None or p - j > MAX_DISTANCE:
            return 0, 0
        lcp = 0
        while p + lcp < L and lcp < LCP_CAP and bs[j + lcp] == bs[p + lcp]:
            lcp += 1
        if lcp < MIN_MATCH:
            return 0, 0
        return min(lcp, L - END_LITERALS - p), p - j

    while i < L:
        mlen, off = match_at(i)
        if mlen and lazy and match_at(i + 1)[0] > mlen:
            mlen = 0  # defer: emit one literal, re-decide at i+1
        if mlen:
            tokens.append((lit_start, i - lit_start, mlen, off))
            i += mlen
            lit_start = i
        else:
            i += 1
    tokens.append((lit_start, L - lit_start, 0, 0))
    return tokens


def serialize_tokens(seg: np.ndarray, tokens) -> bytes:
    out = bytearray()
    for lit_start, lit_len, mlen, off in tokens:
        lit_tok = min(lit_len, 15)
        m_tok = min(mlen - MIN_MATCH, 15) if mlen else 0
        out.append((lit_tok << 4) | m_tok)
        if lit_len >= 15:
            rem = lit_len - 15
            while rem >= 255:
                out.append(255)
                rem -= 255
            out.append(rem)
        out += seg[lit_start:lit_start + lit_len].tobytes()
        if mlen:
            out.append(off & 0xFF)
            out.append(off >> 8)
            if mlen - MIN_MATCH >= 15:
                rem = mlen - MIN_MATCH - 15
                while rem >= 255:
                    out.append(255)
                    rem -= 255
                out.append(rem)
    return bytes(out)


def decode_block(block: bytes, expected: int) -> bytes:
    """Standard LZ4 block decoder (safety-checked)."""
    out = bytearray()
    pos = 0
    n = len(block)
    while pos < n:
        token = block[pos]
        pos += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = block[pos]
                pos += 1
                lit += b
                if b != 255:
                    break
        out += block[pos:pos + lit]
        pos += lit
        if pos >= n:
            break
        off = block[pos] | (block[pos + 1] << 8)
        pos += 2
        if off == 0:
            raise ValueError("invalid offset 0")
        mlen = (token & 0xF) + MIN_MATCH
        if (token & 0xF) == 15:
            while True:
                b = block[pos]
                pos += 1
                mlen += b
                if b != 255:
                    break
        start = len(out) - off
        if start < 0:
            raise ValueError("offset past start")
        for t in range(mlen):
            out.append(out[start + t])
    if len(out) != expected:
        raise ValueError(f"decoded {len(out)} != expected {expected}")
    return bytes(out)


def slz4_encode(data, seg_log2: int = 17, lazy: bool = True) -> bytes:
    x = as_u8(data)
    n = len(x)
    s = 1 << seg_log2
    w = ByteWriter().u32(n).u8(seg_log2)
    n_segs = -(-n // s) if n else 0
    w.u32(n_segs)
    blocks = []
    for i in range(n_segs):
        seg = x[i * s:(i + 1) * s]
        blocks.append(serialize_tokens(seg, parse_segment(seg, lazy)))
    w.u32s([len(b) for b in blocks])
    for b in blocks:
        w.raw(b)
    return w.getvalue()


def slz4_decode(blob) -> bytes:
    r = ByteReader(blob)
    n = r.u32()
    seg_log2 = r.u8()
    s = 1 << seg_log2
    n_segs = r.u32()
    sizes = r.u32s(n_segs)
    out = bytearray()
    for i in range(n_segs):
        expected = min(s, n - i * s)
        out += decode_block(r.raw(int(sizes[i])).tobytes(), expected)
    return bytes(out)
