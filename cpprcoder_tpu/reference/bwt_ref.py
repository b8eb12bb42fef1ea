"""Oracle (host, exact) implementation of CT-BWT1 (FORMATS.md).

Cyclic-rotation Burrows-Wheeler transform over independent blocks — the
reference's BlkSort (blksort.h:76-108,401-661) semantics: rotations (not
suffixes) are sorted; output per block = last column + row index of the
original string; trailing partial block stored raw. Sorting here is
prefix-doubling with np.lexsort (the multikey quicksort of blksort.h:276-350
is replaced, not translated)."""

from __future__ import annotations

import numpy as np

from cpprcoder_tpu.core.bytesutil import ByteReader, ByteWriter, as_u8


def bwt_forward_block(block: np.ndarray) -> tuple[np.ndarray, int]:
    """Return (last_column, row_index) for one block (cyclic rotations)."""
    b = len(block)
    rank = block.astype(np.int64)
    idx = np.arange(b)
    h = 1
    while h < b:
        key2 = np.roll(rank, -h)
        order = np.lexsort((idx, key2, rank))  # stable; idx tiebreak
        r1 = rank[order]
        r2 = key2[order]
        diff = np.empty(b, dtype=np.int64)
        diff[0] = 0
        diff[1:] = (r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])
        new_sorted = np.cumsum(diff)
        rank = np.empty(b, dtype=np.int64)
        rank[order] = new_sorted
        if rank.max() == b - 1:
            break
        h <<= 1
    order = np.lexsort((np.arange(b), rank))
    last = block[(order - 1) % b]
    row = int(np.nonzero(order == 0)[0][0])
    return last, row


def bwt_inverse_block(last: np.ndarray, row: int) -> np.ndarray:
    """Invert one block: stable sort of the last column gives the next-map."""
    b = len(last)
    t = np.argsort(last, kind="stable")
    out = np.empty(b, dtype=np.uint8)
    p = row
    for i in range(b):
        p = t[p]
        out[i] = last[p]
    return out


def bwt_encode(data, block_log2: int = 15) -> bytes:
    x = as_u8(data)
    n = len(x)
    bs = 1 << block_log2
    w = ByteWriter().u32(n).u8(block_log2)
    nb = n // bs
    for i in range(nb):
        last, row = bwt_forward_block(x[i * bs:(i + 1) * bs])
        w.raw(last.tobytes()).u32(row)
    w.raw(x[nb * bs:].tobytes())
    return w.getvalue()


def bwt_decode(blob) -> bytes:
    r = ByteReader(blob)
    n = r.u32()
    bs = 1 << r.u8()
    nb = n // bs
    out = bytearray()
    for _ in range(nb):
        last = r.raw(bs)
        row = r.u32()
        out += bwt_inverse_block(last, row).tobytes()
    out += r.raw(n - nb * bs).tobytes()
    return bytes(out)
