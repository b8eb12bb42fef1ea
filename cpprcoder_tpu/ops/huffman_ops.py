"""JAX K-lane canonical Huffman: CT-HUF1.

Encode: lax.scan with per-lane (acc, nbits) bit accumulators emitting ≤ 1
u16 word per symbol (code length ≤ 15), compacted per lane with the same
scatter-free searchsorted pass as the other coders. Decode: per-lane bit
cursors, a 2^15-entry (len<<8|sym) LUT gather, two word gathers per symbol.
Table construction (package-merge) runs on host — it is O(256·15) scalar
work on the histogram and never touches device buffers.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from cpprcoder_tpu.config import HUF_MAX_BITS, pick_lanes
from cpprcoder_tpu.core.bytesutil import ByteReader, ByteWriter, as_u8
from cpprcoder_tpu.models.huffman import (
    build_canonical_decode_tables,
    build_encoder_table,
)
from cpprcoder_tpu.reference.huffman_ref import (
    _lane_desc,
    pack_nibbles,
    unpack_nibbles,
)
from cpprcoder_tpu.utils.shapes import bucket

U32 = jnp.uint32
I32 = jnp.int32


def _pad2d(x: np.ndarray, steps: int, k: int) -> np.ndarray:
    out = np.zeros(steps * k, dtype=np.uint8)
    out[: len(x)] = x
    return out.reshape(steps, k)


@lru_cache(maxsize=64)
def _encode_fn(steps: int, k: int):
    @jax.jit
    def run(x2d, n, lengths, codes):
        from cpprcoder_tpu.ops.lookup import bulk_lookup256

        lane_ids = jnp.arange(k, dtype=U32)
        lc = bulk_lookup256(jnp.stack([lengths, codes], axis=1),
                            x2d.reshape(-1)).reshape(steps, k, 2)

        def step(carry, lct):
            acc, nbits, t_idx = carry
            active = (t_idx * k + lane_ids) < n
            l = jnp.where(active, lct[:, 0], 0)
            c = jnp.where(active, lct[:, 1], 0)
            acc = acc | (c << nbits)
            nbits = nbits + l
            emit = nbits >= 16
            word = (acc & U32(0xFFFF)).astype(jnp.uint16)
            acc = jnp.where(emit, acc >> 16, acc)
            nbits = jnp.where(emit, nbits - 16, nbits)
            return (acc, nbits, t_idx + 1), (emit, word, l)

        init = (jnp.zeros(k, U32), jnp.zeros(k, U32), U32(0))
        (acc, nbits, _), (emits, words, lens) = lax.scan(step, init, lc)
        bitcounts = lens.sum(axis=0)
        # lane-major event order: [K, steps] + one flush slot per lane
        emits = jnp.concatenate([emits.T, (nbits > 0)[:, None]], axis=1)
        words = jnp.concatenate(
            [words.T, (acc & U32(0xFFFF)).astype(jnp.uint16)[:, None]], axis=1)
        cnt = emits.reshape(-1).astype(I32)
        pstart = jnp.cumsum(cnt) - cnt
        return words.reshape(-1), pstart, cnt.sum(), bitcounts

    return run


@lru_cache(maxsize=64)
def _decode_fn(steps: int, k: int, w_cap: int):
    @jax.jit
    def run(words, bases, word_ends, limits, bases_l, perm, n):
        """Canonical arithmetic decode, gather-free (no 2^15 LUT gather):

        limits[l] (l=1..15): (first_code_of_length_l + count_l) << (15-l),
        i.e. the exclusive upper bound of length-l codes left-aligned in a
        15-bit window; length = first l whose limit exceeds the window.
        bases_l[l]: first_code_l - rank_offset_l; perm[rank] = symbol
        (symbols sorted by (length, symbol)). Stream feeding uses a 32-bit
        LSB-first bit queue refilled by ONE masked u16 gather per step."""
        lane_ids = jnp.arange(k, dtype=U32)
        lvec = jnp.arange(1, HUF_MAX_BITS + 1, dtype=U32)

        def refill(win, nbits, wcur):
            need = nbits <= 16
            w = jnp.where(wcur < word_ends,
                          words[jnp.minimum(wcur, w_cap - 1)].astype(U32), 0)
            win2 = win | (w << nbits)
            return (jnp.where(need, win2, win),
                    jnp.where(need, nbits + 16, nbits),
                    jnp.where(need, wcur + 1, wcur))

        def step(carry, _):
            win, nbits, wcur, t_idx = carry
            active = (t_idx * k + lane_ids) < n
            win, nbits, wcur = refill(win, nbits, wcur)
            window = win & U32((1 << HUF_MAX_BITS) - 1)
            # bit-reverse the 15-bit LSB-first window → MSB-first code view
            r = window
            r = ((r & U32(0x5555)) << 1) | ((r >> 1) & U32(0x5555))
            r = ((r & U32(0x3333)) << 2) | ((r >> 2) & U32(0x3333))
            r = ((r & U32(0x0F0F)) << 4) | ((r >> 4) & U32(0x0F0F))
            r = (((r & U32(0x00FF)) << 8) | (r >> 8)) >> 1   # 16→15 bits
            lt = r[:, None] < limits[None, 1:]
            l = (U32(HUF_MAX_BITS) - jnp.sum(lt, axis=1).astype(U32)) + 1
            l_oh = l[:, None] == lvec[None, :]
            base = jnp.sum(jnp.where(l_oh, bases_l[None, 1:], 0), axis=1)
            rank = ((r >> (U32(HUF_MAX_BITS) - l)) - base).astype(I32)
            from cpprcoder_tpu.ops.lookup import onehot_lookup

            sym = onehot_lookup(perm, jnp.clip(rank, 0, 255)).astype(jnp.uint8)
            consumed = jnp.where(active, l, 0)
            win = win >> consumed
            nbits = nbits - consumed
            return (win, nbits, wcur, t_idx + 1), sym

        init = (jnp.zeros(k, U32), jnp.zeros(k, U32), bases, U32(0))
        _, out = lax.scan(step, init, None, length=steps)
        return out

    return run


def huffman_encode_jax(data, lanes: int | None = None) -> bytes:
    x = as_u8(data)
    n = len(x)
    k = lanes or pick_lanes(n)
    if n == 0:
        return ByteWriter().u32(0).u8(_lane_desc(k)).getvalue()
    counts = np.bincount(x, minlength=256)
    lengths, codes = build_encoder_table(counts)
    steps = bucket(-(-n // k))
    words, pstart, n_words, bitcounts = _encode_fn(steps, k)(
        jnp.asarray(_pad2d(x, steps, k)), U32(n),
        jnp.asarray(lengths, U32), jnp.asarray(codes, U32))
    nw = int(n_words)
    cap = bucket(max(nw, 1))
    from cpprcoder_tpu.ops.rans_ops import _stream_fn

    stream = _stream_fn(steps * k + k, cap)(words, pstart, n_words)
    w = ByteWriter().u32(n).u8(_lane_desc(k))
    w.raw(pack_nibbles(lengths).tobytes())
    w.u32s(np.asarray(jax.device_get(bitcounts)))
    w.u16s(np.asarray(jax.device_get(stream))[:nw])
    return w.getvalue()


def huffman_decode_jax(blob) -> bytes:
    r = ByteReader(blob)
    n = r.u32()
    k = 1 << r.u8()
    if n == 0:
        return b""
    lengths = unpack_nibbles(r.raw(128))
    bitcounts = r.u32s(k).astype(np.int64)
    word_counts = (bitcounts + 15) // 16
    nw = int(word_counts.sum())
    words = r.u16s(nw).astype(np.uint16)
    bases = np.concatenate(([0], np.cumsum(word_counts)))[:-1].astype(np.int32)
    limits, bases_l, perm = build_canonical_decode_tables(lengths, HUF_MAX_BITS)
    steps = bucket(-(-n // k))
    w_cap = bucket(max(nw, 1))
    padded = np.zeros(w_cap, np.uint16)
    padded[:nw] = words
    word_ends = (bases + word_counts).astype(np.int32)
    out = _decode_fn(steps, k, w_cap)(
        jnp.asarray(padded), jnp.asarray(bases), jnp.asarray(word_ends),
        jnp.asarray(limits, U32), jnp.asarray(bases_l, U32),
        jnp.asarray(perm, U32), U32(n))
    return np.asarray(jax.device_get(out)).reshape(-1)[:n].tobytes()
