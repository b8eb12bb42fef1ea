"""JAX K-lane ASE: CT-ASE1.

Per-lane 64-entry recency tables carried as a [K, 64] scan state; find is a
vectorized compare (the SSE2 find of cppase.h:201-214 generalized), the
move-to-back / evict-front updates are masked shifts, and bit emission uses
the same ≤1-u16-word-per-symbol accumulator as CT-HUF1.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from cpprcoder_tpu.config import pick_lanes
from cpprcoder_tpu.core.bytesutil import ByteReader, ByteWriter, as_u8
from cpprcoder_tpu.reference.ase_ref import ENTROPY, TABLE_SIZE, _lane_desc
from cpprcoder_tpu.utils.shapes import bucket

U32 = jnp.uint32
I32 = jnp.int32


def _pad2d(x: np.ndarray, steps: int, k: int) -> np.ndarray:
    out = np.zeros(steps * k, dtype=np.uint8)
    out[: len(x)] = x
    return out.reshape(steps, k)


def _update(table, size, sym, hit, idx0):
    """table [k,64] i32, size/sym [k] i32, hit bool, idx0 [k] i32."""
    j = jnp.arange(TABLE_SIZE, dtype=I32)[None, :]
    shifted = jnp.roll(table, -1, axis=1)
    full = size >= TABLE_SIZE
    start = jnp.where(hit, idx0, jnp.where(full, 0, size))
    place = jnp.where(hit, size - 1, jnp.where(full, TABLE_SIZE - 1, size))
    new = jnp.where((j >= start[:, None]) & (j < place[:, None]), shifted, table)
    new = jnp.where(j == place[:, None], sym[:, None], new)
    new_size = jnp.where(hit | full, size, size + 1)
    return new, new_size


@lru_cache(maxsize=32)
def _encode_fn(steps: int, k: int):
    entropy = jnp.asarray(ENTROPY, I32)

    @jax.jit
    def run(x2d, n):
        lane_ids = jnp.arange(k, dtype=U32)

        def step(carry, xt):
            table, size, bits, acc, nbits, t_idx = carry
            active = (t_idx * k + lane_ids) < n
            sym = xt.astype(I32)
            eq = table == sym[:, None]
            valid = jnp.arange(TABLE_SIZE, dtype=I32)[None, :] < size[:, None]
            found = eq & valid
            hit = found.any(axis=1)
            idx0 = jnp.argmax(found, axis=1).astype(I32)
            d = size - 1 - idx0
            val = jnp.where(hit, (d << 1) | 1, sym << 1).astype(U32)
            width = jnp.where(hit, bits + 1, 9).astype(U32)
            table2, size2 = _update(table, size, sym, hit, idx0)
            bits2 = jnp.where(hit | (size >= TABLE_SIZE), bits,
                              entropy[jnp.minimum(size + 1, TABLE_SIZE)])
            # emission (≤ 1 u16/symbol since width ≤ 9)
            acc2 = acc | (val << nbits)
            nb2 = nbits + width
            emit = nb2 >= 16
            word = (acc2 & U32(0xFFFF)).astype(jnp.uint16)
            acc2 = jnp.where(emit, acc2 >> 16, acc2)
            nb2 = jnp.where(emit, nb2 - 16, nb2)
            # inactive lanes: keep state
            table = jnp.where(active[:, None], table2, table)
            size = jnp.where(active, size2, size)
            bits = jnp.where(active, bits2, bits)
            acc = jnp.where(active, acc2, acc)
            nbw = jnp.where(active, nb2, nbits)
            bitw = jnp.where(active, width, 0)
            return (table, size, bits, acc, nbw, t_idx + 1), (
                active & emit, word, bitw)

        init = (jnp.zeros((k, TABLE_SIZE), I32), jnp.zeros(k, I32),
                jnp.zeros(k, I32), jnp.zeros(k, U32), jnp.zeros(k, U32),
                U32(0))
        (table, size, bits, acc, nbits, _), (emits, words, widths) = lax.scan(
            step, init, x2d)
        bitcounts = widths.astype(I32).sum(axis=0)
        emits = jnp.concatenate([emits.T, (nbits > 0)[:, None]], axis=1)
        words = jnp.concatenate(
            [words.T, (acc & U32(0xFFFF)).astype(jnp.uint16)[:, None]], axis=1)
        cnt = emits.reshape(-1).astype(I32)
        pstart = jnp.cumsum(cnt) - cnt
        return words.reshape(-1), pstart, cnt.sum(), bitcounts

    return run


@lru_cache(maxsize=32)
def _decode_fn(steps: int, k: int, w_cap: int):
    entropy = jnp.asarray(ENTROPY, I32)

    @jax.jit
    def run(words, bases, word_ends, n):
        lane_ids = jnp.arange(k, dtype=U32)

        def refill(win, nbits, wcur):
            need = nbits <= 16
            w = jnp.where(wcur < word_ends,
                          words[jnp.minimum(wcur, w_cap - 1)].astype(U32), 0)
            win2 = win | (w << nbits)
            return (jnp.where(need, win2, win),
                    jnp.where(need, nbits + 16, nbits),
                    jnp.where(need, wcur + 1, wcur))

        def step(carry, _):
            table, size, bits, win, nbits, wcur, t_idx = carry
            active = (t_idx * k + lane_ids) < n
            win, nbits, wcur = refill(win, nbits, wcur)
            window = win
            is_hit = (window & 1) > 0
            d = ((window >> 1) & ((U32(1) << bits.astype(U32)) - 1)).astype(I32)
            lit = ((window >> 1) & 0xFF).astype(I32)
            idx0 = jnp.clip(size - 1 - d, 0)
            # gather-free row pick: one-hot over the 64 table slots
            slot_eq = idx0[:, None] == jnp.arange(TABLE_SIZE, dtype=I32)[None, :]
            hit_sym = jnp.max(jnp.where(slot_eq, table, 0), axis=1)
            sym = jnp.where(is_hit, hit_sym, lit)
            consumed = jnp.where(is_hit, 1 + bits, 9).astype(U32)
            table2, size2 = _update(table, size, sym, is_hit, idx0)
            bits2 = jnp.where(is_hit | (size >= TABLE_SIZE), bits,
                              entropy[jnp.minimum(size + 1, TABLE_SIZE)])
            table = jnp.where(active[:, None], table2, table)
            size = jnp.where(active, size2, size)
            bits = jnp.where(active, bits2, bits)
            consumed = jnp.where(active, consumed, 0)
            win = win >> consumed
            nbits = nbits - consumed
            return (table, size, bits, win, nbits, wcur, t_idx + 1), \
                sym.astype(jnp.uint8)

        init = (jnp.zeros((k, TABLE_SIZE), I32), jnp.zeros(k, I32),
                jnp.zeros(k, I32), jnp.zeros(k, U32), jnp.zeros(k, U32),
                bases, U32(0))
        _, out = lax.scan(step, init, None, length=steps)
        return out

    return run


def ase_encode_jax(data, lanes: int | None = None) -> bytes:
    x = as_u8(data)
    n = len(x)
    k = lanes or pick_lanes(n)
    if n == 0:
        return ByteWriter().u32(0).u8(_lane_desc(k)).getvalue()
    steps = bucket(-(-n // k))
    words, pstart, n_words, bitcounts = _encode_fn(steps, k)(
        jnp.asarray(_pad2d(x, steps, k)), U32(n))
    nw = int(n_words)
    cap = bucket(max(nw, 1))
    from cpprcoder_tpu.ops.rans_ops import _stream_fn

    stream = _stream_fn(steps * k + k, cap)(words, pstart, n_words)
    w = ByteWriter().u32(n).u8(_lane_desc(k))
    w.u32s(np.asarray(jax.device_get(bitcounts)))
    w.u16s(np.asarray(jax.device_get(stream))[:nw])
    return w.getvalue()


def ase_decode_jax(blob) -> bytes:
    r = ByteReader(blob)
    n = r.u32()
    k = 1 << r.u8()
    if n == 0:
        return b""
    bitcounts = r.u32s(k).astype(np.int64)
    word_counts = (bitcounts + 15) // 16
    nw = int(word_counts.sum())
    words = r.u16s(nw).astype(np.uint16)
    bases = np.concatenate(([0], np.cumsum(word_counts)))[:-1].astype(np.int32)
    steps = bucket(-(-n // k))
    w_cap = bucket(max(nw, 1))
    padded = np.zeros(w_cap, np.uint16)
    padded[:nw] = words
    word_ends = (bases + word_counts).astype(np.int32)
    out = _decode_fn(steps, k, w_cap)(
        jnp.asarray(padded), jnp.asarray(bases), jnp.asarray(word_ends),
        U32(n))
    return np.asarray(jax.device_get(out)).reshape(-1)[:n].tobytes()
