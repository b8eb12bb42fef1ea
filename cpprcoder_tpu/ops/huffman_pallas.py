"""Pallas TPU kernels for CT-HUF1 (format: reference/huffman_ref.py).

The XLA scan backend (ops/huffman_ops.py) pays per-step dispatch just like
the range coders did; this runs the whole bit-packer/decoder loop in one
kernel launch using the established CT-RCQ/RCX grid pattern (sequential
grid over window steps, VMEM scratch carries lane state).

Huffman-specific kernel rules:
  - static tables ride ONE MXU dot per step: an [8,256] table block
    (rows = len / code_lo / code_hi for encode; perm for decode) against
    the [256,K] symbol one-hot — every piece is < 256, bf16-exact.
  - NO variable shifts in Mosaic: `code << nbits`, `win >> consumed`,
    `r >> (15-l)` become one-hot selects over <= 17 statically-shifted
    copies (_shl_var/_shr_var) — pure VPU selects.
  - decode bit feed: per-lane u16 word rows [LW, K] resident in VMEM
    (struck once outside the kernel, ops/huffman_ops._decode path's
    bases/word_counts); refills are masked reduces, no gathers.

Containers are byte-identical with the XLA backend (tests/test_huffman_pallas.py).
Reference parity: the real canonical Huffman the stub cpphuff.h:33,43-45
never implemented, at kernel speed.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from cpprcoder_tpu.config import HUF_MAX_BITS
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
F32 = jnp.float32

SUB = 8
MIN_LANES = 128
VMEM_ROWS_CAP = 6 << 20

_INTERPRET = False


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=F32)


def _shl_var(v, s, maxs: int):
    """v << s for traced s in [0, maxs], via one-hot select (u32)."""
    out = jnp.zeros_like(v)
    for b in range(maxs + 1):
        out = jnp.where(s == U32(b), v << b, out)
    return out


def _shr_var(v, s, maxs: int):
    out = jnp.zeros_like(v)
    for b in range(maxs + 1):
        out = jnp.where(s == U32(b), v >> b, out)
    return out


# ------------------------------------------------------------------ encode

def _encode_kernel(n_ref, x_ref, tab_ref, ev_ref, fl_ref,
                   acc_s, nb_s, bc_s, *, k: int, kp: int, steps: int):
    from jax.experimental import pallas as pl

    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _init():
        acc_s[:] = jnp.zeros((1, kp), U32)
        nb_s[:] = jnp.zeros((1, kp), U32)
        bc_s[:] = jnp.zeros((1, kp), U32)

    n = n_ref[0, 0]
    acc, nb, bc = acc_s[:], nb_s[:], bc_s[:]
    lanes = lax.broadcasted_iota(I32, (1, kp), 1)
    iota_256 = lax.broadcasted_iota(I32, (256, kp), 0)
    tab = tab_ref[:].astype(F32)          # [8,256]: len, code_lo, code_hi
    ev_rows = []

    for j in range(SUB):
        active = (((pid * SUB + j) * k + lanes) < n) & (lanes < k)
        syms = x_ref[j:j + 1, :]
        oh_sym = ((iota_256 == syms) & active).astype(F32)
        vals = _dot(tab, oh_sym).astype(I32)          # [8, K]
        l = vals[0:1].astype(U32)
        c = (vals[1:2] + vals[2:3] * 256).astype(U32)
        acc = acc | _shl_var(c, nb, HUF_MAX_BITS)
        nb = nb + l
        bc = bc + l
        emit = nb >= 16
        word = acc & U32(0xFFFF)
        acc = jnp.where(emit, acc >> 16, acc)
        nb = jnp.where(emit, nb - 16, nb)
        ev_rows.append((emit.astype(U32) << 16) | word)

    ev_ref[:] = jnp.concatenate(ev_rows, axis=0)      # [SUB, K]
    acc_s[:], nb_s[:], bc_s[:] = acc, nb, bc

    @pl.when(pid == pl.num_programs(0) - 1)
    def _flush():
        valid = lanes < k
        fl_ref[:] = jnp.concatenate(
            [jnp.where(valid & (nb > 0), (U32(1) << 16) | (acc & U32(0xFFFF)),
                       U32(0)),
             jnp.where(valid, bc, U32(0)),
             jnp.zeros((SUB - 2, kp), U32)], axis=0)


@lru_cache(maxsize=64)
def _encode_call(steps: int, k: int, kp: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kern = partial(_encode_kernel, k=k, kp=kp, steps=steps)
    steps8 = -(-steps // SUB) * SUB

    @jax.jit
    def run(x2d, n, tab):
        pad = steps8 - x2d.shape[0]
        xp = jnp.concatenate(
            [x2d, jnp.zeros((pad, x2d.shape[1]), x2d.dtype)]) if pad else x2d
        if kp > k:
            xp = jnp.concatenate(
                [xp, jnp.zeros((steps8, kp - k), xp.dtype)], axis=1)
        evs, fl = pl.pallas_call(
            kern,
            grid=(steps8 // SUB,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((SUB, kp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 256), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((SUB, kp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, kp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((steps8, kp), U32),
                jax.ShapeDtypeStruct((8, kp), U32),
            ),
            scratch_shapes=[
                pltpu.VMEM((1, kp), U32),   # acc
                pltpu.VMEM((1, kp), U32),   # nbits
                pltpu.VMEM((1, kp), U32),   # bitcount
            ],
            interpret=_INTERPRET,
        )(jnp.asarray(n, I32).reshape(1, 1), xp.astype(I32), tab)
        # same post-kernel stream layout as the XLA backend: lane-major
        # slots [K, steps+1] (one flush slot per lane)
        evs = evs[:steps, :k]
        emits = jnp.concatenate(
            [(evs >> 16).astype(jnp.bool_).T,
             (fl[0:1, :k] >> 16).astype(jnp.bool_).T], axis=1)
        words = jnp.concatenate(
            [(evs & U32(0xFFFF)).astype(jnp.uint16).T,
             (fl[0:1, :k] & U32(0xFFFF)).astype(jnp.uint16).T], axis=1)
        bitcounts = fl[1, :k]
        cnt = emits.reshape(-1).astype(I32)
        pstart = jnp.cumsum(cnt) - cnt
        return words.reshape(-1), pstart, cnt.sum(), bitcounts

    return run


def huffman_encode_pallas(data, lanes: int | None = None) -> bytes:
    from cpprcoder_tpu.config import pick_lanes
    from cpprcoder_tpu.ops.huffman_ops import _pad2d
    from cpprcoder_tpu.ops.rans_ops import _stream_fn

    x = as_u8(data)
    n = len(x)
    k = lanes or pick_lanes(n)
    if n == 0:
        return ByteWriter().u32(0).u8(_lane_desc(k)).getvalue()
    counts = np.bincount(x, minlength=256)
    lengths, codes = build_encoder_table(counts)
    tab = np.zeros((8, 256), np.int32)
    tab[0] = lengths
    tab[1] = codes & 255
    tab[2] = codes >> 8
    steps = bucket(-(-n // k))
    words, pstart, n_words, bitcounts = _encode_call(
        steps, k, max(k, MIN_LANES))(
        jnp.asarray(_pad2d(x, steps, k)), U32(n), jnp.asarray(tab))
    nw = int(n_words)
    cap = bucket(max(nw, 1))
    stream = _stream_fn(steps * k + k, cap)(words, pstart, n_words)
    w = ByteWriter().u32(n).u8(_lane_desc(k))
    w.raw(pack_nibbles(lengths).tobytes())
    w.u32s(np.asarray(jax.device_get(bitcounts)))
    w.u16s(np.asarray(jax.device_get(stream))[:nw])
    return w.getvalue()


# ------------------------------------------------------------------ decode

def _decode_kernel(n_ref, rows_ref, lim_ref, bas_ref, perm_ref, out_ref,
                   win_s, nb_s, wcur_s,
                   *, k: int, kp: int, lw: int):
    from jax.experimental import pallas as pl

    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _init():
        win_s[:] = jnp.zeros((1, kp), U32)
        nb_s[:] = jnp.zeros((1, kp), U32)
        wcur_s[:] = jnp.zeros((1, kp), I32)

    n = n_ref[0, 0]
    win, nb, wcur = win_s[:], nb_s[:], wcur_s[:]
    lanes = lax.broadcasted_iota(I32, (1, kp), 1)
    iota_256 = lax.broadcasted_iota(I32, (256, kp), 0)
    lw_iota = lax.broadcasted_iota(I32, (lw, kp), 0)
    l16_iota = lax.broadcasted_iota(I32, (16, kp), 0)
    rows = rows_ref[:]                       # [LW, K] i32 u16-word values
    limits = lim_ref[:]                      # [16, K] i32 (row l = limit_l)
    bases_l = bas_ref[:]                     # [16, K] i32
    perm = perm_ref[:].astype(F32)           # [8, 256] row 0 = perm
    out_rows = []

    for j in range(SUB):
        active = (((pid * SUB + j) * k + lanes) < n) & (lanes < k)
        # refill: one u16 word while nbits <= 16 (mirrors the XLA body)
        need = nb <= 16
        sel = jnp.where(need, wcur, I32(-1))
        w = jnp.sum(jnp.where(lw_iota == sel, rows, I32(0)),
                    axis=0, keepdims=True, dtype=I32).astype(U32)
        win = jnp.where(need, win | _shl_var(w, nb, 16), win)
        nb = jnp.where(need, nb + 16, nb)
        wcur = wcur + need.astype(I32)

        window = win & U32((1 << HUF_MAX_BITS) - 1)
        r = window
        r = ((r & U32(0x5555)) << 1) | ((r >> 1) & U32(0x5555))
        r = ((r & U32(0x3333)) << 2) | ((r >> 2) & U32(0x3333))
        r = ((r & U32(0x0F0F)) << 4) | ((r >> 4) & U32(0x0F0F))
        r = (((r & U32(0x00FF)) << 8) | (r >> 8)) >> 1       # 16 -> 15 bits
        # length = first l in 1..15 with r < limits[l]
        lt = (r < limits.astype(U32)) & (l16_iota >= 1)      # [16, K]
        l = (U32(HUF_MAX_BITS)
             - jnp.sum(lt.astype(I32), axis=0, keepdims=True).astype(U32)
             + 1)
        base = jnp.sum(jnp.where(l16_iota == l.astype(I32), bases_l, 0),
                       axis=0, keepdims=True, dtype=I32).astype(U32)
        rank = (_shr_var(r, U32(HUF_MAX_BITS) - l, HUF_MAX_BITS - 1)
                - base).astype(I32)
        oh_rank = ((iota_256 == jnp.clip(rank, 0, 255)) & active
                   ).astype(F32)
        sym = _dot(perm, oh_rank).astype(I32)[0:1]           # [1, K]
        consumed = jnp.where(active, l, U32(0))
        win = _shr_var(win, consumed, HUF_MAX_BITS)
        nb = nb - consumed
        out_rows.append(sym)

    out_ref[:] = jnp.concatenate(out_rows, axis=0)
    win_s[:], nb_s[:], wcur_s[:] = win, nb, wcur


@lru_cache(maxsize=64)
def _decode_call(steps: int, k: int, kp: int, lw: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kern = partial(_decode_kernel, k=k, kp=kp, lw=lw)
    steps8 = -(-steps // SUB) * SUB

    @jax.jit
    def run(rowsT, limits, bases_l, perm, n):
        if kp > k:
            rowsT = jnp.concatenate(
                [rowsT, jnp.zeros((lw, kp - k), rowsT.dtype)], axis=1)
        lim2 = jnp.broadcast_to(limits.astype(I32)[:, None], (16, kp))
        bas2 = jnp.broadcast_to(bases_l.astype(I32)[:, None], (16, kp))
        out = pl.pallas_call(
            kern,
            grid=(steps8 // SUB,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((lw, kp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((16, kp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((16, kp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 256), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((SUB, kp), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((steps8, kp), I32),
            scratch_shapes=[
                pltpu.VMEM((1, kp), U32),   # win
                pltpu.VMEM((1, kp), U32),   # nbits
                pltpu.VMEM((1, kp), I32),   # word cursor
            ],
            interpret=_INTERPRET,
        )(jnp.asarray(n, I32).reshape(1, 1), rowsT, lim2, bas2, perm)
        return out[:, :k]

    return run


@lru_cache(maxsize=64)
def _rows16_fn(k: int, lw: int, w_cap: int):
    """Per-lane u16 word rows [K, LW] from the flat stream (ONE bulk
    gather, outside the kernel — zero past each lane's end)."""

    @jax.jit
    def run(words, bases, counts):
        pos = bases[:, None] + jnp.arange(lw, dtype=I32)[None, :]
        w = words[jnp.clip(pos, 0, w_cap - 1)].astype(I32)
        keep = (jnp.arange(lw, dtype=I32)[None, :] < counts[:, None])
        return jnp.where(keep, w, 0)

    return run


def huffman_decode_pallas(blob) -> bytes:
    from cpprcoder_tpu.ops.huffman_ops import huffman_decode_jax

    r = ByteReader(blob)
    n = r.u32()
    k = 1 << r.u8()
    if n == 0:
        return b""
    lengths = unpack_nibbles(r.raw(128))
    bitcounts = r.u32s(k).astype(np.int64)
    word_counts = (bitcounts + 15) // 16
    nw = int(word_counts.sum())
    lw = bucket(max(int(word_counts.max()), 1) + 1)
    kp = max(k, MIN_LANES)
    if lw * kp * 4 > VMEM_ROWS_CAP:
        return huffman_decode_jax(blob)
    words = r.u16s(nw).astype(np.uint16)
    bases = np.concatenate(([0], np.cumsum(word_counts)))[:-1].astype(np.int32)
    limits, bases_l, perm = build_canonical_decode_tables(lengths,
                                                          HUF_MAX_BITS)
    steps = bucket(-(-n // k))
    w_cap = bucket(max(nw, 1))
    padded = np.zeros(w_cap, np.uint16)
    padded[:nw] = words
    rows = _rows16_fn(k, lw, w_cap)(
        jnp.asarray(padded), jnp.asarray(bases),
        jnp.asarray(word_counts.astype(np.int32)))
    lim16 = np.zeros(16, np.int32)
    lim16[1:16] = limits[1:16]
    bas16 = np.zeros(16, np.int32)
    bas16[1:16] = bases_l[1:16]
    perm8 = np.zeros((8, 256), np.int32)
    perm8[0] = perm
    out = _decode_call(steps, k, kp, lw)(
        rows.T, jnp.asarray(lim16), jnp.asarray(bas16),
        jnp.asarray(perm8), n)
    return (np.asarray(jax.device_get(out)).astype(np.uint8)
            .reshape(-1)[:n].tobytes())
