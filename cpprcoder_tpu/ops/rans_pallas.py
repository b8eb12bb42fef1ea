"""Pallas TPU kernels for CT-ANS1 v2 (format: reference/rans_ref.py).

The XLA scan backend (ops/rans_ops.py) pays per-step dispatch latencies
just like the range coders did; here the whole rANS loop runs in one
kernel launch using the established CT-RCQ/RCX/HUF1 grid pattern
(sequential grid over SUB-step windows, VMEM scratch carries lane state).
This is the reference's 8-state SIMD interleave (cppans.h:567-649)
generalized to a kernel-wide lane vector.

rANS-specific kernel rules:
  - encode walks the input BACKWARDS (cppans.h:497-530): the grid maps
    program i to step-block (nblocks-1-i) and the kernel iterates its SUB
    window in reverse, so state scratch carries across programs exactly as
    the scalar reverse scan would;
  - the per-symbol division st // f (f is a traced per-lane frequency) is
    an 18-round unrolled long division — quotients are < 2^18 by the
    renorm invariant, so 18 shift-compare rounds are exact (the VPU has no
    integer divide; the reference precomputes reciprocals, cppans.h:180-250);
  - static freq/cum tables are [16,16] tiles read via one-hot MXU dots
    (_extract_rows/_pick from the CT-RCQ kernel);
  - decode refills one u16 word from per-lane word rows [L2, K] resident
    in VMEM by a masked reduce at the lane's cursor — the v2 per-lane
    stream layout exists precisely to make this feed gather-free.

Containers are byte-identical with the XLA and oracle backends
(tests/test_rans_pallas.py).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from cpprcoder_tpu.config import ANS_LOW, ANS_PROB_BITS, pick_lanes
from cpprcoder_tpu.core.bytesutil import ByteReader, ByteWriter, as_u8
from cpprcoder_tpu.models import freq_header
from cpprcoder_tpu.ops.rcq_pallas import (
    _extract_rows,
    _iota16_col_k,
    _lane_iota,
    _pick,
)
from cpprcoder_tpu.reference.rans_ref import _lane_desc, _parse_lane_desc
from cpprcoder_tpu.utils.shapes import bucket

U32 = jnp.uint32
I32 = jnp.int32
F32 = jnp.float32
MASK = (1 << ANS_PROB_BITS) - 1

SUB = 8
MIN_LANES = 128
VMEM_ROWS_CAP = 6 << 20

_INTERPRET = False


def _div_vec(num, den):
    """Exact floor(num / den) elementwise u32; quotient < 2^18, den ≤ 2^14.

    18-round unrolled long division (no idiv on the VPU). cand*den is
    < 2^32 for every candidate, so the compare is exact in u32."""
    q = jnp.zeros_like(num)
    for b in reversed(range(18)):
        cand = q | U32(1 << b)
        q = jnp.where(cand * den <= num, cand, q)
    return q


# ------------------------------------------------------------------ encode

def _encode_kernel(n_ref, x_ref, q_ref, c_ref, ev_ref, fl_ref, st_s,
                   *, k: int, kp: int):
    from jax.experimental import pallas as pl

    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _init():
        st_s[:] = jnp.full((1, kp), ANS_LOW, U32)

    n = n_ref[0, 0]
    nb = pl.num_programs(0)
    blk = nb - 1 - pid          # original step-block this program encodes
    st = st_s[:]
    lanes = _lane_iota(kp)
    qtab = q_ref[:]             # [16,16] i32 freqs (≤ 2^14)
    ctab = c_ref[:]             # [16,16] i32 exclusive cums (< 2^14)
    rows_rev = []

    for jj in range(SUB):
        j = SUB - 1 - jj        # reverse within the block
        active = (((blk * SUB + j) * k + lanes) < n) & (lanes < k)
        syms = x_ref[j:j + 1, :]
        s_hi = syms >> 4
        s_lo = syms & 15
        oh_hi = ((_iota16_col_k(kp) == s_hi) & active).astype(F32)
        oh_lo = (_iota16_col_k(kp) == s_lo).astype(F32)
        f = _pick(_extract_rows(qtab, oh_hi), oh_lo)
        c = _pick(_extract_rows(ctab, oh_hi), oh_lo)

        emit = active & ((st >> 18) >= f)       # u32-wrap-free renorm test
        word = st & U32(0xFFFF)
        st2 = jnp.where(emit, st >> 16, st)
        # inactive lanes have f = 0; u32 max is unimplemented in Mosaic
        # (arith.maxui fails to legalize), so select instead
        fs = jnp.where(f > 0, f, U32(1))
        q = _div_vec(st2, fs)
        r = st2 - q * fs
        st_new = (q << ANS_PROB_BITS) | (r + c)
        st = jnp.where(active, st_new, st)
        rows_rev.append((emit.astype(U32) << 16) | word)

    ev_ref[:] = jnp.concatenate(rows_rev[::-1], axis=0)   # forward order
    st_s[:] = st

    @pl.when(pid == nb - 1)
    def _flush():
        fl_ref[:] = jnp.concatenate(
            [jnp.where(lanes < k, st, U32(ANS_LOW))] +
            [jnp.zeros((SUB - 1, kp), U32)], axis=0)


@lru_cache(maxsize=64)
def _encode_call(steps: int, k: int, kp: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kern = partial(_encode_kernel, k=k, kp=kp)
    steps8 = -(-steps // SUB) * SUB
    nb = steps8 // SUB

    @jax.jit
    def run(x2d, n):
        from cpprcoder_tpu.models.table_jax import (
            histogram_masked,
            normalize_freqs_jnp,
        )

        counts = histogram_masked(x2d.reshape(-1), n)
        freqs = normalize_freqs_jnp(counts, n, ANS_PROB_BITS)
        cums = jnp.concatenate([jnp.zeros(1, U32), jnp.cumsum(freqs[:255])])
        qtab = freqs.astype(I32).reshape(16, 16)
        ctab = cums.astype(I32).reshape(16, 16)

        pad = steps8 - x2d.shape[0]
        xp = jnp.concatenate(
            [x2d, jnp.zeros((pad, x2d.shape[1]), x2d.dtype)]) if pad else x2d
        if kp > k:
            xp = jnp.concatenate(
                [xp, jnp.zeros((steps8, kp - k), xp.dtype)], axis=1)
        evs, fl = pl.pallas_call(
            kern,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((SUB, kp), lambda i: (nb - 1 - i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((16, 16), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((16, 16), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((SUB, kp), lambda i: (nb - 1 - i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, kp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((steps8, kp), U32),
                jax.ShapeDtypeStruct((8, kp), U32),
            ),
            scratch_shapes=[
                pltpu.VMEM((1, kp), U32),   # states
            ],
            interpret=_INTERPRET,
        )(jnp.asarray(n, I32).reshape(1, 1), xp.astype(I32), qtab, ctab)
        # same post-kernel stream layout as the XLA backend: lane-major
        # flatten in forward step order (= each lane's read order)
        evs = evs[:steps, :k]
        emits = (evs >> 16).astype(jnp.bool_).T.reshape(-1)
        words = (evs & U32(0xFFFF)).astype(jnp.uint16).T.reshape(-1)
        cnt = emits.astype(I32)
        pstart = jnp.cumsum(cnt) - cnt
        lane_counts = cnt.reshape(k, steps).sum(axis=1)
        states = fl[0, :k]
        return states, words, pstart, cnt.sum(), lane_counts, freqs

    return run


def rans_encode_pallas(data, lanes: int | None = None) -> bytes:
    from cpprcoder_tpu.ops.rans_ops import _pad2d, _stream_fn

    x = as_u8(data)
    n = len(x)
    k = lanes or pick_lanes(n)
    if n == 0:
        return ByteWriter().u32(0).u8(_lane_desc(k)).getvalue()
    steps = bucket(-(-n // k))
    states, words, pstart, n_words, lane_counts, freqs = _encode_call(
        steps, k, max(k, MIN_LANES))(
        jnp.asarray(_pad2d(x, steps, k)), U32(n))
    nw = int(n_words)
    cap = bucket(max(nw, 1))
    stream = _stream_fn(steps * k, cap)(words, pstart, n_words)
    cnts = np.asarray(jax.device_get(lane_counts))
    wide = bool(cnts.max() > 0xFFFF)
    w = ByteWriter().u32(n).u8(_lane_desc(k, wide))
    w.raw(freq_header.pack_freqs(np.asarray(jax.device_get(freqs))))
    w.u32s(np.asarray(jax.device_get(states)))
    w.u32s(cnts) if wide else w.u16s(cnts)
    w.u16s(np.asarray(jax.device_get(stream))[:nw])
    return w.getvalue()


# ------------------------------------------------------------------ decode

def _decode_kernel(n_ref, st_ref, rows_ref, q_ref, c_ref, out_ref,
                   st_s, widx_s, *, k: int, kp: int, l2: int):
    from jax.experimental import pallas as pl

    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _init():
        st_s[:] = st_ref[:]
        widx_s[:] = jnp.zeros((1, kp), I32)

    n = n_ref[0, 0]
    st = st_s[:]
    widx = widx_s[:]
    lanes = _lane_iota(kp)
    l2_iota = lax.broadcasted_iota(I32, (l2, kp), 0)
    rows = rows_ref[:]                  # [L2, K] i32 u16-word values
    qtab = q_ref[:]
    ctab = c_ref[:]
    chunk_cums = ctab[:, 0:1]           # [16,1] cums of chunk starts
    out_rows = []

    for j in range(SUB):
        active = (((pid * SUB + j) * k + lanes) < n) & (lanes < k)
        slot = st & U32(MASK)
        # two-level symbol search: 16 chunk compares, then 16 in-chunk
        le_hi = chunk_cums.astype(U32) <= slot                  # [16,K]
        s_hi = jnp.sum(le_hi.astype(I32), axis=0, keepdims=True) - 1
        oh_hi = ((_iota16_col_k(kp) == s_hi) & active).astype(F32)
        row_c = _extract_rows(ctab, oh_hi)
        row_q = _extract_rows(qtab, oh_hi)
        le_lo = row_c.astype(U32) <= slot
        s_lo = jnp.sum(le_lo.astype(I32), axis=0, keepdims=True) - 1
        oh_lo = (_iota16_col_k(kp) == s_lo).astype(F32)
        c = _pick(row_c, oh_lo)
        f = _pick(row_q, oh_lo)
        s = (s_hi << 4) | s_lo

        st2 = f * (st >> ANS_PROB_BITS) + slot - c
        need = active & (st2 < U32(ANS_LOW))
        sel = jnp.where(need, widx, I32(-1))
        word = jnp.sum(jnp.where(l2_iota == sel, rows, I32(0)),
                       axis=0, keepdims=True, dtype=I32).astype(U32)
        st2 = jnp.where(need, (st2 << 16) | word, st2)
        st = jnp.where(active, st2, st)
        widx = widx + need.astype(I32)
        out_rows.append(s)

    out_ref[:] = jnp.concatenate(out_rows, axis=0)
    st_s[:] = st
    widx_s[:] = widx


@lru_cache(maxsize=64)
def _decode_call(steps: int, k: int, kp: int, l2: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kern = partial(_decode_kernel, k=k, kp=kp, l2=l2)
    steps8 = -(-steps // SUB) * SUB

    @jax.jit
    def run(rowsT, states, qtab, ctab, n):
        if kp > k:
            rowsT = jnp.concatenate(
                [rowsT, jnp.zeros((l2, kp - k), rowsT.dtype)], axis=1)
            states = jnp.concatenate(
                [states, jnp.full(kp - k, ANS_LOW, U32)])
        out = pl.pallas_call(
            kern,
            grid=(steps8 // SUB,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, kp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((l2, kp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((16, 16), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((16, 16), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((SUB, kp), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((steps8, kp), I32),
            scratch_shapes=[
                pltpu.VMEM((1, kp), U32),   # states
                pltpu.VMEM((1, kp), I32),   # word cursor
            ],
            interpret=_INTERPRET,
        )(jnp.asarray(n, I32).reshape(1, 1), states.reshape(1, kp),
          rowsT, qtab, ctab)
        return out[:, :k]

    return run


def rans_decode_pallas(blob) -> bytes:
    from cpprcoder_tpu.ops.huffman_pallas import _rows16_fn
    from cpprcoder_tpu.ops.rans_ops import rans_decode_jax

    r = ByteReader(blob)
    n = r.u32()
    k, wide = _parse_lane_desc(r.u8())
    if n == 0:
        return b""
    freqs = freq_header.read_freqs(r, 1 << ANS_PROB_BITS)
    states = r.u32s(k)
    cnts = (r.u32s(k) if wide else r.u16s(k)).astype(np.int64)
    n_words = int(cnts.sum())
    l2 = bucket(max(int(cnts.max()), 1) + 1)
    kp = max(k, MIN_LANES)
    if l2 * kp * 4 > VMEM_ROWS_CAP:
        return rans_decode_jax(blob)
    words = r.u16s(n_words).astype(np.uint16)
    bases = np.concatenate(([0], np.cumsum(cnts)))[:-1].astype(np.int32)
    steps = bucket(-(-n // k))
    w_cap = bucket(max(n_words, 1))
    padded = np.zeros(w_cap, np.uint16)
    padded[:n_words] = words
    rows = _rows16_fn(k, l2, w_cap)(
        jnp.asarray(padded), jnp.asarray(bases),
        jnp.asarray(cnts.astype(np.int32)))
    cums = np.concatenate(([0], np.cumsum(freqs[:255]))).astype(np.int32)
    out = _decode_call(steps, k, kp, l2)(
        rows.T, jnp.asarray(states, U32),
        jnp.asarray(freqs.astype(np.int32).reshape(16, 16)),
        jnp.asarray(cums.reshape(16, 16)), n)
    return (np.asarray(jax.device_get(out)).astype(np.uint8)
            .reshape(-1)[:n].tobytes())
