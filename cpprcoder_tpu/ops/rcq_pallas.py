"""Pallas TPU kernels for CT-RCQ (format: reference/rcq_ref.py).

The XLA scan backend (ops/rcq_ops.py) pays per-step op-dispatch latencies
(~3-8 us/step of small-matmul and cumsum launches). Here the WHOLE coder
loop runs inside one kernel launch: the grid iterates over steps (one
K-symbol window per grid program — TPU grids are sequential, so VMEM
scratch carries lane state and the model across programs), every step is
straight VPU/MXU code, and model tables are [16,16] tiles (hi-nibble =
sublane, lo-nibble = lane — the TPU layout of the reference's chunked
AdaptiveFrequencyTable, cpprcoder.h:262-264).

Kernel-design rules used here (Mosaic-shaped):
  - NO division: model totals are 2^QBITS (t = range >> QBITS); the one
    scalar division in quantize() is a 15-round unrolled long division.
  - NO gathers/scatters: symbol search and table reads are one-hot
    compares + MXU dots on BYTE-SPLIT tables (bf16-exact 0..255 pieces;
    the MXU truncates f32 inputs to bf16 — splitting keeps integer
    exactness, same trick as ops/o1_ops.py).
  - NO u32 reductions (unimplemented in Mosaic): tables live in i32
    (values < 2^17), u32 appears only at product/compare sites; payload
    words are reduced as i32 bitcasts.
  - NO dynamic row indexing (sub-tile alignment unprovable for Mosaic):
    the grid + BlockSpec index_map do all row addressing.
  - NO variable shifts: renorm is 2 unrolled single-byte slots.
  - Decode byte feed: per-lane payload word rows [L4, K] resident in VMEM;
    a refill selects word widx[i] of lane i by a masked reduce over L4.
  - Containers are byte-identical with the XLA and oracle backends
    (tests/test_rcq_pallas.py); encode state/eventing REUSES ops.rc_common
    on [1,K]-shaped vectors inside the kernel.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from cpprcoder_tpu.core.bytesutil import ByteReader, ByteWriter, as_u8
from cpprcoder_tpu.models.qmodel import QBITS, QTOTAL, QRESERVE, rcq_params
from cpprcoder_tpu.ops import rc_common
from cpprcoder_tpu.ops.range_ops import _encode_container
from cpprcoder_tpu.reference.rc_ref import _lane_desc, _parse_lane_desc
from cpprcoder_tpu.utils.shapes import bucket

U32 = jnp.uint32
I32 = jnp.int32
F32 = jnp.float32

N_SLOTS = 2
SUB = 8                    # steps per grid program (min sublane block = 8)
MIN_LANES = 128            # grid lane width floor: containers with k below
#   this run on a 128-wide grid with lanes k..127 masked everywhere (they
#   encode nothing, flush nothing, and are sliced off before compaction),
#   so the container is byte-identical to the k-lane format while small
#   files still get kernel-speed steps instead of the XLA scan
VMEM_ROWS_CAP = 6 << 20    # decode word-rows VMEM budget (bytes)

_INTERPRET = False         # set True (tests) to run kernels interpreted


def _rowmajor_idx16():
    return (lax.broadcasted_iota(I32, (16, 16), 0) * 16
            + lax.broadcasted_iota(I32, (16, 16), 1))


def _dot(a, b):
    """MXU dot; operands must be bf16-exact (0/1 one-hots or byte pieces)."""
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=F32)


def _div_by_scalar(num_u32, d_u32):
    """Exact floor(num / d) for num [16,16] u32 < 2^32, scalar d < 2^17,
    quotient < 2^15: 15-round unrolled long division (no idiv on VPU)."""
    q = jnp.zeros_like(num_u32)
    for b in reversed(range(15)):
        cand = q | U32(1 << b)
        q = jnp.where(cand * d_u32 <= num_u32, cand, q)
    return q.astype(I32)


def _model_tables(C, climit: int):
    """C [16,16] i32 -> (C', q, cums_excl [16,16] i32, chunk_cums [16,1]
    i32). All values < 2^17 so i32 is exact. Must match models.qmodel
    {rescale,quantize} + cumsum bit-for-bit."""
    tot = jnp.sum(C, dtype=I32)
    C = jnp.where(tot >= climit, (C >> 1) | 1, C)
    tot = jnp.sum(C, dtype=I32)
    q = jnp.maximum(
        _div_by_scalar(C.astype(U32) * U32(QTOTAL - QRESERVE),
                       tot.astype(U32)), 1)
    rem = I32(QTOTAL) - jnp.sum(q, dtype=I32)
    m = jnp.max(q)
    rm = _rowmajor_idx16()
    first = jnp.min(jnp.where(q == m, rm, I32(4096)))
    q = q + rem * (rm == first).astype(I32)
    # row-major inclusive cumsum: in-row via exact byte-split MXU dots,
    # row offsets via a strict-lower dot on row totals
    tri_incl = (lax.broadcasted_iota(I32, (16, 16), 0)
                <= lax.broadcasted_iota(I32, (16, 16), 1)).astype(F32)
    cs_in = (_dot((q >> 8).astype(F32), tri_incl) * 256
             + _dot((q & 255).astype(F32), tri_incl))          # [16,16] f32
    row_tot = cs_in[:, 15:16]                                  # [16,1] f32
    tril_strict = (lax.broadcasted_iota(I32, (16, 16), 0)
                   > lax.broadcasted_iota(I32, (16, 16), 1)).astype(F32)
    rt = row_tot.astype(I32)
    off = (_dot(tril_strict, (rt >> 8).astype(F32)) * 256
           + _dot(tril_strict, (rt & 255).astype(F32)))        # [16,1]
    cum_incl = (cs_in + off).astype(I32)
    cums_excl = cum_incl - q
    chunk_cums = cums_excl[:, 0:1]                             # [16,1]
    return C, q, cums_excl, chunk_cums


def _extract_rows(table_i32, oh_hi):
    """table [16,16] i32 (< 2^16), oh_hi [16,K] f32 one-hot ->
    rows [16(lo), K] i32: rows[l, i] = table[s_hi[i], l]."""
    hi = _dot((table_i32 >> 8).astype(F32).T, oh_hi)
    lo = _dot((table_i32 & 255).astype(F32).T, oh_hi)
    return hi.astype(I32) * 256 + lo.astype(I32)


def _pick(rows_i32, oh_lo_f32):
    """rows [16,K] i32 (< 2^16), oh_lo one-hot -> [1,K] u32 selected."""
    picked = jnp.sum(jnp.where(oh_lo_f32 > 0, rows_i32, I32(0)), axis=0,
                     keepdims=True, dtype=I32)
    return picked.astype(U32)


def _hist16(oh_hi_masked, oh_lo):
    """[16,16] i32 counts: H[h,l] = sum_i oh_hi[h,i]*oh_lo[l,i] (exact)."""
    h = jax.lax.dot_general(oh_hi_masked, oh_lo,
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=F32)
    return h.astype(I32)


def _iota16_col_k(k):
    return lax.broadcasted_iota(I32, (16, k), 0)


def _lane_iota(k):
    return lax.broadcasted_iota(I32, (1, k), 1)


# ------------------------------------------------------------------ decode

def _decode_kernel(n_ref, rows_ref, out_ref,
                   rng_s, code_s, q0_s, q1_s, occ_s, widx_s, C_s,
                   *, k: int, kp: int, l4: int, inc: int, climit: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _init():
        rng_s[:] = jnp.full((1, kp), 0xFFFFFFFF, U32)
        code_s[:] = pltpu.bitcast(rows_ref[0:1, :], U32)
        q0_s[:] = jnp.zeros((1, kp), U32)
        q1_s[:] = jnp.zeros((1, kp), U32)
        occ_s[:] = jnp.zeros((1, kp), U32)
        widx_s[:] = jnp.ones((1, kp), I32)
        C_s[:] = jnp.ones((16, 16), I32)

    n = n_ref[0, 0]
    rng = rng_s[:]
    code = code_s[:]
    q0 = q0_s[:]
    q1 = q1_s[:]
    occ = occ_s[:]
    widx = widx_s[:]
    C = C_s[:]
    l4_iota = lax.broadcasted_iota(I32, (l4, kp), 0)
    lanes = _lane_iota(kp)
    rows = rows_ref[:]
    out_rows = []

    for j in range(SUB):
        # refill one word where occ < N_SLOTS (occ in {0,1} there)
        need = occ < U32(N_SLOTS)
        sel = jnp.where(need, widx, I32(-1))
        # rows are i32 bitcasts of the u32 payload words (no u32
        # reductions in Mosaic); exactly one row matches, so the i32 sum
        # preserves bits
        word_i = jnp.sum(jnp.where(l4_iota == sel, rows, I32(0)),
                         axis=0, keepdims=True, dtype=I32)
        word = pltpu.bitcast(word_i, U32)
        q0 = q0 | jnp.where(occ == 0, word, word >> 8)
        q1 = q1 | jnp.where(occ == 0, U32(0), word << 24)
        occ = jnp.where(need, occ + 4, occ)
        widx = widx + need.astype(I32)

        C, q, cums_excl, chunk_cums = _model_tables(C, climit)
        active = (((pid * SUB + j) * k + lanes) < n) & (lanes < k)

        t = rng >> QBITS
        le_hi = chunk_cums.astype(U32) * t <= code             # [16,K]
        s_hi = jnp.sum(le_hi.astype(I32), axis=0, keepdims=True) - 1
        oh_hi = ((_iota16_col_k(kp) == s_hi) & active).astype(F32)
        row_c = _extract_rows(cums_excl, oh_hi)
        row_q = _extract_rows(q, oh_hi)
        le_lo = row_c.astype(U32) * t <= code
        s_lo = jnp.sum(le_lo.astype(I32), axis=0, keepdims=True) - 1
        oh_lo = (_iota16_col_k(kp) == s_lo).astype(F32)
        c = _pick(row_c, oh_lo)
        f = _pick(row_q, oh_lo)
        s = (s_hi << 4) | s_lo

        code = code - c * t
        rng = jnp.where((c + f) == U32(QTOTAL), rng - c * t, f * t)
        for _ in range(N_SLOTS):
            do = rng < U32(rc_common.RC_TOP)
            b = q0 >> 24
            q0 = jnp.where(do, (q0 << 8) | (q1 >> 24), q0)
            q1 = jnp.where(do, q1 << 8, q1)
            occ = occ - do.astype(U32)
            code = jnp.where(do, (code << 8) | b, code)
            rng = jnp.where(do, rng << 8, rng)

        C = C + _hist16(oh_hi, oh_lo) * I32(inc)
        out_rows.append(s)

    C_s[:] = C
    out_ref[:] = jnp.concatenate(out_rows, axis=0)
    rng_s[:] = rng
    code_s[:] = code
    q0_s[:] = q0
    q1_s[:] = q1
    occ_s[:] = occ
    widx_s[:] = widx


@lru_cache(maxsize=64)
def _decode_call(steps: int, k: int, kp: int, l4: int, inc: int,
                 climit_log2: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kern = partial(_decode_kernel, k=k, kp=kp, l4=l4, inc=inc,
                   climit=1 << climit_log2)
    steps8 = -(-steps // SUB) * SUB

    @jax.jit
    def run(rows_wT, n):
        if kp > k:
            rows_wT = jnp.concatenate(
                [rows_wT, jnp.zeros((l4, kp - k), rows_wT.dtype)], axis=1)
        out = pl.pallas_call(
            kern,
            grid=(steps8 // SUB,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((l4, kp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((SUB, kp), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((steps8, kp), I32),
            scratch_shapes=[
                pltpu.VMEM((1, kp), U32),   # rng
                pltpu.VMEM((1, kp), U32),   # code
                pltpu.VMEM((1, kp), U32),   # q0
                pltpu.VMEM((1, kp), U32),   # q1
                pltpu.VMEM((1, kp), U32),   # occ
                pltpu.VMEM((1, kp), I32),   # widx
                pltpu.VMEM((16, 16), I32),  # C
            ],
            interpret=_INTERPRET,
        )(jnp.asarray(n, I32).reshape(1, 1),
          jax.lax.bitcast_convert_type(rows_wT, I32))
        return out[:, :k]

    return run


def rcq_decode_pallas(blob) -> bytes:
    from cpprcoder_tpu.ops.rcq_ops import _rows_fn, rcq_decode_jax

    r = ByteReader(blob)
    n = r.u32()
    k, wide = _parse_lane_desc(r.u8())
    inc = r.u8()
    climit_log2 = r.u8()
    qbits = r.u8()
    if qbits != QBITS:
        from cpprcoder_tpu.core.bytesutil import CorruptContainerError

        raise CorruptContainerError(
            f"container qbits {qbits} != build {QBITS}")
    if n == 0:
        return b""
    sizes = (r.u32s(k) if wide else r.u16s(k)).astype(np.int32)
    l4 = bucket(-(-int(sizes.max()) // 4) + 1)
    kp = max(k, MIN_LANES)
    if l4 * kp * 4 > VMEM_ROWS_CAP:
        return rcq_decode_jax(blob)
    from cpprcoder_tpu.utils import profiling

    payload = r.rest()
    p_cap = bucket(max(len(payload), 1))
    padded = np.zeros(p_cap, dtype=np.uint8)
    padded[: len(payload)] = payload
    # same phase names as rcq_decode_jax so --profile reports either backend
    with profiling.phase("dec.rows", len(payload)):
        rows_w = _rows_fn(k, l4, p_cap)(jnp.asarray(padded),
                                        jnp.asarray(sizes))
        rows_wT = rows_w.T
    steps = bucket(-(-n // k))
    with profiling.phase("dec.scan", n):
        out = _decode_call(steps, k, kp, l4, inc, climit_log2)(rows_wT, n)
    with profiling.phase("dec.fetch", n):
        res = (np.asarray(jax.device_get(out)).astype(np.uint8)
               .reshape(-1)[:n].tobytes())
    return res


# ------------------------------------------------------------------ encode

def _encode_kernel(n_ref, x_ref, ev_ref, fl_ref,
                   low_s, car_s, rng_s, cache_s, csz_s, C_s,
                   *, k: int, kp: int, inc: int, climit: int, steps: int):
    from jax.experimental import pallas as pl

    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _init():
        low_s[:] = jnp.zeros((1, kp), U32)
        car_s[:] = jnp.zeros((1, kp), U32)
        rng_s[:] = jnp.full((1, kp), 0xFFFFFFFF, U32)
        cache_s[:] = jnp.zeros((1, kp), U32)
        csz_s[:] = jnp.ones((1, kp), U32)
        C_s[:] = jnp.ones((16, 16), I32)

    n = n_ref[0, 0]
    st = (low_s[:], car_s[:], rng_s[:], cache_s[:], csz_s[:])
    C = C_s[:]
    lanes = _lane_iota(kp)
    ev_rows = []

    for j in range(SUB):
        C, q, cums_excl, chunk_cums = _model_tables(C, climit)
        active = (((pid * SUB + j) * k + lanes) < n) & (lanes < k)
        syms = x_ref[j:j + 1, :]        # [1, Kp] i32
        s_hi = syms >> 4
        s_lo = syms & 15
        oh_hi = ((_iota16_col_k(kp) == s_hi) & active).astype(F32)
        oh_lo = (_iota16_col_k(kp) == s_lo).astype(F32)
        row_c = _extract_rows(cums_excl, oh_hi)
        row_q = _extract_rows(q, oh_hi)
        c = _pick(row_c, oh_lo)
        f = _pick(row_q, oh_lo)

        t = st[2] >> QBITS
        is_top = (c + f) == U32(QTOTAL)
        st, evs = rc_common.encode_symbol(st, t, c, f, is_top, active,
                                          N_SLOTS)
        ev_rows.extend([evs[0], evs[1]])
        C = C + _hist16(oh_hi, oh_lo) * I32(inc)

    ev_ref[:] = jnp.concatenate(ev_rows, axis=0)   # [2*SUB, K]
    C_s[:] = C
    low_s[:], car_s[:], rng_s[:], cache_s[:], csz_s[:] = st

    @pl.when(pid == pl.num_programs(0) - 1)
    def _flush():
        fl = rc_common.flush(st)        # [2, 1, kp]
        valid = lanes < k               # padded lanes must flush nothing
        # flush block is (8, kp) for tile alignment; rows 2..7 are zero
        # events (no emission) and dropped by the caller
        fl_ref[:] = jnp.concatenate(
            [jnp.where(valid, fl[0], U32(0)),
             jnp.where(valid, fl[1], U32(0)),
             jnp.zeros((SUB - 2, kp), U32)], axis=0)


@lru_cache(maxsize=64)
def _encode_call(steps: int, k: int, kp: int, inc: int, climit_log2: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kern = partial(_encode_kernel, k=k, kp=kp, inc=inc,
                   climit=1 << climit_log2, steps=steps)
    steps8 = -(-steps // SUB) * SUB

    @jax.jit
    def run(x2d, n):
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
            ],
            out_specs=(
                pl.BlockSpec((2 * SUB, kp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, kp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((2 * steps8, kp), U32),
                jax.ShapeDtypeStruct((8, kp), U32),
            ),
            scratch_shapes=[
                pltpu.VMEM((1, kp), U32),    # low
                pltpu.VMEM((1, kp), U32),    # carry
                pltpu.VMEM((1, kp), U32),    # range
                pltpu.VMEM((1, kp), U32),    # cache
                pltpu.VMEM((1, kp), U32),    # cache_size
                pltpu.VMEM((16, 16), I32),   # C
            ],
            interpret=_INTERPRET,
        )(jnp.asarray(n, I32).reshape(1, 1), xp.astype(I32))
        # keep events TIME-MAJOR [E, K] (pad-step rows dropped: inactive
        # lanes emit nothing; padded lanes k..kp-1 are masked in-kernel and
        # sliced off here); compaction has [E, K]-native twins, saving an
        # 8-byte-per-symbol transpose
        from cpprcoder_tpu.ops import compaction

        events_t = jnp.concatenate([evs[: 2 * steps], fl[:2]])[:, :k]
        _, _, _, lane_sizes, total = compaction.payload_layout_t(events_t)
        return events_t, lane_sizes, total

    return run


def rcq_encode_pallas(data, lanes: int | None = None, inc: int | None = None,
                      climit_log2: int | None = None) -> bytes:
    x = as_u8(data)
    n = len(x)
    k, inc0, cl0 = rcq_params(n, lanes)
    inc = inc if inc is not None else inc0
    climit_log2 = climit_log2 if climit_log2 is not None else cl0
    if n == 0:
        return (ByteWriter().u32(0).u8(_lane_desc(k, False))
                .u8(inc).u8(climit_log2).u8(QBITS).getvalue())
    steps = bucket(-(-n // k))
    fn = _encode_call(steps, k, max(k, MIN_LANES), inc, climit_log2)
    phase1 = lambda x2d: fn(x2d, U32(n))

    def header(wide):
        return (ByteWriter().u32(n).u8(_lane_desc(k, wide))
                .u8(inc).u8(climit_log2).u8(QBITS))

    return _encode_container(x, k, phase1, header, time_major=True)
