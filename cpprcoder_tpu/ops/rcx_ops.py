"""JAX (XLA scan) backend for CT-RCX — the context-conditioned quantized
adaptive range coder (format spec: reference/rcx_ref.py; model:
models/cxmodel.py).

Same coder core and container machinery as CT-RCQ (ops/rcq_ops.py), two
differences:

  - CHUNKED lane layout: lane i owns contiguous bytes
    x[i*stride:(i+1)*stride], stride = ceil(n/K) — so each lane's previous
    window symbol is the true previous byte, the order-1 context. stride is
    a pure function of (n, K): containers never depend on step bucketing.
  - model = C[2^cbits, 256] context rows; rescale/quantize vectorized over
    rows; ctx = prev >> (8 - cbits) carried per lane through the scan.

This backend is the readable correctness twin (and the VMEM-cap fallback):
it uses plain XLA gathers/scatters, which serialize on TPU — the fast path
is ops/rcx_pallas.py. Byte-identical containers across oracle/jax/pallas
are asserted in tests/test_rcx.py.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from cpprcoder_tpu.core.bytesutil import ByteReader, ByteWriter, as_u8
from cpprcoder_tpu.models.cxmodel import (
    QBITS,
    QTOTAL,
    quantize_rows_jnp,
    rcx_params,
    rescale_rows_jnp,
)
from cpprcoder_tpu.ops import rc_common
from cpprcoder_tpu.ops.range_ops import _encode_container
from cpprcoder_tpu.ops.rcq_ops import _rows_fn, _row_select
from cpprcoder_tpu.reference.rc_ref import _lane_desc, _parse_lane_desc
from cpprcoder_tpu.utils.shapes import bucket

U32 = jnp.uint32
I32 = jnp.int32

N_SLOTS = 2  # same bound as CT-RCQ: range_new >= t >= 2^(24-QBITS) = 2^9


def _pad2d_chunked(x: np.ndarray, steps: int, k: int,
                   stride: int) -> np.ndarray:
    """x2d [steps, k] with x2d[j, i] = x[i*stride + j] (zero past ends)."""
    buf = np.zeros(k * stride, np.uint8)
    buf[: len(x)] = x
    out = np.zeros((steps, k), np.uint8)
    out[:stride] = buf.reshape(k, stride).T
    return out


# ------------------------------------------------------------------ encode

@lru_cache(maxsize=64)
def _encode_fn(steps: int, k: int, inc: int, climit_log2: int, cbits: int,
               stride: int, wlog: int = 0):
    """v2 window schedule (wlog > 0): the scan runs over WINDOW chunks of
    W = 2^wlog steps; the model requantizes once per chunk (up to 3
    conditional halvings + quantize, models/cxmodel.py) and the W steps
    inside code against the frozen tables while counts keep updating.
    wlog=0 is bit-identical to the round-4 per-step schedule."""
    climit = 1 << climit_log2
    W = 1 << wlog
    steps_w = -(-steps // W) * W

    @jax.jit
    def run(x2d, n):
        st = rc_common.make_state(k)
        lane_ids = jnp.arange(k, dtype=U32)
        C0 = jnp.ones((1 << cbits, 256), U32)
        pad = steps_w - x2d.shape[0]
        xp = jnp.concatenate(
            [x2d, jnp.zeros((pad, k), x2d.dtype)]) if pad else x2d
        xw = xp.reshape(steps_w // W, W, k)

        def window(carry, xchunk):
            st, t_idx, C, prev = carry
            C = rescale_rows_jnp(C, climit)
            q = quantize_rows_jnp(C)
            cums_excl = jnp.cumsum(q, axis=1, dtype=U32) - q
            evs_w = []
            for w in range(W):
                xt = xchunk[w]
                syms = xt.astype(I32)
                ctx = (prev >> (8 - cbits)).astype(I32) if cbits \
                    else jnp.zeros(k, I32)
                active = (t_idx < stride) & (lane_ids * stride + t_idx < n)
                c = cums_excl[ctx, syms]
                f = q[ctx, syms]
                t = st[2] >> QBITS
                is_top = (c + f) == U32(QTOTAL)
                st, evs = rc_common.encode_symbol(st, t, c, f, is_top,
                                                  active, N_SLOTS)
                C = C + jnp.zeros_like(C).at[ctx, syms].add(
                    jnp.where(active, U32(inc), U32(0)))
                prev = jnp.where(active, xt, prev)
                t_idx = t_idx + 1
                evs_w.append(evs)
            return (st, t_idx, C, prev), jnp.stack(evs_w)

        (st, _, _, _), evs = lax.scan(
            window, (st, U32(0), C0, jnp.zeros(k, jnp.uint8)), xw)
        # evs [nw, W, N_SLOTS, k] -> lane-major [k, 2*steps_w], trimmed
        flush_evs = rc_common.flush(st)
        events = jnp.concatenate(
            [jnp.transpose(evs, (3, 0, 1, 2)).reshape(k, -1)[:, :2 * steps],
             jnp.transpose(flush_evs, (1, 0))], axis=1)
        from cpprcoder_tpu.ops import compaction

        _, _, lane_sizes, _, total = compaction.lane_layout(events)
        return events, lane_sizes, total

    return run


def rcx_encode_jax(data, lanes: int | None = None, inc: int | None = None,
                   climit_log2: int | None = None,
                   cbits: int | None = None,
                   wlog: int | None = None) -> bytes:
    from cpprcoder_tpu.models.cxmodel import WLOG_DEFAULT

    x = as_u8(data)
    n = len(x)
    k, inc, climit_log2, cbits = rcx_params(n, lanes, inc, cbits)
    wlog = WLOG_DEFAULT if wlog is None else wlog
    if n == 0:
        return (ByteWriter().u32(0).u8(_lane_desc(k, False))
                .u8(inc).u8(climit_log2).u8(QBITS).u8(cbits).u8(wlog)
                .getvalue())
    stride = -(-n // k)
    steps = bucket(stride)
    fn = _encode_fn(steps, k, inc, climit_log2, cbits, stride, wlog)
    phase1 = lambda x2d: fn(x2d, U32(n))

    def header(wide):
        return (ByteWriter().u32(n).u8(_lane_desc(k, wide))
                .u8(inc).u8(climit_log2).u8(QBITS).u8(cbits).u8(wlog))

    pad = lambda x, steps, k: _pad2d_chunked(x, steps, k, stride)
    return _encode_container(x, k, phase1, header, pad2d=pad)


# ------------------------------------------------------------------ decode

@lru_cache(maxsize=64)
def _decode_fn(steps: int, k: int, inc: int, climit_log2: int, cbits: int,
               stride: int, l4: int, wlog: int = 0):
    climit = 1 << climit_log2
    W = 1 << wlog
    steps_w = -(-steps // W) * W

    @jax.jit
    def run(rows_w, n):
        rng = jnp.full(k, 0xFFFFFFFF, U32)
        code = rows_w[:, 0]
        q0 = jnp.zeros(k, U32)
        q1 = jnp.zeros(k, U32)
        occ = jnp.zeros(k, U32)
        widx = jnp.ones(k, I32)
        lane_ids = jnp.arange(k, dtype=U32)
        C0 = jnp.ones((1 << cbits, 256), U32)

        def window(carry, _):
            rng, code, q0, q1, occ, widx, t_idx, C, prev = carry
            C = rescale_rows_jnp(C, climit)
            q = quantize_rows_jnp(C)
            cums_excl = jnp.cumsum(q, axis=1, dtype=U32) - q
            outs = []
            for _w in range(W):
                need = occ < U32(N_SLOTS)
                word = _row_select(rows_w, jnp.where(need, widx, I32(-1)))
                q0 = q0 | jnp.where(occ == 0, word, word >> 8)
                q1 = q1 | jnp.where(occ == 0, U32(0), word << 24)
                occ = jnp.where(need, occ + 4, occ)
                widx = widx + need.astype(I32)

                ctx = (prev >> (8 - cbits)).astype(I32) if cbits \
                    else jnp.zeros(k, I32)
                active = (t_idx < stride) & (lane_ids * stride + t_idx < n)
                row_c = cums_excl[ctx]                 # [K, 256]
                row_q = q[ctx]
                t = rng >> QBITS
                le = row_c * t[:, None] <= code[:, None]
                s = jnp.sum(le, axis=1).astype(I32) - 1
                c = jnp.take_along_axis(row_c, s[:, None], axis=1)[:, 0]
                f = jnp.take_along_axis(row_q, s[:, None], axis=1)[:, 0]
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
                C = C + jnp.zeros_like(C).at[ctx, s].add(
                    jnp.where(active, U32(inc), U32(0)))
                prev = jnp.where(active, s.astype(jnp.uint8), prev)
                t_idx = t_idx + 1
                outs.append(s.astype(jnp.uint8))
            return (rng, code, q0, q1, occ, widx, t_idx, C, prev), \
                jnp.stack(outs)

        _, out = lax.scan(
            window,
            (rng, code, q0, q1, occ, widx, U32(0), C0,
             jnp.zeros(k, jnp.uint8)),
            None, length=steps_w // W)
        # [nw, W, k] -> [steps, k]; byte j of lane i = x[i*stride + j]
        return out.reshape(steps_w, k)[:steps]

    return run


def _parse_rcx_header(r: ByteReader):
    n = r.u32()
    k, wide = _parse_lane_desc(r.u8())
    inc = r.u8()
    climit_log2 = r.u8()
    qbits = r.u8()
    cbits = r.u8()
    wlog = r.u8()
    from cpprcoder_tpu.core.bytesutil import CorruptContainerError

    if qbits != QBITS:
        raise CorruptContainerError(
            f"container qbits {qbits} != build {QBITS}")
    if cbits > 8:
        raise CorruptContainerError(f"bad cbits {cbits}")
    if wlog > 3:
        raise CorruptContainerError(f"bad wlog {wlog}")
    return n, k, wide, inc, climit_log2, cbits, wlog


def rcx_decode_jax(blob) -> bytes:
    r = ByteReader(blob)
    n, k, wide, inc, climit_log2, cbits, wlog = _parse_rcx_header(r)
    if n == 0:
        return b""
    sizes = (r.u32s(k) if wide else r.u16s(k)).astype(np.int32)
    payload = r.rest()
    if int(sizes.sum()) > len(payload):
        from cpprcoder_tpu.core.bytesutil import CorruptContainerError

        raise CorruptContainerError(
            f"size table claims {int(sizes.sum())} payload bytes, "
            f"container has {len(payload)}")
    from cpprcoder_tpu.utils import profiling

    p_cap = bucket(max(len(payload), 1))
    padded = np.zeros(p_cap, dtype=np.uint8)
    padded[: len(payload)] = payload
    l4 = bucket(-(-int(sizes.max()) // 4) + 1)
    with profiling.phase("dec.rows", len(payload)):
        rows_w = _rows_fn(k, l4, p_cap)(jnp.asarray(padded),
                                        jnp.asarray(sizes))
    stride = -(-n // k)
    steps = bucket(stride)
    with profiling.phase("dec.scan", n):
        out = _decode_fn(steps, k, inc, climit_log2, cbits, stride,
                         l4, wlog)(rows_w, U32(n))
    with profiling.phase("dec.fetch", n):
        arr = np.asarray(jax.device_get(out))       # [steps, k]
        return arr[:stride].T.reshape(-1)[:n].tobytes()
