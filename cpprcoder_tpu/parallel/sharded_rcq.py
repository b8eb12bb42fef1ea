"""Mesh-sharded CT-RCQ: distributed encode AND decode (shard_map).

Distribution model (BASELINE.json north star; the TPU generalization of the
reference's only parallelism seeds — independent blocks, blksort.h:432-442,
and interleaved coder states, cppans.h:585-597):

  - 'data' axis: independent superblocks (one model instance each).
  - 'lane' axis: the K lanes of a block are sharded; the quantized model's
    COUNTS are replicated and the per-window histogram update is `psum`'d
    over 'lane' — an order-independent integer sum, so every shard derives
    the same quantized table and encoder/decoder stay bit-identical with
    the single-device backend (tests/test_sharded_rcq.py proves container
    byte-equality).
  - decode twin: each lane shard reads ITS lanes' payload word-rows
    ([k_local, L4], a clean 'lane' sharding of the decode input) and psums
    the decoded-symbol histogram — the mesh decode path VERDICT.md round 1
    flagged as missing.
  - assembly: per-shard compressed sizes are exclusively scanned so each
    shard knows its container offset (size-scan + slice assembly).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cpprcoder_tpu.models.qmodel import QBITS, QTOTAL, QRESERVE
from cpprcoder_tpu.ops import compaction, rc_common
from cpprcoder_tpu.ops.lookup import coder_step_lookups2, hist_from_onehots

U32 = jnp.uint32
I32 = jnp.int32

N_SLOTS = 2


def _quantize_shared(C):
    """quantize_jnp twin on a replicated counts vector (runs identically on
    every shard — all inputs are replicated)."""
    tot = jnp.sum(C, dtype=U32)
    q = jnp.maximum((C * U32(QTOTAL - QRESERVE)) // tot, 1)
    rem = U32(QTOTAL) - jnp.sum(q, dtype=U32)
    onehot = (jnp.arange(256, dtype=I32)
              == jnp.argmax(q).astype(I32)).astype(U32)
    return q + rem * onehot


def _model_step_shared(C, climit: int):
    C = jnp.where(jnp.sum(C, dtype=U32) >= U32(climit), (C >> 1) | 1, C)
    q = _quantize_shared(C)
    return C, q, jnp.cumsum(q)


@lru_cache(maxsize=16)
def _sharded_encode_fn(mesh: Mesh, steps: int, k_global: int, inc: int,
                       climit_log2: int):
    climit = 1 << climit_log2
    lane_n = mesh.shape["lane"]
    k_local = k_global // lane_n
    assert k_local * lane_n == k_global

    def shard_fn(x3d_local, n_vec):
        lane_ax = jax.lax.axis_index("lane").astype(U32)

        def encode_one(x2d, n):
            st = tuple(jax.lax.pvary(a, ("data", "lane"))
                       for a in rc_common.make_state(k_local))
            lane_ids = lane_ax * k_local + jnp.arange(k_local, dtype=U32)
            C0 = jax.lax.pvary(jnp.ones(256, U32), ("data",))

            def step(carry, xt):
                st, t_idx, C = carry
                C, q, cum_incl = _model_step_shared(C, climit)
                syms = xt.astype(I32)
                active = (t_idx * k_global + lane_ids) < n
                f, c, upd = coder_step_lookups2(q, cum_incl, syms, active,
                                                inc)
                t = st[2] >> QBITS
                is_top = (c + f) == U32(QTOTAL)
                st2, evs = rc_common.encode_symbol(st, t, c, f, is_top,
                                                   active, N_SLOTS)
                C = C + jax.lax.psum(upd, "lane")
                return (st2, t_idx + 1, C), evs

            (st, _, _), evs = lax.scan(step, (st, U32(0), C0), x2d)
            flush_evs = rc_common.flush(st)
            events = jnp.concatenate(
                [jnp.transpose(evs, (2, 0, 1)).reshape(k_local, -1),
                 jnp.transpose(flush_evs, (1, 0))], axis=1)
            _, _, lane_sizes, _, total_b = compaction.lane_layout(events)
            return events, lane_sizes, total_b

        events, lane_sizes, totals = jax.vmap(encode_one)(
            x3d_local, n_vec)
        return events, lane_sizes, totals.sum()[None]

    @jax.jit
    def run(x3d, n_vec):
        events, lane_sizes, shard_totals = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P("data", None, "lane"), P("data")),
            out_specs=(P("data", "lane", None), P("data", "lane"),
                       P(("data", "lane"))),
        )(x3d, n_vec)
        offsets = jnp.cumsum(shard_totals) - shard_totals
        return events, lane_sizes, shard_totals, offsets

    return run


@lru_cache(maxsize=16)
def _sharded_decode_fn(mesh: Mesh, steps: int, k_global: int, inc: int,
                       climit_log2: int, l4: int):
    """Mesh decode twin: lane-sharded word-rows in, lane-sharded symbols
    out, model replicated with psum'd updates."""
    from cpprcoder_tpu.ops.lookup import find_symbol2
    from cpprcoder_tpu.ops.rcq_ops import _row_select

    climit = 1 << climit_log2
    lane_n = mesh.shape["lane"]
    k_local = k_global // lane_n

    def shard_fn(rows3d_local, n_vec):
        lane_ax = jax.lax.axis_index("lane").astype(U32)

        def decode_one(rows_w, n):
            rng = jax.lax.pvary(jnp.full(k_local, 0xFFFFFFFF, U32),
                                ("data", "lane"))
            code = rows_w[:, 0]
            q0 = jnp.zeros_like(code)
            q1 = jnp.zeros_like(code)
            occ = jax.lax.pvary(jnp.zeros(k_local, U32), ("data", "lane"))
            widx = jax.lax.pvary(jnp.ones(k_local, I32), ("data", "lane"))
            lane_ids = lane_ax * k_local + jnp.arange(k_local, dtype=U32)
            C0 = jax.lax.pvary(jnp.ones(256, U32), ("data",))

            def step(carry, _):
                rng, code, q0, q1, occ, widx, t_idx, C = carry
                need = occ < U32(N_SLOTS)
                word = _row_select(rows_w, jnp.where(need, widx, I32(-1)))
                q0 = q0 | jnp.where(occ == 0, word, word >> 8)
                q1 = q1 | jnp.where(occ == 0, U32(0), word << 24)
                occ = jnp.where(need, occ + 4, occ)
                widx = widx + need.astype(I32)

                C, q, cum_incl = _model_step_shared(C, climit)
                active = (t_idx * k_global + lane_ids) < n
                t = rng >> QBITS
                # product search: s = max{s : cums_excl[s]*t <= code}
                cums_excl = cum_incl - q
                chunk = cums_excl[0::16]
                le_hi = chunk[None, :] * t[:, None] <= code[:, None]
                s_hi = jnp.sum(le_hi, axis=1).astype(I32) - 1
                from cpprcoder_tpu.ops.lookup import _dot_h, _iota16

                mask = active[:, None]
                oh_hi = ((s_hi[:, None] == _iota16()[None, :]) & mask
                         ).astype(jnp.float32)
                row_c = _dot_h(oh_hi, cums_excl.reshape(16, 16)
                               .astype(jnp.float32))
                row_q = _dot_h(oh_hi, q.reshape(16, 16).astype(jnp.float32))
                le_lo = row_c.astype(U32) * t[:, None] <= code[:, None]
                s_lo = jnp.sum(le_lo, axis=1).astype(I32) - 1
                oh_lo = (s_lo[:, None] == _iota16()[None, :]
                         ).astype(jnp.float32)
                c = jnp.sum(row_c * oh_lo, axis=1).astype(U32)
                f = jnp.sum(row_q * oh_lo, axis=1).astype(U32)
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
                upd = hist_from_onehots(oh_hi, oh_lo, inc)
                C = C + jax.lax.psum(upd, "lane")
                return (rng, code, q0, q1, occ, widx, t_idx + 1, C), \
                    s.astype(jnp.uint8)

            _, out = lax.scan(
                step, (rng, code, q0, q1, occ, widx, U32(0), C0),
                None, length=steps)
            return out  # [steps, k_local]

        return jax.vmap(decode_one)(rows3d_local, n_vec)

    @jax.jit
    def run(rows3d, n_vec):
        return jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P("data", "lane", None), P("data")),
            out_specs=P("data", None, "lane"),
        )(rows3d, n_vec)

    return run


def sharded_rcq_encode(x: np.ndarray, mesh: Mesh, k_global: int = 16,
                       inc: int = 24, climit_log2: int = 16):
    """Distributed encode of mesh.shape['data'] superblocks.

    Returns ((events, lane_sizes, shard_totals, offsets), (blocks, steps,
    per_block))."""
    blocks = mesh.shape["data"]
    n = len(x)
    per_block = -(-n // blocks)
    steps = -(-per_block // k_global)
    padded = np.zeros(blocks * per_block, np.uint8)
    padded[:n] = x
    x3d = np.zeros((blocks, steps * k_global), np.uint8)
    x3d[:, :per_block] = padded.reshape(blocks, per_block)
    x3d = x3d.reshape(blocks, steps, k_global)
    n_vec = np.minimum(per_block,
                       np.maximum(n - np.arange(blocks) * per_block, 0)
                       ).astype(np.uint32)
    fn = _sharded_encode_fn(mesh, steps, k_global, inc, climit_log2)
    x3d_dev = jax.device_put(x3d, NamedSharding(mesh, P("data", None, "lane")))
    n_dev = jax.device_put(n_vec, NamedSharding(mesh, P("data")))
    return fn(x3d_dev, n_dev), (blocks, steps, per_block)


def sharded_rcq_decode(rows3d: np.ndarray, n_vec: np.ndarray, mesh: Mesh,
                       steps: int, k_global: int = 16, inc: int = 24,
                       climit_log2: int = 16) -> np.ndarray:
    """Distributed decode: rows3d [blocks, k_global, L4] per-lane payload
    word rows (build with ops.rcq_ops._rows_fn per block), n_vec true byte
    counts. Returns [blocks, steps, k_global] decoded symbols."""
    l4 = rows3d.shape[2]
    fn = _sharded_decode_fn(mesh, steps, k_global, inc, climit_log2, l4)
    rows_dev = jax.device_put(
        jnp.asarray(rows3d), NamedSharding(mesh, P("data", "lane", None)))
    n_dev = jax.device_put(jnp.asarray(n_vec),
                           NamedSharding(mesh, P("data")))
    return np.asarray(jax.device_get(fn(rows_dev, n_dev)))
