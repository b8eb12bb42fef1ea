"""Mesh-sharded CT-RCX: distributed encode AND decode (shard_map).

Same distribution model as sharded_rcq.py — 'data' axis carries independent
superblocks (one model instance each; the production scaling axis), 'lane'
axis shards the K lanes of one block with the CONTEXT model replicated and
per-window histogram updates psum'd over 'lane' (order-independent integer
sum, so containers stay byte-identical with the single-device backends).

CT-RCX specifics:
  - chunked lane layout: lane i owns x[i*stride:(i+1)*stride]; a lane shard
    therefore owns a CONTIGUOUS slab of the input — the natural way to
    shard a byte stream over chips (no interleaving across the wire).
  - the model is C[2^cbits, 256]; the psum'd update is the [B,256] context
    histogram of the window; every shard derives identical quantized rows.
  - each lane's context (its previous symbol) is shard-local state.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cpprcoder_tpu.models.cxmodel import (
    QBITS,
    QTOTAL,
    quantize_rows_jnp,
    rescale_rows_jnp,
)
from cpprcoder_tpu.ops import compaction, rc_common

U32 = jnp.uint32
I32 = jnp.int32

N_SLOTS = 2


def _model_rows(C, climit: int):
    C = rescale_rows_jnp(C, climit)
    q = quantize_rows_jnp(C)
    cums_excl = jnp.cumsum(q, axis=1, dtype=U32) - q
    return C, q, cums_excl


@lru_cache(maxsize=16)
def _sharded_encode_fn(mesh: Mesh, steps: int, k_global: int, inc: int,
                       climit_log2: int, cbits: int):
    """steps = scan length (max block stride); each block carries its own
    stride (ceil(n_b / K)) so every container is format-identical with the
    single-device encoder — including a partial tail block."""
    climit = 1 << climit_log2
    lane_n = mesh.shape["lane"]
    k_local = k_global // lane_n
    assert k_local * lane_n == k_global

    def shard_fn(x3d_local, n_vec, stride_vec):
        lane_ax = jax.lax.axis_index("lane").astype(I32)

        def encode_one(x2d, n, stride):
            st = tuple(jax.lax.pvary(a, ("data", "lane"))
                       for a in rc_common.make_state(k_local))
            lane_ids = lane_ax * k_local + jnp.arange(k_local, dtype=I32)
            C0 = jax.lax.pvary(jnp.ones((1 << cbits, 256), U32), ("data",))
            prev0 = jax.lax.pvary(jnp.zeros(k_local, jnp.uint8),
                                  ("data", "lane"))

            stride = stride.astype(I32)

            def step(carry, xt):
                st, t_idx, C, prev = carry
                C, q, cums_excl = _model_rows(C, climit)
                syms = xt.astype(I32)
                ctx = (prev >> (8 - cbits)).astype(I32) if cbits \
                    else jnp.zeros(k_local, I32)
                active = (t_idx < stride) & \
                    (lane_ids * stride + t_idx < n.astype(I32))
                c = cums_excl[ctx, syms]
                f = q[ctx, syms]
                t = st[2] >> QBITS
                is_top = (c + f) == U32(QTOTAL)
                st2, evs = rc_common.encode_symbol(st, t, c, f, is_top,
                                                   active, N_SLOTS)
                upd = jnp.zeros_like(C).at[ctx, syms].add(
                    jnp.where(active, U32(inc), U32(0)))
                C = C + jax.lax.psum(upd, "lane")
                prev = jnp.where(active, xt, prev)
                return (st2, t_idx + 1, C, prev), evs

            (st, _, _, _), evs = lax.scan(step, (st, I32(0), C0, prev0),
                                          x2d)
            flush_evs = rc_common.flush(st)
            events = jnp.concatenate(
                [jnp.transpose(evs, (2, 0, 1)).reshape(k_local, -1),
                 jnp.transpose(flush_evs, (1, 0))], axis=1)
            _, _, lane_sizes, _, total_b = compaction.lane_layout(events)
            return events, lane_sizes, total_b

        events, lane_sizes, totals = jax.vmap(encode_one)(
            x3d_local, n_vec, stride_vec)
        return events, lane_sizes, totals.sum()[None]

    @jax.jit
    def run(x3d, n_vec, stride_vec):
        events, lane_sizes, shard_totals = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P("data", None, "lane"), P("data"), P("data")),
            out_specs=(P("data", "lane", None), P("data", "lane"),
                       P(("data", "lane"))),
        )(x3d, n_vec, stride_vec)
        offsets = jnp.cumsum(shard_totals) - shard_totals
        return events, lane_sizes, shard_totals, offsets

    return run


@lru_cache(maxsize=16)
def _sharded_decode_fn(mesh: Mesh, steps: int, k_global: int, inc: int,
                       climit_log2: int, cbits: int, l4: int):
    from cpprcoder_tpu.ops.rcq_ops import _row_select

    climit = 1 << climit_log2
    lane_n = mesh.shape["lane"]
    k_local = k_global // lane_n

    def shard_fn(rows3d_local, n_vec, stride_vec):
        lane_ax = jax.lax.axis_index("lane").astype(I32)

        def decode_one(rows_w, n, stride):
            rng = jax.lax.pvary(jnp.full(k_local, 0xFFFFFFFF, U32),
                                ("data", "lane"))
            code = rows_w[:, 0]
            q0 = jnp.zeros_like(code)
            q1 = jnp.zeros_like(code)
            occ = jax.lax.pvary(jnp.zeros(k_local, U32), ("data", "lane"))
            widx = jax.lax.pvary(jnp.ones(k_local, I32), ("data", "lane"))
            lane_ids = lane_ax * k_local + jnp.arange(k_local, dtype=I32)
            C0 = jax.lax.pvary(jnp.ones((1 << cbits, 256), U32), ("data",))
            prev0 = jax.lax.pvary(jnp.zeros(k_local, jnp.uint8),
                                  ("data", "lane"))
            stride = stride.astype(I32)

            def step(carry, _):
                rng, code, q0, q1, occ, widx, t_idx, C, prev = carry
                need = occ < U32(N_SLOTS)
                word = _row_select(rows_w, jnp.where(need, widx, I32(-1)))
                q0 = q0 | jnp.where(occ == 0, word, word >> 8)
                q1 = q1 | jnp.where(occ == 0, U32(0), word << 24)
                occ = jnp.where(need, occ + 4, occ)
                widx = widx + need.astype(I32)

                C, q, cums_excl = _model_rows(C, climit)
                ctx = (prev >> (8 - cbits)).astype(I32) if cbits \
                    else jnp.zeros(k_local, I32)
                active = (t_idx < stride) & \
                    (lane_ids * stride + t_idx < n.astype(I32))
                row_c = cums_excl[ctx]
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
                upd = jnp.zeros_like(C).at[ctx, s].add(
                    jnp.where(active, U32(inc), U32(0)))
                C = C + jax.lax.psum(upd, "lane")
                prev = jnp.where(active, s.astype(jnp.uint8), prev)
                return (rng, code, q0, q1, occ, widx, t_idx + 1, C, prev), \
                    s.astype(jnp.uint8)

            _, out = lax.scan(
                step, (rng, code, q0, q1, occ, widx, I32(0), C0, prev0),
                None, length=steps)
            return out  # [steps, k_local]

        return jax.vmap(decode_one)(rows3d_local, n_vec, stride_vec)

    @jax.jit
    def run(rows3d, n_vec, stride_vec):
        return jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P("data", "lane", None), P("data"), P("data")),
            out_specs=P("data", None, "lane"),
        )(rows3d, n_vec, stride_vec)

    return run


def block_layout(n: int, blocks: int, k_global: int):
    """(n_vec, stride_vec, steps): per-block byte counts and chunk strides
    (stride_b = ceil(n_b / K), a pure function of each block's size — so
    every block's container is byte-identical with the single-device
    encoder, including a partial tail block); steps = max stride (the
    uniform scan length)."""
    per_block = -(-n // blocks)
    n_vec = np.minimum(per_block,
                       np.maximum(n - np.arange(blocks) * per_block, 0)
                       ).astype(np.uint32)
    stride_vec = -(-n_vec.astype(np.int64) // k_global)
    stride_vec = np.maximum(stride_vec, 1).astype(np.int32)
    return n_vec, stride_vec, int(stride_vec.max()), per_block


def sharded_rcx_encode(x: np.ndarray, mesh: Mesh, blocks: int | None = None,
                       k_global: int = 64, inc: int = 16,
                       climit_log2: int = 16, cbits: int = 4):
    """Distributed encode of `blocks` superblocks (a multiple of the mesh's
    'data' extent; >1 per shard exercises the vmap-over-blocks path).

    Returns ((events, lane_sizes, shard_totals, offsets),
             (blocks, n_vec, stride_vec, steps))."""
    blocks = blocks or mesh.shape["data"]
    assert blocks % mesh.shape["data"] == 0
    n = len(x)
    n_vec, stride_vec, steps, per_block = block_layout(n, blocks, k_global)
    padded = np.zeros(blocks * per_block, np.uint8)
    padded[:n] = x
    xb = padded.reshape(blocks, per_block)
    x3d = np.zeros((blocks, steps, k_global), np.uint8)
    for b in range(blocks):
        st = int(stride_vec[b])
        buf = np.zeros(k_global * st, np.uint8)
        buf[: n_vec[b]] = xb[b, : n_vec[b]]
        x3d[b, :st] = buf.reshape(k_global, st).T
    fn = _sharded_encode_fn(mesh, steps, k_global, inc, climit_log2, cbits)
    x3d_dev = jax.device_put(x3d, NamedSharding(mesh, P("data", None,
                                                        "lane")))
    n_dev = jax.device_put(n_vec, NamedSharding(mesh, P("data")))
    st_dev = jax.device_put(stride_vec, NamedSharding(mesh, P("data")))
    return (fn(x3d_dev, n_dev, st_dev),
            (blocks, n_vec, stride_vec, steps))


def sharded_rcx_decode(rows3d: np.ndarray, n_vec: np.ndarray,
                       stride_vec: np.ndarray, mesh: Mesh, steps: int,
                       k_global: int = 64, inc: int = 16,
                       climit_log2: int = 16, cbits: int = 4) -> np.ndarray:
    """Distributed decode twin. rows3d [blocks, k_global, L4] payload word
    rows (ops.rcq_ops._rows_fn per block). Returns [blocks, steps,
    k_global] symbols (chunked layout: byte j of lane i = x[i*stride_b+j],
    rows past each block's stride are garbage)."""
    l4 = rows3d.shape[2]
    fn = _sharded_decode_fn(mesh, steps, k_global, inc, climit_log2,
                            cbits, l4)
    rows_dev = jax.device_put(
        jnp.asarray(rows3d), NamedSharding(mesh, P("data", "lane", None)))
    n_dev = jax.device_put(jnp.asarray(n_vec),
                           NamedSharding(mesh, P("data")))
    st_dev = jax.device_put(jnp.asarray(stride_vec, dtype=jnp.int32),
                            NamedSharding(mesh, P("data")))
    return np.asarray(jax.device_get(fn(rows_dev, n_dev, st_dev)))
