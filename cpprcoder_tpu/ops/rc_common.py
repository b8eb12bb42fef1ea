"""Vectorized K-lane range-coder primitives (JAX).

The byte-wise sequential coder of the reference (cpprcoder.h:400-436 HOT
loop) becomes a lane-vectorized step function: all K lanes carry
(low, carry, range, cache, cache_size) as u32 vectors, renormalization is
unrolled to a static number of conditional shift_low slots, and each
shift_low emits a packed u32 *event* instead of bytes:

    bit 31     emit flag
    bits 30:23 first emitted byte (cache + carry)
    bit 22     carry flag (run bytes are (0xFF+carry)&0xFF → 0x00 if set)
    bits 21:0  run length (cache_size - 1 trailing run bytes)

Events are later compacted into contiguous per-lane payloads by
`ops.compaction`. This keeps the scan body free of scatters: the only
data-dependent writes happen once, at compaction time.
"""

from __future__ import annotations

import jax.numpy as jnp

from cpprcoder_tpu.config import RC_TOP

U32 = jnp.uint32

EV_RUN_BITS = 22
EV_RUN_MASK = (1 << EV_RUN_BITS) - 1


def make_state(k: int):
    """(low, carry, range, cache, cache_size) vectors for K lanes."""
    return (
        jnp.zeros(k, U32),                    # low
        jnp.zeros(k, U32),                    # carry (bit 32 of low)
        jnp.full(k, 0xFFFFFFFF, U32),         # range
        jnp.zeros(k, U32),                    # cache
        jnp.ones(k, U32),                     # cache_size (incl. dummy byte)
    )


def _shift_low(st):
    """One vectorized shift_low; returns (state, packed event u32)."""
    low, carry, rng, cache, csize = st
    cond = (low < U32(0xFF000000)) | (carry > 0)
    first = (cache + carry) & U32(0xFF)
    ev = (
        (U32(1) << 31)
        | (first << 23)
        | ((carry & U32(1)) << 22)
        | ((csize - 1) & U32(EV_RUN_MASK))
    )
    ev = jnp.where(cond, ev, U32(0))
    cache = jnp.where(cond, low >> 24, cache)
    csize = jnp.where(cond, U32(0), csize) + 1
    carry = jnp.where(cond, U32(0), carry)
    low = low << 8
    return (low, carry, rng, cache, csize), ev


def encode_symbol(st, t, cum, freq, is_top, active, n_slots: int):
    """Encode one symbol per lane. t/cum/freq are u32 [K]; is_top/active bool [K].

    Returns (state, events [n_slots, K] u32)."""
    low, carry, rng, cache, csize = st
    add = t * cum
    new_low = low + add
    carry2 = carry | (new_low < low).astype(U32)
    new_rng = jnp.where(is_top, rng - add, t * freq)
    cur = (new_low, carry2, new_rng, cache, csize)
    evs = []
    for _ in range(n_slots):
        do = cur[2] < U32(RC_TOP)
        shifted, ev = _shift_low(cur)
        nxt = (
            jnp.where(do, shifted[0], cur[0]),
            jnp.where(do, shifted[1], cur[1]),
            jnp.where(do, shifted[2] << 8, cur[2]),
            jnp.where(do, shifted[3], cur[3]),
            jnp.where(do, shifted[4], cur[4]),
        )
        cur = nxt
        evs.append(jnp.where(do, ev, U32(0)))
    # inactive lanes keep their previous state and emit nothing
    out_st = tuple(jnp.where(active, c, s) for c, s in zip(cur, st))
    events = jnp.stack([jnp.where(active, e, U32(0)) for e in evs])
    return out_st, events


def flush(st):
    """Terminate all lanes: round the code value up to a multiple of 2^24
    (valid since range ≥ 2^24) and run shift_low twice. Returns events [2, K]."""
    low, carry, rng, cache, csize = st
    delta = (U32(0) - low) & U32(0xFFFFFF)
    new_low = low + delta
    carry = carry | (new_low < low).astype(U32)
    st = (new_low, carry, rng, cache, csize)
    st, ev1 = _shift_low(st)
    st, ev2 = _shift_low(st)
    return jnp.stack([ev1, ev2])
