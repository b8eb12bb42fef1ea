"""Ragged byte-stream compaction for event-based coder output.

Events (see ops.rc_common for the packed u32 layout) are produced densely at
[K, E]; each emitting event contributes `1 + run_len` bytes (a "first" byte
followed by run_len identical run bytes). Per lane, events tile the lane's
byte stream contiguously, lanes tile the payload in order, and the first
emitted byte of every lane (the dummy) is dropped (FORMATS.md).

Materialization is scatter-free (XLA TPU scatters serialize): every output
byte position finds its owning event with one vectorized binary search over
the event start offsets — the SURVEY.md §7 'ragged compaction' pattern.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cpprcoder_tpu.ops.rc_common import EV_RUN_MASK

U32 = jnp.uint32
I32 = jnp.int32


def event_fields(events):
    emit = (events >> 31) > 0
    first = ((events >> 23) & U32(0xFF)).astype(jnp.uint8)
    run_byte = jnp.where((events >> 22) & 1, jnp.uint8(0x00), jnp.uint8(0xFF))
    run_len = (events & U32(EV_RUN_MASK)).astype(I32)
    return emit, first, run_byte, run_len


def payload_layout(events):
    """events [K, E] → (pcnt, pstart, dropped, lane_sizes, total).

    pcnt: payload bytes per event (dummy byte removed from each lane's first
    emitting event); pstart: exclusive cumsum over the flattened (lane-major)
    event grid — i.e. each event's start offset in the final payload."""
    emit, _, _, run_len = event_fields(events)
    cnt = jnp.where(emit, 1 + run_len, 0).astype(I32)
    cum_lane = jnp.cumsum(cnt, axis=1)
    # the lane's first emitting event is the one with zero emitted before it
    prior = cum_lane - cnt
    dropped = emit & (prior == 0)
    pcnt = cnt - dropped.astype(I32)
    flat = pcnt.reshape(-1)
    cum = jnp.cumsum(flat)
    pstart = (cum - flat)
    lane_sizes = jnp.maximum(cum_lane[:, -1] - 1, 0)
    total = cum[-1]
    return pcnt.reshape(-1), pstart, dropped.reshape(-1), lane_sizes, total


def materialize(events, out_cap: int):
    """Build the concatenated payload (static size out_cap ≥ total).

    Returns (payload u8 [out_cap], lane_sizes i32 [K]).

    Sort-based expansion (measured on v5e: lax.sort of 2M pairs ~1 ms vs
    165 ms for a 1M-query searchsorted and ~7 ns/element for gathers — so
    the expansion uses two sorts + a cummax and NO gathers):

      1. merge-sort event-start records (key 2*pstart) with output-position
         records (key 2*p+1): each position lands right after its owning
         event (the last emitting event with pstart <= p);
      2. forward-fill the owner along the sorted order with one cummax of
         (sorted_index << 10 | event bits) — monotone by construction;
      3. each position's byte = owner's first byte if the position record
         directly follows its event record (and the event's dummy byte is
         not dropped), else the owner's run byte;
      4. a second sort by position extracts the payload in order.

    Capacity: sorted_index needs R = K*E + out_cap <= 2^22 records (the
    10-bit payload leaves 22 index bits); larger jobs fall back to the
    searchsorted path (superblock framing keeps real containers below the
    bound)."""
    M = events.size
    if M + out_cap > (1 << 22):
        return _materialize_searchsorted(events, out_cap)
    emit, first, run_byte, _ = event_fields(events)
    pcnt, pstart, dropped, lane_sizes, total = payload_layout(events)
    BIG = jnp.uint32(0xFFFFFFFF)
    ev_keys = jnp.where(pcnt > 0, pstart.astype(U32) * 2, BIG)
    ev_vals = (first.reshape(-1).astype(U32)
               | (run_byte.reshape(-1) == 0).astype(U32) << 8
               | dropped.astype(U32) << 9)
    positions = jnp.arange(out_cap, dtype=U32)
    keys = jnp.concatenate([ev_keys, positions * 2 + 1])
    # one combined payload: event bits (10) | is_event flag (bit 10)
    vals = jnp.concatenate([ev_vals | U32(1 << 10), jnp.zeros(out_cap, U32)])
    skeys, svals = jax.lax.sort((keys, vals), num_keys=1)
    sev = (svals >> 10) & 1
    r = M + out_cap
    iota = jnp.arange(r, dtype=U32)
    fill = jax.lax.cummax(
        jnp.where(sev == 1, (iota << 10) | (svals & U32(0x3FF)), U32(0)))
    bits = fill & U32(0x3FF)
    after_ev = jnp.concatenate([jnp.zeros(1, U32), sev[:-1]]) == 1
    first_b = bits & U32(0xFF)
    run_b = jnp.where((bits >> 8) & 1, U32(0x00), U32(0xFF))
    use_first = after_ev & (((bits >> 9) & 1) == 0)
    byte = jnp.where(use_first, first_b, run_b)
    # second sort: positions (key p) to the front in order, events to tail
    key2 = jnp.where(sev == 0, skeys >> 1, BIG)
    _, byte2 = jax.lax.sort((key2, byte), num_keys=1)
    out = jnp.where(positions < total.astype(U32), byte2[:out_cap], 0)
    return out.astype(jnp.uint8), lane_sizes


def _materialize_searchsorted(events, out_cap: int):
    """Original gather-based expansion (fallback above the sort-capacity
    bound; also the readable spec the sort path is tested against)."""
    emit, first, run_byte, _ = event_fields(events)
    pcnt, pstart, dropped, lane_sizes, total = payload_layout(events)
    # event start positions: non-contributing events share the next event's
    # start; searchsorted(side='right')-1 then picks the last (the owner).
    positions = jnp.arange(out_cap, dtype=I32)
    eid = jnp.searchsorted(pstart, positions, side="right") - 1
    eid = jnp.clip(eid, 0)
    is_first_byte = (positions == pstart[eid]) & ~dropped[eid]
    byte = jnp.where(is_first_byte, first.reshape(-1)[eid],
                     run_byte.reshape(-1)[eid])
    byte = jnp.where(positions < total, byte, 0)
    return byte, lane_sizes


def lane_layout(events):
    """Back-compat summary: (None, None, lane_sizes, lane_offsets, total)."""
    _, _, _, lane_sizes, total = payload_layout(events)
    lane_offsets = jnp.cumsum(lane_sizes) - lane_sizes
    return None, None, lane_sizes, lane_offsets, total


# ----------------------------------------------------- transposed variants
#
# The Pallas encode kernels naturally produce events time-major ([E, K]);
# these twins consume that layout directly, saving an 8-byte-per-symbol
# device transpose. Record ORDER inside the sort is irrelevant (the sort
# re-orders anyway) — only the pstart VALUES must reflect the lane-major
# payload layout, which the column-wise cumsums below compute.

def payload_layout_t(events_t, may_drop=True):
    """events_t [E, K] -> (pcnt [E,K], pstart [E,K], dropped [E,K],
    lane_sizes [K], total).

    may_drop: True (one-shot encode: each lane's first emitting event
    loses its dummy byte), or a [K] bool mask for CONTINUATION chunks of a
    resumable encode — only lanes that have NEVER emitted in an earlier
    chunk may still drop (codecs/resume.py)."""
    emit, _, _, run_len = event_fields(events_t)
    cnt = jnp.where(emit, 1 + run_len, 0).astype(I32)
    cum_lane = jnp.cumsum(cnt, axis=0)              # per-lane inclusive
    prior = cum_lane - cnt
    first_emit = emit & (prior == 0)
    if isinstance(may_drop, bool):
        dropped = first_emit if may_drop else jnp.zeros_like(emit)
    else:
        dropped = first_emit & may_drop[None, :]
    pcnt = cnt - dropped.astype(I32)
    pin_lane = jnp.cumsum(pcnt, axis=0) - pcnt      # exclusive, per lane
    lane_sizes = cum_lane[-1, :] - dropped.sum(axis=0, dtype=I32)
    lane_offsets = jnp.cumsum(lane_sizes) - lane_sizes
    pstart = pin_lane + lane_offsets[None, :]
    total = lane_sizes.sum()
    return pcnt, pstart, dropped, lane_sizes, total


def materialize_t(events_t, out_cap: int, may_drop=True):
    """materialize() twin for time-major [E, K] event grids."""
    M = events_t.size
    if M + out_cap > (1 << 22) and may_drop is True:
        return _materialize_searchsorted(events_t.T, out_cap)
    emit, first, run_byte, _ = event_fields(events_t)
    pcnt, pstart, dropped, lane_sizes, total = payload_layout_t(
        events_t, may_drop)
    BIG = jnp.uint32(0xFFFFFFFF)
    ev_keys = jnp.where(pcnt.reshape(-1) > 0,
                        pstart.reshape(-1).astype(U32) * 2, BIG)
    ev_vals = (first.reshape(-1).astype(U32)
               | (run_byte.reshape(-1) == 0).astype(U32) << 8
               | dropped.reshape(-1).astype(U32) << 9)
    positions = jnp.arange(out_cap, dtype=U32)
    keys = jnp.concatenate([ev_keys, positions * 2 + 1])
    vals = jnp.concatenate([ev_vals | U32(1 << 10), jnp.zeros(out_cap, U32)])
    skeys, svals = jax.lax.sort((keys, vals), num_keys=1)
    sev = (svals >> 10) & 1
    iota = jnp.arange(M + out_cap, dtype=U32)
    fill = jax.lax.cummax(
        jnp.where(sev == 1, (iota << 10) | (svals & U32(0x3FF)), U32(0)))
    bits = fill & U32(0x3FF)
    after_ev = jnp.concatenate([jnp.zeros(1, U32), sev[:-1]]) == 1
    first_b = bits & U32(0xFF)
    run_b = jnp.where((bits >> 8) & 1, U32(0x00), U32(0xFF))
    use_first = after_ev & (((bits >> 9) & 1) == 0)
    byte = jnp.where(use_first, first_b, run_b)
    key2 = jnp.where(sev == 0, skeys >> 1, BIG)
    _, byte2 = jax.lax.sort((key2, byte), num_keys=1)
    out = jnp.where(positions < total.astype(U32), byte2[:out_cap], 0)
    return out.astype(jnp.uint8), lane_sizes
