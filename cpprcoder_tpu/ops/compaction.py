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

    Returns (payload u8 [out_cap], lane_sizes i32 [K])."""
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
