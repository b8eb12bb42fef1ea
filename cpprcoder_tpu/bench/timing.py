"""Truthful device timing on the axon tunnel.

Two tunnel pathologies shape this module (both re-verified this round):

1. `block_until_ready` can return before device execution completes
   (measured: 20 chained 4096^3 matmuls "finish" in 1.2 ms; the real wall
   arrives with the next scalar fetch).
2. The first device->host fetch after device writes pays a sync that scales
   with the bytes written on device (~MB/s through the tunnel), so any
   timed region must keep per-rep written bytes tiny.

Protocol: the kernel is repeated INSIDE one jit, each repetition carrying a
data dependency on the previous checksum (nothing hoisted or elided); the
only output is one u32 scalar. Wall time = run + scalar fetch; a constant
~25 ms dispatch+fetch overhead with ~±1-3 ms jitter rides on every wall.
Cost per rep is the two-point slope between a low and a high rep count,
which cancels that constant:

    t_exec = (wall(reps_hi) - wall(reps_lo)) / (reps_hi - reps_lo)

Reliability rules (round-1 emitted a 152 TB/s decode figure by clamping a
noise-dominated 1-vs-2-rep slope to 1e-9 s; VERDICT.md "What's weak" #2):

- rep counts are sized from a quick single-rep estimate so the hi-lo wall
  gap is well above jitter (>= TARGET_GAP), costing exactly two compiles
  per body (compiles through the tunnel are ~20-40 s, so no rep ladder);
- walls are min-of-`repeats` (jitter is one-sided);
- the slope is re-measured; estimates must agree within `tol` (a third
  tie-breaker run may arbitrate). Disagreement returns NaN, never a clamp;
- non-positive gaps return NaN (callers must surface the failure).
"""

from __future__ import annotations

import math
import time

import jax
import jax.numpy as jnp

U32 = jnp.uint32

TARGET_GAP = 0.060      # desired (wall_hi - wall_lo), seconds
OVERHEAD_EST = 0.022    # typical constant dispatch+fetch wall, seconds
MAX_REPS = 256


def make_loop(body_fn, reps: int):
    """body_fn(perturb_u8_scalar) -> u32 checksum; returns jitted runner.

    The repetitions are UNROLLED (a fori_loop around large scan kernels
    crashes this TPU worker); each repetition depends on the previous
    checksum so nothing is hoisted or elided."""

    @jax.jit
    def run():
        acc = U32(0)
        for _ in range(reps):
            acc = acc + body_fn((acc & 1).astype(jnp.uint8))
        return acc

    return run


def _wall(fn) -> float:
    t0 = time.perf_counter()
    int(fn())
    return time.perf_counter() - t0


def _min_wall(fn, repeats: int) -> float:
    return min(_wall(fn) for _ in range(repeats))


def quantize_reps(r: int) -> int:
    """Round a rep count up to a power of two. Every distinct unrolled rep
    count is a distinct XLA program (20-40 s compile through the tunnel);
    quantizing makes estimate-sized rep counts stable across runs so the
    persistent compilation cache (utils/cache.py) hits."""
    return 1 << max(0, (r - 1).bit_length())


def pick_reps(single_wall: float) -> tuple[int, int]:
    """(reps_lo, reps_hi) so the wall gap is ~TARGET_GAP."""
    per_rep = max(single_wall - OVERHEAD_EST, 5e-4)
    d = max(2, min(MAX_REPS, math.ceil(TARGET_GAP / per_rep)))
    return 1, 1 + quantize_reps(d)


def measure(body_fn, reps_lo: int | None = None, reps_hi: int | None = None,
            repeats: int = 4, tol: float = 0.15) -> float:
    """Seconds per execution of body_fn (device time, overhead-cancelled).

    Returns NaN when no stable positive slope can be obtained; callers MUST
    propagate the failure (a NaN throughput row) rather than report it."""
    lo = make_loop(body_fn, reps_lo or 1)
    int(lo())  # compile + pay any pending tunnel sync
    if reps_lo is None or reps_hi is None:
        reps_lo, reps_hi = pick_reps(_min_wall(lo, 2))
        if reps_lo != 1:
            lo = make_loop(body_fn, reps_lo)
            int(lo())
    hi = make_loop(body_fn, reps_hi)
    int(hi())
    d = reps_hi - reps_lo

    def slope() -> float:
        return (_min_wall(hi, repeats) - _min_wall(lo, repeats)) / d

    estimates = [slope(), slope()]
    for _ in range(2):  # up to two tie-breakers
        lo_e, hi_e = min(estimates[-2:]), max(estimates[-2:])
        if lo_e > 0 and hi_e - lo_e <= tol * lo_e:
            return (lo_e + hi_e) / 2
        estimates.append(slope())
    positives = sorted(e for e in estimates if e > 0)
    if len(positives) >= 3:
        mid = positives[len(positives) // 2]
        near = [e for e in positives if abs(e - mid) <= tol * mid]
        if len(near) >= 3:
            return sum(near) / len(near)
    return float("nan")


def throughput_mbps(nbytes: int, seconds: float) -> float:
    """MB/s with NaN propagation (NaN seconds -> NaN MB/s)."""
    if not (seconds and seconds > 0) or math.isnan(seconds):
        return float("nan")
    return nbytes / seconds / 1e6
