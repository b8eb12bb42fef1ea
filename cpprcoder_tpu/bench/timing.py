"""Truthful device timing on the axon tunnel.

`block_until_ready` on this runtime can return before execution completes
(measured: 100 chained 4096³ matmuls "finish" in 0.2 ms). The only reliable
clock is wall time of run + scalar fetch, with the kernel repeated INSIDE
one jit via lax.fori_loop (loop-carried dependency so nothing is hoisted),
and a two-point slope to cancel dispatch + fetch overhead:

    t_exec = (wall(reps_hi) - wall(reps_lo)) / (reps_hi - reps_lo)

Validated against v5e bf16 peak: 100/400-rep matmul loops give 190 TFLOP/s
(peak ≈ 197)."""

from __future__ import annotations

import time
from functools import lru_cache

import jax
import jax.lax as lax
import jax.numpy as jnp

U32 = jnp.uint32


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


def measure(body_fn, reps_lo: int = 1, reps_hi: int = 2,
            repeats: int = 2) -> float:
    """Seconds per execution of body_fn (device time, overhead-cancelled)."""
    lo = make_loop(body_fn, reps_lo)
    hi = make_loop(body_fn, reps_hi)
    int(lo())  # warm + pay pending sync
    int(hi())
    t_lo = min(_wall(lo) for _ in range(repeats))
    t_hi = min(_wall(hi) for _ in range(repeats))
    return max(t_hi - t_lo, 1e-9) / (reps_hi - reps_lo)


def _wall(fn) -> float:
    t0 = time.perf_counter()
    int(fn())
    return time.perf_counter() - t0
