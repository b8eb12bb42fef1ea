"""Pallas TPU kernel for ragged event→payload expansion (CT containers).

The encode kernels emit a dense time-major event grid [E, K] (packed u32,
ops/rc_common.py); the container wants each lane's ragged byte stream. The
XLA expansion (ops/compaction.materialize_rows_t) runs ~22 roll-based
compare-exchange stages over an HBM-resident [K, R2] u32 grid — ~100 MB of
HBM traffic per stage made it the dominant term of the whole encode path
(round 4: kennedy 253 MB/s full-path vs 1075 MB/s coder-kernel-only).

This kernel runs the SAME bitonic merge-expansion entirely in VMEM: the
grid iterates over 128-lane blocks; each program loads its [E, 128] event
slab once (~0.5 MB), does cumsum → merge → cummax ownership fill →
swap-replay unmerge on a [R2, 128] VMEM tile, and stores [l2, 128] payload
bytes — total HBM traffic is the operands, not stages × operands.

Record scheme (identical to compaction._expand_rows, axis transposed):
  key = pin<<10 | tag; tag 0 = non-contributing event, 1..512 =
  contributing (val9+1; val9 = runflag<<8 | first byte), 1023 = position.
  Layout [events asc | 0xFFFFFFFF pad | positions desc] is bitonic; the
  merge's swap decisions are packed into one u32 bitmask per record and
  replayed backwards to return position records to their slots.

Outputs bytes REVERSED along time ([l2, K] row r = payload byte l2-1-r)
so the kernel avoids an in-VMEM flip; the XLA-side wrapper flips (one
cheap pass) and transposes to the [K, l2] interchange layout of
materialize_rows_t. Byte-identical to the XLA path (tests/test_expand.py).

Reference parity: this materializes the same per-lane streams the
reference writes byte-at-a-time through MemoryStream (cpprcoder.h:764-802
shift_low); cited for format parity only — the algorithm is TPU-native.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.lax as lax
import jax.numpy as jnp

from cpprcoder_tpu.ops.rc_common import EV_RUN_MASK

U32 = jnp.uint32
I32 = jnp.int32

LB = 128            # lanes per program (one full VPU lane tile)
R2_MAX = 4096       # VMEM budget: ~5 live [R2, LB] u32 tiles ≈ 10 MB
_INTERPRET = False


def _ceil_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def _kernel(ev_ref, md_ref, out_ref, sz_ref, *, ep: int, l2: int, r2: int):
    from jax.experimental.pallas import tpu as pltpu

    def roll0(x, s):
        n = x.shape[0]
        s %= n
        return pltpu.roll(x, s, axis=0) if s else x

    ev = ev_ref[:]                                     # [Ep, LB] u32
    md = md_ref[:]                                     # [1, LB] i32
    emit = (ev >> 31) > 0
    first = (ev >> 23) & U32(0xFF)
    run_is0 = ((ev >> 22) & 1) > 0
    run_byte = jnp.where(run_is0, U32(0x00), U32(0xFF))
    run_len = (ev & U32(EV_RUN_MASK)).astype(I32)
    cnt = jnp.where(emit, 1 + run_len, 0)              # [Ep, LB] i32

    # inclusive per-lane cumsum along time (Hillis–Steele in VMEM)
    iota_e = lax.broadcasted_iota(I32, (ep, LB), 0)
    cum = cnt
    d = 1
    while d < ep:
        cum = cum + jnp.where(iota_e >= d, roll0(cum, d), 0)
        d *= 2

    prior = cum - cnt
    first_emit = emit & (prior == 0)
    dropped = first_emit & (md > 0)                    # md broadcasts [1,LB]
    pcnt = cnt - dropped.astype(I32)
    # inclusive cumsum of `dropped` = "lane has emitted at or before e"
    dcum = ((cum > 0) & (md > 0)).astype(I32)
    pin = cum - dcum - pcnt                            # exclusive start
    lane_sizes = cum[ep - 1:ep, :] - dcum[ep - 1:ep, :]  # [1, LB]

    first_eff = jnp.where(dropped, run_byte, first)
    val9 = first_eff | (run_is0.astype(U32) << 8)
    contrib = pcnt > 0
    ev_keys = (pin.astype(U32) << 10) | jnp.where(contrib, val9 + 1, U32(0))

    pad_rows = r2 - ep - l2
    iota_r = lax.broadcasted_iota(I32, (r2, LB), 0)
    pos_rev = ((U32(l2 - 1) - lax.broadcasted_iota(
        U32, (l2, LB), 0)) << 10) | U32(1023)
    arr = jnp.concatenate(
        [ev_keys, jnp.full((pad_rows, LB), 0xFFFFFFFF, U32), pos_rev],
        axis=0)

    # bitonic merge (ascending), packing swap decisions into msk bits
    msk = jnp.zeros((r2, LB), U32)
    stages = []
    d = r2 // 2
    b = 0
    while d >= 1:
        up = roll0(arr, -d)
        dn = roll0(arr, d)
        lower = (iota_r & d) == 0
        sw_low = lower & (arr > up)
        sw32 = sw_low.astype(U32)            # Mosaic can't rotate i1 data
        arr = jnp.where(lower, jnp.where(sw_low, up, arr),
                        jnp.where(roll0(sw32, d) > 0, dn, arr))
        msk = msk | (sw32 << b)
        stages.append((b, d))
        d //= 2
        b += 1

    tag = arr & U32(1023)
    is_contrib = (tag >= 1) & (tag <= 512)
    # cummax in i32 (Mosaic has no maxui): contributing keys are
    # pin<<10|1..512 < 2^31 (pin < 2^21 per-lane capacity), pads excluded
    fill_i = jnp.where(is_contrib, arr.astype(I32), 0)
    d = 1
    while d < r2:
        fill_i = jnp.maximum(fill_i,
                             jnp.where(iota_r >= d, roll0(fill_i, d), 0))
        d *= 2
    fill = fill_i.astype(U32)

    p = arr >> 10
    v9 = (fill & U32(1023)) - 1
    byte = jnp.where(p == (fill >> 10), v9 & U32(0xFF),
                     jnp.where((v9 >> 8) & 1 > 0, U32(0x00), U32(0xFF)))
    byte = jnp.where(p < lane_sizes.astype(U32), byte, U32(0))

    vals = jnp.where(tag == U32(1023), byte, U32(0))
    for b, d in reversed(stages):
        sw32 = (msk >> b) & 1
        up = roll0(vals, -d)
        dn = roll0(vals, d)
        lower = (iota_r & d) == 0
        vals = jnp.where(lower, jnp.where(sw32 > 0, up, vals),
                         jnp.where(roll0(sw32, d) > 0, dn, vals))

    out_ref[:] = vals[r2 - l2:].astype(I32)            # REVERSED rows
    sz_ref[:] = jnp.concatenate(
        [lane_sizes, jnp.zeros((7, LB), I32)], axis=0)


@lru_cache(maxsize=64)
def _expand_call(ep: int, kp: int, l2: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r2 = _ceil_pow2(ep + l2)
    kern = partial(_kernel, ep=ep, l2=l2, r2=r2)

    @jax.jit
    def run(events_p, md_row):
        rev, sz = pl.pallas_call(
            kern,
            grid=(kp // LB,),
            in_specs=[
                pl.BlockSpec((ep, LB), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LB), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((l2, LB), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, LB), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((l2, kp), I32),
                jax.ShapeDtypeStruct((8, kp), I32),
            ),
            interpret=_INTERPRET,
        )(events_p, md_row)
        rows = jnp.flip(rev, axis=0).astype(jnp.uint8).T   # [Kp, l2]
        return rows, sz[0]

    return run


def supported(e: int, l2: int) -> bool:
    ep = -(-e // 8) * 8
    return _ceil_pow2(ep + l2) <= R2_MAX and l2 % 8 == 0


def usable(e: int, l2: int) -> bool:
    """supported() AND a platform this kernel can actually run on (real
    TPU, or interpret mode under the CPU test harness)."""
    if not supported(e, l2):
        return False
    if _INTERPRET:
        return True
    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False


def materialize_rows_pallas(events_t, l2: int, may_drop=True):
    """Drop-in twin of compaction.materialize_rows_t (same returns:
    rows [K, l2] u8, lane_sizes [K] i32), VMEM-resident expansion.

    may_drop: True, or a [K] bool array for resumable continuation chunks.
    Caller must check supported(E, l2) (VMEM capacity) first."""
    e, k = events_t.shape
    ep = -(-e // 8) * 8
    kp = -(-k // LB) * LB
    assert supported(e, l2), (e, l2)
    events_p = events_t
    if ep > e or kp > k:
        events_p = jnp.pad(events_t, ((0, ep - e), (0, kp - k)))
    if may_drop is True:
        md = jnp.ones((1, kp), I32)
    else:
        md = jnp.pad(jnp.asarray(may_drop, I32)[None, :],
                     ((0, 0), (0, kp - k)))
    rows, sizes = _expand_call(ep, kp, l2)(events_p, md)
    return rows[:k], sizes[:k]
