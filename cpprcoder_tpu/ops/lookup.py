"""Gather-free table lookups.

Measured on this TPU: per-element dynamic gather inside a scan costs
~8-16 ns (135 µs/step for two 8192-lane lookups from a 256-entry table),
~100× the cost of the surrounding arithmetic. Every in-scan table access is
therefore reformulated as one-hot algebra on the VPU/MXU:

  - bulk_lookup256: lookup for a whole [n] symbol array via chunked one-hot
    f32 matmuls (values must fit f32 exactly, < 2^24 — all CT tables do)
  - find_symbol: decode-side symbol search: given per-lane targets v and an
    inclusive cumulative table [256], one [K,256] compare yields the symbol
    (count of cum ≤ v), its base cum (masked max) and freq (masked min)
  - onehot_lookup: in-scan per-lane lookup from an evolving [256] table
    (adaptive model) via compare + masked reduce
  - histogram256: batched histogram via compare + sum (the adaptive model's
    batched update without scatter-add)
"""

from __future__ import annotations

import jax.numpy as jnp

U32 = jnp.uint32
I32 = jnp.int32
F32 = jnp.float32

def _iota256():
    return jnp.arange(256, dtype=I32)


def bulk_lookup256(tables_u32, syms_u8, chunk: int = 1 << 15):
    """tables_u32 [256, M] (values < 2^24), syms_u8 [n] → [n, M] u32.

    Chunked one-hot f32 matmul: ~n·256·M MACs on the MXU instead of n·M
    serialized gathers."""
    import jax.lax as lax

    n = syms_u8.shape[0]
    m = tables_u32.shape[1]
    tf = tables_u32.astype(F32)
    pad = (-n) % chunk
    syms = jnp.concatenate([syms_u8.reshape(-1),
                            jnp.zeros(pad, jnp.uint8)]) if pad else syms_u8
    syms = syms.reshape(-1, chunk)

    def one(carry, row):
        oh = (row.astype(I32)[:, None] == _iota256()[None, :]).astype(F32)
        # HIGHEST precision is required: the TPU MXU's default f32 matmul
        # truncates inputs to bf16 (8-bit mantissa), silently rounding table
        # values ≥ 2^8 — bf16x3 passes keep integers < 2^24 exact
        return carry, jnp.dot(oh, tf, preferred_element_type=F32,
                              precision=lax.Precision.HIGHEST)

    _, out = lax.scan(one, 0, syms)
    return out.reshape(-1, m)[:n].astype(U32)


def find_symbol(cum_incl_u32, v_u32):
    """cum_incl [256] u32 (inclusive cumsum, total = cum_incl[255]),
    v [K] u32 → (sym i32, cum_lo u32, freq u32).

    sym = #{j : cum_incl[j] ≤ v}; cum_lo = max masked; freq = boundary diff.
    Works for evolving tables too (no precomputation)."""
    le = cum_incl_u32[None, :] <= v_u32[:, None]          # [K, 256]
    sym = jnp.sum(le, axis=1).astype(I32)
    cum_lo = jnp.max(jnp.where(le, cum_incl_u32[None, :], U32(0)), axis=1)
    hi = jnp.min(jnp.where(le, U32(0xFFFFFFFF), cum_incl_u32[None, :]), axis=1)
    return sym, cum_lo, hi - cum_lo


def onehot_lookup(table_u32, syms_i32):
    """table [256] u32, syms [K] i32 → [K] u32 via compare + masked reduce."""
    eq = syms_i32[:, None] == _iota256()[None, :]
    return jnp.max(jnp.where(eq, table_u32[None, :], U32(0)), axis=1)


def find_symbol_of(freqs_u32, cum_incl_u32, syms_i32):
    """Encoder-side lookup: (freq[s], cum_excl[s]) via one compare."""
    eq = syms_i32[:, None] == _iota256()[None, :]
    f = jnp.max(jnp.where(eq, freqs_u32[None, :], U32(0)), axis=1)
    ci = jnp.max(jnp.where(eq, cum_incl_u32[None, :], U32(0)), axis=1)
    return f, ci - f


def onehot_lookup2(table_a, table_b, syms_i32):
    """Two lookups sharing one compare."""
    eq = syms_i32[:, None] == _iota256()[None, :]
    a = jnp.max(jnp.where(eq, table_a[None, :], U32(0)), axis=1)
    b = jnp.max(jnp.where(eq, table_b[None, :], U32(0)), axis=1)
    return a, b


def histogram256(syms_i32, weight: int, active):
    """Batched histogram: Σ over lanes of onehot(sym)·weight, masked.

    syms [K] i32, active [K] bool → [256] u32."""
    eq = (syms_i32[:, None] == _iota256()[None, :]) & active[:, None]
    return eq.sum(axis=0).astype(U32) * U32(weight)
