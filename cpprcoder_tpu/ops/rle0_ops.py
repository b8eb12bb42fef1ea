"""JAX zero-run-length transform: CT-RLE0 (see reference/rle0_ref.py for
the format spec and FORMATS.md).

Unlike the reference library's sequential transforms, both directions are
single-pass data-parallel:

encode: a zero run's digit count and digits depend only on the run length,
which is (next-nonzero-index - position) at each run start — a reverse
cumulative minimum. Output offsets are an exclusive cumsum of per-position
token counts; tokens are scattered once ('drop' mode for masked slots).

decode: every output byte is either a literal or zero. Zeros need no
writes at all — the output starts zeroed, so decode is: compute each
literal's output offset (run groups contribute sum_j (1+d_j)<<j via an
in-group index from a cummax over group starts) and scatter the literals.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cpprcoder_tpu.core.bytesutil import ByteReader, ByteWriter, as_u8

I32 = jnp.int32

_MAXBITS = 30  # run lengths < 2^30 (1 GiB of zeros per run)


def _bitlen_minus1(v):
    """floor(log2(v)) for v >= 1, vectorized (i32)."""
    m = jnp.zeros_like(v)
    for j in range(1, _MAXBITS + 1):
        m = m + (v >= (1 << j)).astype(v.dtype)
    return m


def rle0_encode_jax(data) -> bytes:
    x_host = as_u8(data)
    n = len(x_host)
    w = ByteWriter().u32(n)
    if n == 0:
        return w.getvalue()
    x = jnp.asarray(x_host).astype(I32)
    idx = jnp.arange(n, dtype=I32)
    z = x == 0
    start = z & ~jnp.concatenate([jnp.zeros(1, bool), z[:-1]])
    # distance to next nonzero = run length at starts
    nz_idx = jnp.where(~z, idx, n)
    next_nz = jax.lax.cummin(nz_idx, reverse=True)
    run_len = next_nz - idx  # valid at run starts
    m = _bitlen_minus1(run_len + 1)  # digit count
    contrib = jnp.where(
        z, jnp.where(start, m, 0), jnp.where(x <= 253, 1, 2))
    off = jnp.cumsum(contrib) - contrib
    total = off[-1] + contrib[-1]
    # scatter literals
    big = jnp.iinfo(jnp.int32).max  # drop sentinel
    lit1 = (~z) & (x <= 253)
    esc = (~z) & (x >= 254)
    out = jnp.zeros(n * 2, jnp.uint8)  # encodeBound = 2n
    out = out.at[jnp.where(lit1, off, big)].set(
        (x + 1).astype(jnp.uint8), mode="drop")
    out = out.at[jnp.where(esc, off, big)].set(jnp.uint8(255), mode="drop")
    out = out.at[jnp.where(esc, off + 1, big)].set(
        (x - 254).astype(jnp.uint8), mode="drop")
    # scatter run digits, one masked scatter per bit level
    lp1 = run_len + 1
    for j in range(_MAXBITS):
        sel = start & (m > j)
        if j >= 1:  # cheap static shortcut: max run <= n
            if (1 << j) > n:
                break
        dig = ((lp1 >> j) & 1).astype(jnp.uint8)
        out = out.at[jnp.where(sel, off + j, big)].set(dig, mode="drop")
    total_i = int(total)
    w.raw(np.asarray(jax.device_get(out[:total_i])).tobytes())
    return w.getvalue()


def rle0_decode_jax(blob) -> bytes:
    r = ByteReader(blob)
    n = r.u32()
    y_host = r.rest()
    if n == 0:
        return b""
    t = len(y_host)
    y = jnp.asarray(np.asarray(y_host)).astype(I32)
    idx = jnp.arange(t, dtype=I32)
    esc = y == 255
    consumed = jnp.concatenate([jnp.zeros(1, bool), esc[:-1]])
    digit = (y <= 1) & ~consumed
    grp_start = digit & ~jnp.concatenate([jnp.zeros(1, bool), digit[:-1]])
    last_start = jax.lax.cummax(jnp.where(grp_start, idx, -1))
    j = idx - last_start  # in-group digit index (valid where digit)
    contrib = jnp.where(
        digit, (1 + y) << jnp.minimum(j, _MAXBITS),
        jnp.where(consumed, 0, 1))
    off = jnp.cumsum(contrib) - contrib
    lit = ~digit & ~consumed & ~esc
    out = jnp.zeros(n, jnp.uint8)
    big = jnp.iinfo(jnp.int32).max
    out = out.at[jnp.where(lit, off, big)].set(
        (y - 1).astype(jnp.uint8), mode="drop")
    nxt = jnp.concatenate([y[1:], jnp.zeros(1, I32)])
    out = out.at[jnp.where(esc, off, big)].set(
        (254 + nxt).astype(jnp.uint8), mode="drop")
    total = int(off[-1] + contrib[-1])
    if total != n:
        raise ValueError(f"CT-RLE0: decoded {total} bytes, expected {n}")
    return np.asarray(jax.device_get(out)).tobytes()
