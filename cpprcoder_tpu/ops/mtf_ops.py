"""JAX move-to-front transform: CT-MTF1.

Blocks of 2^15 bytes are the parallel unit (batched over blocks); within a
block a lax.scan carries the 256-entry recency table per block. The table
permutation update is a masked roll (no scatters). Mirrors both plain MTF
and the reference's MTF-1 variant (see reference/mtf_ref.py docstring).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from cpprcoder_tpu.core.bytesutil import ByteReader, ByteWriter, as_u8
from cpprcoder_tpu.reference.mtf_ref import MTF_BLOCK

I32 = jnp.int32


def _update_table(table, sym, r, prev, mtf1: bool):
    """table [nb,256] i32; sym, r, prev [nb] i32 → new table."""
    pos = jnp.arange(256, dtype=I32)[None, :]
    rolled = jnp.roll(table, 1, axis=1)
    r_ = r[:, None]
    if not mtf1:
        move = (r_ > 0)
        new = jnp.where(move & (pos >= 1) & (pos <= r_), rolled, table)
        new = jnp.where(move & (pos == 0), sym[:, None], new)
        return new
    case_swap = ((r == 1) & (prev != 0))[:, None]
    case_move1 = (r_ > 1)
    swapped = jnp.concatenate(
        [table[:, 1:2], table[:, 0:1], table[:, 2:]], axis=1)
    new = jnp.where(case_move1 & (pos >= 2) & (pos <= r_), rolled, table)
    new = jnp.where(case_move1 & (pos == 1), sym[:, None], new)
    new = jnp.where(case_swap, swapped, new)
    return new


@lru_cache(maxsize=16)
def _encode_fn(nb: int, b: int, mtf1: bool):
    @jax.jit
    def run(blocks):  # [nb, b] u8
        table0 = jnp.broadcast_to(jnp.arange(256, dtype=I32), (nb, 256))

        def step(carry, xt):  # xt [nb]
            table, prev = carry
            sym = xt.astype(I32)
            r = jnp.argmax(table == sym[:, None], axis=1).astype(I32)
            table = _update_table(table, sym, r, prev, mtf1)
            return (table, r), r.astype(jnp.uint8)

        (_, _), out = lax.scan(step, (table0, jnp.ones(nb, I32)), blocks.T)
        return out.T

    return run


@lru_cache(maxsize=16)
def _decode_fn(nb: int, b: int, mtf1: bool):
    @jax.jit
    def run(ranks):  # [nb, b] u8
        table0 = jnp.broadcast_to(jnp.arange(256, dtype=I32), (nb, 256))

        def step(carry, rt):
            table, prev = carry
            r = rt.astype(I32)
            # gather-free rank pick: one-hot over 256 positions
            pos_eq = r[:, None] == jnp.arange(256, dtype=I32)[None, :]
            sym = jnp.max(jnp.where(pos_eq, table, 0), axis=1)
            table = _update_table(table, sym, r, prev, mtf1)
            return (table, r), sym.astype(jnp.uint8)

        (_, _), out = lax.scan(step, (table0, jnp.ones(nb, I32)), ranks.T)
        return out.T

    return run


def _pad_blocks(x: np.ndarray, b: int) -> np.ndarray:
    nb = -(-len(x) // b)
    out = np.zeros(nb * b, np.uint8)
    out[: len(x)] = x
    return out.reshape(nb, b)


def mtf_encode_jax(data, mtf1: bool = False) -> bytes:
    x = as_u8(data)
    n = len(x)
    w = ByteWriter().u32(n).u8(1 if mtf1 else 0)
    if n:
        blocks = _pad_blocks(x, MTF_BLOCK)
        out = _encode_fn(blocks.shape[0], MTF_BLOCK, mtf1)(jnp.asarray(blocks))
        w.raw(np.asarray(jax.device_get(out)).reshape(-1)[:n].tobytes())
    return w.getvalue()


def mtf_decode_jax(blob) -> bytes:
    r = ByteReader(blob)
    n = r.u32()
    mtf1 = bool(r.u8())
    if n == 0:
        return b""
    blocks = _pad_blocks(r.raw(n), MTF_BLOCK)
    out = _decode_fn(blocks.shape[0], MTF_BLOCK, mtf1)(jnp.asarray(blocks))
    return np.asarray(jax.device_get(out)).reshape(-1)[:n].tobytes()
