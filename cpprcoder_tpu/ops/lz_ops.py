"""JAX SLZ4 (CT-LZ4) — parallel LZ77 over independent segments.

TPU design (SURVEY.md §7 phase 5), replacing the reference's sequential
single-probe hash scan (test/slz4.h:204-234,462-510):

  encode, all batched over [n_segments, S]:
    1. rank doubling to level 12 (lax.sort, num_keys=2) → exact substring
       ids R_r for lengths 2^r ≤ LCP_CAP
    2. exact nearest-previous-occurrence candidates via one stable sort of
       (R_2, position) — no hash collisions, unlike the reference dict
    3. LCP by descending-level rank comparisons (2 gathers per level)
    4. greedy parse = pointer-doubling trajectory of next(i) = i + step(i)
    5. match-token extraction by one more sort; byte serialization via the
       scatter-free searchsorted-ownership pass (ops.compaction pattern)

  decode:
    pass 1: token-structure walk (lax.scan over tokens; ≤1 u8 gather per
       lane per ext byte via an inner while_loop)
    pass 2: fully parallel byte materialization — literal bytes gather from
       the compressed stream; match chains resolve by pointer doubling on
       src(p) = p - offset(p) (log2(S) gather rounds), the encode-time-
       independent parallel LZ decode.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from cpprcoder_tpu.core.bytesutil import ByteReader, ByteWriter, as_u8
from cpprcoder_tpu.reference.slz4_ref import (
    END_LITERALS,
    LAST_MATCH_GUARD,
    LCP_CAP,
    MAX_DISTANCE,
    MIN_MATCH,
)

I32 = jnp.int32
LCP_LEVELS = LCP_CAP.bit_length() - 1  # 12: ranks for lengths 1..4096


def _build_ranks(blocks, lens):
    """blocks [nseg, S] u8, lens [nseg] i32 → list of rank arrays R_r
    (r = 0..LCP_LEVELS), each [nseg, S] i32; pad positions get unique ids."""
    nseg, s = blocks.shape
    pos = jnp.broadcast_to(jnp.arange(s, dtype=I32), (nseg, s))
    rank = jnp.where(pos < lens[:, None], blocks.astype(I32), 256 + pos)
    idx = pos
    ranks = [rank]
    for r in range(LCP_LEVELS):
        h = 1 << r
        key2 = jnp.concatenate(
            [rank[:, h:], jnp.full((nseg, h), -1, I32)], axis=1)
        r1, r2, perm = lax.sort((rank, key2, idx), num_keys=2, is_stable=True)
        diff = jnp.concatenate(
            [jnp.zeros((nseg, 1), I32),
             ((r1[:, 1:] != r1[:, :-1]) | (r2[:, 1:] != r2[:, :-1])
              ).astype(I32)], axis=1)
        new_sorted = jnp.cumsum(diff, axis=1)
        _, rank = lax.sort((perm, new_sorted), num_keys=1, is_stable=True)
        ranks.append(rank)
    return ranks


def _candidates(r2, idx):
    """Nearest previous position with identical 4-byte string (-1 if none)."""
    nseg, s = r2.shape
    k_sorted, p_sorted = lax.sort((r2, idx), num_keys=1, is_stable=True)
    prev = jnp.concatenate([jnp.full((nseg, 1), -1, I32), p_sorted[:, :-1]],
                           axis=1)
    same = jnp.concatenate(
        [jnp.zeros((nseg, 1), jnp.bool_), k_sorted[:, 1:] == k_sorted[:, :-1]],
        axis=1)
    cand_sorted = jnp.where(same, prev, -1)
    _, cand = lax.sort((p_sorted, cand_sorted), num_keys=1, is_stable=True)
    return cand


def _lcp(ranks, cand, lens):
    """Common-prefix length of suffixes i and cand(i), capped at LCP_CAP."""
    nseg, s = cand.shape
    pos = jnp.broadcast_to(jnp.arange(s, dtype=I32), (nseg, s))
    l = jnp.zeros((nseg, s), I32)
    c = jnp.clip(cand, 0)
    for r in range(LCP_LEVELS, -1, -1):
        span = 1 << r
        ia = jnp.minimum(pos + l, s - 1)
        ca = jnp.minimum(c + l, s - 1)
        ra = jnp.take_along_axis(ranks[r], ia, axis=1)
        rb = jnp.take_along_axis(ranks[r], ca, axis=1)
        ok = ((cand >= 0) & (pos + l + span <= lens[:, None])
              & (l + span <= LCP_CAP) & (ra == rb))
        l = jnp.where(ok, l + span, l)
    return l


@lru_cache(maxsize=16)
def _parse_fn(nseg: int, s: int, t_cap: int, lazy: bool = True):
    log_s = max(1, (s - 1).bit_length())

    @jax.jit
    def run(blocks, lens):
        pos = jnp.broadcast_to(jnp.arange(s, dtype=I32), (nseg, s))
        ranks = _build_ranks(blocks, lens)
        cand = _candidates(ranks[2], pos)
        lcp = _lcp(ranks, cand, lens)
        ll = lens[:, None]
        valid = ((cand >= 0) & (pos - cand <= MAX_DISTANCE)
                 & (lcp >= MIN_MATCH) & (pos <= ll - LAST_MATCH_GUARD))
        mlen = jnp.minimum(lcp, ll - END_LITERALS - pos)
        if lazy:
            # 1-step lazy: defer when the next position matches longer
            # (position-local rule — identical in the oracle parse)
            nxt_valid = jnp.concatenate(
                [valid[:, 1:], jnp.zeros((nseg, 1), jnp.bool_)], axis=1)
            nxt_mlen = jnp.concatenate(
                [mlen[:, 1:], jnp.zeros((nseg, 1), I32)], axis=1)
            valid = valid & ~(nxt_valid & (nxt_mlen > mlen))
        step = jnp.where(valid, mlen, 1)
        nxt = jnp.minimum(pos + step, s)

        # greedy trajectory: traj[t] = next^t(0), saturating at s
        traj = jnp.full((nseg, s), s, I32)
        traj = lax.dynamic_update_slice(traj, jnp.zeros((nseg, 1), I32), (0, 0))
        p = nxt
        filled = 1
        while filled < s:
            m = min(filled, s - filled)
            cur = lax.dynamic_slice(traj, (0, 0), (nseg, m))
            ext = jnp.take_along_axis(p, jnp.minimum(cur, s - 1), axis=1)
            ext = jnp.where(cur >= s, s, ext)
            traj = lax.dynamic_update_slice(traj, ext, (0, filled))
            filled *= 2
            if filled < s:
                p = jnp.where(
                    p >= s, s,
                    jnp.take_along_axis(p, jnp.minimum(p, s - 1), axis=1))

        # traj is nondecreasing → membership via per-segment binary search
        reach = jax.vmap(
            lambda tr, q: tr[jnp.clip(jnp.searchsorted(tr, q), 0, s - 1)] == q
        )(traj, pos)
        is_match = reach & valid & (pos < ll)
        # compact match positions: sort (key: pos if match else s)
        mkey = jnp.where(is_match, pos, s)
        mpos_all = lax.sort(mkey, dimension=1)
        mpos = mpos_all[:, :t_cap]
        has = mpos < s
        mp = jnp.minimum(mpos, s - 1)
        m_len = jnp.where(has, jnp.take_along_axis(mlen, mp, axis=1), 0)
        m_off = jnp.where(has, jnp.take_along_axis(pos - cand, mp, axis=1), 0)
        prev_end = jnp.concatenate(
            [jnp.zeros((nseg, 1), I32),
             (mpos + m_len)[:, :-1]], axis=1)
        lit_start = jnp.where(has, prev_end, 0)
        n_match = has.sum(axis=1)
        return mpos, m_len, m_off, lit_start, n_match

    return run


def _ext_len(v):
    """Number of 255-continuation bytes for a length field ≥ 15."""
    return jnp.where(v < 15, 0, (v - 15) // 255 + 1)


@lru_cache(maxsize=16)
def _serialize_fn(nseg: int, s: int, t_cap: int, out_cap: int):
    @jax.jit
    def run(blocks, lens, mpos, m_len, m_off, lit_start, n_match):
        tokens = t_cap + 1  # +1 final literal-only token per segment
        tix = jnp.broadcast_to(jnp.arange(tokens, dtype=I32), (nseg, tokens))
        is_real = tix < n_match[:, None]
        is_final = tix == n_match[:, None]
        last_end = jnp.where(
            n_match > 0,
            jnp.take_along_axis(mpos + m_len,
                                jnp.clip(n_match - 1, 0)[:, None],
                                axis=1)[:, 0],
            0)

        def fld(a, fill):
            out = jnp.concatenate([a, jnp.zeros((nseg, 1), I32)], axis=1)
            return jnp.where(is_real, out[:, :tokens], fill)

        t_lit_start = jnp.where(is_final, last_end[:, None],
                                fld(lit_start, 0))
        t_lit_len = jnp.where(
            is_final, (lens - last_end)[:, None],
            fld(mpos - lit_start, 0))
        t_mlen = jnp.where(is_final, 0, fld(m_len, 0))
        t_off = jnp.where(is_final, 0, fld(m_off, 0))
        active = is_real | is_final

        el = _ext_len(t_lit_len)
        em = jnp.where(t_mlen > 0, _ext_len(t_mlen - MIN_MATCH), 0)
        t_size = jnp.where(
            active,
            1 + el + t_lit_len + jnp.where(t_mlen > 0, 2 + em, 0),
            0)
        flat_size = t_size.reshape(-1)
        cum = jnp.cumsum(flat_size)
        t_start = (cum - flat_size)
        seg_sizes = t_size.sum(axis=1)
        total = cum[-1]

        # ownership pass over output bytes
        q = jnp.arange(out_cap, dtype=I32)
        eid = jnp.clip(jnp.searchsorted(t_start, q, side="right") - 1, 0)
        u = q - t_start[eid]
        seg_of = eid // tokens
        lsf = t_lit_start.reshape(-1)[eid]
        llf = t_lit_len.reshape(-1)[eid]
        mlf = t_mlen.reshape(-1)[eid]
        off = t_off.reshape(-1)[eid]
        elf = _ext_len(llf)
        emv = jnp.maximum(mlf - MIN_MATCH, 0)
        # token byte
        tok = (jnp.minimum(llf, 15) << 4) | jnp.where(
            mlf > 0, jnp.minimum(emv, 15), 0)
        # literal-extension bytes: index e in [0, elf)
        e_idx = u - 1
        lit_rem = llf - 15
        lext = jnp.where(e_idx < lit_rem // 255, 255, lit_rem % 255)
        # literal data
        d_idx = u - 1 - elf
        lit_byte = blocks.reshape(-1)[
            jnp.clip(seg_of * s + lsf + d_idx, 0, nseg * s - 1)].astype(I32)
        # offset bytes
        o_idx = u - 1 - elf - llf
        off_byte = jnp.where(o_idx == 0, off & 0xFF, off >> 8)
        # match-extension bytes
        x_idx = o_idx - 2
        m_rem = emv - 15
        mext = jnp.where(x_idx < m_rem // 255, 255, m_rem % 255)

        val = jnp.where(
            u == 0, tok,
            jnp.where(u < 1 + elf, lext,
                      jnp.where(u < 1 + elf + llf, lit_byte,
                                jnp.where(o_idx < 2, off_byte, mext))))
        payload = jnp.where(q < total, val, 0).astype(jnp.uint8)
        return payload, seg_sizes, total

    return run


@lru_cache(maxsize=16)
def _walk_fn(nseg: int, t_cap: int, c_cap: int):
    """Decode pass 1: extract token records from compressed blocks."""

    @jax.jit
    def run(comp, bases, ends):
        # comp: [c_cap] u8 (all segment blocks concatenated, padded)
        def read(cur):
            return comp[jnp.minimum(cur, c_cap - 1)].astype(I32)

        def parse_ext(cur, base_val, need):
            # LZ4 255-continuation; returns (value, new cur)
            def cond(st):
                cur, val, more = st
                return more.any()

            def body(st):
                cur, val, more = st
                b = read(cur)
                cur2 = jnp.where(more, cur + 1, cur)
                val2 = jnp.where(more, val + b, val)
                more2 = more & (b == 255)
                return cur2, val2, more2

            cur, val, _ = lax.while_loop(
                cond, body, (cur, base_val, need))
            return val, cur

        def step(carry, _):
            cur, out_pos, done = carry
            tok = read(cur)
            cur1 = cur + 1
            lit = tok >> 4
            lit, cur1 = parse_ext(cur1, lit, ~done & (lit == 15))
            lit_src = cur1
            cur2 = cur1 + lit
            has_match = ~done & (cur2 < ends)
            lo = read(cur2)
            hi = read(cur2 + 1)
            off = jnp.where(has_match, lo | (hi << 8), 0)
            cur3 = jnp.where(has_match, cur2 + 2, cur2)
            mlen = tok & 0xF
            mlen, cur3 = parse_ext(cur3, mlen, has_match & (mlen == 15))
            mlen = jnp.where(has_match, mlen + MIN_MATCH, 0)
            rec = (jnp.where(done, 0, lit_src), jnp.where(done, 0, lit),
                   out_pos, mlen, off)
            out_pos = out_pos + jnp.where(done, 0, lit + mlen)
            done = done | (cur3 >= ends)
            return (cur3, out_pos, done), rec

        init = (bases, jnp.zeros(nseg, I32), bases >= ends)
        (_, out_pos, _), recs = lax.scan(step, init, None, length=t_cap)
        return recs  # tuple of [t_cap, nseg]

    return run


@lru_cache(maxsize=16)
def _resolve_fn(nseg: int, s: int, t_cap: int):
    """Decode pass 2: parallel byte materialization."""
    log_s = max(1, (s - 1).bit_length())

    @jax.jit
    def run(comp_pad, recs, lens):
        lit_src, lit_len, out_start, mlen, off = [r.T for r in recs]  # [nseg, t_cap]
        # per output byte: owning token via per-segment searchsorted
        pos = jnp.broadcast_to(jnp.arange(s, dtype=I32), (nseg, s))
        # zero-extent records only occur at the tail (start == decoded length
        # > every queried q), so plain right-search ownership is correct
        tid = jax.vmap(
            lambda starts, q: jnp.searchsorted(starts, q, side="right") - 1
        )(out_start, pos)
        tid = jnp.clip(tid, 0)
        g = lambda a: jnp.take_along_axis(a, tid, axis=1)
        o_start = g(out_start)
        o_lit = g(lit_len)
        o_src = g(lit_src)
        o_off = g(off)
        in_lit = pos < o_start + o_lit
        src = jnp.where(in_lit, -(o_src + (pos - o_start)) - 1, pos - o_off)
        for _ in range(log_s):
            resolved = src < 0
            nxt = jnp.take_along_axis(src, jnp.clip(src, 0), axis=1)
            src = jnp.where(resolved, src, nxt)
        byte = comp_pad[jnp.clip(-src - 1, 0)]
        return byte

    return run


# ------------------------------------------------------------------ wrappers

def _t_cap(s: int) -> int:
    return s // 4 + 2


def slz4_encode_jax(data, seg_log2: int = 17, lazy: bool = True) -> bytes:
    x = as_u8(data)
    n = len(x)
    s = 1 << seg_log2
    w = ByteWriter().u32(n).u8(seg_log2)
    n_segs = -(-n // s) if n else 0
    w.u32(n_segs)
    if n_segs == 0:
        return w.getvalue()
    blocks = np.zeros((n_segs, s), np.uint8)
    blocks.reshape(-1)[:n] = x
    lens = np.minimum(s, n - np.arange(n_segs) * s).astype(np.int32)
    t_cap = _t_cap(s)
    parse = _parse_fn(n_segs, s, t_cap, lazy)
    mpos, m_len, m_off, lit_start, n_match = parse(
        jnp.asarray(blocks), jnp.asarray(lens))
    out_cap = n_segs * s + (n_segs * s) // 200 + 64 * n_segs + 1024
    ser = _serialize_fn(n_segs, s, t_cap, out_cap)
    payload, seg_sizes, total = ser(
        jnp.asarray(blocks), jnp.asarray(lens),
        mpos, m_len, m_off, lit_start, n_match)
    sizes = np.asarray(jax.device_get(seg_sizes))
    total = int(total)
    w.u32s(sizes)
    w.raw(np.asarray(jax.device_get(payload))[:total].tobytes())
    return w.getvalue()


def slz4_decode_jax(blob) -> bytes:
    r = ByteReader(blob)
    n = r.u32()
    seg_log2 = r.u8()
    s = 1 << seg_log2
    n_segs = r.u32()
    if n_segs == 0:
        return b""
    sizes = r.u32s(n_segs).astype(np.int64)
    comp = r.rest()
    c_cap = int(sizes.sum()) + 16
    comp_pad = np.zeros(c_cap, np.uint8)
    comp_pad[: sizes.sum()] = comp[: sizes.sum()]
    bases = np.concatenate(([0], np.cumsum(sizes)))[:-1].astype(np.int32)
    ends = (bases + sizes).astype(np.int32)
    lens = np.minimum(s, n - np.arange(n_segs) * s).astype(np.int32)
    t_cap = _t_cap(s)
    comp_dev = jnp.asarray(comp_pad)
    recs = _walk_fn(n_segs, t_cap, c_cap)(
        comp_dev, jnp.asarray(bases), jnp.asarray(ends))
    out = _resolve_fn(n_segs, s, t_cap)(comp_dev, recs, jnp.asarray(lens))
    return np.asarray(jax.device_get(out)).reshape(-1)[: n].tobytes()
