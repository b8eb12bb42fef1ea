"""Device benches for the remaining BASELINE configs (VERDICT round-1 #5):

  Config 1  static range coder   -> bench.device.RCJob ("static")
  Config 2  adaptive coders      -> bench.device.RCQJob (driver bench.py)
  Config 3  rANS                 -> RANSJob below
  Config 3b canonical Huffman    -> HUFFJob below
  Config 4  BWT pipeline core    -> BWTJob below (forward + inverse)
  Config 5  SLZ4                 -> SLZ4Job below

All jobs use the tunnel-safe protocol of bench.device (in-jit reps,
slope timing, on-device verification). Run:

    python -m cpprcoder_tpu.bench.allconfigs [files...]

writes ALLCONFIGS.json and prints one JSON row per (codec, file).
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from cpprcoder_tpu.bench.device import _equal_count
from cpprcoder_tpu.bench.timing import (
    OVERHEAD_EST, _min_wall, make_loop, measure, quantize_reps)
from cpprcoder_tpu.utils.shapes import bucket

U32 = jnp.uint32
I32 = jnp.int32


def _auto_measure(body):
    from cpprcoder_tpu.bench.device import _retry_nan

    def once():
        one = make_loop(body, 1)
        int(one())
        est = max(_min_wall(one, 2) - OVERHEAD_EST, 3e-4)
        # unroll cap 8: sort/scan-heavy bodies (bwt, pipeline, o1, ase)
        # produce multi-minute XLA compiles at 32 unrolled reps
        hi = quantize_reps(max(4, min(8, int(0.04 / est) + 1)))
        return measure(body, 1, hi, repeats=5)

    return _retry_nan(once)


class RANSJob:
    """Config 3: K-lane interleaved rANS (ops/rans_ops.py)."""

    def __init__(self, name: str, data: bytes, lanes: int | None = None):
        from cpprcoder_tpu.config import pick_lanes
        from cpprcoder_tpu.ops import rans_ops

        self.name, self.data = name, data
        x = np.frombuffer(data, np.uint8)
        self.n = n = len(x)
        self.k = k = lanes or pick_lanes(n)
        self.steps = steps = bucket(-(-n // k))
        self.x2d = jnp.asarray(rans_ops._pad2d(x, steps, k))
        self.nn = U32(n)
        self.enc = rans_ops._encode_fn(steps, k)
        self._ops = rans_ops

    def warm(self):
        states, words, pstart, n_words, lane_counts, freqs = self.enc(
            self.x2d, self.nn)
        nw = int(n_words)
        self.cap = cap = bucket(max(nw, 1))
        self.stream_fn = self._ops._stream_fn(self.steps * self.k, cap)
        self.dec = self._ops._decode_fn(self.steps, self.k, cap)
        stream = self.stream_fn(words, pstart, n_words)
        cnts = np.asarray(jax.device_get(lane_counts))
        bases = jnp.asarray(
            np.concatenate(([0], np.cumsum(cnts)))[:-1].astype(np.int32))
        self._enc_out = (stream, states, bases, freqs, nw)
        self._dec_out = self.dec(stream, states, bases, freqs, self.nn)
        self.compressed = nw * 2 + 4 + 1 + 4 * self.k + 2 * self.k + 330

    def _enc_body(self, p):
        states, words, pstart, n_words, lane_counts, freqs = self.enc(
            self.x2d ^ p, self.nn)
        stream = self.stream_fn(words, pstart, n_words)
        return (jnp.sum(stream.astype(U32), dtype=U32)
                + jnp.sum(states, dtype=U32))

    def _dec_body(self, p):
        stream, states, bases, freqs, _ = self._enc_out
        out = self.dec(stream ^ p.astype(jnp.uint16), states, bases, freqs,
                       self.nn)
        return jnp.sum(out, dtype=U32)

    def run(self):
        self.enc_t = _auto_measure(self._enc_body)
        self.dec_t = _auto_measure(self._dec_body)

    def finalize(self):
        eq = int(_equal_count(self._dec_out.reshape(-1)[: self.n],
                              self.x2d.reshape(-1)[: self.n]))
        return {"file": self.name, "codec": "rans", "bytes": self.n,
                "k": self.k, "compressed": self.compressed,
                "ratio": self.compressed / self.n,
                "enc_MBps": self.n / self.enc_t / 1e6,
                "dec_MBps": self.n / self.dec_t / 1e6,
                "roundtrip_ok": eq == self.n}


class RANSPallasJob(RANSJob):
    """Config 3 on the Pallas kernel path (ops/rans_pallas.py): the whole
    interleaved-rANS loop in one kernel launch per direction."""

    def __init__(self, name: str, data: bytes, lanes: int | None = None):
        super().__init__(name, data, lanes)
        from cpprcoder_tpu.ops import rans_pallas as rp

        self._rp = rp
        self.kp = max(self.k, rp.MIN_LANES)
        self.enc = rp._encode_call(self.steps, self.k, self.kp)

    def warm(self):
        states, words, pstart, n_words, lane_counts, freqs = self.enc(
            self.x2d, self.nn)
        nw = int(n_words)
        self.cap = cap = bucket(max(nw, 1))
        self.stream_fn = self._ops._stream_fn(self.steps * self.k, cap)
        stream = self.stream_fn(words, pstart, n_words)
        cnts = np.asarray(jax.device_get(lane_counts)).astype(np.int64)
        bases = np.concatenate(([0], np.cumsum(cnts)))[:-1]
        self.l2 = l2 = bucket(max(int(cnts.max()), 1) + 1)
        from cpprcoder_tpu.ops.huffman_pallas import _rows16_fn

        self.rows_fn = _rows16_fn(self.k, l2, cap)
        self._rows_args = (jnp.asarray(bases.astype(np.int32)),
                           jnp.asarray(cnts.astype(np.int32)))
        self.dec_p = self._rp._decode_call(self.steps, self.k, self.kp, l2)
        fq = np.asarray(jax.device_get(freqs)).astype(np.int32)
        cums = np.concatenate(([0], np.cumsum(fq[:255]))).astype(np.int32)
        self._tabs = (jnp.asarray(fq.reshape(16, 16)),
                      jnp.asarray(cums.reshape(16, 16)))
        self._enc_out = (stream, states)
        self._dec_out = self._dec_full(stream, states)
        self.compressed = nw * 2 + 4 + 1 + 4 * self.k + 2 * self.k + 330

    def _dec_full(self, stream, states):
        rows = self.rows_fn(stream, *self._rows_args)
        return self.dec_p(rows.T, states, *self._tabs, jnp.int32(self.n))

    def _enc_body(self, p):
        states, words, pstart, n_words, lane_counts, freqs = self.enc(
            self.x2d ^ p, self.nn)
        stream = self.stream_fn(words, pstart, n_words)
        return (jnp.sum(stream.astype(U32), dtype=U32)
                + jnp.sum(states, dtype=U32))

    def _dec_body(self, p):
        stream, states = self._enc_out
        out = self._dec_full(stream ^ p.astype(jnp.uint16), states)
        return jnp.sum(out, dtype=I32).astype(U32)

    def finalize(self):
        row = RANSJob.finalize(self)
        row["codec"] = "rans_pallas"
        return row


class HUFFJob:
    """Config 3b: canonical Huffman (real implementation of the cpphuff.h
    stub; ops/huffman_ops.py)."""

    def __init__(self, name: str, data: bytes, lanes: int | None = None):
        from cpprcoder_tpu.config import HUF_MAX_BITS, pick_lanes
        from cpprcoder_tpu.models.huffman import (
            build_canonical_decode_tables, build_encoder_table)
        from cpprcoder_tpu.ops import huffman_ops, rans_ops

        self.name, self.data = name, data
        x = np.frombuffer(data, np.uint8)
        self.n = n = len(x)
        self.k = k = lanes or pick_lanes(n)
        self.steps = steps = bucket(-(-n // k))
        self.x2d = jnp.asarray(huffman_ops._pad2d(x, steps, k))
        self.nn = U32(n)
        counts = np.bincount(x, minlength=256)
        lengths, codes = build_encoder_table(counts)
        self.lengths = jnp.asarray(lengths, U32)
        self.codes = jnp.asarray(codes, U32)
        self.limits, self.bases_l, self.perm = (
            jnp.asarray(a, U32) for a in
            build_canonical_decode_tables(lengths, HUF_MAX_BITS))
        self.enc = huffman_ops._encode_fn(steps, k)
        self._hops = huffman_ops
        self._sfn = rans_ops._stream_fn

    def warm(self):
        words, pstart, n_words, bitcounts = self.enc(
            self.x2d, self.nn, self.lengths, self.codes)
        nw = int(n_words)
        self.cap = cap = bucket(max(nw, 1))
        self.stream_fn = self._sfn(self.steps * self.k + self.k, cap)
        stream = self.stream_fn(words, pstart, n_words)
        bc = np.asarray(jax.device_get(bitcounts)).astype(np.int64)
        word_counts = (bc + 15) // 16
        bases = np.concatenate(([0], np.cumsum(word_counts)))[:-1]
        self.bases = jnp.asarray(bases.astype(np.int32))
        self.word_ends = jnp.asarray((bases + word_counts).astype(np.int32))
        self.dec = self._hops._decode_fn(self.steps, self.k, cap)
        self._enc_out = stream
        self._dec_out = self.dec(stream, self.bases, self.word_ends,
                                 self.limits, self.bases_l, self.perm,
                                 self.nn)
        self.compressed = int(word_counts.sum()) * 2 + 4 + 1 + 128 + 4 * self.k

    def _enc_body(self, p):
        words, pstart, n_words, bitcounts = self.enc(
            self.x2d ^ p, self.nn, self.lengths, self.codes)
        stream = self.stream_fn(words, pstart, n_words)
        return (jnp.sum(stream.astype(U32), dtype=U32)
                + jnp.sum(bitcounts, dtype=U32))

    def _dec_body(self, p):
        out = self.dec(self._enc_out ^ p.astype(jnp.uint16), self.bases,
                       self.word_ends, self.limits, self.bases_l, self.perm,
                       self.nn)
        return jnp.sum(out, dtype=U32)

    run = RANSJob.run

    def finalize(self):
        eq = int(_equal_count(self._dec_out.reshape(-1)[: self.n],
                              self.x2d.reshape(-1)[: self.n]))
        return {"file": self.name, "codec": "huffman", "bytes": self.n,
                "k": self.k, "compressed": self.compressed,
                "ratio": self.compressed / self.n,
                "enc_MBps": self.n / self.enc_t / 1e6,
                "dec_MBps": self.n / self.dec_t / 1e6,
                "roundtrip_ok": eq == self.n}


class HUFFPallasJob(HUFFJob):
    """Config 3b on the Pallas kernel path (ops/huffman_pallas.py): the
    whole bit-packer / canonical-decoder loop in one kernel launch."""

    def __init__(self, name: str, data: bytes, lanes: int | None = None):
        super().__init__(name, data, lanes)
        from cpprcoder_tpu.ops import huffman_pallas as hp

        self._hp = hp
        self.kp = max(self.k, hp.MIN_LANES)
        tab = np.zeros((8, 256), np.int32)
        tab[0] = np.asarray(jax.device_get(self.lengths))
        codes = np.asarray(jax.device_get(self.codes))
        tab[1] = codes & 255
        tab[2] = codes >> 8
        self.tab = jnp.asarray(tab)
        self.enc_p = hp._encode_call(self.steps, self.k, self.kp)

    def warm(self):
        words, pstart, n_words, bitcounts = self.enc_p(
            self.x2d, self.nn, self.tab)
        nw = int(n_words)
        self.cap = cap = bucket(max(nw, 1))
        self.stream_fn = self._sfn(self.steps * self.k + self.k, cap)
        stream = self.stream_fn(words, pstart, n_words)
        bc = np.asarray(jax.device_get(bitcounts)).astype(np.int64)
        word_counts = (bc + 15) // 16
        bases = np.concatenate(([0], np.cumsum(word_counts)))[:-1]
        self.lw = lw = bucket(max(int(word_counts.max()), 1) + 1)
        self.rows_fn = self._hp._rows16_fn(self.k, lw, cap)
        self._rows_args = (jnp.asarray(bases.astype(np.int32)),
                           jnp.asarray(word_counts.astype(np.int32)))
        self.dec_p = self._hp._decode_call(self.steps, self.k, self.kp, lw)
        from cpprcoder_tpu.config import HUF_MAX_BITS

        lim16 = np.zeros(16, np.int32)
        bas16 = np.zeros(16, np.int32)
        lim16[1:] = np.asarray(jax.device_get(self.limits))[1:16]
        bas16[1:] = np.asarray(jax.device_get(self.bases_l))[1:16]
        perm8 = np.zeros((8, 256), np.int32)
        perm8[0] = np.asarray(jax.device_get(self.perm))
        self._tabs = (jnp.asarray(lim16), jnp.asarray(bas16),
                      jnp.asarray(perm8))
        self._enc_out = stream
        self._dec_out = self._dec_full(stream)
        self.compressed = int(word_counts.sum()) * 2 + 4 + 1 + 128 + 4 * self.k

    def _dec_full(self, stream):
        rows = self.rows_fn(stream, *self._rows_args)
        return self.dec_p(rows.T, *self._tabs, self.n)

    def _enc_body(self, p):
        words, pstart, n_words, bitcounts = self.enc_p(
            self.x2d ^ p, self.nn, self.tab)
        stream = self.stream_fn(words, pstart, n_words)
        return (jnp.sum(stream.astype(U32), dtype=U32)
                + jnp.sum(bitcounts, dtype=U32))

    def _dec_body(self, p):
        out = self._dec_full(self._enc_out ^ p.astype(jnp.uint16))
        return jnp.sum(out, dtype=I32).astype(U32)

    def finalize(self):
        row = HUFFJob.finalize(self)
        row["codec"] = "huffman_pallas"
        return row


class SLZ4Job:
    """Config 5: SLZ4 (LZ4 block format, exact-candidate lazy parse)."""

    def __init__(self, name: str, data: bytes, seg_log2: int = 17):
        from cpprcoder_tpu.ops import lz_ops

        self.name, self.data = name, data
        x = np.frombuffer(data, np.uint8)
        self.n = n = len(x)
        s = 1 << seg_log2
        self.n_segs = n_segs = max(1, -(-n // s))
        blocks = np.zeros((n_segs, s), np.uint8)
        blocks.reshape(-1)[:n] = x
        self.blocks = jnp.asarray(blocks)
        self.lens = jnp.asarray(
            np.minimum(s, np.maximum(n - np.arange(n_segs) * s, 0))
            .astype(np.int32))
        t_cap = lz_ops._t_cap(s)
        self.parse = lz_ops._parse_fn_v2(n_segs, s, t_cap, True)
        out_cap = n_segs * s + (n_segs * s) // 200 + 64 * n_segs + 1024
        self.ser = lz_ops._serialize_fn_v2(n_segs, s, t_cap, out_cap)
        self._lz = lz_ops
        self.s, self.t_cap, self.out_cap = s, t_cap, out_cap

    def warm(self):
        mpos, m_len, m_off, lit_start, n_match = self.parse(
            self.blocks, self.lens)
        payload, seg_sizes, total = self.ser(
            self.blocks, self.lens, mpos, m_len, m_off, lit_start, n_match)
        self.compressed = int(total) + 9 + 4 * self.n_segs
        sizes = np.asarray(jax.device_get(seg_sizes)).astype(np.int64)
        bases = np.concatenate(([0], np.cumsum(sizes)))[:-1]
        cmax = bucket(int(sizes.max()) + 8)
        self.walk = self._lz._walk_fn(self.n_segs, self.t_cap, cmax)
        self.resolve = self._lz._resolve_fn(self.n_segs, self.s, self.t_cap)
        comp = jnp.asarray(np.asarray(jax.device_get(payload)))
        self._payload = comp
        self._bases = jnp.asarray(bases.astype(np.int32))
        self._ends = jnp.asarray((bases + sizes).astype(np.int32))
        self._dec_out = self._dec_full(comp)

    def _dec_full(self, comp):
        recs = self.walk(comp, self._bases, self._ends)
        return self.resolve(comp, recs, self.lens)

    def _enc_body(self, p):
        mpos, m_len, m_off, lit_start, n_match = self.parse(
            self.blocks ^ p, self.lens)
        payload, seg_sizes, total = self.ser(
            self.blocks ^ p, self.lens, mpos, m_len, m_off, lit_start,
            n_match)
        return jnp.sum(seg_sizes, dtype=I32).astype(U32) + total.astype(U32)

    def _dec_body(self, p):
        out = self._dec_full(self._payload ^ p)
        return jnp.sum(out, dtype=U32)

    run = RANSJob.run

    def finalize(self):
        dec = np.asarray(jax.device_get(self._dec_out)).reshape(
            self.n_segs, -1)
        x = np.frombuffer(self.data, np.uint8)
        ok = True
        s = self.s
        for i in range(self.n_segs):
            ln = min(s, self.n - i * s)
            if not (dec[i, :ln] == x[i * s: i * s + ln]).all():
                ok = False
                break
        return {"file": self.name, "codec": "slz4", "bytes": self.n,
                "k": self.n_segs, "compressed": self.compressed,
                "ratio": self.compressed / self.n,
                "enc_MBps": self.n / self.enc_t / 1e6,
                "dec_MBps": self.n / self.dec_t / 1e6,
                "roundtrip_ok": ok}


class BWTJob:
    """Config 4 core: 32 KiB-block BWT forward + inverse kernels."""

    def __init__(self, name: str, data: bytes, block_log2: int = 15):
        from cpprcoder_tpu.ops import bwt_ops

        self.name, self.data = name, data
        x = np.frombuffer(data, np.uint8)
        self.n = n = len(x)
        bs = 1 << block_log2
        nb = max(1, n // bs)          # whole blocks only (tail is raw)
        self.nb, self.bs = nb, bs
        blocks = x[: nb * bs].reshape(nb, bs) if n >= bs else \
            np.zeros((1, bs), np.uint8)
        self.blocks = jnp.asarray(blocks)
        self.fwd = bwt_ops._forward_fn(nb, bs)
        self.inv = bwt_ops._inverse_fn(nb, bs)

    def warm(self):
        last, idx = self.fwd(self.blocks)
        self._fwd_out = (last, idx)
        self._inv_out = self.inv(last, idx)

    def _enc_body(self, p):
        last, idx = self.fwd(self.blocks ^ p)
        return jnp.sum(last, dtype=U32) + jnp.sum(idx, dtype=U32)

    def _dec_body(self, p):
        last, idx = self._fwd_out
        out = self.inv(last ^ p, idx)
        return jnp.sum(out, dtype=U32)

    run = RANSJob.run

    def finalize(self):
        ok = bool(np.asarray(jax.device_get(
            (self._inv_out == self.blocks).all())))
        nbytes = self.nb * self.bs
        return {"file": self.name, "codec": "bwt_core", "bytes": nbytes,
                "k": self.nb, "compressed": nbytes + 2 * self.nb,
                "ratio": 1.0,
                "enc_MBps": nbytes / self.enc_t / 1e6,
                "dec_MBps": nbytes / self.dec_t / 1e6,
                "roundtrip_ok": ok}


class ANS2Job:
    """CT-ANS2: adaptive interleaved rANS with windowed model refresh
    (ops/ans2_ops.py; reference lineage cppans.h + adaptive model)."""

    def __init__(self, name: str, data: bytes, lanes: int | None = None):
        from cpprcoder_tpu.config import pick_lanes
        from cpprcoder_tpu.ops import ans2_ops, rans_ops

        self.name, self.data = name, data
        x = np.frombuffer(data, np.uint8)
        self.n = n = len(x)
        self.k = k = lanes or pick_lanes(n)
        self.inc = ans2_ops.ANS2_INC_DEFAULT
        self.ll = ans2_ops.ANS2_LIMIT_LOG2_DEFAULT
        self.rl = ans2_ops.default_refresh_log2(k, n)
        self.steps = steps = bucket(-(-n // k))
        self.x2d = jnp.asarray(ans2_ops._pad2d(x, steps, k))
        self.nn = U32(n)
        self.enc = ans2_ops._encode_fn(steps, k, self.inc, self.ll, self.rl)
        self._ops = ans2_ops
        self._stream_mod = rans_ops

    def warm(self):
        states, words, pstart, n_words = self.enc(self.x2d, self.nn)
        nw = int(n_words)
        self.cap = cap = bucket(max(nw, 1))
        self.stream_fn = self._stream_mod._stream_fn(self.steps * self.k, cap)
        stream = self.stream_fn(words, pstart, n_words)
        self.dec = self._ops._decode_fn(self.steps, self.k, cap, self.inc,
                                        self.ll, self.rl)
        self._enc_out = (stream, states)
        self._dec_out = self.dec(stream, states, self.nn)
        self.compressed = nw * 2 + 9 + 4 + 4 * self.k

    def _enc_body(self, p):
        states, words, pstart, n_words = self.enc(self.x2d ^ p, self.nn)
        stream = self.stream_fn(words, pstart, n_words)
        return (jnp.sum(stream.astype(U32), dtype=U32)
                + jnp.sum(states, dtype=U32))

    def _dec_body(self, p):
        stream, states = self._enc_out
        out = self.dec(stream ^ p.astype(jnp.uint16), states, self.nn)
        return jnp.sum(out, dtype=U32)

    run = RANSJob.run

    def finalize(self):
        eq = int(_equal_count(self._dec_out.reshape(-1)[: self.n],
                              self.x2d.reshape(-1)[: self.n]))
        return {"file": self.name, "codec": "ans2", "bytes": self.n,
                "k": self.k, "compressed": self.compressed,
                "ratio": self.compressed / self.n,
                "enc_MBps": self.n / self.enc_t / 1e6,
                "dec_MBps": self.n / self.dec_t / 1e6,
                "roundtrip_ok": eq == self.n}


class ASEJob:
    """CT-ASE1: recency-list bit-packer (ops/ase_ops.py; reference
    cppase.h:139-324)."""

    def __init__(self, name: str, data: bytes, lanes: int | None = None):
        from cpprcoder_tpu.config import pick_lanes
        from cpprcoder_tpu.ops import ase_ops, rans_ops

        self.name, self.data = name, data
        x = np.frombuffer(data, np.uint8)
        self.n = n = len(x)
        self.k = k = lanes or pick_lanes(n)
        self.steps = steps = bucket(-(-n // k))
        self.x2d = jnp.asarray(ase_ops._pad2d(x, steps, k))
        self.nn = U32(n)
        self.enc = ase_ops._encode_fn(steps, k)
        self._ops = ase_ops
        self._stream_mod = rans_ops

    def warm(self):
        words, pstart, n_words, bitcounts = self.enc(self.x2d, self.nn)
        nw = int(n_words)
        self.cap = cap = bucket(max(nw, 1))
        self.stream_fn = self._stream_mod._stream_fn(
            self.steps * self.k + self.k, cap)
        stream = self.stream_fn(words, pstart, n_words)
        cnts = np.asarray(jax.device_get((bitcounts + 15) // 16),
                          dtype=np.int64)
        bases = np.concatenate(([0], np.cumsum(cnts)))[:-1].astype(np.int32)
        ends = (bases + cnts).astype(np.int32)
        self.dec = self._ops._decode_fn(self.steps, self.k, cap)
        self._bases, self._ends = jnp.asarray(bases), jnp.asarray(ends)
        self._enc_out = stream
        self._dec_out = self.dec(stream, self._bases, self._ends, self.nn)
        self.compressed = nw * 2 + 5 + 4 * self.k

    def _enc_body(self, p):
        words, pstart, n_words, bitcounts = self.enc(self.x2d ^ p, self.nn)
        stream = self.stream_fn(words, pstart, n_words)
        return (jnp.sum(stream.astype(U32), dtype=U32)
                + jnp.sum(bitcounts, dtype=U32))

    def _dec_body(self, p):
        out = self.dec(self._enc_out ^ p.astype(jnp.uint16), self._bases,
                       self._ends, self.nn)
        return jnp.sum(out, dtype=U32)

    run = RANSJob.run

    def finalize(self):
        eq = int(_equal_count(self._dec_out.reshape(-1)[: self.n],
                              self.x2d.reshape(-1)[: self.n]))
        return {"file": self.name, "codec": "ase", "bytes": self.n,
                "k": self.k, "compressed": self.compressed,
                "ratio": self.compressed / self.n,
                "enc_MBps": self.n / self.enc_t / 1e6,
                "dec_MBps": self.n / self.dec_t / 1e6,
                "roundtrip_ok": eq == self.n}


class O1Job:
    """CT-RC3: order-1 blended adaptive range coder (ops/o1_ops.py)."""

    def __init__(self, name: str, data: bytes, lanes: int | None = None):
        from cpprcoder_tpu.ops import o1_ops, range_ops

        self.name, self.data = name, data
        x = np.frombuffer(data, np.uint8)
        self.n = n = len(x)
        self.k = k = lanes or o1_ops.pick_lanes(n)
        self.inc = o1_ops.pick_inc(k)
        self.l1, self.l0 = o1_ops.LIMIT1_LOG2, o1_ops.LIMIT0_LOG2
        self.bl = o1_ops.BLEND_LOG2
        L, lens = o1_ops._chunk_layout(n, k)
        self.L = L
        self.steps = steps = bucket(L)
        self.x2d = jnp.asarray(o1_ops._pad_chunked(x, steps, k, L))
        self.lens = jnp.asarray(lens, I32)
        self.enc = o1_ops._encode_fn(steps, k, self.inc, self.l1, self.l0,
                                     self.bl)
        total0 = int(self.enc(self.x2d, self.lens)[2])
        self.cap = bucket(total0 + 8)
        self._ops = o1_ops
        self._range_ops = range_ops

    def warm(self):
        events, lane_sizes, total = self.enc(self.x2d, self.lens)
        self.mat = self._range_ops._materialize_fn(self.k, events.shape[1],
                                                   self.cap)
        payload, sizes = self.mat(events)
        self.compressed = int(total) + 9 + 2 * self.k
        self.dec = self._ops._decode_fn(self.steps, self.k, self.inc,
                                        self.l1, self.l0, self.bl, self.cap)
        self._enc_out = (payload, sizes)
        self._dec_out = self.dec(payload, sizes.astype(jnp.int32), self.lens)

    def _enc_body(self, p):
        events, lane_sizes, total = self.enc(self.x2d ^ p, self.lens)
        payload, sizes = self.mat(events)
        return jnp.sum(payload, dtype=U32) + jnp.sum(sizes, dtype=U32)

    def _dec_body(self, p):
        payload, sizes = self._enc_out
        out = self.dec(payload ^ p, sizes.astype(jnp.int32), self.lens)
        return jnp.sum(out, dtype=I32).astype(U32)

    run = RANSJob.run

    def finalize(self):
        out = np.asarray(jax.device_get(self._dec_out))   # [steps, k]
        got = out.T.reshape(self.k, self.steps)[:, : self.L].reshape(
            -1)[: self.n]
        x = np.frombuffer(self.data, np.uint8)
        ok = bool((got.astype(np.uint8) == x).all())
        return {"file": self.name, "codec": "o1", "bytes": self.n,
                "k": self.k, "compressed": self.compressed,
                "ratio": self.compressed / self.n,
                "enc_MBps": self.n / self.enc_t / 1e6,
                "dec_MBps": self.n / self.dec_t / 1e6,
                "roundtrip_ok": ok}


class PipelineJob:
    """Config 4 end-to-end: blocksort -> MTF-1 -> CT-RCX Pallas coder as
    ONE timed device path (reference pipeline precedent:
    test/main.cpp:944-1002 composes blocksort with a backend coder).
    Every stage is device-resident: the MTF ranks feed the flagship
    entropy kernel through an on-device chunked-lane relayout, and the
    decode side inverts it without touching the host."""

    def __init__(self, name: str, data: bytes, block_log2: int = 15):
        from cpprcoder_tpu.models.cxmodel import WLOG_DEFAULT, rcx_params
        from cpprcoder_tpu.ops import bwt_ops, mtf_ops, rcx_pallas

        self.name, self.data = name, data
        x = np.frombuffer(data, np.uint8)
        bs = 1 << block_log2
        nb = max(1, len(x) // bs)
        self.n = n = nb * bs if len(x) >= bs else len(x)
        self.nb, self.bs = nb, bs
        blocks = x[: nb * bs].reshape(nb, bs) if len(x) >= bs else \
            np.pad(x, (0, bs - len(x))).reshape(1, bs)
        self.blocks = jnp.asarray(blocks)
        self.fwd = bwt_ops._forward_fn(nb, bs)
        self.inv = bwt_ops._inverse_fn(nb, bs)
        self.mtf_e = mtf_ops._encode_fn(nb, bs, True)
        self.mtf_d = mtf_ops._decode_fn(nb, bs, True)
        n = nb * bs
        k, inc, cl, cbits = rcx_params(n)
        self.k, self.inc, self.cl, self.cbits = k, inc, cl, cbits
        self.wlog = WLOG_DEFAULT
        self.kp = max(k, rcx_pallas.MIN_LANES)
        self.stride = stride = -(-n // k)
        self.steps = steps = bucket(stride)
        self.nn = U32(n)
        self.enc = rcx_pallas._encode_call(steps, k, self.kp, inc, cl,
                                           cbits, stride, self.wlog)
        self._rcx_pallas = rcx_pallas

    def _to_chunked(self, flat):
        """[n] u8 -> [steps, k] chunked lane layout, on device."""
        n, k, st = self.n, self.k, self.stride
        buf = jnp.pad(flat, (0, k * st - n))
        x2d = buf.reshape(k, st).T
        return jnp.pad(x2d, ((0, self.steps - st), (0, 0)))

    def _enc_chain(self, blocks):
        last, idx = self.fwd(blocks)
        ranks = self.mtf_e(last)
        x2d = self._to_chunked(ranks.reshape(-1))
        events, lane_sizes, total = self.enc(x2d, self.nn)
        return events, lane_sizes, total, idx

    def _encode_full(self, blocks):
        from cpprcoder_tpu.ops import compaction

        events, lane_sizes, total, idx = self._enc_chain(blocks)
        rows, sizes = compaction.materialize_rows(events, self.l2)
        return rows, sizes, total, idx

    def warm(self):
        probe = self._enc_chain(self.blocks)
        max_sz = int(np.asarray(jax.device_get(probe[1])).max())
        total = int(probe[2])
        self.l4 = bucket(-(-max_sz // 4) + 1)
        self.l2 = 4 * self.l4
        self.dec = self._rcx_pallas._decode_call(
            self.steps, self.k, self.kp, self.l4, self.inc, self.cl,
            self.cbits, self.stride, self.wlog)
        rows, sizes, total_, idx = self._encode_full(self.blocks)
        self._enc_out = (rows, sizes, idx)
        self.compressed = int(total_) + 10 + 2 * self.k + 2 * self.nb
        self._dec_out = self._dec_chain(rows, idx)

    def _dec_chain(self, rows, idx):
        from cpprcoder_tpu.ops import compaction

        rows_w = compaction.rows_to_be_words(rows)
        out = self.dec(rows_w.T, jnp.int32(self.n))    # [steps8, k] i32
        flat = out[: self.stride, : self.k].astype(jnp.uint8).T.reshape(
            -1)[: self.n]
        ranks = flat.reshape(self.nb, self.bs)
        last = self.mtf_d(ranks)
        return self.inv(last, idx)

    def _enc_body(self, p):
        rows, sizes, total, idx = self._encode_full(self.blocks ^ p)
        return (jnp.sum(rows.astype(U32), dtype=U32)
                + jnp.sum(sizes, dtype=U32) + jnp.sum(idx, dtype=U32))

    def _dec_body(self, p):
        rows, sizes, idx = self._enc_out
        out = self._dec_chain(rows ^ p.astype(rows.dtype), idx)
        return jnp.sum(out, dtype=U32)

    run = RANSJob.run

    def finalize(self):
        ok = bool(np.asarray(jax.device_get(
            (self._dec_out == self.blocks).all())))
        nbytes = self.nb * self.bs
        return {"file": self.name, "codec": "bwt_mtf1_rcx", "bytes": nbytes,
                "k": self.k, "compressed": self.compressed,
                "ratio": self.compressed / nbytes,
                "enc_MBps": nbytes / self.enc_t / 1e6,
                "dec_MBps": nbytes / self.dec_t / 1e6,
                "timing": [getattr(self, "enc_how", "slope"),
                           getattr(self, "dec_how", "slope")],
                "roundtrip_ok": ok}


class _DevJob:
    """Adapter: run a bench.device job class under the allconfigs loop."""

    def __init__(self, cls, *args, **kw):
        self.job = cls(*args, **kw)

    def warm(self):
        self.job.warm()
        if hasattr(self.job, "warm_timing"):
            self.job.warm_timing()

    def run(self):
        self.job.run()

    def finalize(self):
        return self.job.finalize()


def all_jobs():
    """(label, factory) pairs covering every codec in the framework —
    the reference benches every enabled codec per run
    (test/main.cpp:1274-1385); this is the repo equivalent."""
    from cpprcoder_tpu.bench import device

    # ordered roughly by compile cost (cheap/cached first) so a bounded
    # run still lands rows for the most codecs
    return [
        ("rcx_pallas", lambda f, d: _DevJob(device.RCXJob, f, d, "pallas")),
        ("rans_pallas", RANSPallasJob),
        ("huffman_pallas", HUFFPallasJob),
        ("rans", RANSJob),
        ("huffman", HUFFJob),
        ("bwt_core", BWTJob),
        ("slz4", SLZ4Job),
        ("ans2", ANS2Job),
        ("ase", ASEJob),
        ("o1", O1Job),
        ("pipeline", PipelineJob),
        ("rcq_pallas", lambda f, d: _DevJob(device.RCQJob, f, d, "pallas")),
        ("static", lambda f, d: _DevJob(device.RCJob, f, d, "static")),
        ("adaptive", lambda f, d: _DevJob(device.RCJob, f, d, "adaptive")),
    ]


def main(files=None, codecs=None, out="ALLCONFIGS.json"):
    from cpprcoder_tpu.bench.harness import CANTERBURY, load
    from cpprcoder_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    files = files or list(CANTERBURY)
    rows = []
    # ALLCONFIGS.json is rewritten after every row so a timeout still
    # leaves evidence (the round-2 lesson, bench.py)
    for label, factory in all_jobs():
        if codecs and label not in codecs:
            continue
        for f in files:
            data = load(f)
            try:
                job = factory(f, data)
                job.warm()
                job.run()
                row = job.finalize()
            except Exception as e:  # isolate per-job failures
                row = {"file": f, "codec": label, "error": repr(e)}
            rows.append(row)
            print(json.dumps(row), flush=True)
            with open(out, "w") as fh:
                json.dump(rows, fh, indent=1)
    return rows


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="*", default=None)
    ap.add_argument("--codecs", nargs="*", default=None,
                    help="subset of codec labels (see all_jobs)")
    ap.add_argument("--out", default="ALLCONFIGS.json")
    a = ap.parse_args()
    main(a.files or None, a.codecs, a.out)
