"""Device-resident benchmarking.

This development environment reaches its TPU through a tunnel that (a) pays
a large one-time sync on the first device→host fetch, (b) lets
block_until_ready return before execution finishes. All timing therefore
uses bench.timing.measure: the kernel repeated inside one jit with a
loop-carried dependency, scalar-fetch walls, two-point slope (validated
against v5e matmul peak). Verification runs on device (jitted equality
count); only scalars cross the tunnel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cpprcoder_tpu.bench.timing import measure
from cpprcoder_tpu.config import adaptive_params_for, pick_lanes
from cpprcoder_tpu.ops import range_ops
from cpprcoder_tpu.utils.shapes import bucket

U32 = jnp.uint32


@jax.jit
def _equal_count(a, b):
    return (a.reshape(-1) == b.reshape(-1)).sum()


def _retry_nan(measure_once, tries: int = 3) -> float:
    """Re-run an unstable (NaN) slope measurement up to `tries` times.

    Transient host/tunnel contention can destabilize one slope; a retry is
    still an honest measurement. Returns NaN only if every try disagrees."""
    import math

    t = measure_once()
    for _ in range(tries - 1):
        if not math.isnan(t):
            break
        t = measure_once()
    return t


# Planning-rate estimates for DETERMINISTIC rep counts: reps are a function
# of n only (never of a measured estimate), so the timing-loop programs are
# byte-stable across runs and the persistent compilation cache always hits.
ENC_RATE_EST = 1.0e8     # bytes/s
DEC_RATE_EST = 4.0e8
FLOOR_EST = 5e-4         # in-jit per-rep floor for tiny bodies, seconds


def det_reps(n: int, rate: float) -> int:
    from cpprcoder_tpu.bench.timing import quantize_reps

    est = max(n / rate, FLOOR_EST)
    return quantize_reps(max(4, min(32, int(0.06 / est) + 1)))


def _out_cap(n: int, k: int) -> int:
    # worst-case CT-RC payload: ~n bytes (incompressible) + per-lane flush
    return bucket(n + (n >> 4) + 16 * k + 1024)


class RCJob:
    """One file × one RC codec under the tunnel-safe protocol."""

    def __init__(self, name: str, data: bytes, kind: str,
                 lanes: int | None = None):
        self.name, self.data, self.kind = name, data, kind
        x = np.frombuffer(data, np.uint8)
        self.n = n = len(x)
        self.k = k = lanes or pick_lanes(n)
        self.steps = steps = bucket(-(-n // k))
        self.cap = cap = _out_cap(n, k)
        self.x2d = jnp.asarray(range_ops._pad2d(x, steps, k))
        self.nn = U32(n)
        if kind == "static":
            self.enc = range_ops._static_encode_fn(steps, k)
            self.dec = range_ops._static_decode_fn(steps, k, cap)
            self.hdr = 4 + 1 + 512 + 2 * k
            n_slots = 2
        else:
            inc, ll = adaptive_params_for(k)
            self.enc = range_ops._adaptive_encode_fn(steps, k, inc, ll)
            self.dec = range_ops._adaptive_decode_fn(steps, k, inc, ll, cap)
            self.hdr = 4 + 3 + 2 * k
            n_slots = 2 if ll <= 16 else 3
        self.mat = range_ops._materialize_fn(k, steps * n_slots + 2, cap)
        self.enc_t = self.dec_t = None

    def _encode_full(self, x2d):
        out = self.enc(x2d, self.nn)
        payload, sizes = self.mat(out[0])
        return (payload, sizes, out[2]) + tuple(out[3:])

    def _enc_body(self, p):
        e = self._encode_full(self.x2d ^ p)
        return jnp.sum(e[0], dtype=U32) + jnp.sum(e[1], dtype=U32)

    def _dec_body(self, p):
        e = self._enc_out
        payload = e[0] ^ p
        if self.kind == "static":
            out = self.dec(payload, e[1], e[3])
        else:
            out = self.dec(payload, e[1], self.nn)
        return jnp.sum(out, dtype=U32)

    def warm(self):
        self._enc_out = self._encode_full(self.x2d)
        if self.kind == "static":
            self._dec_out = self.dec(self._enc_out[0], self._enc_out[1],
                                     self._enc_out[3])
        else:
            self._dec_out = self.dec(self._enc_out[0], self._enc_out[1],
                                     self.nn)

    def run(self, reps_hi: int | None = None):
        self.enc_t = _retry_nan(lambda: measure(self._enc_body))
        self.dec_t = _retry_nan(lambda: measure(self._dec_body))

    def finalize(self) -> dict:
        eq = int(_equal_count(self._dec_out.reshape(-1)[: self.n],
                              self.x2d.reshape(-1)[: self.n]))
        total = int(self._enc_out[2])
        comp = total + self.hdr
        return {
            "file": self.name, "codec": f"{self.kind}_range", "bytes": self.n,
            "k": self.k, "compressed": comp, "ratio": comp / self.n,
            "enc_MBps": self.n / self.enc_t / 1e6,
            "dec_MBps": self.n / self.dec_t / 1e6,
            "roundtrip_ok": eq == self.n,
        }


def bench_corpus(kinds=("static", "adaptive"), files=None,
                 reps_hi: int | None = None, load=None) -> list[dict]:
    from cpprcoder_tpu.bench.harness import CANTERBURY
    from cpprcoder_tpu.bench.harness import load as _load

    load = load or _load
    files = files or CANTERBURY
    jobs = [RCJob(f, load(f), kind) for kind in kinds for f in files]
    for j in jobs:
        j.warm()
    results = []
    for j in jobs:
        j.run(reps_hi)
        results.append(j.finalize())
    return results


class RCXJob:
    """One file x CT-RCX (context-model flagship) under the tunnel-safe
    protocol. Chunked lane layout: verification reassembles the byte order
    (lane i owns x[i*stride:(i+1)*stride]) before comparing.

    backend: "pallas" (TPU kernels) or "jax" (XLA scan). Timed bodies cover
    the full device pipeline, exactly like RCQJob."""

    def __init__(self, name: str, data: bytes, backend: str = "pallas",
                 lanes: int | None = None, inc: int | None = None,
                 climit_log2: int | None = None, cbits: int | None = None,
                 wlog: int | None = None):
        from cpprcoder_tpu.models.cxmodel import WLOG_DEFAULT, rcx_params
        from cpprcoder_tpu.ops import range_ops, rcx_ops, rcx_pallas
        from cpprcoder_tpu.utils.shapes import bucket

        self.name, self.data, self.backend = name, data, backend
        x = np.frombuffer(data, np.uint8)
        self.n = n = len(x)
        k, inc, cl, cbits = rcx_params(n, lanes, inc, cbits)
        wlog = WLOG_DEFAULT if wlog is None else wlog
        self.k, self.inc, self.cl, self.cbits = k, inc, cl, cbits
        self.wlog = wlog
        self.kp = max(k, rcx_pallas.MIN_LANES)
        self.stride = stride = -(-n // k)
        self.steps = steps = bucket(stride)
        self.x2d = jnp.asarray(rcx_ops._pad2d_chunked(x, steps, k, stride))
        self.nn = U32(n)
        if backend == "pallas":
            self.enc = rcx_pallas._encode_call(steps, k, self.kp, inc, cl,
                                               cbits, stride, wlog)
        else:
            self.enc = rcx_ops._encode_fn(steps, k, inc, cl, cbits, stride,
                                          wlog)
        total0 = int(self.enc(self.x2d, self.nn)[2])
        self.cap = cap = bucket(total0 + 8)
        if backend == "pallas":
            self.mat = range_ops._materialize_t_fn(steps * 2 + 2, k, cap)
        else:
            self.mat = range_ops._materialize_fn(k, steps * 2 + 2, cap)
        self._rcx_ops = rcx_ops
        self._rcx_pallas = rcx_pallas
        self._bucket = bucket
        self.hdr = 10 + 2 * k
        self.enc_t = self.dec_t = None

    def _encode_full(self, x2d):
        """pallas: events -> padded per-lane byte rows (merge expansion,
        ops/compaction.materialize_rows, Pallas VMEM kernel) — the device-resident
        interchange the decode kernel reads directly. jax backend keeps
        the flat lane-major payload."""
        events, lane_sizes, total = self.enc(x2d, self.nn)
        if self.backend == "pallas" and getattr(self, "l2", None):
            from cpprcoder_tpu.ops import compaction

            rows, sizes = compaction.materialize_rows(events, self.l2)
            return rows, sizes, total
        payload, sizes = self.mat(events)
        return payload, sizes, total

    def _enc_body(self, p):
        e = self._encode_full(self.x2d ^ p)
        return (jnp.sum(e[0].astype(U32), dtype=U32)
                + jnp.sum(e[1], dtype=U32))

    def _dec_full(self, payload, sizes):
        if self.backend == "pallas":
            from cpprcoder_tpu.ops import compaction

            rows_w = compaction.rows_to_be_words(payload)
            return self.dec(rows_w.T, jnp.int32(self.n))
        rows = self._rows(payload, sizes)
        return self.dec(rows, self.nn)

    def _dec_body(self, p):
        payload, sizes, _ = self._enc_out
        out = self._dec_full(payload ^ p.astype(payload.dtype), sizes)
        return jnp.sum(out, dtype=jnp.int32).astype(U32)

    def warm(self):
        from cpprcoder_tpu.ops.rcq_ops import _rows_fn

        probe = self.enc(self.x2d, self.nn)
        max_sz = int(np.asarray(jax.device_get(probe[1])).max())
        self.l4 = self._bucket(-(-max_sz // 4) + 1)
        self.l2 = 4 * self.l4
        self._enc_out = self._encode_full(self.x2d)
        payload, sizes, total = self._enc_out
        self._rows = lambda pl_, sz: _rows_fn(self.k, self.l4, self.cap)(
            pl_, sz.astype(jnp.int32))
        if self.backend == "pallas":
            self.dec = self._rcx_pallas._decode_call(
                self.steps, self.k, self.kp, self.l4, self.inc, self.cl,
                self.cbits, self.stride, self.wlog)
        else:
            self.dec = self._rcx_ops._decode_fn(
                self.steps, self.k, self.inc, self.cl, self.cbits,
                self.stride, self.l4, self.wlog)
        self._dec_out = self._dec_full(payload, sizes)

    def warm_timing(self):
        from cpprcoder_tpu.bench.timing import make_loop

        for body, rate in ((self._enc_body, ENC_RATE_EST),
                           (self._dec_body, DEC_RATE_EST)):
            for r in (1, det_reps(self.n, rate)):
                int(make_loop(body, r)())

    def run(self, reps_hi: int | None = None):
        self.enc_t, self.enc_how = self._measure(self._enc_body,
                                                 ENC_RATE_EST)
        self.dec_t, self.dec_how = self._measure(self._dec_body,
                                                 DEC_RATE_EST)

    def finalize(self) -> dict:
        # chunked layout: both sides are [steps, k] in the same layout, but
        # tail cells are garbage on the decode side — compare active cells
        dec = self._dec_out[: self.steps, : self.k].astype(jnp.int32)
        src = self.x2d[: self.steps, : self.k].astype(jnp.int32)
        st, k, n = self.stride, self.k, self.n
        lanes = jnp.arange(k, dtype=jnp.int32)[None, :]
        jrow = jnp.arange(self.steps, dtype=jnp.int32)[:, None]
        act = (jrow < st) & (lanes * st + jrow < n)
        eq = int(jnp.sum(jnp.where(act, dec == src, True)))
        total = int(self._enc_out[2])
        comp = total + self.hdr
        return {
            "file": self.name, "codec": f"rcx_{self.backend}",
            "bytes": self.n, "k": self.k, "cbits": self.cbits,
            "compressed": comp, "ratio": comp / self.n,
            "enc_MBps": self.n / self.enc_t / 1e6,
            "dec_MBps": self.n / self.dec_t / 1e6,
            "timing": [getattr(self, "enc_how", "slope"),
                       getattr(self, "dec_how", "slope")],
            "roundtrip_ok": eq == dec.size,
        }


class RCQJob:
    """One file x CT-RCQ under the tunnel-safe protocol.

    backend: "pallas" (TPU kernels) or "jax" (XLA scan). Timed bodies cover
    the full device pipeline: encode = kernel + event compaction +
    payload materialization; decode = word-row restrike + kernel."""

    def __init__(self, name: str, data: bytes, backend: str = "pallas",
                 lanes: int | None = None, inc: int | None = None,
                 climit_log2: int | None = None):
        from cpprcoder_tpu.models.qmodel import rcq_params
        from cpprcoder_tpu.ops import rcq_ops, rcq_pallas, range_ops
        from cpprcoder_tpu.utils.shapes import bucket

        self.name, self.data, self.backend = name, data, backend
        x = np.frombuffer(data, np.uint8)
        self.n = n = len(x)
        k, inc0, cl0 = rcq_params(n, lanes)
        self.k, self.inc = k, inc if inc is not None else inc0
        self.kp = max(k, rcq_pallas.MIN_LANES)
        self.cl = climit_log2 if climit_log2 is not None else cl0
        self.steps = steps = bucket(-(-n // k))
        self.x2d = jnp.asarray(range_ops._pad2d(x, steps, k))
        self.nn = U32(n)
        if backend == "pallas":
            self.enc = rcq_pallas._encode_call(steps, k, self.kp, self.inc,
                                               self.cl)
        else:
            self.enc = rcq_ops._encode_fn(steps, k, self.inc, self.cl)
        # the production wrapper (_encode_container) sizes the payload cap
        # from the ACTUAL compressed total; mirror it (one cheap probe run)
        total0 = int(self.enc(self.x2d, self.nn)[2])
        self.cap = cap = bucket(total0 + 8)
        if backend == "pallas":   # time-major events [E, K]
            self.mat = range_ops._materialize_t_fn(steps * 2 + 2, k, cap)
        else:
            self.mat = range_ops._materialize_fn(k, steps * 2 + 2, cap)
        self._rcq_ops = rcq_ops
        self._rcq_pallas = rcq_pallas
        self._bucket = bucket
        self.hdr = 8 + 2 * k
        self.enc_t = self.dec_t = None

    def _encode_full(self, x2d):
        events, lane_sizes, total = self.enc(x2d, self.nn)
        payload, sizes = self.mat(events)
        return payload, sizes, total

    def _enc_body(self, p):
        e = self._encode_full(self.x2d ^ p)
        return jnp.sum(e[0], dtype=U32) + jnp.sum(e[1], dtype=U32)

    def _dec_full(self, payload, sizes):
        rows = self._rows(payload, sizes)
        if self.backend == "pallas":
            out = self.dec(rows.T, self.nn)
        else:
            out = self.dec(rows, self.nn)
        return out

    def _dec_body(self, p):
        payload, sizes, _ = self._enc_out
        out = self._dec_full(payload ^ p, sizes)
        return jnp.sum(out, dtype=U32)

    def warm(self):
        from cpprcoder_tpu.ops.rcq_ops import _rows_fn

        self._enc_out = self._encode_full(self.x2d)
        payload, sizes, total = self._enc_out
        # l4 from the ACTUAL lane sizes (static per job), exactly like the
        # production decode wrapper
        max_sz = int(np.asarray(jax.device_get(sizes)).max())
        self.l4 = self._bucket(-(-max_sz // 4) + 1)
        self._rows = lambda pl_, sz: _rows_fn(self.k, self.l4, self.cap)(
            pl_, sz.astype(jnp.int32))
        if self.backend == "pallas":
            self.dec = self._rcq_pallas._decode_call(
                self.steps, self.k, self.kp, self.l4, self.inc, self.cl)
        else:
            self.dec = self._rcq_ops._decode_fn(
                self.steps, self.k, self.inc, self.cl, self.l4)
            self._rows = lambda pl_, sz: self._rcq_ops._rows_fn(
                self.k, self.l4, self.cap)(pl_, sz.astype(jnp.int32))
        self._dec_out = self._dec_full(payload, sizes)

    def _measure(self, body, rate):
        """Deterministic-reps slope with an honest wall-bound fallback.

        The slope protocol (timing.measure) returns NaN when walls disagree;
        a NaN row zeroed the whole round-2 driver metric. The fallback here
        never fabricates: min-wall(hi_loop)/hi INCLUDES the ~22 ms constant
        dispatch+fetch overhead, i.e. it is an upper bound on time per rep
        → a LOWER bound on throughput. Returns (seconds, how)."""
        import math

        from cpprcoder_tpu.bench.timing import _min_wall, make_loop

        hi = det_reps(self.n, rate)
        # sub-ms bodies can't open a TARGET_GAP-sized wall delta within the
        # 32-rep compile budget; compensate with more min-walls (jitter is
        # one-sided, min-of-9 cuts it well below the small gap)
        reps = 5 if self.n > 300_000 else 9
        t = _retry_nan(lambda: measure(body, 1, hi, repeats=reps), tries=2)
        if not math.isnan(t):
            return t, "slope"
        loop = make_loop(body, hi)
        int(loop())
        return _min_wall(loop, reps) / hi, "wall_ub"

    def warm_timing(self):
        """Compile (only) every timing-loop program this job will run, so a
        later measured run is compile-free (bench.py --warm build step)."""
        from cpprcoder_tpu.bench.timing import make_loop

        for body, rate in ((self._enc_body, ENC_RATE_EST),
                           (self._dec_body, DEC_RATE_EST)):
            for r in (1, det_reps(self.n, rate)):
                int(make_loop(body, r)())

    def run(self, reps_hi: int | None = None):
        self.enc_t, self.enc_how = self._measure(self._enc_body, ENC_RATE_EST)
        self.dec_t, self.dec_how = self._measure(self._dec_body, DEC_RATE_EST)

    def finalize(self) -> dict:
        eq = int(_equal_count(
            self._dec_out.astype(jnp.uint8).reshape(-1)[: self.n],
            self.x2d.reshape(-1)[: self.n]))
        total = int(self._enc_out[2])
        comp = total + self.hdr
        return {
            "file": self.name, "codec": f"rcq_{self.backend}",
            "bytes": self.n, "k": self.k, "compressed": comp,
            "ratio": comp / self.n,
            "enc_MBps": self.n / self.enc_t / 1e6,
            "dec_MBps": self.n / self.dec_t / 1e6,
            "timing": [getattr(self, "enc_how", "slope"),
                       getattr(self, "dec_how", "slope")],
            "roundtrip_ok": eq == self.n,
        }


# the slope-with-wall-bound measurement protocol is identical for both jobs
RCXJob._measure = RCQJob._measure


class SmallBatchRCXJob:
    """Several small files packed into ONE CT-RCX kernel dispatch.

    Each file owns a disjoint lane group and its own model-row block
    (ctx_base) inside the generalized kernels, so its output bytes are
    IDENTICAL to a solo encode with the same (k_i, inc, climit, cbits) —
    this is the CT-SB small-file packing of FORMATS.md made first-class
    in the bench. Per-file lane counts are chosen so chunk strides
    roughly equalize (no lane group idles the grid). Throughput rows are
    bytes-proportional shares of the one measured batch wall (every file
    rides the same dispatch), marked timing "batched(N)".
    """

    def __init__(self, items):
        from cpprcoder_tpu.models.cxmodel import rcx_params
        from cpprcoder_tpu.ops import rcx_pallas
        from cpprcoder_tpu.utils.shapes import bucket

        self.items = items                      # [(name, data)]
        from cpprcoder_tpu.models.cxmodel import WLOG_DEFAULT

        ns = [len(d) for _, d in items]
        self.total = sum(ns)
        n_max = max(ns)
        _, self.inc, self.cl, self.cbits = rcx_params(n_max)
        self.wlog = WLOG_DEFAULT
        s_target = -(-n_max // 128)
        self.ks, self.strides, self.offs = [], [], []
        off = 0
        for n in ns:
            k = 8
            while -(-n // k) > s_target and k < 128:
                k *= 2
            self.ks.append(k)
            self.strides.append(-(-n // k))
            self.offs.append(off)
            off += k
        self.k_tot = off
        self.kp = max(rcx_pallas.MIN_LANES, bucket(off))
        self.steps = steps = bucket(max(self.strides))
        xp = np.zeros((steps, self.kp), np.uint8)
        ll = np.zeros((1, self.kp), np.int32)
        cb = np.zeros((1, self.kp), np.int32)
        for i, (_, data) in enumerate(items):
            x = np.frombuffer(data, np.uint8)
            k, st, o = self.ks[i], self.strides[i], self.offs[i]
            col = np.zeros((k, steps), np.uint8)
            padded = np.zeros(k * st, np.uint8)
            padded[: len(x)] = x
            col[:, :st] = padded.reshape(k, st)
            xp[:, o:o + k] = col.T
            ll[0, o:o + k] = np.clip(len(x) - np.arange(k) * st, 0, st)
            cb[0, o:o + k] = i << self.cbits
        self.xp = jnp.asarray(xp)
        self.ll = jnp.asarray(ll)
        self.cb = jnp.asarray(cb)
        self.enc = rcx_pallas._encode_call_multi(
            steps, self.k_tot, self.kp, self.inc, self.cl, self.cbits,
            len(items), self.wlog)
        self._rcx_pallas = rcx_pallas
        self._bucket = bucket

    def _encode_full(self, xp):
        from cpprcoder_tpu.ops import compaction

        events, lane_sizes, total = self.enc(xp, self.ll, self.cb)
        rows, sizes = compaction.materialize_rows(events, self.l2)
        return rows, sizes, total

    def _enc_body(self, p):
        e = self._encode_full(self.xp ^ p)
        return (jnp.sum(e[0].astype(U32), dtype=U32)
                + jnp.sum(e[1], dtype=U32))

    def _dec_full(self, rows):
        from cpprcoder_tpu.ops import compaction

        rows_w = compaction.rows_to_be_words(rows)
        pad = self.kp - self.k_tot
        rw = jnp.concatenate(
            [rows_w, jnp.zeros((pad, self.l4), rows_w.dtype)]) \
            if pad else rows_w
        return self.dec(rw.T, self.ll, self.cb)

    def _dec_body(self, p):
        out = self._dec_full(self._enc_out[0] ^ p)
        return jnp.sum(out, dtype=jnp.int32).astype(U32)

    def warm(self):
        probe = self.enc(self.xp, self.ll, self.cb)
        max_sz = int(np.asarray(jax.device_get(probe[1])).max())
        self.l4 = self._bucket(-(-max_sz // 4) + 1)
        self.l2 = 4 * self.l4
        self._enc_out = self._encode_full(self.xp)
        self.dec = self._rcx_pallas._decode_call_multi(
            self.steps, self.k_tot, self.kp, self.l4, self.inc, self.cl,
            self.cbits, len(self.items), self.wlog)
        self._dec_out = self._dec_full(self._enc_out[0])

    def warm_timing(self):
        from cpprcoder_tpu.bench.timing import make_loop

        for body, rate in ((self._enc_body, ENC_RATE_EST),
                           (self._dec_body, DEC_RATE_EST)):
            for r in (1, det_reps(self.total, rate)):
                int(make_loop(body, r)())

    def run(self):
        from cpprcoder_tpu.bench.timing import measure

        self.enc_t = _retry_nan(
            lambda: measure(self._enc_body, 1,
                            det_reps(self.total, ENC_RATE_EST)))
        self.dec_t = _retry_nan(
            lambda: measure(self._dec_body, 1,
                            det_reps(self.total, DEC_RATE_EST)))

    def finalize(self):
        sizes = np.asarray(jax.device_get(self._enc_out[1]))
        out = np.asarray(jax.device_get(self._dec_out))  # [steps, kp]
        rows = []
        tag = f"batched({len(self.items)})"
        for i, (name, data) in enumerate(self.items):
            x = np.frombuffer(data, np.uint8)
            n, k, st, o = len(x), self.ks[i], self.strides[i], self.offs[i]
            cols = out[:, o:o + k].T.reshape(-1)  # [k*steps] lane-major
            got = np.concatenate([
                cols[j * self.steps: j * self.steps
                     + min(st, max(0, n - j * st))] for j in range(k)])
            ok = bool((got[:n].astype(np.uint8) == x).all())
            comp = int(sizes[o:o + k].sum()) + 10 + 2 * k
            share_t = self.enc_t * n / self.total
            share_d = self.dec_t * n / self.total
            rows.append({
                "file": name, "codec": "rcx_pallas", "bytes": n, "k": k,
                "cbits": self.cbits, "compressed": comp,
                "ratio": comp / n,
                "enc_MBps": n / share_t / 1e6,
                "dec_MBps": n / share_d / 1e6,
                "timing": [tag, tag], "roundtrip_ok": ok,
            })
        return rows
