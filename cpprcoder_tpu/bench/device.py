"""Device-resident benchmarking.

This development environment reaches its TPU through a tunnel with two
measured quirks (see bench.py header): ~35-60 ms latency per host↔device
transfer, and — critically — the FIRST device→host transfer in a process
permanently degrades every subsequent dispatch to ~35 ms. Production TPU
hosts (PCIe DMA, data already in HBM for pipeline use-cases) do not behave
this way.

Therefore benchmarking follows a strict protocol:
  1. prepare: move inputs host→device, compile, and warm every kernel
     (no device→host transfer anywhere on this path — output buffers use
     static worst-case caps so no data-dependent shape sync is needed);
  2. time: run the jitted compute, block_until_ready only;
  3. finalize: AFTER all timing, transfer results, verify round-trips
     byte-for-byte, and compute ratios.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from cpprcoder_tpu.config import adaptive_params_for, pick_lanes
from cpprcoder_tpu.ops import range_ops
from cpprcoder_tpu.utils.shapes import bucket

U32 = jnp.uint32


def _time(fn, reps: int) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


@jax.jit
def _equal_count(a, b):
    """Device-side verification: number of equal elements (only this scalar
    crosses the tunnel — bulk d2h is pathologically slow here)."""
    return (a.reshape(-1) == b.reshape(-1)).sum()


def _out_cap(n: int, k: int) -> int:
    # worst-case CT-RC payload: ~n bytes (incompressible) + per-lane flush
    return bucket(n + (n >> 4) + 16 * k + 1024)


class RCJob:
    """One file × one RC codec, run under the no-d2h-before-timing protocol."""

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
        self.result = None

    def encode_once(self):
        out = self.enc(self.x2d, self.nn)
        events = out[0]
        payload, sizes = self.mat(events)
        extras = out[3:]  # static: freqs
        return (payload, sizes, out[2]) + tuple(extras)

    def decode_once(self, enc_out):
        payload, sizes = enc_out[0], enc_out[1]
        if self.kind == "static":
            return self.dec(payload, sizes, enc_out[3])
        return self.dec(payload, sizes, self.nn)

    def warm(self):
        self._enc_out = self.encode_once()
        self._dec_out = self.decode_once(self._enc_out)
        jax.block_until_ready((self._enc_out, self._dec_out))

    def run(self, reps: int = 5):
        self.enc_t = _time(self.encode_once, reps)
        self.dec_t = _time(lambda: self.decode_once(self._enc_out), reps)

    def finalize(self) -> dict:
        # device-side verification against the (padded) input; pad symbols
        # decode to themselves-or-garbage, so compare only the first n
        eq = int(_equal_count(self._dec_out.reshape(-1)[: self.n],
                              self.x2d.reshape(-1)[: self.n]))
        ok = eq == self.n
        total = int(self._enc_out[2])
        comp = total + self.hdr
        self.result = {
            "file": self.name, "codec": f"{self.kind}_range", "bytes": self.n,
            "k": self.k, "compressed": comp, "ratio": comp / self.n,
            "enc_MBps": self.n / self.enc_t / 1e6,
            "dec_MBps": self.n / self.dec_t / 1e6,
            "roundtrip_ok": bool(ok),
        }
        return self.result


def _materialize_cap_fix(job):
    return job


def bench_corpus(kinds=("static", "adaptive"), files=None, reps: int = 5,
                 load=None) -> list[dict]:
    """Benchmark corpus files under the transfer-poisoning protocol:
    prepare+warm+time ALL jobs first, then verify/fetch."""
    from cpprcoder_tpu.bench.harness import CANTERBURY
    from cpprcoder_tpu.bench.harness import load as _load

    load = load or _load
    files = files or CANTERBURY
    jobs = [RCJob(f, load(f), kind) for kind in kinds for f in files]
    for j in jobs:
        j.warm()
    for j in jobs:
        j.run(reps)
    return [j.finalize() for j in jobs]
