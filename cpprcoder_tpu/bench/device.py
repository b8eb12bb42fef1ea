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
        self.enc_t = measure(self._enc_body)
        self.dec_t = measure(self._dec_body)

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
