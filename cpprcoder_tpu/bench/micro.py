"""Microbenchmarks of the primitive costs that shape the coder kernels.

Run on the real chip:  python -m cpprcoder_tpu.bench.micro

Measures (all with bench.timing.measure — in-jit unrolled reps, two-point
slope, NaN on instability):

  matmul       bf16 4096^3 chained matmul — validates the harness against
               the v5e peak (~197 TFLOP/s); a wildly-off number here means
               nothing else in the run can be trusted
  scan_min     per-step cost of a lax.scan whose body is a handful of [K]
               elementwise ops — the floor every scan-based coder pays
  scan_gather  per-step cost of one K-wide dynamic gather from an n-element
               u32 array inside a scan (the decode payload-refill pattern)
  scan_2level  per-step cost of the two-level adaptive-coder step pieces
               (coder_step_lookups2 + 256-cumsum), the CT-RC2 encode body
  scan_find2   per-step cost of find_symbol2 + hist (CT-RC2 decode body)
"""

from __future__ import annotations

import json

import jax
import jax.lax as lax
import jax.numpy as jnp

from cpprcoder_tpu.bench.timing import measure

U32 = jnp.uint32
I32 = jnp.int32
F32 = jnp.float32


def bench_matmul():
    x = jnp.ones((4096, 4096), jnp.bfloat16)

    def body(p):
        y = x + p.astype(jnp.bfloat16)
        for _ in range(8):
            y = jnp.dot(y, x, preferred_element_type=jnp.bfloat16)
        return y[0, 0].astype(U32)

    t = measure(body, 2, 6)
    return {"per_matmul_us": t / 8 * 1e6,
            "tflops": 8 * 2 * 4096**3 / t / 1e12 if t == t else float("nan")}


def _scan_bench(step_fn, carry0, steps: int, reps=(2, 6)):
    def body(p):
        c0 = jax.tree.map(
            lambda a: a + p.astype(a.dtype) if a.dtype == U32 else a, carry0)
        c, _ = lax.scan(step_fn, c0, None, length=steps)
        leaves = [l for l in jax.tree.leaves(c) if l.dtype == U32]
        return sum(jnp.sum(l, dtype=U32) for l in leaves)

    t = measure(body, *reps)
    return t / steps * 1e6  # us/step


def bench_scan_min(k: int, steps: int = 512):
    def step(c, _):
        x, y = c
        x = (x * U32(1664525) + y) ^ (x >> 7)
        y = y + (x & U32(0xFF))
        return (x, y), None

    us = _scan_bench(step, (jnp.arange(k, dtype=U32), jnp.ones(k, U32)), steps)
    return {"k": k, "us_per_step": us}


def bench_scan_gather(k: int, n: int, steps: int = 512):
    table = jnp.arange(n, dtype=U32)

    def step(c, _):
        x, = c
        idx = (x % U32(n)).astype(I32)
        x = x + table[idx]
        return (x,), None

    us = _scan_bench(step, (jnp.arange(k, dtype=U32),), steps)
    return {"k": k, "n": n, "us_per_step": us,
            "ns_per_elem": us * 1e3 / k}


def bench_scan_2level(k: int, steps: int = 512):
    from cpprcoder_tpu.ops.lookup import coder_step_lookups2

    def step(c, _):
        syms, freqs, total = c
        cum_incl = jnp.cumsum(freqs)
        f, cum, upd = coder_step_lookups2(
            freqs, cum_incl, (syms & U32(255)).astype(I32),
            jnp.ones(k, bool), 24)
        freqs = freqs + upd
        total = total + f + cum
        syms = syms * U32(1664525) + U32(1)
        return (syms, freqs, total), None

    us = _scan_bench(
        step, (jnp.arange(k, dtype=U32), jnp.ones(256, U32),
               jnp.zeros(k, U32)), steps)
    return {"k": k, "us_per_step": us}


def bench_scan_find2(k: int, steps: int = 512):
    from cpprcoder_tpu.ops.lookup import find_symbol2, hist_from_onehots

    def step(c, _):
        v, freqs = c
        cum_incl = jnp.cumsum(freqs)
        tot = cum_incl[255]
        s, cc, f, ohs = find_symbol2(cum_incl, v % tot, jnp.ones(k, bool))
        freqs = freqs + hist_from_onehots(*ohs, 24)
        v = v * U32(1664525) + cc + f
        return (v, freqs), None

    us = _scan_bench(
        step, (jnp.arange(k, dtype=U32), jnp.ones(256, U32)), steps)
    return {"k": k, "us_per_step": us}


def main():
    out = {"matmul": bench_matmul()}
    print(json.dumps({"matmul": out["matmul"]}), flush=True)
    for k in (256, 2048, 8192):
        out[f"scan_min_k{k}"] = bench_scan_min(k)
        print(json.dumps({f"scan_min_k{k}": out[f"scan_min_k{k}"]}), flush=True)
    for k in (256, 2048, 8192):
        r = bench_scan_gather(k, 1 << 20)
        out[f"scan_gather_k{k}"] = r
        print(json.dumps({f"scan_gather_k{k}": r}), flush=True)
    out["scan_gather_small_src"] = bench_scan_gather(8192, 4096)
    print(json.dumps({"scan_gather_small_src": out["scan_gather_small_src"]}),
          flush=True)
    for k in (256, 2048, 8192):
        r = bench_scan_2level(k)
        out[f"scan_2level_k{k}"] = r
        print(json.dumps({f"scan_2level_k{k}": r}), flush=True)
    for k in (2048, 8192):
        r = bench_scan_find2(k)
        out[f"scan_find2_k{k}"] = r
        print(json.dumps({f"scan_find2_k{k}": r}), flush=True)
    return out


if __name__ == "__main__":
    from cpprcoder_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    main()
