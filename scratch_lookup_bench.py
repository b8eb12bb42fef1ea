"""Microbench: adaptive encode scan with 3 lookup strategies on real TPU."""
import numpy as np
import jax
import jax.numpy as jnp
import jax.lax as lax
from functools import lru_cache

from cpprcoder_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from cpprcoder_tpu.bench.timing import measure
from cpprcoder_tpu.ops import rc_common
from cpprcoder_tpu.ops.lookup import (
    coder_step_lookups, coder_step_lookups2, find_symbol_of, histogram256,
    find_symbol, find_symbol2, hist_from_onehots)
from cpprcoder_tpu.config import adaptive_params_for, pick_lanes
from cpprcoder_tpu.utils.shapes import bucket

U32 = jnp.uint32
I32 = jnp.int32

print("devices:", jax.devices())

N = 1 << 22  # 4 MiB
rng = np.random.default_rng(0)
x = rng.integers(0, 64, N).astype(np.uint8)  # mildly compressible
k = pick_lanes(N)
steps = bucket(-(-N // k))
inc, ll = adaptive_params_for(k)
limit = 1 << ll
n_slots = 2 if ll <= 16 else 3
print(f"N={N} k={k} steps={steps} inc={inc} ll={ll}")

x2d = np.zeros(steps * k, np.uint8)
x2d[:N] = x
x2d = jnp.asarray(x2d.reshape(steps, k))
nn = U32(N)


def make_enc(variant):
    @jax.jit
    def run(x2d, n, p):
        x2d = x2d ^ p
        st = rc_common.make_state(k)
        lane_ids = jnp.arange(k, dtype=U32)
        freqs0 = jnp.ones(256, U32)

        def step(carry, xt):
            st, t_idx, freqs, total = carry
            resc = total >= U32(limit)
            f_resc = (freqs >> 1) | 1
            freqs = jnp.where(resc, f_resc, freqs)
            total = jnp.where(resc, f_resc.sum(), total)
            cum_incl = jnp.cumsum(freqs)
            syms = xt.astype(I32)
            active = (t_idx * k + lane_ids) < n
            if variant == "vpu":
                f, c = find_symbol_of(freqs, cum_incl, syms)
                upd = histogram256(syms, inc, active)
            elif variant == "mxu256":
                f, c, upd = coder_step_lookups(freqs, cum_incl, syms, active, inc)
            else:
                f, c, upd = coder_step_lookups2(freqs, cum_incl, syms, active, inc)
            t = st[2] // total
            is_top = (c + f) == total
            st, evs = rc_common.encode_symbol(st, t, c, f, is_top, active, n_slots)
            freqs = freqs + upd
            total = total + U32(inc) * active.sum().astype(U32)
            return (st, t_idx + 1, freqs, total), evs

        (st, _, _, _), evs = lax.scan(step, (st, U32(0), freqs0, U32(256)), x2d)
        return jnp.sum(evs[-1], dtype=U32) + st[0].sum() + st[2].sum()

    return run


def make_dec_probe(variant):
    """Decode-side probe: just the find+update part per step (state math
    shared across variants), to isolate the symbol-search cost."""
    @jax.jit
    def run(x2d, n, p):
        lane_ids = jnp.arange(k, dtype=U32)
        freqs0 = jnp.ones(256, U32)
        v0 = (x2d[0].astype(U32) * 7 + p) & U32(0xFF)

        def step(carry, xt):
            v, t_idx, freqs, total = carry
            resc = total >= U32(limit)
            f_resc = (freqs >> 1) | 1
            freqs = jnp.where(resc, f_resc, freqs)
            total = jnp.where(resc, f_resc.sum(), total)
            cum_incl = jnp.cumsum(freqs)
            active = (t_idx * k + lane_ids) < n
            vv = jnp.minimum(v + xt.astype(U32), total - 1)
            if variant == "vpu":
                s, c, f = find_symbol(cum_incl, vv)
                upd = histogram256(s, inc, active)
            else:
                s, c, f, ohs = find_symbol2(cum_incl, vv, active)
                upd = hist_from_onehots(*ohs, inc)
            freqs = freqs + upd
            total = total + U32(inc) * active.sum().astype(U32)
            v = (vv ^ c ^ f) & U32(0xFF)
            return (v, t_idx + 1, freqs, total), None

        (v, _, _, tot), _ = lax.scan(step, (v0, U32(0), freqs0, U32(256)), x2d)
        return v.sum() + tot

    return run


for name in ["mxu256", "two16", "vpu"]:
    fn = make_enc(name)
    t = measure(lambda p, fn=fn: fn(x2d, nn, p), 1, 2)
    print(f"enc {name:8s}: {t*1e3:8.2f} ms  {N/t/1e6:8.1f} MB/s  {t/steps*1e6:6.2f} us/step")

for name in ["vpu", "two16"]:
    fn = make_dec_probe(name)
    t = measure(lambda p, fn=fn: fn(x2d, nn, p), 1, 2)
    print(f"decprobe {name:8s}: {t*1e3:8.2f} ms  {N/t/1e6:8.1f} MB/s  {t/steps*1e6:6.2f} us/step")
