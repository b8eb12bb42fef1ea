import json, time
from cpprcoder_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.lax as lax, jax.numpy as jnp
import numpy as np
from cpprcoder_tpu.bench.timing import make_loop

N_EV = 2 << 20
N_POS = 1 << 20
U32 = jnp.uint32

keys0 = jnp.asarray(np.random.default_rng(0).integers(0, 1 << 30, N_EV, dtype=np.uint32))
vals0 = jnp.arange(N_EV, dtype=U32)
table = jnp.sort(keys0)
queries = jnp.asarray(np.sort(np.random.default_rng(1).integers(0, 1 << 30, N_POS, dtype=np.uint32)))

def sort_pairs(p):
    k = keys0 ^ p.astype(U32)
    sk, sv = lax.sort((k, vals0), num_keys=1)
    return sk[0].astype(U32) + sv[-1].astype(U32)

def bulk_gather(p):
    idx = ((vals0[:N_POS] * U32(2654435761) + p.astype(U32)) % U32(N_EV)).astype(jnp.int32)
    return jnp.sum(table[idx], dtype=U32)

def ssorted(p):
    q = queries ^ p.astype(U32)
    e = jnp.searchsorted(table, q, side="right")
    return jnp.sum(e.astype(U32), dtype=U32)

def cumsum_big(p):
    k = keys0 ^ p.astype(U32)
    return jnp.cumsum(k)[-1]

for name, fn in (("sort_2M_pairs", sort_pairs), ("gather_1M_of_2M", bulk_gather),
                 ("searchsorted_1M_in_2M", ssorted), ("cumsum_2M", cumsum_big)):
    lo, hi = make_loop(fn, 1), make_loop(fn, 5)
    int(lo()); int(hi())
    wl = [0]*6; wh = [0]*6
    for i in range(6):
        t0=time.perf_counter(); int(lo()); wl[i]=time.perf_counter()-t0
        t0=time.perf_counter(); int(hi()); wh[i]=time.perf_counter()-t0
    slope = (min(wh) - min(wl)) / 4
    print(json.dumps({name: {"ms": slope*1e3,
        "wl": [round(w*1e3,1) for w in wl], "wh": [round(w*1e3,1) for w in wh]}}), flush=True)
