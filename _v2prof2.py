import time, numpy as np, jax, jax.numpy as jnp, jax.lax as lax
from cpprcoder_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from cpprcoder_tpu.ops import lz_ops as L
from cpprcoder_tpu.bench.timing import make_loop

data = open('data/kennedy.xls','rb').read()
n = len(data); s = 1<<17
nseg = -(-n//s)
blocks = np.zeros((nseg, s), np.uint8); blocks.reshape(-1)[:n] = np.frombuffer(data, np.uint8)
lens = np.minimum(s, n - np.arange(nseg)*s).astype(np.int32)
bj, lj = jnp.asarray(blocks), jnp.asarray(lens)
I32 = jnp.int32

def ck(*outs):
    acc = jnp.uint32(0)
    for o in outs:
        acc = acc + jnp.sum(o.astype(jnp.uint32))
    return acc

def walls(name, body):
    lo = make_loop(body, 1); hi = make_loop(body, 2)
    int(lo()); int(hi())
    w1 = [0]*10; w2 = [0]*10
    for i in range(10):
        t0=time.perf_counter(); int(lo()); w1[i]=time.perf_counter()-t0
        t0=time.perf_counter(); int(hi()); w2[i]=time.perf_counter()-t0
    w1s = sorted(w1); w2s = sorted(w2)
    print(name, 'wall1 med', round(w1s[5]*1e3,1), 'min', round(w1s[0]*1e3,1),
          'wall2 med', round(w2s[5]*1e3,1), 'min', round(w2s[0]*1e3,1),
          'slope(med)', round((w2s[5]-w1s[5])*1e3,1), flush=True)

def body_mt(p):
    lcp, cand = L._match_table_v2(bj + p, lj)
    return ck(lcp, cand)
mtout = jax.jit(L._match_table_v2)(bj, lj)
lcp0, cand0 = [jnp.asarray(np.asarray(jax.device_get(o))) for o in mtout]
pos = jnp.broadcast_to(jnp.arange(s, dtype=I32), (nseg, s))
ll = lj[:, None]
valid0 = (cand0 >= 0) & (pos <= ll - 12)
mlen0 = jnp.minimum(lcp0, ll - 5 - pos)
valid0 = valid0 & (mlen0 >= 4)
def body_mem(p):
    step = jnp.where(valid0, mlen0 + p.astype(I32)*0, 1)
    nxt = jnp.minimum(pos + step, s)
    vis = L._greedy_membership(nxt, nseg, s)
    return ck(vis)
off0 = jnp.where(valid0, pos - cand0, 0)
def body_clamp(p):
    mstart = lax.cummax(jnp.where(valid0, pos, -1), axis=1)
    packed = jnp.where(valid0, (off0 << 13) | mlen0, 0) + p.astype(I32)*0
    pk_at = jnp.take_along_axis(packed, jnp.clip(mstart, 0), axis=1)
    src = jnp.clip(pos - (pk_at >> 13), 0)
    neq = jnp.take_along_axis(bj, src, axis=1) != bj
    badpos = jnp.where(neq, pos, s)
    rcm = lax.cummin(badpos, axis=1, reverse=True)
    return ck(rcm)
walls('match_table', body_mt)
walls('membership', body_mem)
walls('clamp', body_clamp)
