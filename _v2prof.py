import numpy as np, jax, jax.numpy as jnp, jax.lax as lax
from cpprcoder_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from cpprcoder_tpu.ops import lz_ops as L
from cpprcoder_tpu.bench.timing import measure

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

# stage 1: match table (big sort + alcp + neighbors + inverse sort)
def body_mt(p):
    lcp, cand = L._match_table_v2(bj + p, lj)
    return ck(lcp, cand)
print('match_table ms', round(measure(body_mt, 2, 8)*1e3, 1), flush=True)

# stage 2: membership (block tables + scan + orbit)
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
print('membership ms', round(measure(body_mem, 2, 8)*1e3, 1), flush=True)

# stage 2a: block tables only (one-hot rounds)
def body_tab(p):
    step = jnp.where(valid0, mlen0 + p.astype(I32)*0, 1)
    nxt = jnp.minimum(pos + step, s)
    B = 128; nb = s // B; M = nseg*nb
    base = ((jnp.arange(M, dtype=I32) % nb) * B)[:, None]
    A = nxt.reshape(M, B)
    acc = jnp.uint32(0)
    for _ in range(7):
        rel = jnp.clip(A - base, 0, B - 1)
        comp = L._ohg(A, rel, B)
        inb = (A >= base) & (A < base + B)
        A = jnp.where(inb, comp, A)
    return ck(A)
print('block tables ms', round(measure(body_tab, 2, 8)*1e3, 1), flush=True)

# stage 3: clamp gathers
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
print('clamp ms', round(measure(body_clamp, 2, 8)*1e3, 1), flush=True)
