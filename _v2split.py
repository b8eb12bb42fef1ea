import time, numpy as np, jax, jax.numpy as jnp
from cpprcoder_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from cpprcoder_tpu.ops import lz_ops as L
from cpprcoder_tpu.bench.timing import make_loop

data = open('data/kennedy.xls','rb').read()
n = len(data); s = 1<<17
n_segs = -(-n//s)
blocks = np.zeros((n_segs, s), np.uint8); blocks.reshape(-1)[:n] = np.frombuffer(data, np.uint8)
lens = np.minimum(s, n - np.arange(n_segs)*s).astype(np.int32)
bj, lj = jnp.asarray(blocks), jnp.asarray(lens)
t_cap = L._t_cap(s)
out_cap = n_segs*s + (n_segs*s)//200 + 64*n_segs + 1024
parse = L._parse_fn_v2.__wrapped__(n_segs, s, t_cap, True)
ser = L._serialize_fn_v2.__wrapped__(n_segs, s, t_cap, out_cap)

def ck(*outs):
    acc = jnp.uint32(0)
    for o in outs:
        acc = acc + jnp.sum(o.astype(jnp.uint32))
    return acc

def walls(name, body, r1=1, r2=2):
    lo = make_loop(body, r1); hi = make_loop(body, r2)
    int(lo()); int(hi())
    w1=[];w2=[]
    for _ in range(8):
        t0=time.perf_counter(); int(lo()); w1.append(time.perf_counter()-t0)
        t0=time.perf_counter(); int(hi()); w2.append(time.perf_counter()-t0)
    w1.sort(); w2.sort()
    print(name, f'w{r1} min', round(w1[0]*1e3,1), f'w{r2} min', round(w2[0]*1e3,1),
          'slope', round((w2[0]-w1[0])/(r2-r1)*1e3,1), flush=True)

def body_parse(p):
    return ck(*parse(bj + p, lj))
walls('parse_only', body_parse)

pr = parse(bj, lj)
pr = tuple(jnp.asarray(np.asarray(jax.device_get(x))) for x in pr)
def body_ser(p):
    return ck(*ser(bj + p, lj, *pr))
walls('ser_only', body_ser)
