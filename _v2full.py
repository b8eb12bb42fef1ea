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
def body(p):
    pr = parse(bj + p, lj)
    payload, seg_sizes, total = ser(bj + p, lj, *pr)
    acc = jnp.sum(payload.astype(jnp.uint32)) + jnp.sum(seg_sizes.astype(jnp.uint32)) + total.astype(jnp.uint32)
    for x in pr:
        acc = acc + jnp.sum(x.astype(jnp.uint32))
    return acc.astype(jnp.uint32)
lo = make_loop(body, 2); hi = make_loop(body, 8)
int(lo()); int(hi())
for tag, f, r in (('w2', lo, 2), ('w8', hi, 8)):
    ws = []
    for _ in range(8):
        t0=time.perf_counter(); int(f()); ws.append(time.perf_counter()-t0)
    ws.sort()
    print(tag, 'min', round(ws[0]*1e3,1), 'med', round(ws[4]*1e3,1), flush=True)
