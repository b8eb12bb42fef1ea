import numpy as np, jax, jax.numpy as jnp, time
from cpprcoder_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from cpprcoder_tpu.ops import lz_ops as L
from cpprcoder_tpu.reference import slz4_ref as R
from cpprcoder_tpu.bench.timing import measure

# correctness on device first
for fn in ['fields.c', 'alice29.txt']:
    data = open('data/'+fn,'rb').read()
    t0=time.time()
    jb = L.slz4_encode_jax(data, parse="v2")
    print(fn, 'encode wall (cold)', round(time.time()-t0,1), flush=True)
    ob = R.slz4_encode(data, parse="v2")
    print(fn, 'identical', jb == ob, 'ratio', round(len(jb)/len(data),4), flush=True)
    assert L.slz4_decode_jax(jb) == data

# timing: kennedy and ptt5
for fn in ['kennedy.xls', 'ptt5']:
    data = open('data/'+fn,'rb').read()
    n = len(data); s = 1<<17
    n_segs = -(-n//s)
    blocks = np.zeros((n_segs, s), np.uint8); blocks.reshape(-1)[:n] = np.frombuffer(data, np.uint8)
    lens = np.minimum(s, n - np.arange(n_segs)*s).astype(np.int32)
    bj, lj = jnp.asarray(blocks), jnp.asarray(lens)
    t_cap = L._t_cap(s)
    out_cap = n_segs*s + (n_segs*s)//200 + 64*n_segs + 1024
    parse = L._parse_fn_v2.__wrapped__(n_segs, s, t_cap, True)
    ser = L._serialize_fn.__wrapped__(n_segs, s, t_cap, out_cap)
    def body(p):
        pr = parse(bj + p, lj)
        payload, seg_sizes, total = ser(bj + p, lj, *pr)
        acc = jnp.sum(payload.astype(jnp.uint32)) + jnp.sum(seg_sizes.astype(jnp.uint32)) + total.astype(jnp.uint32)
        for x in pr:
            acc = acc + jnp.sum(x.astype(jnp.uint32))
        return acc.astype(jnp.uint32)
    t = measure(body, reps_lo=2, reps_hi=8)
    print(fn, n, 'bytes enc full-path ms', round(t*1e3,2), 'MB/s', round(n/1e6/t,1), flush=True)
