import json
from cpprcoder_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from cpprcoder_tpu.bench.device import RCQJob, U32
from cpprcoder_tpu.bench.harness import load
from cpprcoder_tpu.bench.timing import measure

j = RCQJob("kennedy.xls", load("kennedy.xls"), backend="pallas", lanes=1024)
j.warm()

def kern_only(p):
    events, lane_sizes, total = j.enc(j.x2d ^ p, j.nn)
    return jnp.sum(lane_sizes, dtype=jnp.int32).astype(U32) + total.astype(U32)

def mat_only(p):
    ev = j._events_cache ^ p.astype(U32)
    payload, sizes = j.mat(ev)
    return jnp.sum(payload, dtype=U32) + jnp.sum(sizes, dtype=U32)

j._events_cache = j.enc(j.x2d, j.nn)[0]
t1 = measure(kern_only, 1, 4, repeats=5)
print(json.dumps({"kernel_only_MBps": j.n / t1 / 1e6, "t": t1}), flush=True)
t2 = measure(mat_only, 1, 4, repeats=5)
print(json.dumps({"materialize_MBps": j.n / t2 / 1e6, "t": t2}), flush=True)
