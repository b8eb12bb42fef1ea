import json
from cpprcoder_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax.numpy as jnp
from cpprcoder_tpu.bench.device import RCQJob, U32, _equal_count
from cpprcoder_tpu.bench.harness import load
from cpprcoder_tpu.bench.timing import measure

# TPU round-trip of the new compaction via the production wrappers
from cpprcoder_tpu.codecs import get_codec
for f, backend in (("fields.c", "pallas"), ("alice29.txt", "pallas")):
    data = load(f)
    c = get_codec("rcq")
    blob = c._encode(data, backend=backend)
    from cpprcoder_tpu.reference import rcq_ref
    assert blob == rcq_ref.rcq_encode(data), f"{f}: jax != oracle container"
    assert c.decode(blob, backend=backend) == data, f"{f}: roundtrip"
    print(json.dumps({"file": f, "backend": backend, "tpu_roundtrip": True,
                      "container_identical_to_oracle": True}), flush=True)

j = RCQJob("kennedy.xls", load("kennedy.xls"), backend="pallas")
j.warm()
ev0 = j.enc(j.x2d, j.nn)[0]

def mat_only(p):
    ev = ev0 ^ p.astype(U32)
    payload, sizes = j.mat(ev)
    return jnp.sum(payload, dtype=U32) + jnp.sum(sizes, dtype=U32)

def enc_full(p):
    e = j._encode_full(j.x2d ^ p)
    return jnp.sum(e[0], dtype=U32) + jnp.sum(e[1], dtype=U32)

for lbl, body in (("mat", mat_only), ("enc_full", enc_full)):
    t = measure(body, 1, 8, repeats=6)
    print(json.dumps({lbl + "_ms": t * 1e3, lbl + "_MBps": j.n / t / 1e6}),
          flush=True)

# small file on the padded-lane pallas path (k=32 -> kp=128)
js = RCQJob("fields.c", load("fields.c"), backend="pallas")
js.warm()
eq = int(_equal_count(js._dec_out.astype(jnp.uint8).reshape(-1)[: js.n],
                      js.x2d.reshape(-1)[: js.n]))
print(json.dumps({"fields_pallas_roundtrip": eq == js.n, "k": js.k,
                  "kp": js.kp}), flush=True)
for lbl, body in (("fields_enc", js._enc_body), ("fields_dec", js._dec_body)):
    t = measure(body, 1, 16, repeats=8)
    print(json.dumps({lbl + "_ms": t * 1e3, lbl + "_MBps": js.n / t / 1e6}),
          flush=True)
