"""Large-stream device benchmark (BASELINE Config 5 scale, single chip).

Splits a synthetic multi-block stream into device-resident superblocks and
times the jitted encode/decode loops under the no-d2h-before-timing protocol
(see bench/device.py); verification happens after timing.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from cpprcoder_tpu.config import adaptive_params_for
from cpprcoder_tpu.ops import range_ops, rans_ops
from cpprcoder_tpu.utils.shapes import bucket

U32 = jnp.uint32


def bench_large(total_bytes: int = 1 << 30, superblock: int = 1 << 25,
                k: int = 8192, codec: str = "rans", reps: int = 2,
                seed: int = 0, verify: bool = True) -> dict:
    from cpprcoder_tpu.bench.synth import synth_stream

    data = synth_stream(total_bytes, seed)
    n_sb = -(-len(data) // superblock)
    steps = bucket(-(-superblock // k))
    sbs = []
    for i in range(n_sb):
        chunk = data[i * superblock:(i + 1) * superblock]
        sbs.append((jnp.asarray(range_ops._pad2d(chunk, steps, k)),
                    U32(len(chunk))))
    jax.block_until_ready([s[0] for s in sbs])

    if codec == "rans":
        enc = rans_ops._encode_fn(steps, k)
        w_cap = bucket(superblock + 16 * k + 1024)
        stream_fn = rans_ops._stream_fn(steps * k, w_cap)
        dec = rans_ops._decode_fn(steps, k, w_cap)

        def encode_sb(x2d, nn):
            states, emits, words, pstart, n_words, freqs = enc(x2d, nn)
            stream = stream_fn(words, pstart, n_words)
            return stream, states, freqs, n_words

        def decode_sb(e, nn):
            return dec(e[0], e[1], e[2], nn)

        def comp_size(e):
            return int(e[3]) * 2 + 512 + 4 * k + 9

    elif codec in ("adaptive", "static"):
        cap = bucket(superblock + (superblock >> 4) + 16 * k + 1024)
        if codec == "adaptive":
            inc, ll = adaptive_params_for(k)
            enc = range_ops._adaptive_encode_fn(steps, k, inc, ll)
            dec = range_ops._adaptive_decode_fn(steps, k, inc, ll, cap)
            n_slots = 2 if ll <= 16 else 3
        else:
            enc = range_ops._static_encode_fn(steps, k)
            dec = range_ops._static_decode_fn(steps, k, cap)
            n_slots = 2
        mat = range_ops._materialize_fn(k, steps * n_slots + 2, cap)

        def encode_sb(x2d, nn):
            out = enc(x2d, nn)
            payload, sizes = mat(out[0])
            return (payload, sizes, out[2]) + tuple(out[3:])

        def decode_sb(e, nn):
            if codec == "static":
                return dec(e[0], e[1], e[3])
            return dec(e[0], e[1], nn)

        def comp_size(e):
            return int(e[2]) + 2 * k + 9 + (512 if codec == "static" else 0)
    else:
        raise ValueError(codec)

    # warm
    encs = [encode_sb(x, nn) for x, nn in sbs]
    outs = [decode_sb(e, nn) for e, (_, nn) in zip(encs, sbs)]
    jax.block_until_ready((encs, outs))

    best_enc = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        encs = [encode_sb(x, nn) for x, nn in sbs]
        jax.block_until_ready(encs)
        best_enc = min(best_enc, time.perf_counter() - t0)
    best_dec = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [decode_sb(e, nn) for e, (_, nn) in zip(encs, sbs)]
        jax.block_until_ready(outs)
        best_dec = min(best_dec, time.perf_counter() - t0)

    # after timing: sizes + verification. Both stay device-side (bulk d2h is
    # pathologically slow over this tunnel); only scalars are fetched.
    from cpprcoder_tpu.bench.device import _equal_count

    comp = sum(comp_size(e) for e in encs)
    ok = True
    if verify:
        for (x2d, nn), out in zip(sbs, outs):
            nb = int(nn)
            eq = int(_equal_count(out.reshape(-1)[:nb], x2d.reshape(-1)[:nb]))
            if eq != nb:
                ok = False
                break
    return {
        "codec": codec, "bytes": len(data), "k": k, "superblock": superblock,
        "compressed": comp, "ratio": comp / len(data),
        "enc_GBps": len(data) / best_enc / 1e9,
        "dec_GBps": len(data) / best_dec / 1e9,
        "roundtrip_ok": ok,
    }


if __name__ == "__main__":
    import json
    import sys

    total = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 30
    for codec in (sys.argv[2].split(",") if len(sys.argv) > 2
                  else ["rans", "adaptive", "static"]):
        print(json.dumps(bench_large(total_bytes=total, codec=codec)))
