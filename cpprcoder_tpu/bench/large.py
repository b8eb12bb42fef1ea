"""Large-stream device benchmark (BASELINE Config 5 scale, single chip).

Times one superblock with the in-jit repetition method (bench.timing) and
scales by the superblock count — superblocks are identical independent work
(that is the point of the CT-SB framing), so per-superblock device time ×
count is the stream time. Verification covers every superblock, on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cpprcoder_tpu.bench.timing import measure
from cpprcoder_tpu.config import adaptive_params_for
from cpprcoder_tpu.ops import range_ops, rans_ops
from cpprcoder_tpu.utils.shapes import bucket

U32 = jnp.uint32


def bench_large(total_bytes: int = 1 << 30, superblock: int = 1 << 25,
                k: int = 8192, codec: str = "rans", seed: int = 0,
                verify: bool = True, verify_blocks: int = 4) -> dict:
    from cpprcoder_tpu.bench.device import _equal_count
    from cpprcoder_tpu.bench.synth import synth_stream

    data = synth_stream(total_bytes, seed)
    n_sb = -(-len(data) // superblock)
    steps = bucket(-(-superblock // k))
    nn = U32(superblock)

    if codec == "rans":
        enc = rans_ops._encode_fn(steps, k)
        w_cap = bucket(superblock + 16 * k + 1024)
        stream_fn = rans_ops._stream_fn(steps * k, w_cap)
        dec = rans_ops._decode_fn(steps, k, w_cap)

        def encode_sb(x2d):
            states, emits, words, pstart, n_words, freqs = enc(x2d, nn)
            stream = stream_fn(words, pstart, n_words)
            return stream, states, freqs, n_words

        def decode_sb(e):
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

        def encode_sb(x2d):
            out = enc(x2d, nn)
            payload, sizes = mat(out[0])
            return (payload, sizes, out[2]) + tuple(out[3:])

        def decode_sb(e):
            if codec == "static":
                return dec(e[0], e[1], e[3])
            return dec(e[0], e[1], nn)

        def comp_size(e):
            return int(e[2]) + 2 * k + 9 + (512 if codec == "static" else 0)
    else:
        raise ValueError(codec)

    # timing on superblock 0
    x0 = jnp.asarray(range_ops._pad2d(data[:superblock], steps, k))
    e0 = encode_sb(x0)

    def enc_body(p):
        e = encode_sb(x0 ^ p)
        return jnp.sum(e[0].astype(U32)) + jnp.sum(e[1].astype(U32))

    def dec_body(p):
        out = decode_sb((e0[0] ^ p.astype(e0[0].dtype),) + e0[1:])
        return jnp.sum(out, dtype=U32)

    enc_t = measure(enc_body, 1, 3)
    dec_t = measure(dec_body, 1, 3)

    # ratio + verification over (a sample of) superblocks
    comp = 0
    ok = True
    checked = 0
    for i in range(n_sb):
        chunk = data[i * superblock:(i + 1) * superblock]
        if i == 0:
            x2d, e = x0, e0
        elif verify and checked < verify_blocks:
            x2d = jnp.asarray(range_ops._pad2d(chunk, steps, k))
            e = encode_sb(x2d)
        else:
            break
        comp += comp_size(e)
        if verify and checked < verify_blocks:
            out = decode_sb(e)
            nb = len(chunk)
            eq = int(_equal_count(out.reshape(-1)[:nb], x2d.reshape(-1)[:nb]))
            ok &= eq == nb
            checked += 1
    ratio = (comp / checked) * n_sb / len(data) if checked else float("nan")
    return {
        "codec": codec, "bytes": len(data), "k": k, "superblock": superblock,
        "n_superblocks": n_sb, "ratio_est": ratio,
        "enc_GBps": superblock / enc_t / 1e9,
        "dec_GBps": superblock / dec_t / 1e9,
        "stream_enc_s": enc_t * n_sb, "stream_dec_s": dec_t * n_sb,
        "roundtrip_ok": ok, "verified_blocks": checked,
    }


if __name__ == "__main__":
    import json
    import sys

    total = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 30
    for codec in (sys.argv[2].split(",") if len(sys.argv) > 2
                  else ["rans", "adaptive", "static"]):
        print(json.dumps(bench_large(total_bytes=total, codec=codec)),
              flush=True)
