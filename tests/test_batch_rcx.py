"""Small-file batched CT-RCX dispatch (bench.device.SmallBatchRCXJob):
per-file lane payloads must be BYTE-IDENTICAL to a solo encode with the
same parameters (k_i, inc, climit, cbits) — the rows-independence argument
the batch kernel relies on (model-row blocks are disjoint per file, the
quantizer treats rows independently), asserted here end to end.

Note the batch derives (inc, climit, cbits) from n_max, not each file's
own defaults, so identity is to a PARAMETER-MATCHED solo encode (ADVICE
r4 finding 5)."""

import numpy as np

from cpprcoder_tpu.ops import rcx_pallas

rcx_pallas._INTERPRET = True


def _cases():
    rng = np.random.default_rng(7)
    return [
        rng.integers(0, 200, 1021, dtype=np.uint8).tobytes(),
        rng.integers(30, 120, 2311, dtype=np.uint8).tobytes(),
        (b"the quick brown fox " * 180)[:3500],
    ]


def test_batch_matches_parameter_matched_solo():
    from cpprcoder_tpu.bench.device import SmallBatchRCXJob
    from cpprcoder_tpu.core.bytesutil import ByteReader
    from cpprcoder_tpu.ops.rcx_ops import _parse_rcx_header

    items = [(f"f{i}", d) for i, d in enumerate(_cases())]
    job = SmallBatchRCXJob(items)
    job.warm()
    rows = np.asarray(job._enc_out[0])          # [K, l2] payload rows
    sizes = np.asarray(job._enc_out[1])         # [K]

    for i, (_, data) in enumerate(items):
        k, o = job.ks[i], job.offs[i]
        solo = rcx_pallas.rcx_encode_pallas(
            data, lanes=k, inc=job.inc, climit_log2=job.cl,
            cbits=job.cbits, wlog=job.wlog)
        r = ByteReader(solo)
        n, k2, wide, inc, cl, cbits, wlog = _parse_rcx_header(r)
        assert (n, k2, inc, cl, cbits, wlog) == (len(data), k, job.inc,
                                                 job.cl, job.cbits,
                                                 job.wlog)
        solo_sizes = (r.u32s(k) if wide else r.u16s(k)).astype(np.int64)
        payload = r.rest()
        offs = np.concatenate(([0], np.cumsum(solo_sizes)))
        assert (sizes[o:o + k] == solo_sizes).all()
        for j in range(k):
            batch_lane = rows[o + j, : sizes[o + j]].tobytes()
            solo_lane = bytes(payload[offs[j]:offs[j + 1]])
            assert batch_lane == solo_lane, (i, j)
