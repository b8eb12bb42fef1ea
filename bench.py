#!/usr/bin/env python
"""Driver benchmark: prints ONE JSON line
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Metric: aggregate encode+decode throughput of the adaptive range coder over
the full 11-file Canterbury corpus (Config 2 of BASELINE.json), measured
device-resident on one TPU chip (production pipelines keep data in HBM; this
dev environment's host tunnel is not the production path and additionally
degrades all dispatches after the first device→host transfer — see
cpprcoder_tpu/bench/device.py). Every file is round-trip verified
byte-for-byte after timing; verification failure zeroes the metric.

Baseline: reference adaptive coder corpus aggregate = 2·2810784 bytes /
(53532+74975) µs = 43.75 MB/s (BASELINE.md aggregates table).
"""

import json
import sys


REF_ADAPTIVE_MBPS = 43.75


def main():
    from cpprcoder_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from cpprcoder_tpu.bench.device import bench_corpus
    from cpprcoder_tpu.bench.harness import REF_RATIOS

    rows = bench_corpus(kinds=("adaptive", "static"))
    adaptive = [r for r in rows if r["codec"] == "adaptive_range"]
    all_ok = all(r["roundtrip_ok"] for r in rows)
    total = sum(r["bytes"] for r in adaptive)
    enc_t = sum(r["bytes"] / (r["enc_MBps"] * 1e6) for r in adaptive)
    dec_t = sum(r["bytes"] / (r["dec_MBps"] * 1e6) for r in adaptive)
    agg_mbps = 2 * total / (enc_t + dec_t) / 1e6
    value = agg_mbps if all_ok else 0.0

    details = {
        "rows": rows,
        "adaptive_agg_MBps": agg_mbps,
        "adaptive_weighted_ratio":
            sum(r["compressed"] for r in adaptive) / total,
        "ratio_vs_ref": {
            r["file"]: (r["ratio"], REF_RATIOS["adaptive_range"].get(r["file"]))
            for r in adaptive
        },
        "all_roundtrip_ok": all_ok,
    }
    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(details, f, indent=1)

    print(json.dumps({
        "metric": "canterbury_adaptive_rc_encdec_throughput",
        "value": round(value, 1),
        "unit": "MB/s",
        "vs_baseline": round(value / REF_ADAPTIVE_MBPS, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
