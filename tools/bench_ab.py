#!/usr/bin/env python
"""Controlled re-measure of suspected bench regressions (r5 verdict #3).

One Spark session, median-of-N per query, queries interleaved round-robin
(so slow host phases hit all queries equally, not whichever ran last),
host probes before/after. Prints one JSON line per query plus a summary.

Usage: python tools/bench_ab.py [N] [query ...]
Defaults: N=5, the four r5-flagged queries + two stable controls.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

DEFAULT_QUERIES = [
    "kmeans_embeddings",
    "semdedup",
    "embedding_gram_matrix",
    "pagerank_suppliers",
    # controls that were stable r4->r5 (within 10%):
    "q1_pricing_summary",
    "text_stats",
]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    names = sys.argv[2:] or DEFAULT_QUERIES
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from feature_generation_benchmark_spark.hostprobe import (
        io_cache_probe,
        single_core_probe_sec,
    )
    from feature_generation_benchmark_spark.session import get_spark
    from feature_generation_benchmark_spark.workloads import registry

    io_probe = io_cache_probe(sf_dir)
    probe_before = single_core_probe_sec()
    spark = get_spark("bench-ab")
    reg = registry()
    fns = {q: reg[q].fn for q in names}

    # one warm pass (parquet footers, page cache, codegen) outside timing
    for q in names:
        fns[q](spark, sf_dir).count()

    times: dict[str, list[float]] = {q: [] for q in names}
    for _ in range(n):
        for q in names:
            t0 = time.time()
            fns[q](spark, sf_dir).count()
            times[q].append(time.time() - t0)
    probe_after = single_core_probe_sec()

    out = {
        "n": n,
        "sf_dir": sf_dir,
        "probe_before_sec": round(probe_before, 3),
        "probe_after_sec": round(probe_after, 3),
        "io_probe_mbps": round((io_probe or {}).get("io_mbps", -1.0), 1),
        "queries": {
            q: {
                "median": round(statistics.median(ts), 3),
                "min": round(min(ts), 3),
                "max": round(max(ts), 3),
            }
            for q, ts in times.items()
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
