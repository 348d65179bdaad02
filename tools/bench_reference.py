"""Reference-parity benchmark: the FULL 2,080-feature task on natively
generated data at the reference's scale ladder.

Protocol mirrors the reference's ``BenchmarkWriter``
(``python/data_generation/helpers.py:24-44``): the timed region is
end-to-end parquet read → compute → parquet write. Generation (their
Rust CLI step) is timed separately and excluded from the query metric.

Usage::

    python tools/bench_reference.py [tiny|small|medium|big] [strategy ...]

Baselines to compare against (16 vCPU, ``BASELINE.md``): PySpark pivot
tiny 104.21 s / small 151.60 s / medium 455.49 s; PySpark case-when tiny
242.84 s. Pass strategies explicitly; ``bucket_pivot`` is the planner's
at-scale default, ``case_when`` the canonical-semantics anchor.
``big_parts`` / ``big_keys`` isolate the big ladder's two stress axes on
disk-constrained boxes (see ``sources/generator.py::SIZES``).

NOISE-PROOF PROTOCOL (round 3 — this host's deliverable CPU swings up to
~7× between minutes, so single cold readings are not trustworthy):

- the generated dataset persists under ``SPARK_GRAFT_DATA_CACHE``
  (default ``/tmp/fgb_ref_cache``) keyed by (size, seed) and is reused
  across runs — generation noise never contaminates the query anchor;
- each strategy runs ``SPARK_GRAFT_REPS`` times (default 3) in ONE
  session; the per-rep times and their median are reported — the median
  of same-session reps is the load-bearing number;
- an all-core integer burn probe runs before and after the reps and its
  wall time is recorded next to the anchor, so any reader can rescale a
  reading taken in a slow host window (healthy ≈ ``probe_ref_sec``).

Env: ``SPARK_GRAFT_REPS``, ``SPARK_GRAFT_DATA_CACHE``,
``SPARK_GRAFT_KEEP_CACHE=0`` to delete after the run,
``SPARK_GRAFT_INIT_PARTITION_FACTOR`` (session.py) for the
initialPartitionNum A/B.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feature_generation_benchmark_spark.plans import (  # noqa: E402
    compile_bucket_pivot,
    compile_bucket_rollup,
    compile_case_when,
)
from feature_generation_benchmark_spark.plans.pivot_rollup import (  # noqa: E402
    compile_pivot_rollup,
)
from feature_generation_benchmark_spark.session import get_spark  # noqa: E402
from feature_generation_benchmark_spark.sources.generator import (  # noqa: E402
    generate_size,
    write_dataset,
)
from feature_generation_benchmark_spark.spec import reference_spec  # noqa: E402

STRATEGIES = {
    "bucket_pivot": compile_bucket_pivot,
    # single-exchange layout for the high-key-cardinality regime (1M-key
    # big_keys axis): raw repartition on key, both aggs exchange-free
    "bucket_pivot_keypart": lambda spec, df: compile_bucket_pivot(
        spec, df, key_partitioned=True
    ),
    "bucket_rollup": compile_bucket_rollup,
    "case_when": compile_case_when,
    "pivot_rollup": compile_pivot_rollup,
}


from feature_generation_benchmark_spark.hostprobe import burn as _burn  # noqa: E402


def burn_probe(loops: int = 10**8) -> float:
    """Wall time of an all-core Python integer burn — the host-capacity
    calibration recorded beside every anchor. On a healthy window this
    box measures ~4-6 s; a 3-7× higher reading means the anchor ran in a
    degraded window and should be rescaled or re-measured."""
    import multiprocessing as mp

    n = os.cpu_count() or 8
    t0 = time.time()
    procs = [mp.Process(target=_burn, args=(loops,)) for _ in range(n)]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    return round(time.time() - t0, 2)


def _default_heap_gb() -> int:
    """~70% of machine RAM: the at-scale runs are single-JVM local mode, so
    the driver heap IS the executor heap; the tests' 8g default starves a
    1.7B-row scan (32 concurrent parquet readers + partial-agg hash maps)."""
    with open("/proc/meminfo") as f:
        total_kb = int(f.readline().split()[1])
    return max(8, int(total_kb / 1024 / 1024 * 0.7))


def main() -> None:
    size = sys.argv[1] if len(sys.argv) > 1 else "tiny"
    strategies = sys.argv[2:] or ["bucket_rollup"]
    seed = int(os.environ.get("SPARK_GRAFT_SEED", "42"))
    reps = int(os.environ.get("SPARK_GRAFT_REPS", "3"))
    cache_root = os.environ.get(
        "SPARK_GRAFT_DATA_CACHE", "/tmp/fgb_ref_cache"
    )
    keep_cache = os.environ.get("SPARK_GRAFT_KEEP_CACHE", "1") != "0"

    os.environ.setdefault("SPARK_DRIVER_MEMORY", f"{_default_heap_gb()}g")
    spark = get_spark(f"fgb-reference-{size}")
    spec = reference_spec()
    out_root = tempfile.mkdtemp(prefix=f"fgb_ref_{size}_")

    # persisted dataset: generate once per (size, seed, generator code),
    # reuse thereafter — the generator-source fingerprint in the key means
    # a code change can never silently serve stale data into an anchor
    import hashlib

    from feature_generation_benchmark_spark.sources import generator as _gen

    with open(_gen.__file__, "rb") as f:
        gen_fp = hashlib.md5(f.read()).hexdigest()[:8]
    data_path = os.path.join(
        cache_root, f"{size}_seed{seed}_{gen_fp}", "transactions"
    )
    marker = data_path + ".complete"
    gen_s = None
    if not os.path.exists(marker):
        shutil.rmtree(data_path, ignore_errors=True)
        t0 = time.time()
        write_dataset(generate_size(spark, size, seed=seed), data_path)
        gen_s = round(time.time() - t0, 2)
        with open(marker, "w") as f:
            f.write("ok")
    rows = spark.read.parquet(data_path).count()

    probe_before = burn_probe()
    result = {
        "metric": "reference_task_wall_clock",
        "unit": "sec",
        "size": size,
        "rows": rows,
        "n_features": spec.n_features,
        "generate_sec": gen_s,  # None → served from the persisted cache
        "reps": reps,
        "probe_before_sec": probe_before,
        "strategies": {},
    }
    try:
        for name in strategies:
            times, rep_probes = [], []
            for rep in range(reps):
                out_path = os.path.join(out_root, f"out_{name}_{rep}")
                t0 = time.time()
                df = STRATEGIES[name](spec, spark.read.parquet(data_path))
                df.write.mode("overwrite").parquet(out_path)
                times.append(round(time.time() - t0, 2))
                # short per-rep probe: each reading carries its own host-
                # capacity calibration (the host can swing 4x mid-run)
                rep_probes.append(burn_probe(loops=3 * 10**7))
            import statistics

            result["strategies"][name] = {
                "median": round(statistics.median(times), 2),
                "times": times,
                "rep_probes_sec": rep_probes,
            }
        result["probe_after_sec"] = burn_probe()
    finally:
        shutil.rmtree(out_root, ignore_errors=True)
        if not keep_cache:
            shutil.rmtree(os.path.dirname(data_path), ignore_errors=True)

    print(json.dumps(result))
    # persist beside the repo's other bench artifacts — stdout of long
    # background runs gets filtered/truncated too easily to be the only
    # copy of a 40-minute measurement
    results_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results",
    )
    os.makedirs(results_dir, exist_ok=True)
    out_file = os.path.join(results_dir, f"ref_{size}_latest.json")
    with open(out_file, "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
