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
    "bucket_rollup": compile_bucket_rollup,
    "case_when": compile_case_when,
    "pivot_rollup": compile_pivot_rollup,
}


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

    os.environ.setdefault("SPARK_DRIVER_MEMORY", f"{_default_heap_gb()}g")
    spark = get_spark(f"fgb-reference-{size}")
    spec = reference_spec()
    root = tempfile.mkdtemp(prefix=f"fgb_ref_{size}_")
    data_path = os.path.join(root, "transactions")

    t0 = time.time()
    write_dataset(generate_size(spark, size, seed=seed), data_path)
    gen_s = time.time() - t0
    rows = spark.read.parquet(data_path).count()

    result = {
        "metric": "reference_task_wall_clock",
        "unit": "sec",
        "size": size,
        "rows": rows,
        "n_features": spec.n_features,
        "generate_sec": round(gen_s, 2),
        "strategies": {},
    }
    try:
        for name in strategies:
            out_path = os.path.join(root, f"out_{name}")
            t0 = time.time()
            df = STRATEGIES[name](spec, spark.read.parquet(data_path))
            df.write.mode("overwrite").parquet(out_path)
            result["strategies"][name] = round(time.time() - t0, 2)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
