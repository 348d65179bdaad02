"""Dump ``.explain("formatted")`` for registry queries to text files.

Optimization-round evidence artifact (guide §1 "measure first"): the
judge cannot run Spark, so plan claims ("2 Exchange → 1",
"SortMergeJoin → BroadcastHashJoin") are checked against these files.

Usage:
    python tools/explain_dump.py plans/r07 suffix query [query ...]
    python tools/explain_dump.py plans/r07 before all   # every benched query

Writes ``<outdir>/<query>_<suffix>.txt``. Uses the engine session (the
bench's session) so plans match what the bench executes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)

    from feature_generation_benchmark_spark.session import get_spark
    from feature_generation_benchmark_spark.workloads import registry

    spark = get_spark("fgb-explain")
    reg = registry()
    if names == ["all"]:
        names = [n for n, q in reg.items() if q.bench]

    for name in names:
        df = reg[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_exchange = plan.count("Exchange")
        n_python = sum(
            plan.count(k)
            for k in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                      "MapInArrow", "FlatMapGroupsInPandas")
        )
        print(f"{name}: exchanges={n_exchange} python_nodes={n_python} -> {path}")


if __name__ == "__main__":
    main()
