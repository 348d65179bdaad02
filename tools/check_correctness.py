"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at the given sf dir, then compares
row count, column names/order-insensitive values (rounded), and dtypes.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def normalize(rows: list[tuple], colnames: list[str]) -> list[tuple]:
    """Order-insensitive, float-tolerant canonical form."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def canon(v):
        if isinstance(v, bool):
            return v
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return round(v, 6)
        return v

    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e

    # Mirror the driver: a VANILLA session (no engine confs) — catches any
    # query that silently depends on get_spark()'s profile (nanosAsLong,
    # UTC timeZone, Arrow, ...). Use SPARK_GRAFT_ENGINE_SESSION=1 to run
    # against the engine profile instead.
    import os

    if os.environ.get("SPARK_GRAFT_ENGINE_SESSION"):
        from feature_generation_benchmark_spark.session import get_spark

        spark = get_spark("check-correctness")
    else:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("check-correctness-vanilla")
            .getOrCreate()
        )

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        spark_cols = sdf.columns
        spark_rows = [tuple(r) for r in sdf.collect()]
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"{name}: rows={len(spark_rows)} (rows-only, no oracle) "
                  f"[{t_spark:.1f}s]")
            if len(spark_rows) == 0:
                failures.append((name, "0 rows"))
            continue
        res = con.execute(oracles[name])
        duck_cols = [d[0] for d in res.description]
        duck_rows = res.fetchall()

        problems = []
        if sorted(spark_cols) != sorted(duck_cols):
            extra = set(spark_cols) - set(duck_cols)
            miss = set(duck_cols) - set(spark_cols)
            problems.append(f"columns differ extra={extra} missing={miss}")
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rowcount {len(spark_rows)} vs {len(duck_rows)}")
        if not problems:
            a = normalize(spark_rows, spark_cols)
            b = normalize(duck_rows, duck_cols)
            if a != b:
                n_bad = sum(1 for x, y in zip(a, b) if x != y)
                problems.append(f"values differ in {n_bad}/{len(a)} rows")
                for x, y in zip(a, b):
                    if x != y:
                        diffs = [
                            (i, u, v)
                            for i, (u, v) in enumerate(zip(x, y))
                            if u != v
                        ][:5]
                        print(f"  first diff row: {diffs}")
                        break
        status = "OK" if not problems else "FAIL " + "; ".join(problems)
        print(f"{name}: rows={len(spark_rows)} {status} [{t_spark:.1f}s]")
        if problems:
            failures.append((name, problems))

    print(f"\n{len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
