#!/usr/bin/env python
"""Measure the flat-vs-nested Gram cell-generation crossover (r5 verdict
#6). Synthetic quantized vectors at several dimensions, row counts scaled
to keep total upper-triangle cells ~constant, so wall-clock differences
reflect the per-row form, not workload size.

Run:  python tools/gram_crossover.py [total_cells_millions]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from feature_generation_benchmark_spark.operators.gram import (
    _flat_cells,
    _nested_cells,
)
from feature_generation_benchmark_spark.session import get_spark


def main() -> None:
    total_cells = float(sys.argv[1]) * 1e6 if len(sys.argv) > 1 else 200e6
    spark = get_spark("gram-crossover")
    print(f"target cells per run: {total_cells/1e6:.0f}M")
    for d in (32, 64, 128, 256, 512, 1024):
        tri = d * (d + 1) // 2
        n = max(int(total_cells // tri), 64)
        vec = F.transform(
            F.sequence(F.lit(0), F.lit(d - 1)),
            lambda i: (F.col("id") * 7 + i * 13) % 1000 - 500,
        )
        rows = (
            spark.range(n, numPartitions=32)
            .select(vec.alias("__q"))
            .persist()
        )
        rows.count()  # materialize input out of the timed region
        out = {}
        for label, form in (("flat", _flat_cells), ("nested", _nested_cells)):
            # reduce to ONE row so timing excludes result transfer
            t0 = time.time()
            agg = (
                form(rows, "__q", False)
                .groupBy("i", "j")
                .agg(F.sum("p").alias("v"))
                .agg(F.sum("v"), F.count(F.lit(1)))
                .collect()[0]
            )
            out[label] = time.time() - t0
            assert agg[1] == tri, (d, label, agg)
        rows.unpersist()
        print(
            f"d={d:5d} n={n:8d} cells/row={tri:8d} "
            f"flat={out['flat']:7.2f}s nested={out['nested']:7.2f}s "
            f"ratio={out['nested']/out['flat']:.2f}"
        )


if __name__ == "__main__":
    main()
