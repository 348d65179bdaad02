"""Physical strategy A5 — grouped-map over zero-copy Arrow batches.

The reference's Spark-4 variant ships each entity's rows to Python as an
Arrow table and computes with a columnar engine
(``impl/pyspark4-polars-udf.py:80-107,176``; it uses Polars — not present
in this environment, so the columnar compute here is NumPy over Arrow
buffers, same zero-copy boundary). Kept, like A4, as an escape hatch and an
independent implementation for cross-strategy testing.

Physical shape: Exchange(hashpartition key) → group sort →
FlatMapGroupsInArrow (no pandas conversion cost on the way in).
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feature_generation_benchmark_spark.plans.grouped_map import (
    output_schema,
    round_projection,
)
from feature_generation_benchmark_spark.spec import Agg, FeatureSpec


def _make_arrow_fn(spec: FeatureSpec):
    features = spec.features()
    keys = spec.keys
    time_col = spec.time_col
    measures = spec.measures

    def compute(table: pa.Table) -> pa.Table:
        import numpy as np

        t = table.column(time_col).to_numpy(zero_copy_only=False)
        ms = {
            m: table.column(m).to_numpy(zero_copy_only=False)
            for m in measures
        }
        cats = {
            c: table.column(c).to_numpy(zero_copy_only=False)
            for g in spec.groupings
            for c in g.cols
        }
        arrays: list[pa.Array] = [
            pa.array(
                [table.column(k)[0].as_py()],
                type=table.schema.field(k).type,
            )
            for k in keys
        ]
        names: list[str] = list(keys)
        combo_masks: dict[tuple, np.ndarray] = {}
        window_masks = {w: t <= w for w in spec.windows}
        cell_vals: dict[tuple, np.ndarray] = {}
        for feat in features:
            ckey = (feat.grouping.cols, feat.combo)
            if ckey not in combo_masks:
                # all-True base — see grouped_map (empty-cols groupings)
                mask = np.ones(len(t), dtype=bool)
                for c, v in zip(feat.grouping.cols, feat.combo):
                    mask = mask & (cats[c] == v)
                combo_masks[ckey] = mask
            cell = (ckey, feat.window, feat.measure)
            if cell not in cell_vals:
                cell_vals[cell] = ms[feat.measure][
                    combo_masks[ckey] & window_masks[feat.window]
                ]
            vals = cell_vals[cell]
            names.append(feat.name)
            if feat.agg is Agg.COUNT:
                arrays.append(pa.array([int(vals.size)], type=pa.int64()))
                continue
            if vals.size == 0:
                out = 0.0 if feat.agg is Agg.SUM else None
            elif feat.agg is Agg.SUM:
                out = float(vals.sum())
            elif feat.agg is Agg.AVG:
                out = float(vals.sum()) / vals.size
            elif feat.agg is Agg.MIN:
                out = float(vals.min())
            else:
                out = float(vals.max())
            arrays.append(pa.array([out], type=pa.float64()))
        return pa.Table.from_arrays(arrays, names=names)

    return compute


def compile_grouped_arrow(spec: FeatureSpec, df: DataFrame) -> DataFrame:
    """Compile ``spec`` into the Arrow grouped-map plan (Spark ≥ 4
    ``applyInArrow``)."""
    pruned = df.select(*spec.input_columns())
    in_scope = pruned.filter(F.col(spec.time_col) <= F.lit(max(spec.windows)))
    schema = output_schema(spec, df)
    wide = in_scope.groupBy(*spec.keys).applyInArrow(
        _make_arrow_fn(spec), schema
    )
    return round_projection(spec, wide)
