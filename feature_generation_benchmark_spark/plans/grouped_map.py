"""Physical strategy A4 — grouped-map (Arrow-batched pandas) fallback.

The reference ships each entity's rows to a Python worker and recomputes the
features with pandas (``impl/pyspark-pandas-udf.py:49-81,150``; Spark-4
Arrow/Polars twin ``impl/pyspark4-polars-udf.py:80-107,176``). It is 10-13×
slower than the native plans at scale (BASELINE.md) — we keep it as the
escape hatch for features that genuinely cannot be expressed as Catalyst
expressions, and as an independent implementation for cross-strategy
correctness testing.

Physical shape: Exchange(hashpartition key) → group sort →
FlatMapGroupsInPandas (Arrow IPC to Python worker and back).

Scale posture: one entity's in-scope rows must fit in a worker's memory;
Arrow batches amortize the JVM↔Python boundary. Never the default strategy.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from feature_generation_benchmark_spark.spec import Agg, FeatureSpec


def output_schema(spec: FeatureSpec, df: DataFrame) -> T.StructType:
    """The keys+N-column output contract (reference builds the same
    explicit StructType, ``impl/pyspark-pandas-udf.py:98-118``): key
    columns keep their input types; count → long; other aggs → double."""
    fields = [
        T.StructField(k, df.schema[k].dataType, False) for k in spec.keys
    ]
    for feat in spec.features():
        dtype = T.LongType() if feat.agg is Agg.COUNT else T.DoubleType()
        fields.append(T.StructField(feat.name, dtype, True))
    return T.StructType(fields)


def _make_group_fn(spec: FeatureSpec):
    features = spec.features()
    keys = spec.keys
    time_col = spec.time_col
    measures = spec.measures

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        out: dict[str, object] = {k: pdf[k].iloc[0] for k in keys}
        t = pdf[time_col].to_numpy()
        ms = {m: pdf[m].to_numpy() for m in measures}
        # cache masks and value subsets: each (combo, window, measure) cell
        # is shared by all aggs, each combo by all windows, each window mask
        # by all combos — turns |features| array scans into |cells|
        combo_masks: dict[tuple, object] = {}
        window_masks = {w: t <= w for w in {f.window for f in features}}
        cell_vals: dict[tuple, object] = {}
        for feat in features:
            ckey = (feat.grouping.cols, feat.combo)
            if ckey not in combo_masks:
                # all-True base: an empty-cols grouping ("total per key",
                # valid per spec.py) has no equality terms — None & mask
                # would TypeError at executor runtime
                mask = np.ones(len(pdf), dtype=bool)
                for c, v in zip(feat.grouping.cols, feat.combo):
                    mask = mask & (pdf[c].to_numpy() == v)
                combo_masks[ckey] = mask
            cell = (ckey, feat.window, feat.measure)
            if cell not in cell_vals:
                cell_vals[cell] = ms[feat.measure][
                    combo_masks[ckey] & window_masks[feat.window]
                ]
            vals = cell_vals[cell]
            if feat.agg is Agg.COUNT:
                out[feat.name] = int(vals.size)
                continue
            if vals.size == 0:
                out[feat.name] = 0.0 if feat.agg is Agg.SUM else None
                continue
            if feat.agg is Agg.SUM:
                val = float(vals.sum())
            elif feat.agg is Agg.AVG:
                val = float(vals.sum()) / vals.size
            elif feat.agg is Agg.MIN:
                val = float(vals.min())
            else:
                val = float(vals.max())
            out[feat.name] = val

        row: dict[str, object] = {}
        for name, value in out.items():
            row[name] = pd.array([value], dtype="Float64") if isinstance(
                value, (float, type(None))
            ) and name not in keys else [value]
        return pd.DataFrame(row)

    return compute


def round_projection(spec: FeatureSpec, wide: DataFrame) -> DataFrame:
    """Shared post-projection for the UDF strategies: round JVM-side with
    ``F.round`` so all strategies share one rounding rule (Python's
    ``round()`` is banker's rounding — would diverge); COUNT features are
    exact longs and stay untouched."""
    if spec.round_decimals is None:
        return wide
    return wide.select(
        *spec.keys,
        *[
            F.round(F.col(f.name), spec.round_decimals).alias(f.name)
            if f.agg is not Agg.COUNT
            else F.col(f.name)
            for f in spec.features()
        ],
    )


def compile_grouped_map(spec: FeatureSpec, df: DataFrame) -> DataFrame:
    """Compile ``spec`` into the grouped-map (applyInPandas) plan."""
    pruned = df.select(*spec.input_columns())
    in_scope = pruned.filter(F.col(spec.time_col) <= F.lit(max(spec.windows)))
    schema = output_schema(spec, df)
    wide = in_scope.groupBy(*spec.keys).applyInPandas(
        _make_group_fn(spec), schema
    )
    return round_projection(spec, wide)
