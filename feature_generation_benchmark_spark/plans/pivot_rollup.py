"""Physical strategy A2+A3′ (pivot form) — synthesized pivot key +
known-values pivot + exact cumulative roll-up + half-join.

This is the faithful re-expression of the reference's fastest plan
(``impl/pyspark-pivot.py``): bucket rows into disjoint smallest-window
buckets (P5), synthesize a pivot key ``concat_ws("_", cats..., bucket)``
(P6, ``:104-105,124``), pivot with an EXPLICIT value list so no discovery
scan runs (``:106-110,126``), run one pivot per grouping scheme, and
inner-join the halves on the entity key (J1, ``:189``). The roll-up that
derives cumulative windows from disjoint buckets applies the two §2.7
exactness fixes:

- avg = Σsum/Σcount across buckets (the reference's unweighted
  mean-of-bucket-means at ``impl/pyspark-pivot.py:97-98`` is wrong unless
  bucket counts are equal);
- empty buckets combine via ``coalesce(x, 0)`` / null-skipping
  ``greatest``/``least`` instead of NULL-poisoning ``+``
  (``:91-92,98``).

Output is identical to every other strategy (cross-checked in tests).
The planner's default at-scale plan is ``plans/bucket_pivot.py``
(integer-cell PivotFirst, one pass, no join — see ``plans/planner.py``);
this module exists for complete physical parity with the reference and as
another independent implementation for the correctness web.
"""

from __future__ import annotations

import itertools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from feature_generation_benchmark_spark.functions.exprs import (
    smallest_window_bucket,
)
from feature_generation_benchmark_spark.spec import Agg, FeatureSpec, Grouping


def _pivot_half(
    spec: FeatureSpec,
    df: DataFrame,
    grouping: Grouping,
    include_avg: bool = False,
) -> DataFrame:
    """One grouping scheme's bucketed pivot, reference shape
    (``impl/pyspark-pivot.py:112-134``) with 4 decomposable aggs
    (+ per-bucket ``mean`` when the approximate roll-up needs it — the
    reference pivots 5 aggs)."""
    key_expr = F.concat_ws(
        "_",
        *[F.col(c) for c in grouping.cols],
        F.col("__bucket").cast("string"),
    )
    # join semantics must MIRROR concat_ws: for the empty combo (cols=()
    # grouping) the key is just the bucket ("7"), so the value must be
    # "7" too — "_".join(combo) + "_7" would emit "_7" and every pivot
    # cell would silently land NULL
    pivot_values = [
        "_".join([*combo, str(w)])
        for combo in grouping.combos()
        for w in spec.windows
    ]
    aggs = [F.count(F.lit(1)).alias("cnt")]
    for m in spec.measures:
        aggs += [
            F.sum(F.col(m)).alias(f"sum_{m}"),
            F.min(F.col(m)).alias(f"min_{m}"),
            F.max(F.col(m)).alias(f"max_{m}"),
        ]
        if include_avg:
            aggs.append(F.avg(F.col(m)).alias(f"avg_{m}"))
    pivoted = (
        df.withColumn("__pk", key_expr)
        .groupBy(*spec.keys)
        .pivot("__pk", pivot_values)  # explicit values: no discovery job
        .agg(*aggs)
    )
    return pivoted


def _cell(combo: tuple[str, ...], bucket: int, suffix: str) -> Column:
    # same concat_ws-mirroring join as the pivot values (empty combo)
    return F.col("_".join([*combo, str(bucket), suffix]))


def _rollup_half(
    spec: FeatureSpec,
    pivoted: DataFrame,
    grouping: Grouping,
    approximate: bool = False,
) -> DataFrame:
    """Derive cumulative-window features from the disjoint bucket cells.

    Default: exact A3′ — the reference's ``transform_col`` with the §2.7
    fixes. ``approximate=True`` reproduces the reference's combine
    BIT-FAITHFULLY for users migrating pivot-impl outputs
    (``impl/pyspark-pivot.py:87-98``): count/sum via plain ``+`` (an empty
    bucket's NULL cell poisons the cumulative value, ``:91-92``), avg as
    the unweighted mean of per-bucket means (``:97-98`` — wrong whenever
    bucket counts differ), min/max via ``least``/``greatest`` (identical
    either way)."""
    out_cols: list[Column] = [F.col(k) for k in spec.keys]
    for combo in grouping.combos():
        for w in spec.windows:
            buckets = [b for b in spec.windows if b <= w]
            if approximate:
                cnt = sum(
                    (_cell(combo, b, "cnt") for b in buckets[1:]),
                    _cell(combo, buckets[0], "cnt"),
                )
            else:
                cnt = sum(
                    (F.coalesce(_cell(combo, b, "cnt"), F.lit(0)) for b in buckets),
                    F.lit(0),
                )
            total: dict[str, Column] = {}
            avg_expr: dict[str, Column] = {}
            least: dict[str, Column] = {}
            greatest: dict[str, Column] = {}
            for m in spec.measures:
                if approximate:
                    total[m] = sum(
                        (_cell(combo, b, f"sum_{m}") for b in buckets[1:]),
                        _cell(combo, buckets[0], f"sum_{m}"),
                    )
                    avg_expr[m] = sum(
                        (_cell(combo, b, f"avg_{m}") for b in buckets[1:]),
                        _cell(combo, buckets[0], f"avg_{m}"),
                    ) / F.lit(len(buckets))
                else:
                    total[m] = sum(
                        (
                            F.coalesce(_cell(combo, b, f"sum_{m}"), F.lit(0.0))
                            for b in buckets
                        ),
                        F.lit(0.0),
                    )
                    avg_expr[m] = F.when(cnt > F.lit(0), total[m] / cnt)
                mins = [_cell(combo, b, f"min_{m}") for b in buckets]
                maxs = [_cell(combo, b, f"max_{m}") for b in buckets]
                least[m] = mins[0] if len(mins) == 1 else F.least(*mins)
                greatest[m] = maxs[0] if len(maxs) == 1 else F.greatest(*maxs)
            for agg in spec.aggs:
                for m in spec.measures:
                    name = spec.feature_name(m, combo, w, agg)
                    if agg is Agg.COUNT:
                        expr = cnt.cast("long")
                    elif agg is Agg.SUM:
                        expr = total[m]
                    elif agg is Agg.AVG:
                        expr = avg_expr[m]
                    elif agg is Agg.MIN:
                        expr = least[m]
                    else:
                        expr = greatest[m]
                    if agg is not Agg.COUNT and spec.round_decimals is not None:
                        expr = F.round(expr, spec.round_decimals)
                    out_cols.append(expr.alias(name))
    return pivoted.select(*out_cols)


def compile_pivot_rollup(
    spec: FeatureSpec, df: DataFrame, approximate: bool = False
) -> DataFrame:
    """Compile ``spec`` via the reference's pivot plan: one bucketed pivot
    per grouping scheme, roll-up, inner-join of the halves.

    ``approximate=True`` is the bit-faithful migration mode: it reproduces
    the reference pivot impls' output INCLUDING their documented defects
    (SURVEY §2.7.2-3) for users who need drop-in identical numbers before
    switching to the exact default."""
    # trigger the spec-level name-collision guard: the concat_ws("_")
    # pivot key is ambiguous exactly when feature NAMES collide (same
    # underscore-joined scheme), and two distinct cells sharing a pivot
    # key would silently aggregate together
    spec.features()
    pruned = df.select(*spec.input_columns())
    in_scope = pruned.filter(
        F.col(spec.time_col) <= F.lit(max(spec.windows))
    ).withColumn("__bucket", smallest_window_bucket(spec.time_col, spec.windows))

    halves = [
        _rollup_half(
            spec,
            _pivot_half(spec, in_scope, g, include_avg=approximate),
            g,
            approximate=approximate,
        )
        for g in spec.groupings
    ]
    out = halves[0]
    for h in halves[1:]:
        out = out.join(h, on=list(spec.keys), how="inner")  # J1: 1 row/key per side
    return out
