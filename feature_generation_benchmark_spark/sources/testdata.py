"""Adapters from the driver's testdata tables to engine inputs.

The ``events`` table is the transactions analog (FIXTURES.md F3):
``user_id ≈ customer_id``, ``event_type ≈ trx_type``, ``value ≈ trx_amnt``,
and ``t_minus`` is derived from ``ts`` as whole days back from a fixed
reference date — mirroring the reference's integer relative-time model
(``docs/index.md:108-110``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Events span 2024-01-01 .. 2024-01-30 at every scale factor; the day after
#: the last event makes every row's t_minus ≥ 1 and stable across SFs.
EVENTS_REF_DATE = "2024-01-31"

#: Known event_type domain (observed, stable across SFs) — known-values
#: discipline, same as the reference's compiled-in category domains.
EVENT_TYPES: tuple[str, ...] = ("click", "error", "purchase", "signup", "view")


#: Per-session memo of ANALYZED table handles. A DataFrame is an immutable
#: lazy plan — sharing one across queries reuses the file listing + footer
#: schema read (~0.13 s per spark.read.parquet call; the suite makes ~260
#: of them) without caching any DATA: every action over the handle still
#: computes from the parquet files. Keyed on the dataset directory's mtime
#: so an overwritten dataset (tests, generators) is re-listed.
_TABLE_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict]" = None  # type: ignore[assignment]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    global _TABLE_MEMO
    import os
    import weakref

    if _TABLE_MEMO is None:
        _TABLE_MEMO = weakref.WeakKeyDictionary()
    path = f"{sf_dir}/{name}.parquet"
    try:
        mtime = os.stat(path).st_mtime_ns
    except OSError:
        mtime = -1
    memo = _TABLE_MEMO.setdefault(spark, {})
    key = (path, mtime)
    hit = memo.get(key)
    if hit is not None:
        return hit
    try:
        # Testdata carries TIMESTAMP(NANOS); ask for int64-nanos reads. The
        # conf only takes effect when set at session BUILD time (get_spark
        # does), so this is best-effort for externally-created sessions.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(path)
    if name == "events" and not isinstance(
        df.schema["ts"].dataType, T.LongType
    ):
        # Sessions created WITHOUT nanosAsLong (e.g. the driver's vanilla
        # session) surface TIMESTAMP(NANOS) as TIMESTAMP_NTZ. Normalize to
        # the engine contract — epoch nanoseconds as int64 — via calendar
        # arithmetic (timestampdiff on NTZ operands is timezone-free, so
        # the value is identical under any session timeZone). Cost: the
        # events window cutoff can no longer push down to the parquet scan
        # on such sessions; engine-built sessions keep the native int64
        # path and full row-group pruning.
        df = df.withColumn(
            "ts",
            (
                F.expr(
                    "timestampdiff(MICROSECOND, "
                    "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
                )
                * F.lit(1000)
            ).cast("long"),
        )
    memo[key] = df
    return df


def from_nanos(col: str) -> "F.Column":
    """Exact nanosecond-epoch long → TimestampType (µs precision).

    With ``spark.sql.legacy.parquet.nanosAsLong`` the testdata's
    TIMESTAMP(NANOS) columns surface as LongType; ``div`` keeps the
    conversion in integer arithmetic — a double division would lose
    microseconds at 1.7e18 magnitudes.
    """
    return F.timestamp_micros(F.expr(f"{col} div 1000"))


#: Nanoseconds per day — the events time model's single shared constant
#: (owned here with the rest of the ts [int64 nanos] contract; workload
#: modules import it rather than re-defining — r6 session-3 review found
#: four independent copies).
NS_PER_DAY = 86_400 * 10**9
_NS_PER_DAY = NS_PER_DAY


def _epoch_days(date_str: str) -> int:
    import datetime as dt

    return (dt.date.fromisoformat(date_str) - dt.date(1970, 1, 1)).days


def events_transactions(
    spark: SparkSession,
    sf_dir: str,
    ref_date: str = EVENTS_REF_DATE,
    max_t_minus: int | None = None,
) -> DataFrame:
    """events → long transactions-shaped frame
    (user_id, event_type, value_cents, t_minus).

    The measure is carried as **integer-valued cents in a double**
    (``value`` is exactly 2-decimal in the testdata): sums of integer-valued
    doubles are exact regardless of summation order, so every aggregate is
    bit-deterministic across Spark partial-agg trees AND equal to any other
    engine — the cross-engine float-comparison problem disappears instead of
    being papered over with rounding.

    ``t_minus`` is pure integer day arithmetic on the raw nanos int64
    (UTC-day floor), equal to ``datediff(ref, date(ts))`` for positive
    epochs. ``max_t_minus`` additionally applies the window cutoff as a raw
    ``ts >= const`` predicate — the form parquet row-group pruning
    understands (the derived ``t_minus <= K`` filter alone cannot push
    down; at 100 TB that is the difference between scanning 30 days and
    scanning everything).
    """
    ev = load_table(spark, sf_dir, "events")
    ref_days = _epoch_days(ref_date)
    if max_t_minus is not None:
        cutoff_ns = (ref_days - max_t_minus) * _NS_PER_DAY
        ev = ev.filter(F.col("ts") >= F.lit(cutoff_ns))
    t_minus = (
        F.lit(ref_days) - F.expr(f"ts div {_NS_PER_DAY}")
    ).cast("long")
    return ev.select(
        "user_id",
        "event_type",
        F.round(F.col("value") * F.lit(100), 0).alias("value_cents"),
        t_minus.alias("t_minus"),
        # recency measure twin (double so aggregate types match across
        # engines); integer-valued → exact sums in any aggregation order
        t_minus.cast("double").alias("t_minus_days"),
    )


def events_transactions_from_sql(ref_date: str = EVENTS_REF_DATE) -> str:
    """DuckDB subquery twin of :func:`events_transactions` (same column
    names/types) for oracle SQL FROM clauses."""
    days = f"datediff('day', CAST(ts AS DATE), DATE '{ref_date}')"
    return (
        "(SELECT user_id, event_type, round(value*100) AS value_cents, "
        f"{days} AS t_minus, CAST({days} AS DOUBLE) AS t_minus_days "
        "FROM events)"
    )
