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

#: Events span 2024-01-01 .. 2024-01-30 at every scale factor; the day after
#: the last event makes every row's t_minus ≥ 1 and stable across SFs.
EVENTS_REF_DATE = "2024-01-31"

#: Known event_type domain (observed, stable across SFs) — known-values
#: discipline, same as the reference's compiled-in category domains.
EVENT_TYPES: tuple[str, ...] = ("click", "error", "purchase", "signup", "view")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    try:
        # Testdata carries TIMESTAMP(NANOS); ensure the conf holds even on
        # externally-created sessions (it's a runtime SQL conf).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def from_nanos(col) -> "F.Column":
    """Exact nanosecond-epoch long → TimestampType (µs precision).

    With ``spark.sql.legacy.parquet.nanosAsLong`` the testdata's
    TIMESTAMP(NANOS) columns surface as LongType; integer division keeps the
    conversion exact (no double rounding at 1.7e18 magnitudes).
    """
    return F.timestamp_micros((F.col(col) / F.lit(1000)).cast("long"))


def events_transactions(
    spark: SparkSession, sf_dir: str, ref_date: str = EVENTS_REF_DATE
) -> DataFrame:
    """events → long transactions-shaped frame
    (user_id, event_type, value_cents, t_minus).

    The measure is carried as **integer-valued cents in a double**
    (``value`` is exactly 2-decimal in the testdata): sums of integer-valued
    doubles are exact regardless of summation order, so every aggregate is
    bit-deterministic across Spark partial-agg trees AND equal to any other
    engine — the cross-engine float-comparison problem disappears instead of
    being papered over with rounding.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "user_id",
        "event_type",
        F.round(F.col("value") * F.lit(100), 0).alias("value_cents"),
        F.datediff(F.lit(ref_date).cast("date"), from_nanos("ts").cast("date"))
        .cast("long")
        .alias("t_minus"),
    )


def events_transactions_from_sql(ref_date: str = EVENTS_REF_DATE) -> str:
    """DuckDB subquery twin of :func:`events_transactions` (same column
    names/types) for oracle SQL FROM clauses."""
    return (
        "(SELECT user_id, event_type, round(value*100) AS value_cents, "
        f"datediff('day', CAST(ts AS DATE), DATE '{ref_date}') AS t_minus "
        "FROM events)"
    )
