"""Event sessionization — gap-based session assignment with window
functions (the one place OVER-clauses enter the engine; the reference has
none, SURVEY §2.5 — this is a north-star extension, SURVEY §7.2-M8).

All Catalyst-native: lag → boundary flag → running sum. Two window passes
over one hash partitioning (same partition key), one shuffle total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap: float,
    order_cols: list[str] | None = None,
    session_col: str = "session_id",
    numeric_time: bool = False,
) -> DataFrame:
    """Assign a per-key session index: a new session starts when the gap to
    the previous event exceeds ``gap``. ``order_cols`` break ts ties
    deterministically (e.g. an event id).

    ``numeric_time=False``: ``ts_col`` is a timestamp, ``gap`` in seconds.
    ``numeric_time=True``: ``ts_col`` is numeric (e.g. epoch nanos) and
    ``gap`` is in the SAME unit — exact integer comparisons, no float
    conversion (how the oracle-checked queries run).
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(key).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    if numeric_time:
        gap_exceeded = F.col(ts_col) - prev_ts > F.lit(gap)
    else:
        gap_exceeded = (
            F.col(ts_col).cast("double") - prev_ts.cast("double") > F.lit(gap)
        )
    is_new = F.when(prev_ts.isNull() | gap_exceeded, F.lit(1)).otherwise(F.lit(0))
    running = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(session_col, F.sum(is_new).over(running))


def session_stats(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap: float,
    order_cols: list[str] | None = None,
    numeric_time: bool = False,
) -> DataFrame:
    """Per-key session metrics: session count, event counts, mean session
    duration (in the time unit of ``ts_col``). With ``numeric_time`` all
    arithmetic stays in exact integers until the final division."""
    sessions = sessionize(
        df, key, ts_col, gap, order_cols, numeric_time=numeric_time
    )
    ts = F.col(ts_col) if numeric_time else F.col(ts_col).cast("double")
    per_session = sessions.groupBy(key, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(ts) - F.min(ts)).alias("duration"),
    )
    return per_session.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("total_events"),
        F.avg("n_events").alias("avg_events_per_session"),
        F.avg("duration").alias("avg_session_duration"),
    )
