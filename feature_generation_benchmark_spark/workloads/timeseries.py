"""Time-series / hypertable workload — calendar gap-fill with forward
fill, OHLC bar resampling, and time-weighted averaging over the ``events``
table.

These are the hypertable-rollup-style operators a feature pipeline needs
for irregular event streams (the reference's time model stops at integer
``t_minus`` day buckets, ``docs/index.md:108-110`` — it has no resample /
fill / irregular-interval surface at all).

Scale posture: every operator here is keyed by ``user_id`` (or the bar
key) — one hash-shuffle each, no global sorts, calendar explosion bounded
by the day span (a constant — e.g. 730 — regardless of corpus size), so
the plans scale horizontally with the key space at 100 TB.

Determinism: all arithmetic is integer (epoch days / µs, value cents);
ordering ties inside windows and argmin/argmax structs are broken by
``event_id`` (unique), so results are bit-identical across engines and
partition layouts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from feature_generation_benchmark_spark.sources.testdata import (
    NS_PER_DAY as _NS_PER_DAY,
    load_table,
)
from feature_generation_benchmark_spark.workloads import QueryDef

_US_PER_DAY = 86_400 * 10**6
_BAR_US = 6 * 3600 * 10**6  # 6-hour bars
_BAR_NS = _BAR_US * 1000


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, event_id, ts [int64 nanos], cents [long])."""
    return load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.round(F.col("value") * F.lit(100), 0).cast("long").alias("cents"),
    )


# --------------------------------------------------------------------------
# calendar gap-fill + forward fill (timescale-style ``time_bucket_gapfill``
# + ``locf``): one row per (user, day) over each user's active span, gap
# days carry 0 activity and the last observed event value forward
# --------------------------------------------------------------------------

def gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    day = F.expr(f"ts div {_NS_PER_DAY}").alias("day")
    # per (user, day): activity + that day's LAST event value (argmax by
    # (ts, event_id) via lexicographic struct max — deterministic, one agg)
    daily = (
        ev.select("user_id", day, "ts", "event_id", "cents")
        .groupBy("user_id", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("day_cents"),
            F.max(F.struct("ts", "event_id", "cents"))["cents"].alias(
                "last_cents"
            ),
        )
    )
    # each user's calendar: one sequence() per user, bounded by the day
    # span (a constant at any corpus scale) — never a cross join
    cal = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day"),
        )
    )
    filled = cal.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return filled.select(
        "user_id",
        "day",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("day_cents", F.lit(0)).alias("day_cents"),
        F.last("last_cents", ignorenulls=True).over(w).alias("carried_cents"),
        F.when(F.col("n_events").isNull(), 1).otherwise(0)
        .cast("int")
        .alias("is_gap"),
    )


_GAP_FILL_ORACLE = f"""
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CAST(round(value*100) AS BIGINT) AS cents
  FROM events
), daily AS (
  SELECT user_id, ts_us // {_US_PER_DAY} AS day,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(cents) AS BIGINT) AS day_cents,
         (max({{'ts': ts_us, 'e': event_id, 'v': cents}})).v AS last_cents
  FROM ev GROUP BY user_id, day
), cal AS (
  SELECT user_id, unnest(generate_series(min(day), max(day))) AS day
  FROM daily GROUP BY user_id
)
SELECT cal.user_id, cal.day,
  coalesce(daily.n_events, 0) AS n_events,
  coalesce(daily.day_cents, 0) AS day_cents,
  last_value(daily.last_cents IGNORE NULLS) OVER (
    PARTITION BY cal.user_id ORDER BY cal.day
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS carried_cents,
  CAST(CASE WHEN daily.n_events IS NULL THEN 1 ELSE 0 END AS INT) AS is_gap
FROM cal LEFT JOIN daily ON cal.user_id = daily.user_id AND cal.day = daily.day
"""


# --------------------------------------------------------------------------
# OHLC bar resample: irregular events → fixed 6-hour bars per event_type;
# open/close are argmin/argmax by (ts, event_id) — single-agg struct trick
# --------------------------------------------------------------------------

def ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    bar_start_us = (F.expr(f"ts div {_BAR_NS}") * F.lit(_BAR_US)).alias(
        "bar_start_us"
    )
    return (
        ev.select("event_type", bar_start_us, "ts", "event_id", "cents")
        .groupBy("event_type", "bar_start_us")
        .agg(
            F.min(F.struct("ts", "event_id", "cents"))["cents"].alias(
                "open_cents"
            ),
            F.max("cents").alias("high_cents"),
            F.min("cents").alias("low_cents"),
            F.max(F.struct("ts", "event_id", "cents"))["cents"].alias(
                "close_cents"
            ),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("volume_cents"),
        )
    )


_OHLC_ORACLE = f"""
WITH ev AS (
  SELECT event_type, event_id, epoch_us(ts) AS ts_us,
         CAST(round(value*100) AS BIGINT) AS cents
  FROM events
)
SELECT event_type,
  (ts_us // {_BAR_US}) * {_BAR_US} AS bar_start_us,
  (min({{'ts': ts_us, 'e': event_id, 'v': cents}})).v AS open_cents,
  max(cents) AS high_cents,
  min(cents) AS low_cents,
  (max({{'ts': ts_us, 'e': event_id, 'v': cents}})).v AS close_cents,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(sum(cents) AS BIGINT) AS volume_cents
FROM ev GROUP BY event_type, bar_start_us
"""


# --------------------------------------------------------------------------
# time-weighted average: each event's value holds until the user's next
# event (step interpolation); weights are exact µs durations, so the only
# float op is one final division — bit-deterministic
# --------------------------------------------------------------------------

def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.expr("ts div 1000").alias("ts_us"),
        "cents",
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    dur = (F.lead("ts_us").over(w) - F.col("ts_us")).alias("dur_us")
    held = ev.select("user_id", "cents", dur).filter(F.col("dur_us").isNotNull())
    return held.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("dur_us").alias("span_us"),
        F.sum(F.col("dur_us") * F.col("cents")).alias("weighted_sum"),
        # a user whose ≥2 events all share one µs timestamp has span 0:
        # 0/0 is engine-dependent (NULL vs NaN) — pin it to NULL on both
        # sides so the result is deterministic
        F.when(
            F.sum("dur_us") > 0,
            F.sum(F.col("dur_us") * F.col("cents")).cast("double")
            / F.sum("dur_us"),
        ).alias("twa_cents"),
    )


_TWA_ORACLE = """
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CAST(round(value*100) AS BIGINT) AS cents
  FROM events
), held AS (
  SELECT user_id, cents,
    lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) - ts_us
      AS dur_us
  FROM ev
)
SELECT user_id,
  CAST(count(*) AS BIGINT) AS n_intervals,
  CAST(sum(dur_us) AS BIGINT) AS span_us,
  CAST(sum(dur_us * cents) AS BIGINT) AS weighted_sum,
  CASE WHEN sum(dur_us) > 0
       THEN CAST(sum(dur_us * cents) AS DOUBLE) / sum(dur_us)
       END AS twa_cents
FROM held WHERE dur_us IS NOT NULL
GROUP BY user_id
"""


QUERIES = [
    QueryDef(
        "gap_fill_daily",
        gap_fill_daily,
        _GAP_FILL_ORACLE,
        "calendar gap-fill + last-observation-carried-forward per user",
    ),
    QueryDef(
        "ohlc_bars",
        ohlc_bars,
        _OHLC_ORACLE,
        "irregular events resampled to 6h OHLC bars (argmin/argmax structs)",
    ),
    QueryDef(
        "time_weighted_avg",
        time_weighted_avg,
        _TWA_ORACLE,
        "step-interpolated time-weighted average, exact integer weights",
    ),
]


# --------------------------------------------------------------------------
# trailing-window anomaly detection (r3b): per-user daily event-count
# z-score against the trailing 28-day baseline — the monitoring query a
# feature pipeline runs over its own event stream.
# --------------------------------------------------------------------------

_ANOM_DAYS = 28
#: |z| threshold; 2.5 = 5/2 keeps the flag predicate exactly rational
#: (z² > 25/4) so it is decided in pure integer arithmetic.
_ANOM_Z_NUM = 5
_ANOM_Z_DEN = 2


def user_daily_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag user-days whose event count deviates > 2.5 sample standard
    deviations from that user's trailing 28-day mean (current day
    excluded).

    Plan: one (user, day) count agg, then ONE user-keyed Window whose
    integer RANGE frame [-28, -1] supplies the baseline count/sum/
    sum-of-squares — no self-join, linear per user regardless of history
    length (the pattern `workloads/pit.py` establishes).

    Determinism contract: the baseline aggregates m=count, S=Σx, Q=Σx²
    are exact integers, so the anomaly predicate is evaluated in PURE
    INTEGER algebra — z² > (5/2)² ⇔ 4·(m·x−S)²·(m−1) > 25·m·(m·Q−S²) —
    and the reported double z-score is one identical arithmetic
    expression over those integers on both engines (every step correctly
    rounded IEEE from exact inputs → bit-identical). Baselines with
    m < 2 report NULL z and a false flag; a zero-variance baseline (a
    perfectly constant history, where z is undefined/infinite) reports
    NULL z and flags ANY deviation from that constant — the classic
    "flat line then spike" case must not pass unflagged."""
    ev = _events(spark, sf_dir)
    daily = (
        ev.select("user_id", F.expr(f"ts div {_NS_PER_DAY}").alias("day"))
        .groupBy("user_id", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rangeBetween(-_ANOM_DAYS, -1)
    )
    m = F.count("n_events").over(w)
    s = F.sum("n_events").over(w)
    q = F.sum(F.col("n_events") * F.col("n_events")).over(w)
    based = daily.select(
        "user_id",
        F.col("day").cast("long").alias("day"),
        "n_events",
        m.cast("long").alias("m"),
        s.cast("long").alias("s"),
        q.cast("long").alias("q"),
    )
    x = F.col("n_events")
    mm, ss, qq = F.col("m"), F.col("s"), F.col("q")
    var_num = mm * qq - ss * ss  # m(m-1)·var — exact integer
    defined = (mm >= 2) & (var_num > 0)
    z = (mm * x - ss) / (
        mm * F.sqrt(var_num / (mm * (mm - F.lit(1))))
    )
    flag = (
        F.lit(_ANOM_Z_DEN**2) * (mm * x - ss) * (mm * x - ss)
        * (mm - F.lit(1))
        > F.lit(_ANOM_Z_NUM**2) * mm * var_num
    )
    return based.select(
        "user_id",
        "day",
        "n_events",
        mm.cast("long").alias("baseline_days"),
        F.when(mm >= 1, ss / mm).alias("baseline_mean"),
        F.when(defined, z).alias("zscore"),
        F.when(defined, flag)
        .when((mm >= 2) & (var_num == 0), mm * x - ss != 0)
        .otherwise(F.lit(False))
        .alias("is_anomaly"),
    )


_ANOMALY_ORACLE = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) // {_US_PER_DAY} AS day FROM events
),
daily AS (
  SELECT user_id, day, CAST(count(*) AS BIGINT) AS n_events
  FROM ev GROUP BY user_id, day
),
based AS (
  SELECT user_id, CAST(day AS BIGINT) AS day, n_events,
    CAST(count(n_events) OVER w AS BIGINT) AS m,
    CAST(coalesce(sum(n_events) OVER w, 0) AS BIGINT) AS s,
    CAST(coalesce(sum(n_events * n_events) OVER w, 0) AS BIGINT) AS q
  FROM daily
  WINDOW w AS (PARTITION BY user_id ORDER BY day
               RANGE BETWEEN {_ANOM_DAYS} PRECEDING AND 1 PRECEDING)
)
SELECT user_id, day, n_events,
  m AS baseline_days,
  CASE WHEN m >= 1 THEN s / m END AS baseline_mean,
  CASE WHEN m >= 2 AND m * q - s * s > 0 THEN
    (m * n_events - s) / (m * sqrt((m * q - s * s) / (m * (m - 1))))
  END AS zscore,
  coalesce(
    CASE WHEN m >= 2 AND m * q - s * s > 0 THEN
      {_ANOM_Z_DEN**2} * (m * n_events - s) * (m * n_events - s) * (m - 1)
        > {_ANOM_Z_NUM**2} * m * (m * q - s * s)
    WHEN m >= 2 AND m * q - s * s = 0 THEN
      m * n_events - s <> 0
    END, FALSE) AS is_anomaly
FROM based
"""

QUERIES.append(
    QueryDef(
        "user_daily_anomaly",
        user_daily_anomaly,
        _ANOMALY_ORACLE,
        "trailing-28d z-score anomaly flags, integer-exact predicate",
    )
)


# --------------------------------------------------------------------------
# rolling distinct actives (r3b): DAU + trailing-7d WAU — the canonical
# engagement metric, via the explode-by-window-size pattern. COUNT
# (DISTINCT) cannot run inside a sliding window frame; instead each
# (user, day) activity row contributes itself to the 7 trailing buckets it
# belongs to — a bounded ×7 flatMap — and each bucket takes one exact
# distinct count. The approximate sibling at unbounded window widths is
# the mergeable-HLL rollup in ``operators/aggregates.py``.
# --------------------------------------------------------------------------

_ROLLING_DAYS = 7


def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, dau, wau7): distinct users active that day, and within the
    trailing 7 days. WAU rows exist for every day inside 6 days after an
    activity (the trailing window still contains it); DAU is 0 there.

    Scale: distinct (user, day) is one keyed agg; the ×7 explosion is
    shuffle-free; the bucket distinct is a (day, user)-keyed agg whose
    map-side combine collapses the ×7 duplication. No window frames, no
    self-joins — day cardinality is calendar-bounded at any corpus size."""
    ev = _events(spark, sf_dir)
    du = (
        ev.select("user_id", F.expr(f"ts div {_NS_PER_DAY}").alias("day"))
        .distinct()
    )
    contrib = du.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.col("day") + _ROLLING_DAYS - 1)
        ).alias("day"),
    )
    wau = contrib.groupBy("day").agg(
        F.countDistinct("user_id").cast("long").alias("wau7")
    )
    dau = du.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    return (
        wau.join(dau, "day", "left")
        .select(
            F.col("day").cast("long").alias("day"),
            F.coalesce("dau", F.lit(0)).cast("long").alias("dau"),
            "wau7",
        )
    )


_ROLLING_ORACLE = f"""
WITH du AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_US_PER_DAY} AS day FROM events
),
con AS (
  SELECT user_id,
         unnest(generate_series(day, day + {_ROLLING_DAYS - 1})) AS day
  FROM du
),
wau AS (
  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau7
  FROM con GROUP BY day
),
dau AS (
  SELECT day, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY day
)
SELECT CAST(w.day AS BIGINT) AS day,
       CAST(coalesce(d.dau, 0) AS BIGINT) AS dau, w.wau7
FROM wau w LEFT JOIN dau d USING (day)
"""

QUERIES.append(
    QueryDef(
        "rolling_active_users",
        rolling_active_users,
        _ROLLING_ORACLE,
        "DAU + trailing-7d WAU via explode-by-window distinct counting",
    )
)


def event_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounce noisy event streams: within each (user, event_type)
    stream, an event arriving less than 60 s after the PREVIOUS event of
    that stream is a bounce and is dropped; report per-type keep/drop
    counts and the kept value.

    Semantics note: this is the lag-based (stateless) debounce — the
    predicate compares against the previous RAW event, kept or not,
    which is one window pass and exactly expressible in SQL. The
    previous-KEPT variant is an order-dependent prefix scan (session-gap
    chaining); its Spark form is `sessionization_stats`' gap logic — the
    lag-based rule is what log dedupe pipelines typically ship because
    it's idempotent over re-sorted replays.

    Plan: ONE (user, event_type)-keyed exchange for the lag window, then
    a type-keyed rollup over 5 keys (partial-agg combines map-side).
    Integer µs and cents throughout — the gap and the stream order are
    computed on µs-TRUNCATED timestamps on BOTH engines (r6 session-3
    review: the Spark side previously ordered and differenced raw nanos
    while the oracle used epoch_us, so sub-µs components — in-contract
    for the int64-nanos data model — could flip a 60 s boundary decision
    or reorder sub-µs ties between the engines).
    """
    ev = _events(spark, sf_dir).withColumn("ts_us", F.expr("ts div 1000"))
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts_us", "event_id"
    )
    gap_us = F.col("ts_us") - F.lag("ts_us").over(w)
    kept = F.when(
        gap_us.isNull() | (gap_us >= F.lit(60 * 10**6)), F.lit(1)
    ).otherwise(F.lit(0))
    flagged = ev.select("event_type", "cents", kept.alias("kept"))
    return flagged.groupBy("event_type").agg(
        F.sum("kept").cast("long").alias("n_kept"),
        (F.count(F.lit(1)) - F.sum("kept")).cast("long").alias("n_dropped"),
        F.sum(F.col("kept") * F.col("cents")).cast("long").alias(
            "kept_cents"
        ),
    )


_DEBOUNCE_ORACLE = """
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
lagged AS (
  SELECT event_type, cents,
         ts_us - lag(ts_us) OVER (
           PARTITION BY user_id, event_type ORDER BY ts_us, event_id
         ) AS gap_us
  FROM e
),
k AS (
  SELECT event_type, cents,
         CASE WHEN gap_us IS NULL OR gap_us >= 60000000 THEN 1 ELSE 0 END
           AS kept
  FROM lagged
)
SELECT event_type,
  CAST(sum(kept) AS BIGINT) AS n_kept,
  CAST(count(*) - sum(kept) AS BIGINT) AS n_dropped,
  CAST(sum(kept * cents) AS BIGINT) AS kept_cents
FROM k GROUP BY event_type
"""

QUERIES.append(
    QueryDef(
        "event_debounce",
        event_debounce,
        _DEBOUNCE_ORACLE,
        "lag-based 60s debounce per (user, type) stream; keep/drop rollup",
    )
)


# ---------------------------------------------------------------------------
# Per-key exponential moving average — the grouped sequential-fold shape
# ---------------------------------------------------------------------------


def ema_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer EMA of order totals in date order — the canonical
    inherently-sequential per-key fold (state_t depends on state_{t-1}),
    which no window FRAME expresses. Spark-first form: collect each
    customer's (date, key, cents) into a sorted array and fold it with
    the JVM ``aggregate`` lambda — ONE hash exchange on ``o_custkey``,
    whole-stage-codegen fold, zero Python. (The grouped ``applyInPandas``
    form computes the same thing but pays one pandas frame per customer —
    measured 22 s vs ~1 s at sf0.1/150k customers; keep grouped-map for
    folds whose per-key state can't live in one array. The streaming twin
    is ``streaming/features.py``'s applyInPandasWithState EMA.)

    The recurrence is INTEGER-EXACT by construction:
    ``e₁ = x₁;  eₜ = (xₜ + 3·eₜ₋₁) // 4``  on cents (α = 1/4 with floor
    division) — bit-portable across engines, no float accumulation. The
    oracle is a DuckDB *recursive CTE* stepping the same recurrence — the
    suite's first recursive-fold twin.

    Scale posture: per-key state is one customer's orders (≤ thousands of
    rows — bounded array), folded linearly; horizontally scalable across
    the key space; no global sort, no iteration-count joins."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_custkey",
        F.col("o_orderdate").alias("odate"),
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    return (
        base.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sort_array(
                F.collect_list(F.struct("odate", "o_orderkey", "cents"))
            ).alias("hist"),
        )
        .select(
            "o_custkey",
            "n_orders",
            # -1 sentinel = "no state yet"; cents >= 0 so it can't collide
            F.expr(
                "aggregate(hist, -1L, (acc, x) -> "
                "IF(acc = -1L, x.cents, (x.cents + 3L * acc) div 4L))"
            ).alias("ema_cents"),
        )
    )


_EMA_ORACLE = """
WITH RECURSIVE ord AS (
  SELECT o_custkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
),
ema AS (
  SELECT o_custkey, rn, cents AS e FROM ord WHERE rn = 1
  UNION ALL
  SELECT o.o_custkey, o.rn, (o.cents + 3 * e.e) // 4 AS e
  FROM ema e JOIN ord o ON o.o_custkey = e.o_custkey AND o.rn = e.rn + 1
)
SELECT o_custkey,
       CAST(count(*) AS BIGINT) AS n_orders,
       arg_max(e, rn) AS ema_cents
FROM ema GROUP BY o_custkey
"""

QUERIES.append(
    QueryDef(
        "ema_customer_spend",
        ema_customer_spend,
        _EMA_ORACLE,
        "per-customer integer-exact EMA (α=1/4 floor recurrence) via "
        "collect_list + JVM aggregate() fold; oracle = recursive CTE",
    )
)


# ---------------------------------------------------------------------------
# CUSUM change-point alarms — the sequential drift detector (Page 1954)
# ---------------------------------------------------------------------------

_CUSUM_H_MULT = 2  # alarm when s_t exceeds 2x the reference level


def cusum_daily_alarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type CUSUM over the daily total-cents series: the upper
    one-sided recurrence ``s_t = max(0, s_{t-1} + x_t - k)`` with the
    reference level ``k = floor(mean daily total)``, alarming when
    ``s_t > 2k`` — the classic sequential change-point detector a data
    pipeline runs on its own volume series.

    INTEGER-EXACT like the EMA fold: x_t and k are exact cent integers,
    so the recurrence is bit-portable; the oracle is the suite's second
    recursive-CTE twin. Plan: one (type, day) combining agg over the
    scan, a broadcast per-type k, and a JVM ``aggregate()`` fold over
    each type's sorted day array (calendar-bounded state). The fold
    carries (s, n_alarms, max_s) — one pass, O(1) state per step."""
    daily = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr(f"ts div {_NS_PER_DAY}").alias("day"),
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").alias("x"))
    )
    # integer floor division: CAST(double) truncates on Spark but ROUNDS
    # on DuckDB, so the reference level must never pass through a double
    k = daily.groupBy("event_type").agg(
        F.expr("sum(x) div count(1)").alias("k"),
        F.count(F.lit(1)).alias("n_days"),
    )
    folded = (
        daily.groupBy("event_type")
        .agg(
            F.sort_array(F.collect_list(F.struct("day", "x"))).alias(
                "series"
            )
        )
        .join(F.broadcast(k), "event_type")
        .select(
            "event_type",
            "n_days",
            "k",
            F.expr(
                f"""
                aggregate(
                  series,
                  named_struct('s', 0L, 'n_alarms', 0L, 'max_s', 0L),
                  (acc, e) -> named_struct(
                    's', greatest(0L, acc.s + e.x - k),
                    'n_alarms', acc.n_alarms + IF(
                      greatest(0L, acc.s + e.x - k) > {_CUSUM_H_MULT}L * k,
                      1L, 0L),
                    'max_s', greatest(acc.max_s,
                                      greatest(0L, acc.s + e.x - k)))
                )
                """
            ).alias("st"),
        )
        .select(
            "event_type",
            "n_days",
            "k",
            F.col("st.n_alarms").alias("n_alarms"),
            F.col("st.max_s").alias("max_s"),
        )
    )
    return folded


_CUSUM_ORACLE = f"""
WITH RECURSIVE daily AS (
  SELECT event_type, epoch_ns(ts) // {_NS_PER_DAY} AS day,
         sum(CAST(round(value*100) AS BIGINT)) AS x
  FROM events GROUP BY event_type, day
),
kk AS (
  SELECT event_type, sum(x) // count(*) AS k,
         count(*) AS n_days
  FROM daily GROUP BY event_type
),
idx AS (
  SELECT event_type, x,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
  FROM daily
),
walk AS (
  SELECT i.event_type, i.rn,
         greatest(0, i.x - kk.k) AS s,
         CASE WHEN greatest(0, i.x - kk.k) > {_CUSUM_H_MULT} * kk.k
              THEN 1 ELSE 0 END AS n_alarms,
         greatest(0, i.x - kk.k) AS max_s
  FROM idx i JOIN kk USING (event_type) WHERE i.rn = 1
  UNION ALL
  SELECT i.event_type, i.rn,
         greatest(0, w.s + i.x - kk.k) AS s,
         w.n_alarms + CASE WHEN greatest(0, w.s + i.x - kk.k)
                                > {_CUSUM_H_MULT} * kk.k
                           THEN 1 ELSE 0 END AS n_alarms,
         greatest(w.max_s, greatest(0, w.s + i.x - kk.k)) AS max_s
  FROM walk w
  JOIN idx i ON i.event_type = w.event_type AND i.rn = w.rn + 1
  JOIN kk ON kk.event_type = i.event_type
)
SELECT w.event_type,
  CAST(kk.n_days AS BIGINT) AS n_days,
  CAST(kk.k AS BIGINT) AS k,
  CAST(w.n_alarms AS BIGINT) AS n_alarms,
  CAST(w.max_s AS BIGINT) AS max_s
FROM walk w
JOIN kk ON kk.event_type = w.event_type AND w.rn = kk.n_days
"""

QUERIES.append(
    QueryDef(
        "cusum_daily_alarms",
        cusum_daily_alarms,
        _CUSUM_ORACLE,
        "Page's CUSUM drift alarms on daily cent totals: integer-exact "
        "max(0, s+x-k) fold per type, recursive-CTE oracle",
    )
)


# ---------------------------------------------------------------------------
# Lead-lag cross-correlation — does click volume today predict purchase
# volume k days later? The marketing/causal-screening series statistic.
# ---------------------------------------------------------------------------

_LEADLAG_MAX = 7


def leadlag_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between daily click counts and purchase counts
    shifted by lag = 0..7 days, one row per lag (e6-quantized).

    Spark-first: ONE (type, day) combining agg builds both daily series;
    the lag alignment is a self-join of the tiny day-grain frame (30
    rows/side) on ``day + lag`` after a broadcast of the 8-row lag
    spec — the corpus is scanned once regardless of how many lags are
    screened. Correlation is computed from the five exact integer sums
    (n, Σx, Σy, Σxy, Σx², Σy²) per lag, so the only floats are the final
    covariance/denominator expression — identical IEEE on both engines,
    then e6 quantization (single-division contract)."""
    daily = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(
            "event_type", F.expr(f"ts div {_NS_PER_DAY}").alias("day")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    clicks = daily.filter(F.col("event_type") == "click").select(
        "day", F.col("n").alias("x")
    )
    purchases = daily.filter(F.col("event_type") == "purchase").select(
        "day", F.col("n").alias("y")
    )
    lags = spark.range(_LEADLAG_MAX + 1).select(F.col("id").alias("lag"))
    pairs = (
        clicks.crossJoin(F.broadcast(lags))
        .join(
            purchases.withColumnRenamed("day", "pday"),
            F.col("pday") == F.col("day") + F.col("lag"),
        )
        .select("lag", "x", "y")
    )
    # decimal(38,0) sums, not long: daily counts are GLOBAL (grow with
    # the corpus, unlike per-key aggregates), so at the 100 TB posture a
    # single x·y product overflows int64 and long sums would wrap
    # silently while the DuckDB twin's HUGEINT stays exact (the
    # weekday_seasonality discipline; r6 session-3 review). decimal(18,0)
    # operands keep the product precision at 37 — exact, no clip.
    xd = F.col("x").cast("decimal(18,0)")
    yd = F.col("y").cast("decimal(18,0)")
    sums = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * yd).alias("sxy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd * yd).alias("syy"),
    )
    nd = F.col("n").cast("decimal(18,0)")
    num = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (nd * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return sums.select(
        "lag",
        "n",
        F.when(
            den > 0,
            F.round(num.cast("double") * F.lit(1e6) / den, 0).cast("long"),
        ).alias("corr_e6"),
    )


_LEADLAG_ORACLE = f"""
WITH daily AS (
  SELECT event_type, epoch_ns(ts) // {_NS_PER_DAY} AS day,
         count(*) AS n
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY event_type, day
),
c AS (SELECT day, n AS x FROM daily WHERE event_type = 'click'),
p AS (SELECT day AS pday, n AS y FROM daily WHERE event_type = 'purchase'),
pairs AS (
  SELECT lag, x, y
  FROM c CROSS JOIN (SELECT unnest(range({_LEADLAG_MAX + 1})) AS lag)
  JOIN p ON pday = day + lag
),
s AS (
  -- HUGEINT products: BIGINT x*y would raise on overflow at the same
  -- scale the Spark side's decimal sums exist for
  SELECT lag, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(CAST(x AS HUGEINT)*y) AS sxy,
         sum(CAST(x AS HUGEINT)*x) AS sxx,
         sum(CAST(y AS HUGEINT)*y) AS syy
  FROM pairs GROUP BY lag
)
SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n,
  CASE WHEN sqrt(CAST(n*sxx - sx*sx AS DOUBLE) * (n*syy - sy*sy)) > 0
  THEN CAST(round((n*sxy - sx*sy) * 1e6
       / sqrt(CAST(n*sxx - sx*sx AS DOUBLE) * (n*syy - sy*sy)))
       AS BIGINT) END AS corr_e6
FROM s
"""

QUERIES.append(
    QueryDef(
        "leadlag_click_purchase",
        leadlag_click_purchase,
        _LEADLAG_ORACLE,
        "lead-lag Pearson correlation (lag 0..7d) between daily click "
        "and purchase volumes from exact integer sums; corpus scanned "
        "once for all lags",
    )
)


# ---------------------------------------------------------------------------
# Weekday seasonality profile — STL-lite: how much of the daily-volume
# variance is explained by the day-of-week pattern
# ---------------------------------------------------------------------------

def weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: the 7-point day-of-week mean-volume profile and
    the seasonality strength = 1 − var(residual)/var(daily), where the
    residual subtracts each day's weekday mean (the STL seasonal-
    strength statistic on a weekly period).

    Exactness: daily totals are exact cents and EVERY aggregate is an
    exact integer/decimal sum — order-free, so the result cannot flip
    with partitioning. The residual variance is never summed in floating
    point; it is derived from the grouped-variance identity
    ``sum((x - m_d)^2) = sum(x^2) - sum_d(s_d^2 / n_d)`` with each
    ``s_d^2*1e6 div n_d`` a floor division of exact integers (identical
    on both engines; the 1e-6 scale keeps the floor truncation ~1e-22
    relative — invisible at e6 quantization). The only floating-point
    step is ONE final division of two exact integers, then e6-round —
    the same contract as ``leadlag_click_purchase``. dow = epoch-day
    mod 7 (day 0 = Thursday) — pure integer, no calendar functions to
    disagree on. Shuffles: one (type, day) combining agg; everything
    after is ≤ types×7 rows."""
    daily = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr(f"ts div {_NS_PER_DAY}").alias("day"),
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").alias("x"))
        .withColumn("dow", F.col("day") % 7)
    )
    # (type, dow) level: exact counts, sums, and sums of squares.
    xd = F.col("x").cast("decimal(19,0)")
    dow_stats = daily.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("n_d"),
        F.sum("x").alias("s_d"),
        F.sum((xd * xd).cast("decimal(38,0)")).alias("sxx_d"),
    )
    # Per-dow between-group term, floor(s_d^2 * 1e6 / n_d): exact integer.
    term = F.expr(
        "cast(floor(cast(s_d as decimal(38,0)) * cast(s_d as decimal(38,0))"
        " * 1000000 / n_d) as decimal(38,0))"
    )
    stats = dow_stats.groupBy("event_type").agg(
        F.sum("n_d").alias("n_days"),
        F.sum("s_d").alias("sx"),
        F.sum("sxx_d").alias("sxx"),
        F.sum(term).alias("sum_term"),
    )
    # srr_scaled  = sxx*1e6 - sum_term          (residual SS, e6-scaled)
    # den_scaled  = sxx*1e6 - floor(sx^2*1e6/n) (total SS,    e6-scaled)
    # strength    = 1 - srr/den = (den - srr)/den = (sum_term - sx2term)/den
    scaled = stats.select(
        "event_type",
        "n_days",
        F.expr(
            "cast(sxx as decimal(38,0)) * 1000000"
            " - cast(floor(cast(sx as decimal(38,0))"
            "   * cast(sx as decimal(38,0)) * 1000000 / n_days)"
            "   as decimal(38,0))"
        ).alias("den_scaled"),
        F.expr(
            "sum_term - cast(floor(cast(sx as decimal(38,0))"
            "   * cast(sx as decimal(38,0)) * 1000000 / n_days)"
            "   as decimal(38,0))"
        ).alias("num_scaled"),
    )
    return scaled.select(
        "event_type",
        "n_days",
        F.when(
            F.col("den_scaled") > 0,
            F.round(
                F.col("num_scaled").cast("double")
                / F.col("den_scaled").cast("double")
                * 1e6,
                0,
            ).cast("long"),
        ).alias("seasonal_strength_e6"),
    )


_SEASON_ORACLE = f"""
WITH daily AS (
  SELECT event_type, epoch_ns(ts) // {_NS_PER_DAY} AS day,
         sum(CAST(round(value*100) AS BIGINT)) AS x
  FROM events GROUP BY event_type, day
),
d AS (SELECT event_type, day, x, day % 7 AS dow FROM daily),
dm AS (
  SELECT event_type, dow, count(*) AS n_d,
         sum(CAST(x AS HUGEINT)) AS s_d,
         sum(CAST(x AS HUGEINT) * x) AS sxx_d,
         (sum(CAST(x AS HUGEINT)) * sum(CAST(x AS HUGEINT)) * 1000000)
           // count(*) AS term
  FROM d GROUP BY event_type, dow
),
s AS (
  SELECT event_type, sum(n_d) AS n_days, sum(s_d) AS sx,
         sum(sxx_d) AS sxx, sum(term) AS sum_term
  FROM dm GROUP BY event_type
),
sc AS (
  SELECT event_type, n_days,
         sxx * 1000000 - (sx * sx * 1000000) // n_days AS den_scaled,
         sum_term - (sx * sx * 1000000) // n_days AS num_scaled
  FROM s
)
SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
  CASE WHEN den_scaled > 0 THEN
    CAST(round(CAST(num_scaled AS DOUBLE) / CAST(den_scaled AS DOUBLE)
               * 1e6) AS BIGINT)
  END AS seasonal_strength_e6
FROM sc
"""

QUERIES.append(
    QueryDef(
        "weekday_seasonality",
        weekday_seasonality,
        _SEASON_ORACLE,
        "STL-lite weekly seasonal strength per type: 1 - var(residual)/"
        "var(daily) from exact integer sums, integer dow (epoch mod 7)",
    )
)
