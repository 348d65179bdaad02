"""Ordered conversion-funnel workload — per-user view → click → purchase
sequencing with strict event-time ordering.

``observe_funnel`` (functions/metrics.py) counts stage rows in flight;
this workload answers the harder sequenced question: how many users
completed each stage IN ORDER, and how long conversion took. Stage
anchors are earliest-qualifying events (first view; first click AFTER
that view; first purchase AFTER that click), computed as conditional
min-aggregations joined back per user — every shuffle is user-keyed, so
the plan scales with the user space.

Determinism: stage times are exact epoch µs; ties cannot occur within a
stage (min over a set is unique) and durations are integer differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from feature_generation_benchmark_spark.sources.testdata import (
    NS_PER_DAY as _NS_PER_DAY,
    load_table,
)
from feature_generation_benchmark_spark.workloads import QueryDef

_STAGES = ("view", "click", "purchase")


def funnel_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr("ts div 1000").alias("ts_us"),
    )
    # each stage frame feeds BOTH the next stage's sequencing join and
    # the final 3-way left join: cache them so s1 is computed once, not
    # 3x, and s2 once, not 2x (r7 plan audit: the uncached form scanned
    # events 6x and ran 22 exchanges; caches are user-sized aggregates
    # and the session owner clears them between queries)
    s1 = ev.filter(F.col("event_type") == _STAGES[0]).groupBy("user_id").agg(
        F.min("ts_us").alias("t_view")
    ).cache()
    s2 = (
        ev.filter(F.col("event_type") == _STAGES[1])
        .join(s1, "user_id")
        .filter(F.col("ts_us") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_click"))
    ).cache()
    s3 = (
        ev.filter(F.col("event_type") == _STAGES[2])
        .join(s2, "user_id")
        .filter(F.col("ts_us") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_purchase"))
    )
    full = s1.join(s2, "user_id", "left").join(s3, "user_id", "left")
    return full.agg(
        F.count(F.lit(1)).alias("n_viewed"),
        F.count("t_click").alias("n_clicked"),
        F.count("t_purchase").alias("n_purchased"),
        F.sum(
            F.when(
                F.col("t_purchase").isNotNull(),
                F.col("t_purchase") - F.col("t_view"),
            )
        ).alias("total_convert_us"),
        F.max(
            F.when(
                F.col("t_purchase").isNotNull(),
                F.col("t_purchase") - F.col("t_view"),
            )
        ).alias("max_convert_us"),
    )


_FUNNEL_ORACLE = """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
), s1 AS (
  SELECT user_id, min(ts_us) AS t_view
  FROM ev WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(e.ts_us) AS t_click
  FROM ev e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts_us > s1.t_view
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(e.ts_us) AS t_purchase
  FROM ev e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts_us > s2.t_click
  GROUP BY e.user_id
)
SELECT
  CAST(count(*) AS BIGINT) AS n_viewed,
  CAST(count(s2.t_click) AS BIGINT) AS n_clicked,
  CAST(count(s3.t_purchase) AS BIGINT) AS n_purchased,
  CAST(sum(CASE WHEN s3.t_purchase IS NOT NULL
                THEN s3.t_purchase - s1.t_view END) AS BIGINT)
    AS total_convert_us,
  CAST(max(CASE WHEN s3.t_purchase IS NOT NULL
                THEN s3.t_purchase - s1.t_view END) AS BIGINT)
    AS max_convert_us
FROM s1
LEFT JOIN s2 USING (user_id)
LEFT JOIN s3 USING (user_id)
"""


QUERIES = [
    QueryDef(
        "funnel_conversions",
        funnel_conversions,
        _FUNNEL_ORACLE,
        "ordered view->click->purchase funnel with strict time sequencing",
    ),
]




def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day
    (cohort), counted distinct on each later activity day offset. The
    classic growth-analytics rollup; exact integer day arithmetic, and
    the only wide shuffle is keyed by (cohort, age, user) — bounded by
    users × active days."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr(f"ts div {_NS_PER_DAY}").alias("day")
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    aged = ev.join(first, "user_id").select(
        "user_id",
        "cohort_day",
        (F.col("day") - F.col("cohort_day")).alias("age_days"),
    )
    return aged.groupBy("cohort_day", "age_days").agg(
        F.countDistinct("user_id").alias("n_users")
    )


_RETENTION_ORACLE = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events
), first AS (
  SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id
)
SELECT cohort_day, ev.day - cohort_day AS age_days,
       CAST(count(DISTINCT ev.user_id) AS BIGINT) AS n_users
FROM ev JOIN first USING (user_id)
GROUP BY cohort_day, age_days
"""


QUERIES.append(
    QueryDef(
        "cohort_retention",
        cohort_retention,
        _RETENTION_ORACLE,
        "first-activity cohorts x day-offset distinct-user retention matrix",
    )
)


def itemset_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise event-type co-occurrence support (the A-Priori/market-
    basket first pass): for each unordered type pair {a, b}, how many
    users did both.

    Plan: ONE user-keyed exchange builds per-user distinct-type baskets
    (`collect_set` — bounded by the 5-value type domain); ordered pairs
    are generated ROW-LOCALLY from the sorted basket with nested
    `transform` + `slice` (≤ C(|domain|,2) per user, no self-join of the
    event table), and the final pair rollup combines map-side. The naive
    formulation — events self-joined on user_id — shuffles |events|² /
    |users| candidate rows; this one moves |users| basket rows once.

    Output: (type_a, type_b, n_users), type_a < type_b. NULL user_ids
    are excluded explicitly (the pit.py NULL discipline): Spark's
    groupBy would pool them into ONE pseudo-basket while the oracle's
    equality self-join drops them — the groupBy-vs-join divergence.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    baskets = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_set("event_type")).alias("types")
    )
    pairs = F.flatten(
        F.transform(
            "types",
            lambda a, i: F.transform(
                F.slice(
                    F.col("types"), i + F.lit(2),
                    F.size("types") - i - F.lit(1)
                ),
                lambda b: F.struct(a.alias("type_a"), b.alias("type_b")),
            ),
        )
    )
    return (
        baskets.select(F.explode(pairs).alias("p"))
        .select("p.type_a", "p.type_b")
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


_ITEMSET_ORACLE = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(count(*) AS BIGINT) AS n_users
FROM ut a JOIN ut b
  ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY 1, 2
"""


QUERIES.append(
    QueryDef(
        "itemset_pairs",
        itemset_pairs,
        _ITEMSET_ORACLE,
        "market-basket pair support: row-local pair generation from "
        "per-user baskets, no event self-join",
    )
)


def markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition model over each user's event-type
    journey: count (previous type → current type) steps across all user
    streams and report the MLE transition probability — the user-journey
    model growth analytics fits before anything fancier.

    Plan: ONE user-keyed exchange for the lag window, then a rollup over
    at most |types|² keys (map-side combine) and a |types|-partition
    window for the row normalization — everything after the lag is
    domain-bounded. Determinism: ordering ties broken by event_id; the
    probability is one exact-int division (same expression both
    engines).

    Output: (prev_type, cur_type, n_steps, prob).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("ts div 1000").alias("ts_us"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    steps = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("cur_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_steps"))
    )
    w_prev = Window.partitionBy("prev_type")
    return steps.select(
        "prev_type",
        "cur_type",
        "n_steps",
        (F.col("n_steps") / F.sum("n_steps").over(w_prev)).alias("prob"),
    )


_MARKOV_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
),
lagged AS (
  SELECT event_type AS cur_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_type
  FROM e
),
steps AS (
  SELECT prev_type, cur_type, CAST(count(*) AS BIGINT) AS n_steps
  FROM lagged WHERE prev_type IS NOT NULL
  GROUP BY prev_type, cur_type
)
SELECT prev_type, cur_type, n_steps,
  n_steps / sum(n_steps) OVER (PARTITION BY prev_type) AS prob
FROM steps
"""


QUERIES.append(
    QueryDef(
        "markov_transitions",
        markov_transitions,
        _MARKOV_ORACLE,
        "first-order event-type transition matrix (counts + MLE probs) "
        "from user journeys",
    )
)


def journey_paths_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern mining lite: the most common 3-step event-type
    paths across user journeys (the "what do users actually do"
    companion to `markov_transitions`' one-step matrix).

    Plan: the SAME single user-keyed exchange carries both lags (two
    `lag` calls over one window spec share one sort), the path rollup is
    |types|³-bounded with map-side combine, and the global top-k is a
    rank window over that bounded table. Ties break lexicographically.

    Output: (step1, step2, step3, n_paths, rank) — top 10.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("ts div 1000").alias("ts_us"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    paths = (
        ev.select(
            F.lag("event_type", 2).over(w).alias("step1"),
            F.lag("event_type", 1).over(w).alias("step2"),
            F.col("event_type").alias("step3"),
        )
        .filter(F.col("step1").isNotNull())
        .groupBy("step1", "step2", "step3")
        .agg(F.count(F.lit(1)).cast("long").alias("n_paths"))
    )
    w_rank = Window.orderBy(
        F.col("n_paths").desc(), "step1", "step2", "step3"
    )
    return (
        paths.withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rank") <= 10)
    )


_JOURNEY_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
),
steps AS (
  SELECT
    lag(event_type, 2) OVER (
      PARTITION BY user_id ORDER BY ts_us, event_id) AS step1,
    lag(event_type, 1) OVER (
      PARTITION BY user_id ORDER BY ts_us, event_id) AS step2,
    event_type AS step3
  FROM e
),
paths AS (
  SELECT step1, step2, step3, CAST(count(*) AS BIGINT) AS n_paths
  FROM steps WHERE step1 IS NOT NULL
  GROUP BY step1, step2, step3
)
SELECT * FROM (
  SELECT step1, step2, step3, n_paths,
    CAST(row_number() OVER (
      ORDER BY n_paths DESC, step1, step2, step3) AS BIGINT) AS rank
  FROM paths
) WHERE rank <= 10
"""


QUERIES.append(
    QueryDef(
        "journey_paths_top",
        journey_paths_top,
        _JOURNEY_ORACLE,
        "top-10 3-step event-type paths (sequence mining lite); both "
        "lags share one user-keyed window",
    )
)


# ---------------------------------------------------------------------------
# windowFunnel: max ordered-chain depth within a time window of the
# chain's FIRST event (ClickHouse windowFunnel semantics) — the funnel
# metric product analytics actually ships, and a different computation
# than funnel_conversions' min-timestamp staged joins.
# ---------------------------------------------------------------------------

_WF_WINDOW_US = 7 * 86_400 * 10**6  # 7 days


def window_funnel_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user max funnel depth over view→click→purchase where every
    chain event lies within 7 days of the chain's first event; output
    the depth histogram (depth 0..3 → distinct-user counts).

    Spark-first: a sequence-pattern DP as a JVM ``aggregate()`` fold
    over each user's time-sorted (ts, step) array — state is one
    3-field struct holding, per depth, the MAX chain-start time among
    chains reaching that depth (the optimal frontier: a larger start
    leaves the most window room), so the fold is O(events·steps) with
    O(steps) state. ONE user-keyed exchange; no per-step join chain, no
    window function. Ties: events sort by (ts, step), so an equal-ts
    later step may chain off an equal-ts earlier step (t2 >= t1 — the
    oracle twin encodes the same >=).

    Oracle: exists-chain SQL (view t1 <= click t2 <= purchase t3,
    t_k - t1 <= W) — existence is equivalent to the max-frontier DP.
    NULL user_ids are excluded (pit.py NULL discipline): Spark's groupBy
    would fold a NULL pseudo-user to a real depth while the oracle's
    per-depth equality joins never match NULL and bin it at depth 0."""
    step = (
        F.when(F.col("event_type") == _STAGES[0], 1)
        .when(F.col("event_type") == _STAGES[1], 2)
        .when(F.col("event_type") == _STAGES[2], 3)
    )
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select(
            "user_id",
            F.expr("ts div 1000").alias("ts_us"),
            step.alias("step"),
        )
    )
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("step").isNotNull(),
                        F.struct("ts_us", "step"),
                    )
                )
            ).alias("seq")
        )
        .select(
            "user_id",
            F.expr(
                f"""
                aggregate(
                  seq,
                  named_struct('f1', -1L, 'f2', -1L, 'f3', -1L),
                  (s, x) -> named_struct(
                    'f1', IF(x.step = 1, greatest(s.f1, x.ts_us), s.f1),
                    'f2', IF(x.step = 2 AND s.f1 >= 0L
                             AND x.ts_us - s.f1 <= {_WF_WINDOW_US}L,
                             greatest(s.f2, s.f1), s.f2),
                    'f3', IF(x.step = 3 AND s.f2 >= 0L
                             AND x.ts_us - s.f2 <= {_WF_WINDOW_US}L,
                             greatest(s.f3, s.f2), s.f3)),
                  s -> CASE WHEN s.f3 >= 0L THEN 3
                            WHEN s.f2 >= 0L THEN 2
                            WHEN s.f1 >= 0L THEN 1
                            ELSE 0 END
                )
                """
            ).alias("depth"),
        )
    )
    return per_user.groupBy("depth").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )


_WF_ORACLE = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
    CASE event_type WHEN '{_STAGES[0]}' THEN 1
                    WHEN '{_STAGES[1]}' THEN 2
                    WHEN '{_STAGES[2]}' THEN 3 END AS step
  FROM events
),
d1 AS (SELECT DISTINCT user_id FROM ev WHERE step = 1),
d2 AS (
  SELECT DISTINCT a.user_id
  FROM ev a JOIN ev b ON a.user_id = b.user_id
  WHERE a.step = 1 AND b.step = 2
    AND b.ts_us >= a.ts_us AND b.ts_us - a.ts_us <= {_WF_WINDOW_US}
),
d3 AS (
  SELECT DISTINCT a.user_id
  FROM ev a JOIN ev b ON a.user_id = b.user_id
            JOIN ev c ON a.user_id = c.user_id
  WHERE a.step = 1 AND b.step = 2 AND c.step = 3
    AND b.ts_us >= a.ts_us AND c.ts_us >= b.ts_us
    AND c.ts_us - a.ts_us <= {_WF_WINDOW_US}
),
depth AS (
  SELECT u.user_id,
    CASE WHEN d3.user_id IS NOT NULL THEN 3
         WHEN d2.user_id IS NOT NULL THEN 2
         WHEN d1.user_id IS NOT NULL THEN 1
         ELSE 0 END AS depth
  FROM (SELECT DISTINCT user_id FROM ev) u
  LEFT JOIN d1 ON u.user_id = d1.user_id
  LEFT JOIN d2 ON u.user_id = d2.user_id
  LEFT JOIN d3 ON u.user_id = d3.user_id
)
SELECT CAST(depth AS INT) AS depth,
  CAST(count(*) AS BIGINT) AS n_users
FROM depth GROUP BY depth
"""

QUERIES.append(
    QueryDef(
        "window_funnel_depth",
        window_funnel_depth,
        _WF_ORACLE,
        "ClickHouse-style windowFunnel: max view→click→purchase chain "
        "depth within 7d of chain start, as an O(steps)-state JVM DP "
        "fold per user (no step-join chain)",
    )
)
