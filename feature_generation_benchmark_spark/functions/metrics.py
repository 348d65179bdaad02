"""In-flight pipeline metrics via ``DataFrame.observe``.

A curation funnel needs its stage counts (ingested → gate-passed →
deduped → sampled) for monitoring, but computing them with separate
``count()`` jobs re-runs the plan once per stage — at 100 TB that
multiplies the whole pipeline cost by the stage count. ``observe``
attaches accumulator-backed aggregates to a point in the plan: the
metrics ride along with the ONE real action (the parquet write) and cost
nothing extra.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observe_funnel(
    df: DataFrame, name: str, **conditions: Column
) -> tuple[DataFrame, Observation]:
    """Attach row-count metrics to this plan point: total rows plus one
    conditional count per keyword (``passed=F.col("ok")`` → metric
    ``passed``). Read ``observation.get`` AFTER an action has run the
    plan. Metrics are exact for batch queries regardless of task retries
    (Spark de-duplicates observation updates per task)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(cond.cast("long")).alias(key)
        for key, cond in conditions.items()
    ]
    obs = Observation(name)
    return df.observe(obs, *aggs), obs
