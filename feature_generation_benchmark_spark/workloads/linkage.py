"""Record-linkage workload — blocked fuzzy join with edit-distance verify.

A deterministically corrupted copy of ``part`` names (one character
deleted at an md5-chosen position) is linked back to the clean catalog:
block on (first word, length band) → equi-join candidates → verify with
``levenshtein`` ≤ 1 → argmin best match per dirty record. The corruption
is replayed exactly in the DuckDB oracle, so blocking, verification, and
best-match selection are all value-hash checked.

Scale posture: candidates come only from the blocking equi-join (the
standard linkage discipline — never all-pairs); the edit-distance verify
is JVM-side per candidate row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feature_generation_benchmark_spark.functions.textfns import (
    md5_prefix_long,
)

from feature_generation_benchmark_spark.operators.joins import fuzzy_join
from feature_generation_benchmark_spark.sources.testdata import load_table
from feature_generation_benchmark_spark.workloads import QueryDef


def _corrupt(name, key):
    """Delete one char at an md5-derived position in the trailing word
    (positions len, len-1, len-2 — the noun is always ≥ 3 chars)."""
    h = md5_prefix_long(F.concat_ws("#", name, key.cast("string")))
    pos = F.length(name) - (h % 3)
    return F.concat(
        name.substr(F.lit(1), pos - 1),
        name.substr(pos + 1, F.length(name)),
    )


def fuzzy_part_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    # link against the DISTINCT-name catalog, not raw rows: the part table
    # repeats each name across many keys, and raw-vs-raw linkage costs
    # (dups-per-name)² per name. A deduped reference catalog (canonical
    # key = min partkey per name) is both the realistic target and keeps
    # candidates at |dirty| × names-per-block.
    clean = part.groupBy(F.col("p_name").alias("clean_name")).agg(
        F.min("p_partkey").alias("clean_key")
    )
    dirty = part.select(
        F.col("p_partkey").alias("dirty_key"),
        _corrupt(F.col("p_name"), F.col("p_partkey")).alias("dirty_name"),
    )
    matched = fuzzy_join(
        dirty,
        clean,
        "dirty_name",
        "clean_name",
        block_on=[
            (
                F.substring_index(F.col("dirty_name"), " ", 1),
                F.substring_index(F.col("clean_name"), " ", 1),
            ),
            (
                F.length("dirty_name") + F.lit(1),
                F.length("clean_name"),
            ),
        ],
        max_distance=1,
    )
    best = matched.groupBy("dirty_key", "dirty_name").agg(
        F.min(
            F.struct(
                F.col("__edit_dist").alias("d"),
                F.col("clean_name").alias("n"),
                F.col("clean_key").alias("k"),
            )
        ).alias("best")
    )
    return best.select(
        "dirty_key",
        "dirty_name",
        F.col("best.d").cast("long").alias("edit_dist"),
        F.col("best.n").alias("match_name"),
        F.col("best.k").alias("match_key"),
    )


_LINKAGE_ORACLE = """
WITH dirty AS (
  SELECT p_partkey AS dirty_key,
         substr(p_name, 1, CAST(pos - 1 AS INT))
           || substr(p_name, CAST(pos + 1 AS INT)) AS dirty_name
  FROM (
    SELECT p_partkey, p_name,
      length(p_name)
        - (CAST(('0x' || substr(md5(p_name || '#' || p_partkey), 1, 8))
                AS BIGINT) % 3) AS pos
    FROM part)
), clean AS (
  SELECT p_name AS clean_name, min(p_partkey) AS clean_key
  FROM part GROUP BY p_name
), cand AS (
  SELECT d.dirty_key, d.dirty_name, c.clean_key, c.clean_name,
         levenshtein(d.dirty_name, c.clean_name) AS dist
  FROM dirty d JOIN clean c
    ON split_part(d.dirty_name, ' ', 1) = split_part(c.clean_name, ' ', 1)
   AND length(d.dirty_name) + 1 = length(c.clean_name)
  WHERE levenshtein(d.dirty_name, c.clean_name) <= 1
)
SELECT dirty_key, dirty_name,
  (min({'d': dist, 'n': clean_name, 'k': clean_key})).d AS edit_dist,
  (min({'d': dist, 'n': clean_name, 'k': clean_key})).n AS match_name,
  (min({'d': dist, 'n': clean_name, 'k': clean_key})).k AS match_key
FROM cand GROUP BY dirty_key, dirty_name
"""


QUERIES = [
    QueryDef(
        "fuzzy_part_linkage",
        fuzzy_part_linkage,
        _LINKAGE_ORACLE,
        "blocked fuzzy join: md5-corrupted names linked back via levenshtein",
    ),
]
