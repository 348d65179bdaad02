"""UDTF workload — the Python table-function API exercised end-to-end.

``sentence_split`` (functions/udtfs.py) lateral-joined against the
``documents`` table from SQL, then aggregated per document so the driver
output is compact and scalar-only. The DuckDB oracle reproduces the regex
split rule exactly, so the whole UDTF path is value-hash checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from feature_generation_benchmark_spark.functions.udtfs import register_udtfs
from feature_generation_benchmark_spark.sources.testdata import load_table
from feature_generation_benchmark_spark.workloads import QueryDef


def sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_udtfs(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return spark.sql(
        """
        SELECT d.doc_id,
               CAST(count(*) AS BIGINT)        AS n_sentences,
               CAST(sum(s.n_tokens) AS BIGINT) AS n_tokens,
               CAST(max(s.n_tokens) AS BIGINT) AS max_sent_tokens,
               md5(string_agg(s.sentence, '|')
                   WITHIN GROUP (ORDER BY s.sent_idx)) AS sentences_md5
        FROM {docs} d, LATERAL sentence_split(d.text) s
        GROUP BY d.doc_id
        """,
        docs=docs,
    )


# the oracle replays the same split rule: regex [.!?]+ → strip → drop
# empties → 1-based index; tokens follow the canonical rule
_SENTENCE_ORACLE = r"""
WITH parts AS (
  SELECT doc_id, string_split_regex(text, '[.!?]+') AS ps FROM documents
), numbered AS (
  SELECT doc_id,
         trim(ps[u.i], ' ' || chr(9) || chr(13) || chr(10)) AS sentence,
         u.i AS pos
  FROM parts, unnest(generate_series(1, len(ps))) AS u(i)
), sents AS (
  SELECT doc_id, sentence,
         row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS sent_idx,
         len(list_filter(string_split_regex(lower(sentence), '[^a-z0-9]+'),
                         x -> x <> '')) AS n_toks
  FROM numbered WHERE sentence <> ''
)
SELECT doc_id,
  CAST(count(*) AS BIGINT) AS n_sentences,
  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
  CAST(max(n_toks) AS BIGINT) AS max_sent_tokens,
  md5(string_agg(sentence, '|' ORDER BY sent_idx)) AS sentences_md5
FROM sents GROUP BY doc_id
"""


QUERIES = [
    QueryDef(
        "sentence_stats",
        sentence_stats,
        _SENTENCE_ORACLE,
        "Python UDTF sentence splitter via SQL LATERAL, per-doc rollup",
    ),
]
