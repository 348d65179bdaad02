"""In-flight observe metrics — one action yields stage counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_generation_benchmark_spark.functions.metrics import (
    observe_funnel,
)
from feature_generation_benchmark_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


def test_observe_funnel_counts_without_extra_jobs(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    flagged = docs.select(
        "doc_id",
        "lang",
        (F.length("text") > 200).alias("long_doc"),
        (F.col("lang") == "en").alias("is_en"),
    )
    observed, obs = observe_funnel(
        flagged, "funnel", long_docs=F.col("long_doc"), en_docs=F.col("is_en")
    )
    out = observed.filter(F.col("long_doc"))
    # ONE action drives the plan; metrics ride along
    out.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = obs.get
    want_total = docs.count()
    want_long = flagged.filter("long_doc").count()
    want_en = flagged.filter("is_en").count()
    assert got["n_rows"] == want_total
    assert got["long_docs"] == want_long
    assert got["en_docs"] == want_en
