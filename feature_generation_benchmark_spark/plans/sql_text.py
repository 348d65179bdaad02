"""SQL-text entry point — the engine's plans emitted as runnable SQL.

The reference's DuckDB impls are string-built SQL fed to the engine
(``impl/duckdb_case-when.py:87-123``); SURVEY §3.4 calls for our plans to
be expressible both as DataFrame chains AND as SQL text. This module
compiles a FeatureSpec to Spark-dialect SQL (same generator as the DuckDB
oracle, backtick quoting) and executes it via ``spark.sql`` over a temp
view — Catalyst produces the same physical plan as the A1 DataFrame form,
so this is a parity surface, not a 4th algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from feature_generation_benchmark_spark.plans.oracle import oracle_sql_for_spec
from feature_generation_benchmark_spark.spec import FeatureSpec


def sql_text_for_spec(spec: FeatureSpec, table: str) -> str:
    """The spec compiled to Spark-dialect SQL over ``table``."""
    return oracle_sql_for_spec(spec, table, ident_quote="`")


def compile_sql_text(
    spec: FeatureSpec, df: DataFrame, view_name: str = "fgb_trx"
) -> DataFrame:
    """Register ``df`` as a temp view and run the generated SQL."""
    df.createOrReplaceTempView(view_name)
    return df.sparkSession.sql(sql_text_for_spec(spec, view_name))
