"""Spec → ANSI SQL oracle generator.

Compiles the SAME :class:`FeatureSpec` object the Spark strategies compile,
into a DuckDB-runnable SQL string using ``FILTER (WHERE ...)`` conditional
aggregation (mirroring the reference's SQL twin,
``impl/duckdb_case-when.py:48-56,87-123``). Because both artifacts derive
from one spec, the driver's Spark-vs-DuckDB hash comparison checks the
*strategies*, not hand-kept SQL.

Feature columns are ``"``-quoted — category values may contain ``-``
(reference ``src/lib.rs:33-47``).
"""

from __future__ import annotations

from feature_generation_benchmark_spark.spec import Agg, Feature, FeatureSpec

#: identifier quote char: '"' (ANSI/DuckDB) or '`' (Spark SQL dialect) —
#: the same generated text serves as DuckDB oracle AND as a runnable
#: Spark-SQL surface (plans/sql_text.py)
_QUOTE = '"'


def _qident(name: str) -> str:
    return _QUOTE + name.replace(_QUOTE, _QUOTE * 2) + _QUOTE


def _qstr(value: str) -> str:
    return "'" + value.replace("'", "''") + "'"


def _condition_sql(spec: FeatureSpec, feat: Feature) -> str:
    parts = [f"{_qident(spec.time_col)} <= {feat.window}"]
    parts += [
        f"{_qident(c)} = {_qstr(v)}" for c, v in zip(feat.grouping.cols, feat.combo)
    ]
    return " AND ".join(parts)


def _agg_sql(spec: FeatureSpec, feat: Feature) -> str:
    cond = _condition_sql(spec, feat)
    m = _qident(feat.measure)
    if feat.agg is Agg.COUNT:
        body = f"count(*) FILTER (WHERE {cond})"
        return f"{body} AS {_qident(feat.name)}"
    if feat.agg is Agg.SUM:
        body = f"coalesce(sum({m}) FILTER (WHERE {cond}), 0.0)"
    elif feat.agg is Agg.AVG:
        body = f"avg({m}) FILTER (WHERE {cond})"
    elif feat.agg is Agg.MIN:
        body = f"min({m}) FILTER (WHERE {cond})"
    elif feat.agg is Agg.MAX:
        body = f"max({m}) FILTER (WHERE {cond})"
    else:  # pragma: no cover
        raise ValueError(f"unknown agg {feat.agg}")
    if spec.round_decimals is not None:
        body = f"round({body}, {spec.round_decimals})"
    return f"{body} AS {_qident(feat.name)}"


def oracle_sql_for_spec(
    spec: FeatureSpec, from_sql: str, ident_quote: str = '"'
) -> str:
    """ANSI-SQL twin of the compiled feature plan.

    ``from_sql``: a table name or parenthesized subquery exposing the spec's
    input columns (key, time_col, measure, category cols).
    ``ident_quote``: '"' for DuckDB/ANSI, '`' for Spark's SQL dialect.
    """
    global _QUOTE
    _QUOTE = ident_quote
    try:
        select_items = [_qident(k) for k in spec.keys] + [
            _agg_sql(spec, feat) for feat in spec.features()
        ]
        select_list = ",\n  ".join(select_items)
        group_by = ", ".join(_qident(k) for k in spec.keys)
        return (
            f"SELECT\n  {select_list}\n"
            f"FROM {from_sql}\n"
            f"WHERE {_qident(spec.time_col)} <= {max(spec.windows)}\n"
            f"GROUP BY {group_by}"
        )
    finally:
        _QUOTE = '"'
