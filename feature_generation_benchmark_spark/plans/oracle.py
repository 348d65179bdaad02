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


class _Dialect:
    """Quoting rules for the two consumers of the generated text.

    ``ident_quote``: '"' (ANSI/DuckDB) or '`' (Spark SQL).
    ``escape_backslash``: Spark's parser processes backslash escapes
    inside string literals by default, so a literal backslash must be
    doubled there (mirrors ``functions/exprs.quote_str``); DuckDB single
    quotes are escape-free, where doubling would CORRUPT the value.
    Passed explicitly through every helper — no module-global quote state
    (a shared mutable global made concurrent DuckDB-vs-Spark generation a
    data race on the quote char).
    """

    def __init__(self, ident_quote: str) -> None:
        self.q = ident_quote
        self.escape_backslash = ident_quote == "`"

    def ident(self, name: str) -> str:
        return self.q + name.replace(self.q, self.q * 2) + self.q

    def string(self, value: str) -> str:
        if self.escape_backslash:
            value = value.replace("\\", "\\\\")
        return "'" + value.replace("'", "''") + "'"


def _condition_sql(d: _Dialect, spec: FeatureSpec, feat: Feature) -> str:
    parts = [f"{d.ident(spec.time_col)} <= {feat.window}"]
    parts += [
        f"{d.ident(c)} = {d.string(v)}"
        for c, v in zip(feat.grouping.cols, feat.combo)
    ]
    return " AND ".join(parts)


def _agg_sql(d: _Dialect, spec: FeatureSpec, feat: Feature) -> str:
    cond = _condition_sql(d, spec, feat)
    m = d.ident(feat.measure)
    if feat.agg is Agg.COUNT:
        body = f"count(*) FILTER (WHERE {cond})"
        return f"{body} AS {d.ident(feat.name)}"
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
    return f"{body} AS {d.ident(feat.name)}"


def oracle_sql_for_spec(
    spec: FeatureSpec, from_sql: str, ident_quote: str = '"'
) -> str:
    """ANSI-SQL twin of the compiled feature plan.

    ``from_sql``: a table name or parenthesized subquery exposing the spec's
    input columns (key, time_col, measure, category cols).
    ``ident_quote``: '"' for DuckDB/ANSI, '`' for Spark's SQL dialect
    (which also switches string-literal backslash escaping — see
    :class:`_Dialect`).
    """
    d = _Dialect(ident_quote)
    select_items = [d.ident(k) for k in spec.keys] + [
        _agg_sql(d, spec, feat) for feat in spec.features()
    ]
    select_list = ",\n  ".join(select_items)
    group_by = ", ".join(d.ident(k) for k in spec.keys)
    return (
        f"SELECT\n  {select_list}\n"
        f"FROM {from_sql}\n"
        f"WHERE {d.ident(spec.time_col)} <= {max(spec.windows)}\n"
        f"GROUP BY {group_by}"
    )
