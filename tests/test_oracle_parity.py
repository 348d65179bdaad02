"""Fast oracle-parity smoke at sf0.001 — same comparison the driver runs at
sf0.01 (tools/check_correctness.py is the full local gate)."""

from __future__ import annotations

import math
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402

from tests.conftest import SF_SMOKE  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    return con


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def c(v):
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else round(v, 6)
        return v

    return sorted((tuple(c(r[i]) for i in order) for r in rows), key=repr)


def all_query_names():
    return sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", all_query_names())
def test_query_matches_oracle(spark, duck, name):
    fn = entrymod.queries()[name]
    sdf = fn(spark, SF_SMOKE)
    spark_rows = [tuple(r) for r in sdf.collect()]
    oracles = entrymod.oracle_sql()
    if name not in oracles:
        assert len(spark_rows) >= 0  # rows-only contract
        return
    res = duck.execute(oracles[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(sdf.columns) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows)
    assert canon(spark_rows, sdf.columns) == canon(duck_rows, duck_cols)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.columns) == 1 + entrymod.EVENTS_SPEC.n_features
