"""Driver-surface guards over the whole query registry.

The driver canonicalizes every query's output with pandas
``sort_values`` before value-hashing — list/dict cells crash it
(round-1 ``multimodal_features`` failure). These tests pin the contract:
every served query must emit only scalar columns, and every query name
must resolve and build a plan against testdata.
"""

from __future__ import annotations

import pyspark.sql.types as T
import pytest

from feature_generation_benchmark_spark.workloads import registry

SF_SMOKE = "/root/testdata/sf0.001"


def _complex_fields(schema: T.StructType) -> list[str]:
    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


@pytest.fixture(scope="module")
def reg():
    return registry()


def test_registry_nonempty_and_unique(reg):
    assert len(reg) >= 40
    assert all(q.name == name for name, q in reg.items())


def test_registry_rotates_least_verified_first(reg):
    """The driver's correctness gate reads only the first 50 entries, so
    the registry must order queries by ascending green-check count —
    the least-driver-verified queries always sit inside the window."""
    from feature_generation_benchmark_spark.workloads import (
        _green_check_counts,
    )

    counts = _green_check_counts(
        {n: q.oracle is not None for n, q in reg.items()}
    )
    names = list(reg)
    window, rest = names[:50], names[50:]
    if rest:
        assert max(counts.get(n, 0) for n in window) <= min(
            counts.get(n, 0) for n in rest
        )


def test_green_counting_is_check_class_aware(reg):
    """r4 verdict 'What's wrong #1': a stale rows-only driver row must
    NOT count as green for an entry that now has a full oracle —
    otherwise entries that gained oracles after r1 never get a hash
    check. Probed against an INJECTED ledger (r5 verdict #1: reading the
    real artifacts here coupled the test to whatever the driver last
    wrote and broke at HEAD the moment CORRECTNESS_r05.json landed)."""
    from feature_generation_benchmark_spark.workloads import (
        _green_check_counts,
    )

    rows_only_row = {"err": "no_oracle", "spark_rows": 7, "hash_match": None}
    hash_row = {"err": None, "spark_rows": 7, "hash_match": True}
    hash_red_row = {"err": None, "spark_rows": 7, "hash_match": False}
    ledger = [
        (1, {"q": rows_only_row}),
        (2, {"q": rows_only_row}),
        (3, {"q": hash_row}),
        (4, {"q": hash_red_row}),
    ]
    # Entry that NOW has an oracle: only the hash-green row counts —
    # stale rows-only rows and hash-red rows contribute nothing.
    assert _green_check_counts({"q": True}, ledger=ledger) == {"q": 1}
    # Rows-only-by-design entry: the no_oracle rows count, hash rows
    # (which can't exist for it, but defensively) don't double-count.
    assert _green_check_counts({"q": False}, ledger=ledger)["q"] == 2
    # Zero-row no_oracle record is not green.
    empty = [(1, {"q": {"err": "no_oracle", "spark_rows": 0}})]
    assert _green_check_counts({"q": False}, ledger=empty) == {}


def test_unverified_entries_sit_inside_driver_window(reg):
    """Any entry whose REAL class-aware green count is 0 must be ordered
    before every entry with a green row — i.e. inside the driver's
    50-row check window (as long as <50 entries are owed a check)."""
    from feature_generation_benchmark_spark.workloads import (
        _green_check_counts,
    )

    counts = _green_check_counts(
        {n: q.oracle is not None for n, q in reg.items()}
    )
    names = list(reg)
    owed = [n for n in names if counts.get(n, 0) == 0]
    if owed and len(owed) <= 50:
        worst = max(names.index(n) for n in owed)
        assert worst < max(50, len(owed)), (
            f"driver-unverified entry past the window: "
            f"{[n for n in owed if names.index(n) >= 50]}"
        )


def test_no_complex_output_columns(spark, reg):
    """No served query may return array/map/struct columns — they don't
    survive the driver's pandas canonicalization. Keep complex types on
    the operator APIs; project to scalars at the workload boundary."""
    offenders = {}
    for name, q in reg.items():
        df = q.fn(spark, SF_SMOKE)  # lazy: builds the plan, no execution
        bad = _complex_fields(df.schema)
        if bad:
            offenders[name] = bad
    assert not offenders, f"complex output columns: {offenders}"


def test_bench_output_contract():
    """BENCH parse fix (r1-r3 `parsed: null`): the summary must be the
    FINAL line, complete within a 2000-char stdout tail, and parseable on
    its own; per-query detail rides its own earlier line."""
    import json

    from bench import format_output

    timings = {f"q{i:03d}": i * 0.123 for i in range(120)}
    detail_line, summary_line = format_output(timings, 0.1, 1.18, 1.07)
    assert len(summary_line) < 500
    s = json.loads(summary_line)
    assert s["metric"] == "total_query_wall_clock"
    assert s["value"] == round(sum(timings.values()), 3)
    assert s["n_queries"] == 120
    assert s["median_query_sec"] > 0
    d = json.loads(detail_line)
    assert d["queries"] == timings
    # bounded per-query chunk lines (r7 verdict #2): each parses on its
    # own, fits a tail window with room to spare, and the union is the
    # exact timing dict — so the driver's 2000-char tail always holds
    # complete per-query JSON (the last chunk + summary ≤ ~1300 chars)
    from bench import per_query_chunks

    chunks = per_query_chunks(timings, 0.1)
    merged = {}
    for line in chunks:
        assert len(line) <= 900
        c = json.loads(line)
        assert c["metric"] == "per_query_wall_clock_chunk"
        assert c["of"] == len(chunks)
        assert not set(c["queries"]) & set(merged)
        merged.update(c["queries"])
    assert merged == timings
    # the driver keeps the last ~2000 chars: the summary must survive
    # along with at least the final complete chunk line
    tail = ("\n".join([detail_line, *chunks, summary_line]))[-2000:]
    lines = tail.splitlines()
    assert json.loads(lines[-1]) == s
    assert json.loads(lines[-2])["metric"] == "per_query_wall_clock_chunk"


def test_every_entry_is_oracle_gated(reg):
    """r6 verdict #1: zero ``no_oracle`` rows in the driver artifact —
    every registry entry (including the ``_raw`` production sketch/LSH
    plans) must carry a DuckDB oracle; engine-specific estimates are
    served through exact scaffolding + bound flags instead of raw."""
    missing = [n for n, q in reg.items() if q.oracle is None]
    assert not missing, f"entries without an oracle: {missing}"
