"""Streaming feature-store maintenance (streaming/maintenance.py)."""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from feature_generation_benchmark_spark.plans import compile_case_when
from feature_generation_benchmark_spark.streaming.maintenance import (
    DayPartialsStore,
    maintain_from_stream,
)
from tests.test_incremental import REF_DAY, SPEC


@pytest.fixture()
def dated(tiny_transactions):
    return tiny_transactions.withColumn(
        "day", (F.lit(REF_DAY) - F.col("t_minus")).cast("long")
    )


def _assert_equal(a, b, key="customer_id"):
    ca, cb = sorted(a.columns), sorted(b.columns)
    assert ca == cb
    ra = {r[key]: tuple(r.asDict()[c] for c in ca) for r in a.collect()}
    rb = {r[key]: tuple(r.asDict()[c] for c in cb) for r in b.collect()}
    assert ra.keys() == rb.keys()
    for k in ra:
        for c, va, vb in zip(ca, ra[k], rb[k]):
            if isinstance(va, float) and isinstance(vb, float):
                assert math.isclose(va, vb, rel_tol=1e-9, abs_tol=1e-9)
            else:
                assert va == vb, (k, c, va, vb)


def test_incremental_store_equals_batch(spark, dated, tiny_transactions,
                                        tmp_path):
    store = DayPartialsStore(spark, SPEC, "day", str(tmp_path / "store"))
    v1 = store.apply_increment(dated.filter(F.col("day") % 2 == 0))
    v2 = store.apply_increment(dated.filter(F.col("day") % 2 == 1))
    assert (v1, v2) == (1, 2)
    _assert_equal(
        store.features_asof(REF_DAY),
        compile_case_when(SPEC, tiny_transactions),
    )


def test_version_pruning(spark, dated, tmp_path):
    store = DayPartialsStore(
        spark, SPEC, "day", str(tmp_path / "store"), keep_versions=2
    )
    for i in range(4):
        store.apply_increment(dated.filter(F.col("day") % 4 == i))
    assert store.latest_version() == 4
    kept = sorted(
        n for n in os.listdir(store.path) if n.startswith("v=")
    )
    assert kept == ["v=3", "v=4"]


def test_empty_store_raises(spark, tmp_path):
    store = DayPartialsStore(spark, SPEC, "day", str(tmp_path / "store"))
    with pytest.raises(ValueError, match="empty"):
        store.features_asof(REF_DAY)


def test_stream_maintenance_equals_batch(spark, dated, tiny_transactions,
                                         tmp_path):
    """Real Structured Streaming path: raw rows land as parquet files (two
    file-source micro-batch drains), foreachBatch folds them into the
    store, and the served features equal the batch recompute."""
    src = str(tmp_path / "raw")
    schema = dated.schema
    dated.filter(F.col("day") % 2 == 0).write.mode("overwrite").parquet(src)

    store = DayPartialsStore(spark, SPEC, "day", str(tmp_path / "store"))

    def drain(checkpoint: str) -> None:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "4")
            .parquet(src)
        )
        q = maintain_from_stream(stream, store, checkpoint)
        q.awaitTermination(120)

    drain(str(tmp_path / "ckpt"))
    assert store.latest_version() is not None

    # second wave of files: the SAME checkpoint only processes new ones
    dated.filter(F.col("day") % 2 == 1).write.mode("append").parquet(src)
    drain(str(tmp_path / "ckpt"))

    _assert_equal(
        store.features_asof(REF_DAY),
        compile_case_when(SPEC, tiny_transactions),
    )


def test_replayed_batch_id_is_idempotent(spark, dated, tiny_transactions,
                                         tmp_path):
    """At-least-once foreachBatch: re-delivering an already-applied
    micro-batch (same batch_id) must NOT re-fold it — pre-fix, every
    count/sum partial for the replayed days double-counted."""
    store = DayPartialsStore(spark, SPEC, "day", str(tmp_path / "store"))
    store.apply_increment(dated.filter(F.col("day") % 2 == 0), batch_id=0)
    store.apply_increment(dated.filter(F.col("day") % 2 == 1), batch_id=1)
    before = store.features_asof(REF_DAY)
    expected = {r["customer_id"]: tuple(r) for r in before.collect()}
    # replay batch 1 (crash-before-checkpoint-commit scenario)
    v = store.apply_increment(dated.filter(F.col("day") % 2 == 1),
                              batch_id=1)
    assert v == store.latest_version()
    got = {r["customer_id"]: tuple(r)
           for r in store.features_asof(REF_DAY).collect()}
    assert got == expected
    assert store.last_applied_batch() == 1
    # a genuinely NEW batch id still applies (monotonic ids)
    store.apply_increment(dated.limit(0), batch_id=2)
    assert store.last_applied_batch() == 2


def test_batch_apply_carries_marker_forward(spark, dated, tiny_transactions,
                                            tmp_path):
    """A non-streaming apply (batch_id=None) interleaved with streaming
    writes must carry the previous _applied_batch marker into the new
    version — pre-fix it dropped the marker, last_applied_batch()
    returned None, and a re-delivered streaming micro-batch re-folded
    and double-counted every partial (r6 advice)."""
    store = DayPartialsStore(spark, SPEC, "day", str(tmp_path / "store"))
    store.apply_increment(dated.filter(F.col("day") % 2 == 0), batch_id=0)
    # interleaved ad-hoc batch load: marker must survive
    store.apply_increment(dated.filter(F.col("day") % 2 == 1),
                          batch_id=None)
    assert store.last_applied_batch() == 0
    before = {r["customer_id"]: tuple(r)
              for r in store.features_asof(REF_DAY).collect()}
    # crash-replay of streaming batch 0 must now still be a no-op
    v0 = store.latest_version()
    store.apply_increment(dated.filter(F.col("day") % 2 == 0), batch_id=0)
    assert store.latest_version() == v0
    got = {r["customer_id"]: tuple(r)
           for r in store.features_asof(REF_DAY).collect()}
    assert got == before


def test_half_written_version_is_invisible(spark, dated, tmp_path):
    """A version directory without Spark's _SUCCESS marker (mid-write
    crash debris) must never be read or used as the merge base."""
    store = DayPartialsStore(spark, SPEC, "day", str(tmp_path / "store"))
    store.apply_increment(dated)
    assert store.latest_version() == 1
    # simulate a crashed v=2: directory exists, no _SUCCESS
    dead = os.path.join(store.path, "v=2")
    os.makedirs(dead)
    with open(os.path.join(dead, "part-00000.parquet"), "wb") as f:
        f.write(b"\x00truncated")
    assert store.latest_version() == 1  # dead dir invisible
    v = store.apply_increment(dated.limit(0))
    assert v == 2  # overwrote the debris
    assert os.path.exists(os.path.join(dead, "_SUCCESS"))
