"""Python Data Source API connector: partition parallelism + layout-
independent determinism."""

from __future__ import annotations

import pytest

from feature_generation_benchmark_spark.sources.pydatasource import (
    _EVENT_TYPES,
    register_synthetic_events,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_synthetic_events(spark)


def _read(spark, **opts):
    r = spark.read.format("synthetic_events")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_row_count_and_schema(spark):
    df = _read(spark, rows=2500, partitions=4)
    assert df.count() == 2500
    assert [f.name for f in df.schema.fields] == [
        "event_id", "user_id", "event_type", "value",
    ]
    got_types = {r["event_type"] for r in df.select("event_type").distinct().collect()}
    assert got_types <= set(_EVENT_TYPES)


def test_partition_count_is_respected(spark):
    df = _read(spark, rows=1000, partitions=7)
    assert df.rdd.getNumPartitions() == 7


def test_layout_independent_determinism(spark):
    a = sorted(map(tuple, _read(spark, rows=1200, partitions=2).collect()))
    b = sorted(map(tuple, _read(spark, rows=1200, partitions=10).collect()))
    assert a == b and len(a) == 1200


def test_filter_pushes_into_planned_scan(spark):
    # predicates apply on top of the Python scan without error and prune
    df = _read(spark, rows=1000, partitions=3).filter("event_type = 'click'")
    n = df.count()
    assert 0 < n < 1000


def test_zero_rows_yields_empty_frame(spark):
    df = _read(spark, rows=0, partitions=4)
    assert df.count() == 0


def test_stream_reader_equals_batch(spark, tmp_path):
    """The connector's streaming half must deliver exactly the batch
    dataset: counter offsets advance in batchRows steps, stop at the
    bound, and the accumulated micro-batches equal a batch read."""
    rows = 500
    stream = (
        spark.readStream.format("synthetic_events")
        .option("rows", rows)
        .option("batchRows", 120)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("synth_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    # Python micro-batch sources don't support availableNow: poll until
    # the bounded source stops advancing, then stop the query. The
    # deadline is a STALL timeout (any progress resets it), so slow-host
    # sessions don't flake as long as micro-batches keep landing.
    import time

    stall_s = 120
    deadline = time.time() + stall_s
    seen = -1
    while time.time() < deadline:
        n = spark.table("synth_stream").count()
        if n >= rows:
            break
        if n > seen:
            seen = n
            deadline = time.time() + stall_s
        time.sleep(1)
    q.stop()
    n = spark.table("synth_stream").count()
    assert n >= rows, (
        f"stream stalled: {n}/{rows} rows after {stall_s}s without progress"
    )
    got = sorted(map(tuple, spark.table("synth_stream").collect()))
    want = sorted(map(tuple, _read(spark, rows=rows).collect()))
    assert got == want and len(got) == rows
