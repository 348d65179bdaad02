"""Custom connector on the Spark 4 Python Data Source API.

The engine's scan surface (``sources/io.py``) covers files; this module
covers AUTHORING a source: ``spark.read.format("synthetic_events")``
backed by a pure-Python ``DataSource`` with partition-parallel reads —
the pattern for wrapping any external system (a REST API, a queue, a
proprietary store) as a first-class, pushdown-planned Spark relation.

Determinism discipline matches ``sources/generator.py``: every row is
derived from a counter-based splitmix64 stream keyed by the GLOBAL row
index, so the dataset is identical for any partition count — the same
layout-independence guarantee the Arrow generator gives, here proving it
through the connector API.

Registration is per-session: ``register_synthetic_events(spark)``.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from feature_generation_benchmark_spark.sources.generator import _splitmix64

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")
_SCHEMA = (
    "event_id bigint, user_id bigint, event_type string, value double"
)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.num_partitions = int(options.get("partitions", 4))
        self.seed = int(options.get("seed", 42))
        self.users = int(options.get("users", 100))
        if self.rows < 0 or self.num_partitions < 1:
            raise ValueError("rows must be >= 0, partitions >= 1")

    def partitions(self):
        # max(1, ceil): rows=0 must yield the single empty partition, not
        # a zero range step
        step = max(1, -(-self.rows // self.num_partitions))
        return [
            _RangePartition(lo, min(lo + step, self.rows), self.seed)
            for lo in range(0, self.rows, step)
        ] or [_RangePartition(0, 0, self.seed)]

    def read(self, partition):
        # rows keyed by GLOBAL index -> identical under any partition count
        for i in range(partition.start, partition.end):
            yield _row_at(i, partition.seed, self.users)


def _row_at(i: int, seed: int, users: int):
    """THE row for global index ``i`` — shared by the batch partitions and
    the streaming micro-batches, so stream-accumulated data is
    bit-identical to a batch read of the same range."""
    h = _splitmix64(seed ^ (i << 1))
    return (
        i,
        h % users,
        _EVENT_TYPES[(h >> 32) % len(_EVENT_TYPES)],
        round((_splitmix64(h) % 1_000_000) / 100.0, 2),
    )


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the connector: offsets are plain row counters, so
    micro-batches are replayable ranges (``readBetweenOffsets``) — the
    exactly-once recovery contract. A bounded source (``rows``) simply
    stops advancing its offset at the end."""

    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.batch_rows = int(options.get("batchRows", 200))
        self.seed = int(options.get("seed", 42))
        self.users = int(options.get("users", 100))

    def initialOffset(self):
        return {"idx": 0}

    def read(self, start):
        s = int(start["idx"])
        e = min(s + self.batch_rows, self.rows)
        # a LIST, not a generator: the (rows, offset) pair crosses the
        # driver-side prefetch boundary by pickle
        return (
            [_row_at(i, self.seed, self.users) for i in range(s, e)],
            {"idx": e},
        )

    def readBetweenOffsets(self, start, end):
        return [
            _row_at(i, self.seed, self.users)
            for i in range(int(start["idx"]), int(end["idx"]))
        ]


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema) -> SyntheticEventsStreamReader:
        return SyntheticEventsStreamReader(self.options)


def register_synthetic_events(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)
