"""Structured Streaming extension — the reference is pure batch (SURVEY
§2.5), but its trailing-window aggregations map naturally onto streaming:
the same FeatureSpec grouping/agg surface expressed over event-time windows
with watermarked late-data handling, plus a custom stateful sessionizer
(``applyInPandasWithState``).

Scale posture: watermark bounds state size; aggregations are incremental
(partial state per window pane); the stateful sessionizer keeps O(1) state
per key and emits sessions on timeout — the canonical streaming shapes that
survive unbounded input.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _cents_half_up(values: pd.Series) -> "np.ndarray":
    """value×100 → int64 cents, rounded HALF_UP (away from zero) to match
    the engine-wide Spark ``F.round`` cents rule — pandas ``.round()`` is
    banker's half-even and diverges on x.xx5 values. Done as rint
    (half-even) with exact-.5 fixed up afterwards: the naive
    ``floor(|x|+0.5)`` carries in binary for doubles just below n+0.5
    (0.49999999999999994+0.5 == 1.0) where Spark's BigDecimal HALF_UP
    yields n; exact halves ARE representable so the equality test is
    safe. (One definition — r6 session-3 review found two diverging-prone
    copies of this subtle block.)"""
    scaled = values.to_numpy(dtype="float64") * 100.0
    t = np.trunc(scaled)
    is_half = np.abs(scaled - t) == 0.5
    return np.where(is_half, t + np.sign(scaled), np.rint(scaled)).astype(
        "int64"
    )


def windowed_event_features(
    events: DataFrame,
    key: str = "user_id",
    category: str = "event_type",
    measure: str = "value",
    ts_col: str = "event_ts",
    window_duration: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-(key, category) tumbling/sliding event-time window aggregates
    with a watermark for late data — the streaming twin of the batch
    FeatureSpec cell ``{count, sum, avg, min, max}``.

    Works identically on a batch DataFrame (Spark's unified semantics), so
    tests can assert stream-vs-batch equality.
    """
    win = (
        F.window(F.col(ts_col), window_duration, slide)
        if slide
        else F.window(F.col(ts_col), window_duration)
    )
    with_wm = (
        events.withWatermark(ts_col, watermark)
        if events.isStreaming
        else events
    )
    return with_wm.groupBy(win.alias("win"), F.col(key), F.col(category)).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(measure).alias("sum_value"),
        F.avg(measure).alias("avg_value"),
        F.min(measure).alias("min_value"),
        F.max(measure).alias("max_value"),
    )


def dedup_stream(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "event_ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming exact deduplication on ``keys`` — the streaming twin of the
    batch ``dedup_exact`` operator (a training-data ingest pipeline dedups
    documents as they arrive, not in a nightly batch).

    Uses ``dropDuplicatesWithinWatermark`` so per-key state EXPIRES once the
    watermark passes the key's first-seen event time: state stays
    O(keys-per-watermark-window), the only shape that survives an unbounded
    100 TB stream (plain ``dropDuplicates`` on a stream keeps every key
    forever and OOMs). Duplicates separated by more than the watermark are
    not collapsed — that's the documented contract of within-watermark
    dedup; size the watermark to the pipeline's duplicate-arrival spread.

    On a batch DataFrame this degrades to exact ``dropDuplicates`` so tests
    can use the batch result as the oracle.
    """
    if not events.isStreaming:
        return events.dropDuplicates(keys)
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "event_ts",
    right_ts: str = "event_ts",
    max_delay: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked stream-stream inner join: match right rows to left rows
    with the same key whose event time falls in ``[left_ts, left_ts +
    max_delay]`` (e.g. click → purchase attribution as both arrive).

    Both sides carry a watermark and the join condition bounds the
    event-time distance, so Spark can EXPIRE buffered state once the
    watermark passes — without the time bound a stream-stream join must
    buffer both streams forever. State per key is O(rows within
    watermark+delay), the only shape that survives unbounded input.

    Batch inputs skip the watermark (unified semantics) so tests can use
    the equivalent batch join as the oracle.

    Output columns: all left columns unchanged, plus every right column
    except the join key — suffixed ``_r`` where the name collides with a
    left column. (r6 session-3 review: returning the raw aliased join
    left duplicate ``on``/ts names in the schema, so any name-based
    ``select``/``groupBy`` downstream raised AMBIGUOUS_REFERENCE.)
    """
    lt, rt = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    lhs = (
        left.withWatermark(left_ts, watermark) if left.isStreaming else left
    ).alias("l")
    rhs = (
        right.withWatermark(right_ts, watermark)
        if right.isStreaming
        else right
    ).alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (rt >= lt)
        & (rt <= lt + F.expr(f"INTERVAL {max_delay}"))
    )
    lcols = set(left.columns)
    right_sel = [
        F.col(f"r.{c}").alias(c if c not in lcols else f"{c}_r")
        for c in right.columns
        if c != on
    ]
    return lhs.join(rhs, cond, "inner").select(F.col("l.*"), *right_sel)


SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
    ]
)


def _session_fn(gap_us: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int, float]] = []
        if state.hasTimedOut:
            if state.exists:
                start, last, n, s = state.get
                closed.append((start, last, n, s))
                state.remove()
        else:
            rows = pd.concat(list(pdfs))
            rows = rows.sort_values("ts_us")
            if state.exists:
                start, last, n, s = state.get
            else:
                start, last, n, s = None, None, 0, 0.0
            for ts, v in zip(rows["ts_us"], rows["value"]):
                ts = int(ts)
                if start is None:
                    start, last, n, s = ts, ts, 1, float(v)
                elif ts - last > gap_us:
                    closed.append((start, last, n, s))
                    start, last, n, s = ts, ts, 1, float(v)
                else:
                    # clamp, don't assign: a CROSS-BATCH late event has
                    # ts < last (within a batch rows are sorted), and
                    # letting `last` move backwards regresses the session
                    # end below already-folded events and wrongly splits
                    # the next on-time event into a new session (r6
                    # session-3 review). Late rows fold into the still-
                    # open session with boundary clamping.
                    start, last = min(start, ts), max(last, ts)
                    n, s = n + 1, s + float(v)
            state.update((start, last, n, s))
            # ms; clamp — PySpark rejects a 0 timeout (sub-ms gaps)
            state.setTimeoutDuration(max(1, gap_us // 1000))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start_us": [c[0] for c in closed],
                    "session_end_us": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                    "sum_value": [c[3] for c in closed],
                }
            )

    return fn


def stateful_sessionizer(
    events: DataFrame,
    gap_us: int = 30 * 60 * 10**6,
) -> DataFrame:
    """Custom stateful operator: gap-based session assembly with
    ``applyInPandasWithState`` (processing-time timeout closes idle
    sessions). Input needs columns (user_id long, ts_us long, value double).

    Ordering contract: rows are sorted per key WITHIN a micro-batch;
    a cross-batch late event folds into the still-open session with
    boundary clamping (start=min, end=max — it can never split or
    regress a boundary). An event later than the gap before the open
    session's start still joins that session (its true session is
    unknowable once state has advanced) — use event-time watermarking
    upstream if late data must instead be dropped.
    """
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_us),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes (user
    profile, document metadata, model routing table…) to an unbounded
    event stream.

    Stream-static joins are STATELESS — no watermark, no state store: each
    micro-batch joins against the static side as of that batch (Spark
    re-plans the static subtree per batch, so a dim refresh on disk is
    picked up without restarting the query). ``broadcast_dim`` keeps the
    unbounded side un-shuffled — the only sane shape when the stream is
    the 100 TB side; set it False only for dims too large to broadcast
    (then pre-bucket both sides instead). Works identically on a batch
    frame, so tests assert stream-vs-batch equality.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return events.join(d, on=on, how=how)


def ohlc_stream(
    events: DataFrame,
    category: str = "event_type",
    ts_col: str = "event_ts",
    id_col: str = "event_id",
    measure: str = "value",
    bar: str = "6 hours",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming twin of the batch OHLC bar resample
    (``workloads/timeseries.py::ohlc_bars``): tumbling event-time bars per
    category with open/close as argmin/argmax by (ts, id) — the same
    lexicographic struct min/max, which streaming aggregation state folds
    incrementally. Watermark bounds bar state; on a batch frame this is
    the identical aggregation, so tests assert stream-vs-batch equality.
    """
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    base = src.select(
        F.col(category),
        F.col(ts_col),
        F.col(id_col),
        F.round(F.col(measure) * F.lit(100), 0).cast("long").alias("cents"),
    )
    return base.groupBy(
        F.window(F.col(ts_col), bar).alias("bar"), F.col(category)
    ).agg(
        F.min(F.struct(ts_col, id_col, "cents"))["cents"].alias("open_cents"),
        F.max("cents").alias("high_cents"),
        F.min("cents").alias("low_cents"),
        F.max(F.struct(ts_col, id_col, "cents"))["cents"].alias("close_cents"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("cents").alias("volume_cents"),
    )


class RunningFeatureProcessor:
    """`transformWithStateInPandas` processor (the Spark 4 successor of
    ``applyInPandasWithState``, used by :func:`stateful_sessionizer`):
    per-key running ``{count, sum, min, max}`` over the measure — the
    streaming feature-store state-maintenance shape, state folded
    incrementally per micro-batch with typed ValueState.

    Emits the updated state row for every key touched by a batch, so an
    Update-mode sink always carries each key's latest feature values.
    """

    OUTPUT_SCHEMA = (
        "user_id long, n_events long, sum_cents long, "
        "min_cents long, max_cents long"
    )

    def init(self, handle) -> None:
        self._state = handle.getValueState(
            "agg", "n long, s long, mn long, mx long"
        )

    def handleInputRows(self, key, rows, timerValues):
        if self._state.exists():
            n, s, mn, mx = self._state.get()
        else:
            n, s, mn, mx = 0, 0, None, None
        for pdf in rows:
            if len(pdf) == 0:  # empty Arrow chunk: min()/max() would NaN
                continue
            cents = _cents_half_up(pdf["value"])
            n += int(len(pdf))
            s += int(cents.sum())
            lo, hi = int(cents.min()), int(cents.max())
            mn = lo if mn is None else min(mn, lo)
            mx = hi if mx is None else max(mx, hi)
        self._state.update((n, s, mn, mx))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_cents": [s],
                "min_cents": [mn],
                "max_cents": [mx],
            }
        )

    def close(self) -> None:
        pass


def running_features(events: DataFrame) -> DataFrame:
    """Wire :class:`RunningFeatureProcessor` over a (streaming) events
    frame keyed by user_id. Output mode Update: one refreshed feature row
    per touched key per micro-batch.

    Runtime note: Spark's transformWithState Python worker speaks a
    protobuf state-server protocol. When the ``protobuf`` distribution is
    absent (as in this container), the vendored pure-Python wire-format
    shim (``feature_generation_benchmark_spark/vendor/protoshim``,
    activated by ``session.get_spark`` before the JVM starts) serves the
    same surface, so the end-to-end test runs everywhere; the state store
    must be RocksDB (TWS keeps one column family per state variable)."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    # subclass registration kept local so the module imports even if the
    # stateful-processor API moves between Spark minors
    proc = type(
        "_RunningFeatureProcessor",
        (RunningFeatureProcessor, StatefulProcessor),
        {},
    )()
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=RunningFeatureProcessor.OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


EMA_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("ema_cents", T.LongType()),
    ]
)

_EMA_STATE_SCHEMA = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("e", T.LongType())]
)


def _ema_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    rows = pd.concat(list(pdfs)).sort_values(["ts_us", "event_id"])
    n, e = state.get if state.exists else (0, 0)
    for c in rows["cents"]:
        c = int(c)
        if n == 0:
            e = c
        else:
            # truncate toward zero, matching the batch twin's Spark
            # `div` (-1 div 4 = 0); Python // floors (-1 // 4 = -1), so
            # negative cents (refunds) would diverge permanently (r6
            # session-3 review)
            t = c + 3 * e
            e = t // 4 if t >= 0 else -((-t) // 4)
        n += 1
    state.update((n, e))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "ema_cents": [e]}
    )


def ema_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch per-key EMA fold
    (``workloads/timeseries.py::ema_customer_spend``): the same
    integer-exact ``e ← (x + 3e) // 4`` recurrence carried across
    micro-batches in ``applyInPandasWithState`` value state — (n, e) is
    the ENTIRE per-key state, so state size is O(keys) regardless of
    stream length. Output mode Update: one refreshed (n, ema) row per
    touched key per micro-batch; the latest emission per key is the
    answer.

    Ordering contract (inherent to any sequential fold over a stream):
    within a micro-batch rows are sorted by (ts_us, event_id) before
    folding, so the result equals the batch fold whenever micro-batches
    arrive in per-key event-time order (file source in mtime order,
    kafka partitioned by key). Late out-of-order data WOULD need the
    fold re-run from a snapshot — the batch twin is that backfill path.

    Input needs columns (user_id long, ts_us long, event_id long,
    cents long)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _ema_fn,
        outputStructType=EMA_OUTPUT_SCHEMA,
        stateStructType=_EMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def histogram_sketch_stream(
    events: DataFrame,
    category: str = "event_type",
    ts_col: str = "event_ts",
    measure: str = "value",
    grain: str = "1 day",
    watermark: str = "1 hour",
    bin_cents: int = 2_500,
    n_bins: int = 20,
) -> DataFrame:
    """Streaming producer of the storable day-grain histogram sketch
    table (the batch consumer is ``workloads/mlprep.py::
    histogram_quantile_rollup``): tumbling event-time windows per
    (category, fixed cent bin), counting into exact integer histogram
    cells. Counts fold incrementally through streaming aggregation
    state (watermark-bounded: live state is windows×types×bins rows);
    downstream readers merge day rows by integer addition — the same
    mergeable pre-agg contract as the batch rollup, so any (type,
    day-range) quantile question is served from this sink at
    sketch-table cost. On a batch frame the identical aggregation runs,
    so tests assert stream-vs-batch equality."""
    src = (
        events.withWatermark(ts_col, watermark)
        if events.isStreaming
        else events
    )
    return (
        src.select(
            F.col(category),
            F.col(ts_col),
            F.least(
                F.floor(
                    F.round(F.col(measure) * 100, 0).cast("long")
                    / F.lit(bin_cents)
                ),
                F.lit(n_bins - 1),
            ).alias("bin"),
        )
        .groupBy(
            F.window(F.col(ts_col), grain).alias("day"),
            F.col(category),
            F.col("bin"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


class CategoryMixProcessor:
    """`transformWithStateInPandas` processor exercising the WIDER typed
    state surface (the protocol coverage twin of
    :class:`RunningFeatureProcessor`, which uses ValueState only):

    - **MapState** ``mix``: per-key map of event_type → (n, cents) —
      containsKey / getValue / updateValue / iterator all hit the JVM
      state server (paged ``StateResponseWithMapIterator`` replies);
    - **ListState** ``recent``: the last ``RECENT_CAP`` cents values —
      appended via ``appendList``, read back with the paged list
      iterator, and TRIMMED with ``put`` when over cap, so per-key list
      state is bounded (r6 session-3 review: the untrimmed version grew
      O(stream) and re-read it all every batch — quadratic over the
      stream's life);
    - **timers**: a far-future processing-time timer is registered,
      listed, and deleted each batch (``TimerStateCallCommand``
      register/list/delete round-trips; nothing ever fires) — coverage
      mode only;
    - **TTL**: in coverage mode the map state carries a 1-hour TTL,
      pushing the ``StateCallCommand.ttl.durationMs`` submessage through
      the wire. Production wiring gets NO TTL — an unconditional TTL
      silently shrank idle keys' running totals, breaking the
      "converges to the batch group-by" contract.

    Emits one row per key per batch with the current totals, so Update
    mode converges to the batch group-by (the e2e assertion).

    The protocol-coverage round-trips (timer register/list/delete,
    scratch ValueState lifecycle, MapState sentinel insert/remove,
    ListState rewrite-in-place) are GATED behind ``protocol_coverage``
    (default off): they are e2e-test instrumentation, ~10 extra state-
    server round-trips per key per batch that a production consumer
    wiring :func:`category_mix_features` directly must not pay, and
    their bare asserts vanish under ``python -O`` (advisor finding, r5).
    """

    OUTPUT_SCHEMA = (
        "user_id long, n_types long, total_events long, "
        "total_cents long, n_recent long"
    )

    #: Bound on the per-key ``recent`` list state (last-N cents window).
    RECENT_CAP = 100

    def __init__(self, protocol_coverage: bool = False) -> None:
        self._protocol_coverage = protocol_coverage

    def init(self, handle) -> None:
        if self._protocol_coverage:
            # TTL is wire-protocol instrumentation — production totals
            # must never expire (see class docstring)
            self._mix = handle.getMapState(
                "mix", "event_type string", "n long, cents long",
                ttlDurationMs=3_600_000,
            )
        else:
            self._mix = handle.getMapState(
                "mix", "event_type string", "n long, cents long"
            )
        self._recent = handle.getListState("recent", "cents long")
        # scratch ValueState: exists/update/get/clear round-trips — the
        # remaining ValueStateCall protocol members
        self._scratch = handle.getValueState("scratch", "v long")
        # deleteIfExists is only legal in the CREATED handle state (the
        # JVM rejects it later) — the migration pattern: drop a state
        # variable a previous query version might have left behind
        handle.deleteIfExists("obsolete_v1")
        self._handle = handle

    def handleInputRows(self, key, rows, timerValues):
        if self._protocol_coverage:
            # timer protocol round-trip (register → list → delete); the
            # expiry is an hour out so it never fires inside the test run
            far = timerValues.getCurrentProcessingTimeInMs() + 3_600_000
            self._handle.registerTimer(far)
            assert any(t == far for t in self._handle.listTimers())
            self._handle.deleteTimer(far)

        for pdf in rows:
            if len(pdf) == 0:
                continue
            cents = _cents_half_up(pdf["value"])
            self._recent.appendList([(int(c),) for c in cents])
            for et, c in zip(pdf["event_type"], cents):
                if self._mix.containsKey((et,)):
                    n0, c0 = self._mix.getValue((et,))
                else:
                    n0, c0 = 0, 0
                self._mix.updateValue((et,), (n0 + 1, c0 + int(c)))
        if self._protocol_coverage:
            # remaining protocol members, exercised with self-checking
            # no-net-effect round-trips: ValueState update/get/clear,
            # MapState removeKey + keys()/values(), ListState put()
            assert not self._scratch.exists()
            self._scratch.update((7,))
            assert self._scratch.exists() and self._scratch.get() == (7,)
            self._scratch.clear()
            assert not self._scratch.exists()
            self._mix.updateValue(("__sentinel__",), (0, 0))
            assert self._mix.containsKey(("__sentinel__",))
            self._mix.removeKey(("__sentinel__",))
            assert not self._mix.containsKey(("__sentinel__",))
        n_types = 0
        total_events = 0
        total_cents = 0
        for _k, (n, c) in self._mix.iterator():
            n_types += 1
            total_events += n
            total_cents += c
        # the read is bounded: ≤ RECENT_CAP carried rows + this batch's
        # appends; over-cap lists are trimmed back with put()
        current = [tuple(v) for v in self._recent.get()]
        if len(current) > self.RECENT_CAP:
            current = current[-self.RECENT_CAP:]
            self._recent.put(current)
        n_recent = len(current)
        if self._protocol_coverage:
            assert sum(1 for _ in self._mix.keys()) == n_types
            assert sum(1 for _ in self._mix.values()) == n_types
            self._recent.put(current)  # rewrite-in-place: ListStatePut
            n_recent = sum(1 for _ in self._recent.get())
            assert n_recent == len(current)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_types": [n_types],
                "total_events": [total_events],
                "total_cents": [total_cents],
                "n_recent": [n_recent],
            }
        )

    def close(self) -> None:
        pass

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        # required override surface; the test's far-future timers are
        # deleted before expiry, so this never yields
        yield from ()


def category_mix_features(
    events: DataFrame, protocol_coverage: bool = False
) -> DataFrame:
    """Wire :class:`CategoryMixProcessor` over a streaming events frame
    keyed by user_id (ProcessingTime mode — required for timers/TTL).
    ``protocol_coverage=True`` (e2e test only) adds the wider-protocol
    round-trips per key per batch; leave off in production wiring."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    proc = type(
        "_CategoryMixProcessor",
        (CategoryMixProcessor, StatefulProcessor),
        {},
    )(protocol_coverage=protocol_coverage)
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=CategoryMixProcessor.OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="ProcessingTime",
    )
