"""Streaming feature-store maintenance — the incremental plan
(``plans/incremental.py``) driven by Structured Streaming micro-batches.

Each arriving micro-batch of raw events is reduced to day-granular
decomposable partials and folded into a versioned parquet store
(``foreachBatch`` — the canonical sink pattern for merge-style writes that
plain streaming sinks can't express). The wide feature table for any
as-of date is then served from the store without touching raw history.

Store layout: ``<path>/v=N/`` parquet snapshots; each increment reads the
latest version, merges, and writes ``v=N+1`` — readers never observe a
half-written snapshot: a version is LIVE only once Spark's ``_SUCCESS``
marker lands, so a directory left behind by a mid-write crash is invisible
to ``read()``/``latest_version()`` and simply overwritten by the next
increment (r6 session-3 review: pre-fix, a truncated ``v=N+1`` became the
merge base and silently dropped data forever). Replayed micro-batches are
idempotent: the applied streaming ``batch_id`` is recorded next to each
snapshot and re-deliveries of ``batch_id ≤ last-applied`` are skipped —
without this, at-least-once ``foreachBatch`` double-counted every
count/sum partial after a crash-restart. Old versions are pruned, keeping
``keep_versions``. Partial-table size is
``|keys| × |category combos| × |days|`` — orders of magnitude below raw —
so rewriting the snapshot per micro-batch is cheap relative to the raw
scan it replaces; at very high frequency, point ``keep_versions`` higher
and compact on a schedule.

This module uses driver-side ``os`` path handling (local/NFS paths — the
test environment); the commit primitive is an atomic directory rename,
which object stores don't provide — production deployments swap the
filesystem calls for their store's listing/delete API plus a
manifest-file commit, or replace the whole store with a table format
(Delta/Iceberg MERGE) while keeping the same partials algebra.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from feature_generation_benchmark_spark.plans.incremental import (
    compile_day_partials,
    features_asof,
    merge_day_partials,
)
from feature_generation_benchmark_spark.spec import FeatureSpec


class DayPartialsStore:
    """Versioned parquet store of day-granular feature partials."""

    def __init__(
        self,
        spark: SparkSession,
        spec: FeatureSpec,
        day_col: str,
        path: str,
        keep_versions: int = 2,
    ) -> None:
        self.spark = spark
        self.spec = spec
        self.day_col = day_col
        self.path = path
        self.keep_versions = max(1, keep_versions)
        os.makedirs(path, exist_ok=True)

    # ---- versioning ------------------------------------------------------

    def _versions(self) -> list[int]:
        """LIVE versions only — a directory without Spark's ``_SUCCESS``
        marker is a crashed half-write and must never be read, merged
        from, or counted when choosing the next version number (the
        overwrite-mode write replaces it)."""
        out = []
        for name in os.listdir(self.path):
            if name.startswith("v="):
                try:
                    v = int(name[2:])
                except ValueError:
                    continue
                if os.path.exists(
                    os.path.join(self.path, name, "_SUCCESS")
                ):
                    out.append(v)
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self._versions()
        return vs[-1] if vs else None

    def last_applied_batch(self) -> int | None:
        """Streaming batch_id recorded with the latest live snapshot
        (None for stores written outside ``foreach_batch``)."""
        v = self.latest_version()
        if v is None:
            return None
        p = os.path.join(self.path, f"v={v}", "_applied_batch")
        try:
            with open(p) as f:
                return int(f.read().strip())
        except (OSError, ValueError):
            return None

    def read(self) -> DataFrame | None:
        """The current partials snapshot (None before the first load)."""
        v = self.latest_version()
        if v is None:
            return None
        return self.spark.read.parquet(os.path.join(self.path, f"v={v}"))

    # ---- maintenance -----------------------------------------------------

    def apply_increment(
        self, batch_df: DataFrame, batch_id: int | None = None
    ) -> int:
        """Fold one micro-batch of RAW rows into the store; returns the
        (possibly unchanged) current version number. Associative partials
        algebra means increments may carry any mix of days (late data
        lands in its own day rows).

        ``batch_id`` (from ``foreachBatch``) makes replays idempotent:
        Structured Streaming is at-least-once around the commit point, so
        a crash between the store write and the checkpoint commit
        re-delivers the same micro-batch — re-folding it would double
        every count/sum partial. Ids are monotonic per checkpoint, so
        ``batch_id ≤ last-applied`` is skipped."""
        if batch_id is not None:
            last = self.last_applied_batch()
            if last is not None and batch_id <= last:
                return self.latest_version()
        new = compile_day_partials(self.spec, batch_df, self.day_col)
        current = self.read()
        merged = (
            new
            if current is None
            else merge_day_partials(self.spec, [current, new], self.day_col)
        )
        next_v = (self.latest_version() or 0) + 1
        vdir = os.path.join(self.path, f"v={next_v}")
        # Stage-then-rename: the parquet (and, when streaming, the
        # batch-id marker) land in a stage directory that only becomes a
        # ``v=N`` via one atomic os.rename — data and marker commit
        # TOGETHER, so there is no window where the batch is applied but
        # unrecorded (a marker written after the live write would leave
        # exactly that window and replays would double-count).
        stage = os.path.join(self.path, f"_stage_v={next_v}")
        shutil.rmtree(stage, ignore_errors=True)
        merged.write.mode("overwrite").parquet(stage)
        # A non-streaming apply (batch_id=None) interleaved with
        # streaming writes must CARRY the previous marker forward:
        # dropping it would make last_applied_batch() return None, and a
        # re-delivered streaming micro-batch would re-fold and
        # double-count every partial (r6 advice).
        marker = batch_id if batch_id is not None else self.last_applied_batch()
        if marker is not None:
            with open(os.path.join(stage, "_applied_batch"), "w") as f:
                f.write(str(marker))
        shutil.rmtree(vdir, ignore_errors=True)  # dead half-write, if any
        os.rename(stage, vdir)
        for v in self._versions()[: -self.keep_versions]:
            shutil.rmtree(
                os.path.join(self.path, f"v={v}"), ignore_errors=True
            )
        return next_v

    def foreach_batch(self):
        """Writer for ``stream.writeStream.foreachBatch(...)``."""
        def write(batch_df: DataFrame, batch_id: int) -> None:
            self.apply_increment(batch_df, batch_id=batch_id)

        return write

    # ---- serving ---------------------------------------------------------

    def features_asof(self, ref_day: int) -> DataFrame:
        """The wide feature table as of ``ref_day`` from the current
        snapshot (raises if the store is empty)."""
        current = self.read()
        if current is None:
            raise ValueError("partials store is empty — no loads applied yet")
        return features_asof(self.spec, current, ref_day, self.day_col)


def maintain_from_stream(
    stream_df: DataFrame,
    store: DayPartialsStore,
    checkpoint_path: str,
    trigger_available_now: bool = True,
):
    """Wire a raw-event STREAM into the store: one merge per micro-batch.

    Returns the started ``StreamingQuery``. With ``availableNow`` the query
    drains what exists and stops — the batch-backfill idiom; without it,
    it runs continuously on the default trigger.
    """
    writer = (
        stream_df.writeStream.foreachBatch(store.foreach_batch())
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
