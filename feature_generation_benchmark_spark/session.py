"""SparkSession factory with scale-appropriate defaults.

The reference impls hand-tune confs per script (e.g. Kryo + shuffle
partitions, reference ``impl/pyspark-pivot.py:166-175``; the pathological
``spark.sql.shuffle.partitions=1`` in ``impl/pyspark-case-when.py:85``).
We centralize one AQE-first profile instead: adaptive execution owns
post-shuffle partition coalescing, skew-join splitting and join-strategy
choice at runtime, which is what survives a 100 TB / 1000-executor
scale-up without per-query retuning.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    """Cores the driver environment asks us to use (local mode)."""
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "feature-generation-benchmark-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's conf profile.

    Notes on the profile:

    - AQE on (+ coalescing): at cluster scale the static shuffle-partition
      number is always wrong for at least one stage; AQE right-sizes.
    - ``spark.sql.session.timeZone=UTC``: testdata timestamps are naive;
      pinning the zone makes date arithmetic deterministic and equal to
      DuckDB's naive-timestamp semantics.
    - Arrow on: every pandas/Arrow UDF boundary is vectorized.
    - Kryo: cheap win for shuffle-heavy wide-row plans (the reference uses
      it in all Spark impls).
    """
    cores = default_parallelism()
    if master is None:
        master = os.environ.get("SPARK_MASTER", f"local[{cores}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(cores))
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Driver testdata parquet carries TIMESTAMP(NANOS) which Spark has
        # no native type for; read as long (ns since epoch) and convert
        # explicitly (sources/testdata.py::event_ts).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
