"""Native seeded transaction generator — Spark-first re-expression of the
reference's Rust/Arrow generator (``src/lib.rs:128-268``,
``python/data_generation/__init__.py:24-119``; SURVEY §2.6 G1-G7).

Architecture: a tiny (customer × partition) seed frame fans out through
``mapInArrow``; each Arrow batch is synthesized vectorized in NumPy from a
**counter-based derived seed** — ``seed = splitmix64(global_seed, partition,
customer)`` — so the dataset is bit-reproducible regardless of Spark's
partitioning or task scheduling (G1; Spark's ``F.rand`` cannot give that
guarantee, SURVEY §7.3). Distributions mirror the reference exactly:

- rows/(customer, day): Binomial(100, 0.25) per-customer expected rate with
  ±10% per-day uniform jitter (G2, G3)
- card_type ∈ {DC: 0.75, CC: 0.25}; channel ∈ {mobile: 0.25, web: 0.75};
  trx_type uniform over 13 categories (G4)
- trx_amnt ~ Uniform(100, 10000) (G5)
- t_minus = partition_offset + day index (integer relative time)
- part_col = ``partition_<k>`` hive key (G7 ladder in :data:`SIZES`)

Scale posture: generation parallelism = seed-frame partitions; no shuffle
at all (narrow mapInArrow over a range); hive-partitioned writes stream
straight out of executors.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRX_TYPES = (
    "food-and-household",
    "home",
    "uncategorized",
    "leisure-and-lifestyle",
    "health-and-beauty",
    "shopping-and-services",
    "children",
    "vacation-and-travel",
    "education",
    "insurance",
    "investments-and-savings",
    "expenses-and-other",
    "cars-and-transportation",
)

ARROW_SCHEMA = pa.schema(
    [
        pa.field("customer_id", pa.int64(), nullable=False),
        pa.field("card_type", pa.string(), nullable=False),
        pa.field("trx_type", pa.string(), nullable=False),
        pa.field("channel", pa.string(), nullable=False),
        pa.field("trx_amnt", pa.float64(), nullable=False),
        pa.field("t_minus", pa.int64(), nullable=False),
        pa.field("part_col", pa.string(), nullable=False),
    ]
)

SPARK_SCHEMA = (
    "customer_id long, card_type string, trx_type string, channel string, "
    "trx_amnt double, t_minus long, part_col string"
)


@dataclass(frozen=True)
class SizeConfig:
    customers: int
    partitions: int
    days_per_partition: int


#: The reference's scale ladder (``python/data_generation/__init__.py:36-67``).
SIZES: dict[str, SizeConfig] = {
    "tiny": SizeConfig(1_000, 6, 120),
    "small": SizeConfig(10_000, 12, 60),
    "medium": SizeConfig(100_000, 102, 7),
    "big": SizeConfig(1_000_000, 730, 1),
}


def _splitmix64(x: int) -> int:
    """Counter-based seed mixer (public-domain splitmix64 constants)."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def derive_seed(global_seed: int, partition: int, customer: int) -> int:
    return _splitmix64(
        _splitmix64(global_seed ^ (partition << 32)) ^ customer
    )


def _make_batch_fn(days: int, seed: int):
    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import numpy as np

        for batch in batches:
            cust = batch.column("customer_id").to_numpy()
            part = batch.column("partition").to_numpy()
            out_cust = []
            out_t = []
            out_amt = []
            out_card = []
            out_trx = []
            out_chan = []
            out_part = []
            for c, p in zip(cust, part):
                rng = np.random.default_rng(derive_seed(seed, int(p), int(c)))
                # per-customer expected daily rate (G2)
                rate = rng.binomial(100, 0.25)
                # per-day ±10% jitter (G3), at least 0
                jitter = rng.uniform(0.9, 1.1, size=days)
                counts = np.maximum((rate * jitter).astype(np.int64), 0)
                n = int(counts.sum())
                if n == 0:
                    continue
                day_idx = np.repeat(np.arange(days, dtype=np.int64), counts)
                out_cust.append(np.full(n, c, dtype=np.int64))
                out_t.append(int(p) * days + day_idx)
                out_amt.append(rng.uniform(100.0, 10000.0, size=n))
                out_card.append(
                    np.where(rng.random(n) < 0.75, "DC", "CC")
                )
                out_trx.append(
                    np.array(TRX_TYPES, dtype=object)[
                        rng.integers(0, len(TRX_TYPES), size=n)
                    ]
                )
                out_chan.append(
                    np.where(rng.random(n) < 0.25, "mobile", "web")
                )
                out_part.append(
                    np.full(n, f"partition_{int(p)}", dtype=object)
                )
            if not out_cust:
                continue
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.concatenate(out_cust), type=pa.int64()),
                    pa.array(np.concatenate(out_card), type=pa.string()),
                    pa.array(np.concatenate(out_trx), type=pa.string()),
                    pa.array(np.concatenate(out_chan), type=pa.string()),
                    pa.array(np.concatenate(out_amt), type=pa.float64()),
                    pa.array(np.concatenate(out_t), type=pa.int64()),
                    pa.array(np.concatenate(out_part), type=pa.string()),
                ],
                schema=ARROW_SCHEMA,
            )

    return gen


def generate_transactions(
    spark: SparkSession,
    customers: int,
    partitions: int = 1,
    days_per_partition: int = 30,
    seed: int = 42,
    tasks: int | None = None,
) -> DataFrame:
    """Deterministic transactions DataFrame (reference schema
    ``src/lib.rs:241-249``). Same (seed, size) → identical dataset,
    independent of cluster layout."""
    n = customers * partitions
    if tasks is None:
        tasks = min(max(1, n // 256), spark.sparkContext.defaultParallelism * 4)
    seeds = spark.range(0, n, 1, tasks).select(
        (F.col("id") % customers).alias("customer_id"),
        (F.col("id") / customers).cast("long").alias("partition"),
    )
    return seeds.mapInArrow(
        _make_batch_fn(days_per_partition, seed), SPARK_SCHEMA
    )


def generate_size(
    spark: SparkSession, size: str, seed: int = 42, tasks: int | None = None
) -> DataFrame:
    cfg = SIZES[size]
    return generate_transactions(
        spark, cfg.customers, cfg.partitions, cfg.days_per_partition, seed, tasks
    )


def write_dataset(df: DataFrame, path: str) -> None:
    """Hive-partitioned parquet write, mirroring the reference's
    ``write_to_dataset(partition_cols=["part_col"])``."""
    df.write.mode("overwrite").partitionBy("part_col").parquet(path)
