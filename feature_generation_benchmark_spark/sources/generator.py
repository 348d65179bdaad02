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

import numpy as np
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
    #: deterministic multiplier on the per-(customer, day) Binomial rate —
    #: 1.0 is the reference contract (G2); <1.0 row-samples the SAME
    #: seeded trajectory (every stream draw is unchanged; only the row
    #: fan-out count shrinks), so a scaled size keeps big's full key and
    #: partition axes on a disk-constrained box.
    rate_scale: float = 1.0


#: The reference's scale ladder (``python/data_generation/__init__.py:36-67``).
SIZES: dict[str, SizeConfig] = {
    "tiny": SizeConfig(1_000, 6, 120),
    "small": SizeConfig(10_000, 12, 60),
    "medium": SizeConfig(100_000, 102, 7),
    "big": SizeConfig(1_000_000, 730, 1),
    # Disk-constrained stand-ins for ``big`` (~18B rows / ~260 GB parquet,
    # beyond a single test box): each keeps ONE of big's two stress axes at
    # its full setting — 730 one-day hive partitions, or 1M distinct
    # customer keys — at a total row count a single box's disk can hold
    # (input + at-scale shuffle spill + 2,080-col output concurrently).
    "big_parts": SizeConfig(100_000, 730, 1),
    "big_keys": SizeConfig(1_000_000, 50, 1),
    # BOTH axes at full setting (1M keys × 730 one-day partitions) with the
    # per-day rate sampled 0.15× — ~2.4B rows / ~35 GB, the largest layout
    # this box can hold input + spill + 2,080-col output concurrently.
    "big_both": SizeConfig(1_000_000, 730, 1, rate_scale=0.15),
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


_PHI = 0x9E3779B97F4A7C15  # splitmix64 increment (public-domain constant)

#: per-purpose stream tags (xor'd into the pair seed before mixing) —
#: independent counter-based streams per (pair, purpose, index)
_TAG_RATE, _TAG_JITTER, _TAG_AMNT, _TAG_CARD, _TAG_TRX, _TAG_CHAN = (
    0xA076_1D64_78BD_642F,
    0xE703_7ED1_A0B4_28DB,
    0x8EBC_6AF0_9C88_C6E3,
    0x5899_65CC_7537_4CC3,
    0x1D8E_4E27_C47D_124F,
    0xEB44_ACCA_B455_D165,
)


def _mix64(x):  # vectorized splitmix64 finalizer over uint64 ndarrays
    import numpy as np

    x = (x + np.uint64(_PHI)).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x = (x * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
    x ^= x >> np.uint64(27)
    x = (x * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
    x ^= x >> np.uint64(31)
    return x


def _u01(h):  # uint64 → uniform double in [0, 1), 53-bit mantissa
    return (h >> np.uint64(11)).astype(np.float64) * (2.0 ** -53)


def _stream(pair_seed, tag, idx):
    """Counter-based stream value: mix(mix(seed ^ tag) + idx·φ)."""
    import numpy as np

    base = _mix64(pair_seed ^ np.uint64(tag))
    return _mix64((base + idx.astype(np.uint64) * np.uint64(_PHI)).astype(np.uint64))


def _make_batch_fn(days: int, seed: int, rate_scale: float = 1.0):
    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import numpy as np

        for batch in batches:
            cust = batch.column("customer_id").to_numpy().astype(np.int64)
            part = batch.column("partition").to_numpy().astype(np.int64)
            k = len(cust)
            if k == 0:
                continue
            # per-(partition, customer) seed — G1; identical to
            # derive_seed(), fully vectorized
            s = _mix64(
                _mix64(np.uint64(seed) ^ (part.astype(np.uint64) << np.uint64(32)))
                ^ cust.astype(np.uint64)
            )
            # rate ~ Binomial(100, 0.25) as 100 counter-based Bernoullis (G2)
            j = np.arange(100, dtype=np.uint64)
            bern = _u01(_stream(s[:, None], _TAG_RATE, j[None, :])) < 0.25
            rate = bern.sum(axis=1).astype(np.int64)  # (k,)
            # per-day ±10% jitter (G3)
            d = np.arange(days, dtype=np.uint64)
            jit = 0.9 + 0.2 * _u01(_stream(s[:, None], _TAG_JITTER, d[None, :]))
            # rate_scale shrinks only the per-day fan-out count; the rate
            # and jitter streams above are untouched and the per-row draws
            # below stay counter-based, so a scaled dataset is exactly as
            # deterministic and layout-independent as the full one (it is
            # NOT a row-subset of it: per-row counters are indexed within
            # the pair, so fewer day-0 rows shift every later row's index)
            counts = np.maximum(
                (rate[:, None] * jit * rate_scale).astype(np.int64), 0
            )
            n_per_pair = counts.sum(axis=1)
            total = int(n_per_pair.sum())
            if total == 0:
                continue
            # row fan-out (G6): day index per row, row index within pair
            day_rows = np.repeat(
                np.tile(np.arange(days, dtype=np.int64), k), counts.ravel()
            )
            cust_rows = np.repeat(cust, n_per_pair)
            part_rows = np.repeat(part, n_per_pair)
            s_rows = np.repeat(s, n_per_pair)
            starts = np.cumsum(n_per_pair) - n_per_pair
            idx = np.arange(total, dtype=np.uint64) - np.repeat(
                starts, n_per_pair
            ).astype(np.uint64)
            # per-row draws (G4, G5) — one counter-based stream per purpose
            amnt = 100.0 + 9900.0 * _u01(_stream(s_rows, _TAG_AMNT, idx))
            card_idx = (
                _u01(_stream(s_rows, _TAG_CARD, idx)) >= 0.75
            ).astype(np.int8)  # P(DC)=0.75 → index 0
            trx_idx = (
                _stream(s_rows, _TAG_TRX, idx) % np.uint64(len(TRX_TYPES))
            ).astype(np.int8)
            chan_idx = (
                _u01(_stream(s_rows, _TAG_CHAN, idx)) >= 0.25
            ).astype(np.int8)  # P(mobile)=0.25 → index 0
            # category strings built C++-side via take() — never as Python
            # object arrays (the old per-pair loop's dominant cost)
            uniq_parts, part_inv = np.unique(part_rows, return_inverse=True)
            part_dict = pa.array([f"partition_{int(p)}" for p in uniq_parts])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(cust_rows, type=pa.int64()),
                    pa.array(["DC", "CC"]).take(pa.array(card_idx)),
                    pa.array(list(TRX_TYPES)).take(pa.array(trx_idx)),
                    pa.array(["mobile", "web"]).take(pa.array(chan_idx)),
                    pa.array(amnt, type=pa.float64()),
                    pa.array(part_rows * days + day_rows, type=pa.int64()),
                    part_dict.take(pa.array(part_inv.astype(np.int32))),
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
    rate_scale: float = 1.0,
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
        _make_batch_fn(days_per_partition, seed, rate_scale), SPARK_SCHEMA
    )


def generate_size(
    spark: SparkSession, size: str, seed: int = 42, tasks: int | None = None
) -> DataFrame:
    cfg = SIZES[size]
    return generate_transactions(
        spark,
        cfg.customers,
        cfg.partitions,
        cfg.days_per_partition,
        seed,
        tasks,
        cfg.rate_scale,
    )


def write_dataset(df: DataFrame, path: str) -> None:
    """Hive-partitioned parquet write, mirroring the reference's
    ``write_to_dataset(partition_cols=["part_col"])``."""
    df.write.mode("overwrite").partitionBy("part_col").parquet(path)
