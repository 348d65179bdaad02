from feature_generation_benchmark_spark.sources.io import (
    read_parquet,
    write_parquet,
)
from feature_generation_benchmark_spark.sources.testdata import (
    EVENT_TYPES,
    EVENTS_REF_DATE,
    events_transactions,
    load_table,
)

__all__ = [
    "read_parquet",
    "write_parquet",
    "EVENT_TYPES",
    "EVENTS_REF_DATE",
    "events_transactions",
    "load_table",
]
