"""feature_generation_benchmark_spark — a PySpark-native feature-generation
analytics engine.

A brand-new, Spark-first re-expression of the capabilities of the reference
benchmark suite SemyonSinchenko/feature-generation-benchmark (studied at
/root/reference, see SURVEY.md). The engine compiles a declarative
:class:`~feature_generation_benchmark_spark.spec.FeatureSpec` into Spark
DataFrame plans with selectable physical strategies (conditional aggregation,
bucket+exact-rollup, grouped-map UDF), plus a library of large-scale
data-pipeline operators (dedup, similarity search, text analysis,
sessionization, multimodal plumbing) sharing the same compile-to-DataFrame
discipline.

Everything here is built on public PySpark APIs only.
"""

from feature_generation_benchmark_spark.spec import Agg, FeatureSpec, Grouping
from feature_generation_benchmark_spark.session import get_spark
from feature_generation_benchmark_spark.plans import (
    compile_features,
    choose_strategy,
)

__all__ = [
    "Agg",
    "FeatureSpec",
    "Grouping",
    "get_spark",
    "compile_features",
    "choose_strategy",
]

__version__ = "0.1.0"
