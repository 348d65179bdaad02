from feature_generation_benchmark_spark.functions import exprs

__all__ = ["exprs"]
