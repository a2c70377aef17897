"""Operator surface: aggregates, sorts, set ops, windows, dedup,
similarity search, text analysis, multimodal plumbing."""

from rs_query_engine_spark.operators.aggregates import avg, count, count_star, max_, min_, sum_

__all__ = ["sum_", "min_", "max_", "avg", "count", "count_star"]
