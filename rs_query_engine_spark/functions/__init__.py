from rs_query_engine_spark.functions.scalar import abs_, concat, power, sqrt, substring

__all__ = ["concat", "substring", "abs_", "sqrt", "power"]
