from rs_query_engine_spark.plans.explain import explain_str, physical_plan_contains

__all__ = ["explain_str", "physical_plan_contains"]
