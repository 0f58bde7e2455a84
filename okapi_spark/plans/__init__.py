from okapi_spark.plans.inspect import count_exchanges, physical_plan

__all__ = ["count_exchanges", "physical_plan"]
