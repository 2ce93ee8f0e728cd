from kaj_query_engine_spark.plans.pprint import pprint_query

__all__ = ["pprint_query"]
