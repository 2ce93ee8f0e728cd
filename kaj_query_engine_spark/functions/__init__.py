from kaj_query_engine_spark.functions import text

__all__ = ["text"]
