from kaj_query_engine_spark.operators import dedup, similarity

__all__ = ["dedup", "similarity"]
