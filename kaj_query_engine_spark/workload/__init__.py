"""Query workload: every operator from SURVEY.md §2 (+ extensions) as a
(name, spark-callable, oracle-SQL) triple consumed by __spark_entry__.py
and bench.py.
"""

from kaj_query_engine_spark.workload.registry import (
    WorkloadQuery,
    all_queries,
    queries_dict,
    oracle_dict,
)

__all__ = ["WorkloadQuery", "all_queries", "queries_dict", "oracle_dict"]
