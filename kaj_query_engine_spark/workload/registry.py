"""Workload registry plumbing.

Each :class:`WorkloadQuery` pairs a Spark implementation with the
equivalent ANSI SQL for the DuckDB oracle (or ``None`` for ops that
aren't SQL-expressible — the driver then records a rows-only check).

Column-name discipline: the driver's comparator sorts columns by name
before hashing values, so every computed column is aliased to the SAME
name in the Spark code and the oracle SQL. Aggregates over doubles are
rounded identically on both sides (summation order differs between
engines at the last bit).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class WorkloadQuery:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB, None → rows-only check
    description: str = ""
    bench: bool = True  # include in bench.py timing loop


_REGISTRY: dict[str, WorkloadQuery] = {}


def register(
    name: str,
    oracle: str | None,
    description: str = "",
    bench: bool = True,
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in _REGISTRY:
            raise ValueError(f"duplicate workload query: {name}")
        _REGISTRY[name] = WorkloadQuery(name, fn, oracle, description, bench)
        return fn

    return deco


def all_queries() -> dict[str, WorkloadQuery]:
    # import side-effect populates the registry
    import kaj_query_engine_spark.workload.core  # noqa: F401
    import kaj_query_engine_spark.workload.text  # noqa: F401
    import kaj_query_engine_spark.workload.dedup  # noqa: F401
    import kaj_query_engine_spark.workload.similarity  # noqa: F401
    import kaj_query_engine_spark.workload.temporal  # noqa: F401
    import kaj_query_engine_spark.workload.streaming  # noqa: F401
    import kaj_query_engine_spark.workload.sources  # noqa: F401
    import kaj_query_engine_spark.workload.multimodal  # noqa: F401
    import kaj_query_engine_spark.workload.scale  # noqa: F401
    import kaj_query_engine_spark.workload.pipeline  # noqa: F401
    import kaj_query_engine_spark.workload.maintenance  # noqa: F401

    return dict(_REGISTRY)


def queries_dict() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark for name, q in all_queries().items()}


def oracle_dict() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle}
