"""kaj_query_engine_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query surface and semantics of the
Sharptail/KAJ-Query-Engine reference (a single-threaded Volcano-model
SPJ engine, see /root/reference) on top of Apache Spark:

- the reference's SQL dialect is parsed by :mod:`.dialect` and lowered
  onto the DataFrame API, letting Catalyst/AQE replace the reference's
  randomized join-order optimizer and all hand-rolled physical
  operators (NestedJoin/BlockNestedJoin/SortMergeJoin/ExternalSort);
- LLM-data-pipeline extensions (deduplication, similarity search,
  text analysis, multimodal columns, streaming) live in
  :mod:`.operators`, :mod:`.functions` and :mod:`.streaming` —
  these have no counterpart in the reference and are designed
  partition-parallel for 100 TB scale.
"""

from kaj_query_engine_spark.engine import KajEngine
from kaj_query_engine_spark.session import get_spark
from kaj_query_engine_spark.sources.versioned import VersionedTable

__all__ = ["KajEngine", "VersionedTable", "get_spark"]
__version__ = "0.1.0"
