"""Engine facade: the analog of the reference's ``QueryMain`` driver
(``/root/reference/src/QueryMain.java:26-41``) minus everything Spark
already does (buffer management, optimization, execution).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession

from kaj_query_engine_spark.catalog import Catalog, load_fixture_catalog
from kaj_query_engine_spark.dialect.lowering import lower
from kaj_query_engine_spark.dialect.parser import parse
from kaj_query_engine_spark.plans.pprint import pprint_query


class KajEngine:
    """Parse + lower the reference dialect over a table catalog.

    >>> eng = KajEngine(spark)
    >>> eng.register("customer", df)
    >>> eng.sql('SELECT customer.c_custkey FROM customer '
    ...         'WHERE customer.c_mktsegment = "BUILDING"')
    """

    def __init__(self, spark: SparkSession, strict_compat: bool = False):
        self.spark = spark
        self.catalog = Catalog(spark)
        self.strict_compat = strict_compat
        self._stats_cache: dict[str, object] = {}

    def register(self, name: str, df: DataFrame) -> None:
        self.catalog.register(name, df)

    def load_fixtures(self, sf_dir: str) -> None:
        fixture_cat = load_fixture_catalog(self.spark, sf_dir)
        for name in fixture_cat.names():
            self.catalog.register(name, fixture_cat.table(name))

    def sql(self, query_text: str) -> DataFrame:
        """Dialect SQL → DataFrame (lazy; caller acts on it)."""
        return lower(parse(query_text), self.catalog, self.strict_compat)

    def explain_plan(self, query_text: str) -> str:
        """Logical-plan pretty-print in the spirit of the reference's
        ``Debug.PPrint`` (``src/qp/operators/Debug.java:79-121``)."""
        return pprint_query(parse(query_text))

    def explain_cost(self, query_text: str, join_type: str = "broadcast") -> str:
        """Declared plan + estimated cost, mirroring the reference's
        ``printFinalPlan`` + ``PlanCost`` (``src/QueryMain.java:142-180``,
        ``src/qp/optimizer/PlanCost.java``). Table stats come from a
        one-pass ``approx_count_distinct`` scan, cached per table (the
        ``.stat``-file analog)."""
        from kaj_query_engine_spark.plans.cost import collect_stats, explain_cost

        q = parse(query_text)
        for t in q.from_list:
            tl = t.lower()
            if tl not in self._stats_cache:
                self._stats_cache[tl] = collect_stats(self.catalog.table(tl))
        return explain_cost(q, self._stats_cache, join_type)

    def execute_to_file(
        self, query_text: str, out_path: str, small_result: bool = False
    ) -> float:
        """Run a query and write a tab-separated result (header line,
        ``-NULL-`` for nulls) like the reference's sink
        (``src/QueryMain.java:186-306``). Returns wall seconds.

        Default path is the DISTRIBUTED writer: executors write part
        files under ``out_path`` (a directory, one header per part)
        and the result never lands on the driver — the only shape that
        survives a 100 TB result. ``small_result=True`` is the literal
        QueryMain analog: collect to the driver and write ONE local
        file at ``out_path``. Use it only when the result is
        known-tiny (an aggregate row, a top-k). Both paths emit the
        same cell dialect — bare ``str(value)`` with ``-NULL-`` for
        nulls, no CSV quoting (``raw=True`` on the distributed side).
        """
        from kaj_query_engine_spark.sources.sink import write_result_tsv

        start = time.time()
        df = self.sql(query_text)
        if small_result:
            rows = df.collect()
            os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
            with open(out_path, "w") as fh:
                fh.write("\t".join(df.columns) + "\n")
                for row in rows:
                    fh.write("\t".join(_fmt(v) for v in row) + "\n")
        else:
            write_result_tsv(df, out_path, null_value="-NULL-", raw=True)
        return time.time() - start


def _fmt(value: object) -> str:
    if value is None:
        return "-NULL-"  # mirrors QueryMain.java:299-300
    return str(value)
