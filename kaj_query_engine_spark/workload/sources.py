"""Source/sink workload — format connectors proven by round-trip:
write a fixture table out in the format under test, read it back with
an explicit schema, aggregate, and let the DuckDB oracle check the
aggregate against the original parquet. A format that mangles values
or types cannot pass.

The reference's only format is its ``.tbl`` serialization with the
tab-separated ``.txt`` + ``ConvertTxtToTbl`` loader
(``/root/reference/src/ConvertTxtToTbl.java:27-70``) and a
tab-separated result sink (``src/QueryMain.java:276-306``) — q34
mirrors that exact pipeline shape on Spark connectors.

Scratch files go under ``<repo>/.scratch/<sf>/`` (gitignored), keyed
by scale factor so correctness (sf0.01) and bench (sf0.1) runs don't
collide.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from kaj_query_engine_spark.sources import (
    convert_text_table,
    read_table,
    write_result_tsv,
)
from kaj_query_engine_spark.workload.core import t
from kaj_query_engine_spark.workload.registry import register

_SCRATCH = Path(__file__).resolve().parent.parent.parent / ".scratch"


def _scratch(sf_dir: str, name: str) -> str:
    tag = Path(sf_dir).name
    return str(_SCRATCH / tag / name)


@register(
    "q32_format_roundtrips",
    "SELECT 'csv' AS fmt, n_regionkey AS k, count(*) AS n, "
    "min(n_name) AS v FROM nation GROUP BY n_regionkey "
    "UNION ALL "
    "SELECT 'json', r_regionkey, count(*), min(r_name) "
    "FROM region GROUP BY r_regionkey "
    "UNION ALL "
    "SELECT 'orc', s_nationkey, count(*), min(s_name) "
    "FROM supplier GROUP BY s_nationkey",
    "format-connector round-trips in one tagged result: nation → "
    "tab-separated CSV, region → line-delimited JSON, supplier → ORC — "
    "each written out, re-read with an explicit schema (no inference "
    "pass), and aggregated; the oracle checks the aggregates against "
    "the original parquet, so a format that mangles values or types "
    "cannot pass",
)
def q32(spark, sf_dir):
    n = t(spark, sf_dir, "nation")
    csv_path = _scratch(sf_dir, "nation_csv")
    n.write.mode("overwrite").options(sep="\t", header="true").csv(csv_path)
    csv_back = (
        read_table(spark, csv_path, "csv", schema=n.schema)
        .groupBy(F.col("n_regionkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n"), F.min("n_name").alias("v"))
        .select(F.lit("csv").alias("fmt"), "k", "n", "v")
    )

    r = t(spark, sf_dir, "region")
    json_path = _scratch(sf_dir, "region_json")
    r.write.mode("overwrite").json(json_path)
    json_back = (
        read_table(spark, json_path, "json", schema=r.schema)
        .groupBy(F.col("r_regionkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n"), F.min("r_name").alias("v"))
        .select(F.lit("json").alias("fmt"), "k", "n", "v")
    )

    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    orc_path = _scratch(sf_dir, "supplier_orc")
    s.write.mode("overwrite").orc(orc_path)
    orc_back = (
        read_table(spark, orc_path, "orc")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n"), F.min("s_name").alias("v"))
        .select(F.lit("orc").alias("fmt"), "k", "n", "v")
    )
    return csv_back.unionByName(json_back).unionByName(orc_back)


@register(
    "q34_text_etl_sink",
    "SELECT c_mktsegment, count(*) AS n, "
    "CAST(sum(c_nationkey) AS BIGINT) AS nk_sum "
    "FROM customer GROUP BY c_mktsegment",
    "the reference's full ETL pipeline on Spark connectors: customer → "
    "headerless TSV text → ConvertTxtToTbl-analog typed load → parquet "
    "→ aggregate → tab-separated result sink → re-read of the sink "
    "(ConvertTxtToTbl.java:27-70; QueryMain.java:276-306)",
)
def q34(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
    )
    txt = _scratch(sf_dir, "customer_txt")
    c.write.mode("overwrite").options(sep="\t", header="false").csv(txt)
    loaded = convert_text_table(
        spark,
        txt,
        "c_custkey long, c_name string, c_nationkey long, c_mktsegment string",
        _scratch(sf_dir, "customer_tbl"),
    )
    agg = loaded.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c_nationkey").alias("nk_sum"),
    )
    sink = _scratch(sf_dir, "q34_result")
    write_result_tsv(agg, sink, single_file=True)
    return read_table(
        spark, sink, "csv", schema="c_mktsegment string, n long, nk_sum long"
    )
