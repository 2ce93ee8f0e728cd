"""Source connectors.

The reference knows exactly one format: ``<table>.tbl`` files of
Java-serialized ``Tuple`` objects, loaded by a bespoke converter from
tab-separated text (``/root/reference/src/ConvertTxtToTbl.java:27-70``)
with the schema in a serialized ``<table>.md`` sidecar. Here the same
surface generalizes to Spark's datasource API — every format below is
splittable, predicate-pushdown-capable (parquet/orc), and reads in
parallel across executors:

- **parquet** (primary; columnar, pushdown, partition pruning)
- **csv / text** (the reference's tab-separated ``.txt`` input)
- **json** (line-delimited)
- **orc**

Schemas are explicit ``StructType``s where the format can't carry one
(csv/json inference is a full extra pass at 100 TB — never rely on it
in production paths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_FORMATS = ("parquet", "csv", "json", "orc")


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Read ``path`` as ``fmt`` with an optional explicit schema.

    CSV defaults to tab separator + header to mirror the reference's
    text tables (``ConvertTxtToTbl.java:46-67`` splits on ``\\t``).
    """
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format: {fmt} (one of {_FORMATS})")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        opts = {"sep": "\t", "header": "true", **options}
    else:
        opts = dict(options)
    return reader.format(fmt).options(**opts).load(path)


def convert_text_table(
    spark: SparkSession,
    txt_path: str,
    schema: StructType | str,
    out_path: str,
    sep: str = "\t",
) -> DataFrame:
    """The reference's load/ETL entry point, Spark-first: typed read of
    separator-delimited text and a parquet rewrite.

    Mirrors ``java ConvertTxtToTbl <table>`` — read ``<table>.txt``,
    cast each field by the schema, write the binary table file
    (``/root/reference/src/ConvertTxtToTbl.java:27-70``) — except the
    output is columnar, splittable, and written in parallel. Returns
    the re-read parquet DataFrame.
    """
    df = (
        spark.read.schema(schema)
        .format("csv")
        .options(sep=sep, header="false")
        .load(txt_path)
    )
    df.write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)
