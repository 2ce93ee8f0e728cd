"""Physical table layout: partitioning and bucketing.

The reference has no physical layout story at all — one serialized
file per table (``/root/reference/src/ConvertTxtToTbl.java:68-70``).
At 100 TB, layout IS the optimization:

- **Hive-style partitioning** (``partitionBy``): directory-per-value;
  a filter on the partition column becomes *partition pruning* — the
  scan never opens non-matching files (`PartitionFilters` in the
  plan, vs `PushedFilters` which still reads row groups).
- **Bucketing** (``bucketBy``): rows pre-hashed into N buckets on the
  join/agg key at write time. Two tables bucketed the same way join
  with NO exchange on either side — the shuffle was paid once at
  write, amortized over every subsequent join. This is Spark's answer
  to the reference engine's repeated full-table rescans per join
  (``NestedJoin.java:187-263``).

Bucketed tables must live in the session catalog (`saveAsTable`) —
bucket metadata has nowhere to go in a bare parquet directory.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Write parquet Hive-partitioned by ``partition_cols``.

    Partition columns should be low-cardinality (each value is a
    directory); high-cardinality keys belong in bucketing instead.
    """
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Save ``df`` as a bucketed (and optionally per-bucket sorted)
    catalog table. Sorted buckets let a sort-merge join skip its sort.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a prior session's managed-table directory may survive the
    # (in-memory) catalog; saveAsTable refuses to reuse the location
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    leftover = Path(warehouse.removeprefix("file:")) / table.lower()
    if leftover.exists():
        shutil.rmtree(leftover)
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, bucket_col)
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned dataset (partition columns come back as real
    columns, recovered from directory names)."""
    return spark.read.parquet(path)
