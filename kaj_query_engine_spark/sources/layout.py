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


def warehouse_table_dir(spark: SparkSession, table: str) -> Path:
    """Filesystem directory of a managed catalog table — the ONE place
    this resolution lives; cache-staleness guards that stamp markers
    into the table dir must agree byte-for-byte with the directory
    ``write_bucketed`` cleans."""
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    return Path(warehouse.removeprefix("file:")) / table.lower()


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
    leftover = warehouse_table_dir(spark, table)
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


def zorder_value(df: DataFrame, cols: list[str], bits: int = 16):
    """Z-order (Morton) key over ``cols``: each column is rank-
    normalized to ``bits`` bits via ``ntile`` (so skew can't collapse
    the curve), then the bit strings are interleaved. Pure JVM
    shift/or expressions — codegen, no UDF."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    n = len(cols)
    ranks = [
        (F.ntile(1 << bits).over(Window.orderBy(c)) - 1).cast("long")
        for c in cols
    ]
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, r in enumerate(ranks):
            bit = F.shiftright(r, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 8,
    bits: int = 16,
) -> None:
    """Write parquet clustered on the Z-order curve of ``cols``: range
    partition + sort by the Morton key, so each output file covers a
    compact hyper-rectangle of the key space and parquet min/max
    footer stats prune files for predicates on ANY of the clustered
    columns (single-column sorting only prunes its own column).

    The ``ntile`` rank normalization is a one-pass global sort per
    column at write time — layout cost is paid once, every later scan
    benefits (same economics as bucketing). At cluster scale swap
    ``ntile`` for ``approxQuantile``-derived fixed bin edges to avoid
    the single-partition window.
    """
    zed = df.withColumn("_z", zorder_value(df, cols, bits))
    (
        zed.repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
