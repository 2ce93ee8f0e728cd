"""Training-shard export: the sink side of a pretraining data
pipeline — size-capped parquet shards plus a manifest the training
job's data loader reads instead of listing 10^6 files.

No counterpart in the reference engine (its only sink is the TSV
result writer, ``/root/reference/src/QueryMain.java:276-306``); this
is north-star extension surface, shaped for the 100 TB case:

- shard sizing is declarative (``maxRecordsPerFile``) — the cap is
  enforced by Spark's write path per task, so no global coordination
  or driver-side planning touches the row count;
- the manifest is computed from ONE read-back over the written files
  grouped by ``input_file_name()`` — an O(output) scan that
  parallelizes like any other, not a driver loop over file listings;
- shard assignment is ``hash(key) % n`` when a key is given (stable
  across re-runs for the same key set — a re-exported corpus lands
  rows in the same shard), else round-robin over the configured
  partition count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_training_shards(
    df: DataFrame,
    path: str,
    max_records_per_file: int,
    shard_key: str | None = None,
    n_shards: int | None = None,
    token_col: str | None = None,
) -> DataFrame:
    """Write ``df`` as size-capped parquet shards under ``path`` and a
    manifest under ``path + "/_manifest"``; returns the manifest
    DataFrame (file, n_rows[, n_tokens]) with one row per data file.

    ``shard_key`` routes rows to shards by hash (co-locating a key's
    rows in one shard — e.g. all chunks of a document); without it the
    input partitioning is kept. ``token_col`` adds a per-file token
    sum to the manifest — the number a training scheduler actually
    budgets by.
    """
    out = df
    if shard_key is not None:
        n = n_shards or df.sparkSession.sparkContext.defaultParallelism
        out = df.repartition(n, F.col(shard_key))
    elif n_shards is not None:
        # keyless round-robin: honor the requested shard count rather
        # than silently keeping the input partitioning
        out = df.repartition(n_shards)
    (
        out.write.option("maxRecordsPerFile", max_records_per_file)
        .mode("overwrite")
        .parquet(path)
    )
    manifest = read_manifest_source(df.sparkSession, path, token_col)
    manifest.coalesce(1).write.mode("overwrite").parquet(f"{path}/_manifest")
    return read_manifest(df.sparkSession, path)


def read_manifest_source(
    spark: SparkSession, path: str, token_col: str | None = None
) -> DataFrame:
    """Manifest from the written shards themselves: one read-back
    grouped by file. (Underscore-prefixed dirs are invisible to
    parquet readers, so the manifest can live inside ``path``.)"""
    back = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if token_col is not None:
        aggs.append(F.sum(token_col).alias("n_tokens"))
    return (
        back.groupBy(
            F.element_at(F.split(F.input_file_name(), "/"), -1).alias("file")
        )
        .agg(*aggs)
        .orderBy("file")
    )


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(f"{path}/_manifest")
