"""Training-shard export: cap enforcement, manifest totals, shard-key
routing stability."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaj_query_engine_spark.sources.export import (
    read_manifest,
    write_training_shards,
)


def test_shards_capped_and_manifest_totals(spark, tmp_path):
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7 + 1).alias("n_tok"),
    )
    path = str(tmp_path / "shards")
    manifest = write_training_shards(
        df, path, max_records_per_file=100, shard_key="doc_id",
        n_shards=4, token_col="n_tok",
    )
    rows = manifest.collect()
    assert all(r.n_rows <= 100 for r in rows)
    assert sum(r.n_rows for r in rows) == 1000
    expect_tokens = df.agg(F.sum("n_tok")).collect()[0][0]
    assert sum(r.n_tokens for r in rows) == expect_tokens
    # the persisted manifest equals the returned one
    again = {r.file: (r.n_rows, r.n_tokens) for r in read_manifest(spark, path).collect()}
    assert again == {r.file: (r.n_rows, r.n_tokens) for r in rows}
    # data read-back skips the manifest dir and round-trips
    assert spark.read.parquet(path).count() == 1000


def test_shard_key_routing_is_stable(spark, tmp_path):
    df = spark.range(200).select(F.col("id").alias("doc_id"), F.lit("x").alias("t"))
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(df, p1, 1000, shard_key="doc_id", n_shards=4)
    write_training_shards(df, p2, 1000, shard_key="doc_id", n_shards=4)

    def shard_of(path):
        return {
            r.doc_id: r.f.split("part-")[1][:5]
            for r in spark.read.parquet(path)
            .select("doc_id", F.input_file_name().alias("f"))
            .collect()
        }

    # same key set -> same shard index per key across re-exports
    assert shard_of(p1) == shard_of(p2)
