"""Checkpoint-restart recovery and the RocksDB state-store provider —
the two production semantics of stateful streaming that neither the
single-micro-batch driver gate nor the eviction suite touches:

1. a stopped query restarted from its checkpointLocation RESUMES its
   state (per-key totals carry across process runs — the entire point
   of checkpointing on a real cluster), and
2. the same operator runs unchanged on the RocksDB provider (the
   deployable backend once state exceeds executor heap; the default
   HDFS-backed provider keeps state in memory).

``foreachBatch`` is the sink here because the memory sink refuses
checkpoint recovery ("This query does not support recovering from
checkpoint location").
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from kaj_query_engine_spark.streaming import stream_stateful_user_totals

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _add_file(stream_dir, i, rows):
    path = f"{stream_dir}/b{i:03d}.parquet"
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "value": pa.array([float(r[1]) for r in rows], pa.float64()),
                "ts": pa.array(
                    [pd.Timestamp("2024-03-01 10:00:00")] * len(rows),
                    pa.timestamp("us"),
                ),
            }
        ),
        path,
    )
    os.utime(path, (1_700_000_000 + i * 60,) * 2)


def _run_totals(spark, stream_dir, checkpoint_dir):
    """One availableNow run of the stateful totals against whatever
    files are currently pending; returns the update-mode emissions."""
    got = []
    sdf = spark.readStream.schema("user_id LONG, value DOUBLE, ts TIMESTAMP").parquet(
        str(stream_dir)
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        q = (
            stream_stateful_user_totals(sdf)
            .writeStream.foreachBatch(lambda df, bid: got.extend(df.collect()))
            .outputMode("update")
            .option("checkpointLocation", str(checkpoint_dir))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return got


def test_restart_from_checkpoint_resumes_state(spark, tmp_path):
    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    ck = tmp_path / "ckpt"
    _add_file(stream_dir, 0, [(1, 1.5), (1, 2.5), (2, 10.0)])
    r1 = {r.user_id: (r.n_events, r.sum_v) for r in _run_totals(spark, stream_dir, ck)}
    assert r1 == {1: (2, 4.0), 2: (1, 10.0)}
    # second PROCESS run against the same checkpoint: only the new file
    # is read (offsets recovered), and user 1's totals CONTINUE from
    # the persisted state (3 events, 10.0), not restart at (1, 6.0)
    _add_file(stream_dir, 1, [(1, 6.0), (3, 1.0)])
    r2 = {r.user_id: (r.n_events, r.sum_v) for r in _run_totals(spark, stream_dir, ck)}
    assert r2 == {1: (3, 10.0), 3: (1, 1.0)}


def test_stateful_totals_on_rocksdb_provider(spark, tmp_path):
    """Identical results on the RocksDB state store — the provider is
    a config swap, not an operator rewrite."""
    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    _add_file(stream_dir, 0, [(1, 1.5), (1, 2.5), (2, 10.0)])
    _add_file(stream_dir, 1, [(1, 6.0), (3, 1.0)])
    key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key, ROCKSDB)
    try:
        got = _run_totals(spark, stream_dir, tmp_path / "ckpt_rocks")
    finally:
        spark.conf.unset(key)
    final = {r.user_id: (r.n_events, r.sum_v) for r in got}
    assert final == {1: (3, 10.0), 2: (1, 10.0), 3: (1, 1.0)}
