"""Watermark semantics under MULTI-micro-batch execution.

The driver correctness gate runs every streaming query as ONE
``availableNow`` micro-batch, so watermarks there are provably
batch-equivalent but never *exercised*: no late row is ever dropped,
no state is ever evicted.  These tests close that gap: each writes a
stream directory of several parquet files with strictly increasing
modification times, streams them with ``maxFilesPerTrigger=1`` (one
micro-batch per file — ``availableNow`` honors source rate limits),
and asserts the two semantics that only exist across batches:

1. a row arriving after the watermark passed its window is DROPPED
   (``numRowsDroppedByWatermark`` > 0, and the window's aggregate
   excludes it), and
2. state-store rows are EVICTED once the watermark passes
   (``numRowsRemoved`` > 0 / final state smaller than peak).

Spark updates the watermark at micro-batch boundaries from the
previous batch's ``max(event_time)`` — and since Spark 3.4 keeps TWO
values: the *eviction* watermark (data through batch N-1) and the
*late-events* watermark (one batch older), so a row is only filtered
as late once the watermark that covers it has propagated an extra
batch.  The file stages below therefore insert a filler batch between
"watermark advances" and "late row arrives".
``spark.sql.streaming.noDataMicroBatches.enabled`` (default true) lets
a final empty batch flush closed windows under ``availableNow``.

The reference engine is batch-only (``/root/reference/src/qp/parser/
scaner.lex:37-163`` has no temporal constructs); this pins the
extension surface's claimed incremental semantics.
"""

from __future__ import annotations

import itertools
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from kaj_query_engine_spark.streaming import (
    stream_tumbling_agg,
    streaming_dedup,
)

_QN = itertools.count()

_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


@pytest.fixture(params=["hdfs", "rocksdb"])
def state_provider(request, spark):
    """Run every eviction scenario on BOTH state-store providers: the
    default HDFS-backed in-memory store and RocksDB (the deployable
    backend once state exceeds executor heap). Watermark eviction and
    late-row drop are provider-owned behaviors — ``numRowsRemoved``
    comes from the store's commit path — so provider parity here is a
    semantic claim, not a config detail."""
    key = "spark.sql.streaming.stateStore.providerClass"
    if request.param == "rocksdb":
        spark.conf.set(key, _ROCKSDB)
        try:
            yield request.param
        finally:
            spark.conf.unset(key)
    else:
        yield request.param


def _ts(s: str):
    """'10:01:30' -> pandas Timestamp on a fixed date (UTC wall clock)."""
    import pandas as pd

    return pd.Timestamp(f"2024-03-01 {s}")


def _write_stream_files(tmp_path, batches):
    """Write one parquet file per batch with strictly increasing mtimes
    so the file source (oldest-mtime-first) processes them in order."""
    stream_dir = tmp_path / "stream"
    stream_dir.mkdir(parents=True)
    base = 1_700_000_000
    for i, rows in enumerate(batches):
        path = stream_dir / f"batch_{i:03d}.parquet"
        tbl = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([_ts(r[1]) for r in rows], pa.timestamp("us")),
            }
        )
        pq.write_table(tbl, path)
        os.utime(path, (base + i * 60, base + i * 60))
    return str(stream_dir)


def _run_batched(spark, stream_dir, build, output_mode):
    """Stream the dir one file per micro-batch, availableNow; return
    (result rows, recentProgress list)."""
    sdf = (
        spark.readStream.schema("user_id LONG, ts TIMESTAMP")
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    name = f"kaj_evict_q{next(_QN)}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        q = (
            build(sdf)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        progress = list(q.recentProgress)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name).collect(), progress


def _state_metric(progress, key):
    """Sum a stateOperators metric across all micro-batches."""
    total = 0
    for p in progress:
        for op in p.get("stateOperators", []):
            total += op.get(key, 0) or 0
    return total


def _state_rows_series(progress):
    return [
        op.get("numRowsTotal", 0)
        for p in progress
        for op in p.get("stateOperators", [])
    ]


def test_window_agg_drops_late_row_and_evicts_state(spark, tmp_path, state_provider):
    """A row older than the watermark is dropped from its (already
    closed) window, and closed windows leave the state store."""
    stream_dir = _write_stream_files(
        tmp_path,
        [
            # batch 0: window [10:00,10:05) gets 3 rows; max ts 10:02
            [(1, "10:00:00"), (1, "10:01:00"), (1, "10:02:00")],
            # batch 1: advance max ts to 10:31 -> eviction wm becomes
            # 10:30 for batch 2
            [(2, "10:30:00"), (2, "10:31:00")],
            # batch 2 (filler): eviction wm 10:30 closes the 10:00
            # window (n=3) at end of batch; late-events wm for batch 3
            # becomes 10:30
            [(3, "10:32:00")],
            # batch 3: LATE row for the already-closed 10:00 window
            # (late-events wm is 10:30 now -> must be dropped), plus a
            # fresh 11:00 row pushing the wm past the 10:30 window too
            [(1, "10:01:30"), (3, "11:00:00")],
        ],
    )
    rows, progress = _run_batched(
        spark,
        stream_dir,
        lambda s: stream_tumbling_agg(
            s, "ts", "5 minutes", "1 minute", [F.count(F.lit(1)).alias("n")]
        ),
        output_mode="append",
    )
    by_window = {r["ws"].strftime("%H:%M"): r["n"] for r in rows}
    # the late 10:01:30 row must NOT be in the closed 10:00 window:
    # 3 on-time rows, not 4
    assert by_window["10:00"] == 3
    # the 10:30 window closed too (wm reached 10:59 after batch 3) and
    # holds 10:30, 10:31 and the 10:32 filler
    assert by_window["10:30"] == 3
    # the 11:00 window is still open in append mode -> not emitted
    assert "11:00" not in by_window
    # the drop was counted by the state operator, not silently lost
    assert _state_metric(progress, "numRowsDroppedByWatermark") >= 1
    # and state was actually evicted: rows were removed, and the final
    # state is smaller than the peak (only the open 11:00 window left)
    assert _state_metric(progress, "numRowsRemoved") >= 2
    series = _state_rows_series(progress)
    assert series and series[-1] < max(series)


def test_dedup_within_watermark_expires_state(spark, tmp_path, state_provider):
    """dropDuplicatesWithinWatermark dedups only within the horizon:
    a duplicate inside it is dropped, a re-arrival after state expiry
    passes through, and expired keys leave the state store."""
    stream_dir = _write_stream_files(
        tmp_path,
        [
            # batch 0: first sightings of A(=1) and B(=2)
            [(1, "10:00:00"), (2, "10:00:10")],
            # batch 1: A again 30s later (inside the 1-minute horizon
            # -> dup, dropped); C(=3) advances max ts to 10:10
            [(1, "10:00:30"), (3, "10:10:00")],
            # batch 2 (filler): eviction wm is now 10:09 > A's expiry
            # (10:00 + 1m) -> A and B leave the state store at end of
            # this batch
            [(5, "10:20:00")],
            # batch 3: A re-arrives long after expiry -> its state is
            # gone, so this must be EMITTED again; D(=4) advances wm
            [(1, "11:00:00"), (4, "11:30:00")],
        ],
    )
    rows, progress = _run_batched(
        spark,
        stream_dir,
        lambda s: streaming_dedup(s, ["user_id"], "ts", "1 minute"),
        output_mode="append",
    )
    per_key = {}
    for r in rows:
        per_key[r["user_id"]] = per_key.get(r["user_id"], 0) + 1
    # duplicate-within-horizon dropped; re-arrival-after-expiry kept
    assert per_key[1] == 2, f"expected A emitted twice, got {per_key}"
    assert per_key[2] == 1 and per_key[3] == 1 and per_key[4] == 1
    assert per_key[5] == 1
    # state entries for expired keys were evicted
    assert _state_metric(progress, "numRowsRemoved") >= 1
    series = _state_rows_series(progress)
    assert series and series[-1] < max(series)


def test_session_windows_close_and_evict(spark, tmp_path, state_provider):
    """Session windows (dynamic gap) leave the state store once the
    watermark passes their end+gap, and closed sessions emit exactly
    their member events."""
    from kaj_query_engine_spark.streaming import stream_session_stats

    stream_dir = _write_stream_files(
        tmp_path,
        [
            # batch 0: user 1 opens a session with 2 events 30s apart
            # (inside the 1-minute gap -> one session)
            [(1, "10:00:00"), (1, "10:00:30")],
            # batch 1: a NEW user-1 session 10 minutes later; advances
            # the eviction wm to 10:09 for batch 2
            [(1, "10:10:00")],
            # batch 2 (filler): eviction wm 10:09 > session-1 end+gap
            # (10:01:30) -> first session emits and leaves the store
            [(2, "10:20:00")],
            # batch 3: push the wm past the 10:10 session as well
            [(3, "11:00:00")],
        ],
    )
    rows, progress = _run_batched(
        spark,
        stream_dir,
        lambda s: stream_session_stats(s, "user_id", "ts", "1 minute", "1 minute"),
        output_mode="append",
    )
    emitted = sorted(
        (r["user_id"], r["session_start"].strftime("%H:%M:%S"), r["n_events"])
        for r in rows
    )
    # all sessions the final wm (10:59) passed are closed: both user-1
    # sessions and user-2's 10:20 one; only the 11:00 session is still
    # open -> withheld by append mode
    assert emitted == [
        (1, "10:00:00", 2),
        (1, "10:10:00", 1),
        (2, "10:20:00", 1),
    ]
    assert _state_metric(progress, "numRowsRemoved") >= 2
    series = _state_rows_series(progress)
    assert series and series[-1] < max(series)


def test_stream_stream_join_evicts_buffered_state(spark, tmp_path, state_provider):
    """A watermarked interval join buffers both sides in the state
    store only as long as watermark + join window require: matched
    pairs emit across micro-batches and old buffered rows are evicted
    once the watermark passes them."""
    from kaj_query_engine_spark.streaming import stream_interval_join

    l_dir = _write_stream_files(
        tmp_path / "left_root",
        [[(1, "10:00:00")], [(1, "10:30:00")], [(2, "11:00:00")]],
    )
    r_dir = _write_stream_files(
        tmp_path / "right_root",
        [[(1, "10:00:30")], [(1, "10:30:10")], [(2, "11:00:01")]],
    )

    def read_side(d):
        return (
            spark.readStream.schema("user_id LONG, ts TIMESTAMP")
            .option("maxFilesPerTrigger", "1")
            .parquet(d)
        )

    joined = stream_interval_join(
        read_side(l_dir), read_side(r_dir), "user_id", 60, "1 minute"
    )
    name = f"kaj_evict_q{next(_QN)}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        progress = list(q.recentProgress)
        rows = spark.table(name).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    # every staged pair is within (0, 60s] of its left row -> 3 matches
    pairs = sorted(
        (r["user_id"], r["l_ts"].strftime("%H:%M:%S")) for r in rows
    )
    assert pairs == [(1, "10:00:00"), (1, "10:30:00"), (2, "11:00:00")]
    # buffered rows from the 10:00 (and 10:30) batches left the state
    # store once the watermark passed their horizon
    assert _state_metric(progress, "numRowsRemoved") >= 2
    series = _state_rows_series(progress)
    assert series and series[-1] < max(series)


def test_multi_batch_totals_match_single_batch(spark, tmp_path, state_provider):
    """Regression guard: splitting input across micro-batches must not
    change a watermarked aggregation's on-time results (same rows in
    one file vs three), i.e. incremental execution is exactly batch
    semantics for data that is never late."""
    batches = [
        [(1, "10:00:00"), (2, "10:01:00")],
        [(1, "10:06:00"), (2, "10:07:30")],
        [(1, "10:12:00"), (3, "10:59:00")],
    ]
    split_dir = _write_stream_files(tmp_path, batches)
    rows_split, _ = _run_batched(
        spark,
        split_dir,
        lambda s: stream_tumbling_agg(
            s,
            "ts",
            "5 minutes",
            "1 minute",
            [F.count(F.lit(1)).alias("n"), F.sum("user_id").alias("s")],
        ),
        output_mode="append",
    )
    # batch equivalent, computed directly
    import pandas as pd

    pdf = pd.DataFrame(
        [(u, _ts(t)) for b in batches for (u, t) in b], columns=["user_id", "ts"]
    )
    bdf = spark.createDataFrame(pdf)
    expected = {
        (r["ws"], r["we"]): (r["n"], r["s"])
        for r in (
            bdf.groupBy(F.window("ts", "5 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"), F.sum("user_id").alias("s"))
            .select(
                F.col("w.start").alias("ws"), F.col("w.end").alias("we"), "n", "s"
            )
            .collect()
        )
    }
    got = {(r["ws"], r["we"]): (r["n"], r["s"]) for r in rows_split}
    # append mode withholds windows the watermark hasn't closed: every
    # emitted window must match batch exactly, and all closed windows
    # (end <= final wm 10:58) must have been emitted
    for k, v in got.items():
        assert expected[k] == v
    closed = {k for k in expected if k[1] <= _ts("10:58:00")}
    assert closed == set(got)
