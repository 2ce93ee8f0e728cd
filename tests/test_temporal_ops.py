"""Unit tests for operators/temporal.py — boundary semantics that the
sf-fixture oracle diff can't isolate (exact gap ties, band edges,
as-of ties, rollup consistency)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from kaj_query_engine_spark.operators import temporal as T

T0 = datetime(2024, 1, 1, 0, 0, 0)


def ts(seconds: float) -> datetime:
    return T0 + timedelta(seconds=seconds)


@pytest.fixture()
def events(spark):
    def make(rows):
        return spark.createDataFrame(rows, "user_id long, ts timestamp, value double")

    return make


def test_sessionize_gap_boundary_inclusive(spark, events):
    # diff == gap stays in the session (new session only when diff > gap)
    df = events(
        [
            (1, ts(0), 1.0),
            (1, ts(60), 1.0),  # diff = gap → same session
            (1, ts(121), 1.0),  # diff = 61 > gap → new session
        ]
    )
    out = T.sessionize(df, "user_id", "ts", 60).orderBy("ts").collect()
    assert [r.session_id for r in out] == [1, 1, 2]


def test_sessionize_per_key_isolation(spark, events):
    df = events([(1, ts(0), 1.0), (2, ts(1), 1.0), (1, ts(7200), 1.0)])
    out = T.sessionize(df, "user_id", "ts", 60).collect()
    by_user = {(r.user_id, r.ts): r.session_id for r in out}
    assert by_user[(2, ts(1))] == 1  # other user's events don't interfere
    assert by_user[(1, ts(7200))] == 2


def test_session_stats_duration(spark, events):
    df = events([(1, ts(0), 2.0), (1, ts(30), 3.0)])
    row = T.session_stats(df, "user_id", "ts", 60).collect()[0]
    assert row.n_events == 2
    assert row.duration_s == 30
    assert row.session_start == ts(0) and row.session_end == ts(30)


def test_asof_join_takes_latest_at_or_before(spark, events):
    left = events([(1, ts(100), 0.0)])
    right = events([(1, ts(50), 1.0), (1, ts(100), 2.0), (1, ts(101), 3.0)])
    out = T.asof_join(left, right, "user_id", "ts", "ts", ["value"]).collect()
    # right row exactly AT the left timestamp wins (<= semantics)
    assert out[0].asof_value == 2.0


def test_asof_join_no_match_null_vs_inner(spark, events):
    left = events([(1, ts(10), 0.0)])
    right = events([(1, ts(20), 1.0)])  # only AFTER the left row
    outer = T.asof_join(left, right, "user_id", "ts", "ts", ["value"])
    assert outer.collect()[0].asof_value is None
    inner = T.asof_join(left, right, "user_id", "ts", "ts", ["value"], how="inner")
    assert inner.count() == 0


def test_asof_join_null_payload_on_match(spark, events):
    # the MATCHED right row carries a NULL payload: inner must keep the
    # row, and the NULL must not be replaced by an older row's value
    left = events([(1, ts(100), 0.0)])
    right = events([(1, ts(50), 7.0), (1, ts(90), None)])
    out = T.asof_join(left, right, "user_id", "ts", "ts", ["value"], how="inner")
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0].asof_value is None  # not 7.0


def test_asof_join_respects_keys(spark, events):
    left = events([(1, ts(100), 0.0)])
    right = events([(2, ts(50), 9.0)])  # different user
    assert (
        T.asof_join(left, right, "user_id", "ts", "ts", ["value"])
        .collect()[0]
        .asof_value
        is None
    )


def test_range_join_band_edges(spark, events):
    left = events([(1, ts(0), 0.0)])
    right = events(
        [
            (1, ts(0), 1.0),  # lower edge: excluded (strict >)
            (1, ts(1), 2.0),  # inside
            (1, ts(600), 3.0),  # upper edge: included (<=)
            (1, ts(601), 4.0),  # outside
        ]
    )
    out = T.range_join(left, right, "user_id", "ts", "ts", 0, 600)
    got = sorted(r.r_value for r in out.collect())
    assert got == [2.0, 3.0]


def test_range_join_crosses_bucket_boundary(spark, events):
    # left ts near the end of a bucket: its band spans two buckets — the
    # explode must cover both or matches are silently lost
    left = events([(1, ts(599), 0.0)])
    right = events([(1, ts(1150), 1.0)])  # 551s later, inside (0, 600]
    out = T.range_join(left, right, "user_id", "ts", "ts", 0, 600)
    assert out.count() == 1


def test_time_rollup_levels_consistent(spark, events):
    df = events(
        [(1, ts(i * 37), float(i)) for i in range(200)]  # spans > 2 hours
    )
    out = T.time_rollup(df, "ts", "value").collect()
    by_level = {}
    for r in out:
        by_level.setdefault(r.level, []).append(r)
    # every level accounts for every row and the same total
    for lvl in ("minute", "hour", "day"):
        assert sum(r.n for r in by_level[lvl]) == 200
        assert abs(sum(r.sum_v for r in by_level[lvl]) - sum(range(200))) < 0.5


def test_tumbling_vs_sliding_row_multiplicity(spark, events):
    df = events([(1, ts(i * 60), 1.0) for i in range(120)])  # 2 hours
    tumble = T.tumbling_window_agg(df, "ts", "1 hour", [F.count("*").alias("n")])
    slide = T.sliding_window_agg(
        df, "ts", "1 hour", "30 minutes", [F.count("*").alias("n")]
    )
    # sliding with slide = duration/2 counts every event twice
    assert sum(r.n for r in slide.collect()) == 2 * sum(
        r.n for r in tumble.collect()
    )
