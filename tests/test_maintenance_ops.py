"""Unit tests for operators/maintenance.py — the MERGE contract's
arm-by-arm semantics, the no-op suppression rules, the
apply-feed-reproduces-snapshot law, and SCD2 boundary cases that the
sf-fixture oracle diff can't isolate (leading NULL state, equal
timestamps, single-event keys)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from kaj_query_engine_spark.operators import maintenance as M

SCHEMA = "k long, v string, n double"


@pytest.fixture()
def tables(spark):
    def make(rows, schema=SCHEMA):
        return spark.createDataFrame(rows, schema)

    return make


TARGET = [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0), (4, None, 4.0)]
# 1: bit-identical no-op update; 2: real update; 3: matched delete;
# 5: insert; 6: unmatched delete (no-op); 7: insert flagged DEL (skip)
SOURCE = [
    (1, "a", 1.0),
    (2, "B", 2.0),
    (3, "DEL", 3.0),
    (5, "e", 5.0),
    (6, "DEL", 6.0),
    (7, "DEL", 7.0),
]
def DEL():
    return F.col("v") == "DEL"


def test_merge_upsert_arms(tables):
    out = M.merge_upsert(
        tables(TARGET), tables(SOURCE), ["k"], delete_condition=DEL()
    )
    rows = {r.k: (r.v, r.n) for r in out.collect()}
    assert rows == {
        1: ("a", 1.0),  # matched, identical → source (same bits)
        2: ("B", 2.0),  # matched → source row wins
        4: (None, 4.0),  # target-only → kept (NULL value col intact)
        5: ("e", 5.0),  # source-only → inserted
        # 3 deleted; 6 and 7 never inserted (delete predicate holds)
    }
    assert out.columns == ["k", "v", "n"]  # original column order


def test_change_feed_ops_and_noop_suppression(tables):
    out = M.merge_change_feed(
        tables(TARGET), tables(SOURCE), ["k"], delete_condition=DEL()
    )
    rows = {r.k: (r.op, r.v) for r in out.collect()}
    # k=1 (bit-identical update) and k=6/7 (deletes of absent keys)
    # must NOT appear; D carries the batch row
    assert rows == {2: ("U", "B"), 3: ("D", "DEL"), 5: ("I", "e")}


def test_schema_evolution_merge_semantics(tables):
    """Delta mergeSchema + updateAll contract: source-new column
    appended (NULL for untouched target rows), batch-dropped column
    target-kept on matched rows and NULL on inserts; the change feed
    judges no-ops on the EFFECTIVE row."""
    # batch drops n, gains c; k=1 changes nothing effective (same v,
    # NULL c), k=2 updates v, k=5 inserts with a channel
    evolved = tables(
        [(1, "a", None), (2, "B", "web"), (5, "e", "app")],
        schema="k long, v string, c string",
    )
    out = M.merge_upsert(
        tables(TARGET), evolved, ["k"], schema_evolution=True
    )
    assert out.columns == ["k", "v", "n", "c"]  # evolved order
    rows = {r.k: (r.v, r.n, r.c) for r in out.collect()}
    assert rows == {
        1: ("a", 1.0, None),  # n target-kept, c from batch (NULL)
        2: ("B", 2.0, "web"),  # n target-kept through the update
        3: ("c", 3.0, None),  # untouched: new column NULL
        4: (None, 4.0, None),
        5: ("e", None, "app"),  # insert: dropped column NULL
    }
    feed = M.merge_change_feed(
        tables(TARGET), evolved, ["k"], schema_evolution=True
    )
    frows = {r.k: (r.op, r.v, r.n, r.c) for r in feed.collect()}
    # k=1 suppressed: effective row (v='a', n kept 1.0, c NULL) == target
    assert frows == {
        2: ("U", "B", 2.0, "web"),
        5: ("I", "e", None, "app"),
    }
    # no drift → evolution is a no-op: equals the plain merge
    plain = M.merge_upsert(tables(TARGET), tables(SOURCE), ["k"],
                           delete_condition=DEL())
    evo = M.merge_upsert(tables(TARGET), tables(SOURCE), ["k"],
                         delete_condition=DEL(), schema_evolution=True)
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, evo.collect())
    )
    # keys must exist on both sides even under evolution
    with pytest.raises(ValueError, match="keys absent"):
        M.merge_upsert(
            tables(TARGET),
            tables([("x",)], schema="v string"),
            ["k"],
            schema_evolution=True,
        )


def test_schema_evolution_rejects_type_drift(tables):
    """A shared column whose TYPE changed is not evolution — it must
    fail with a clear error at evolve time, not as an opaque struct
    mismatch inside the packed merge arms."""
    drifted = tables(
        [(1, 7, 1.0)], schema="k long, v int, n double"  # v: string→int
    )
    with pytest.raises(ValueError, match="type drift.*v.*string.*int"):
        M.merge_upsert(tables(TARGET), drifted, ["k"], schema_evolution=True)


def test_null_safe_noop_detection(tables):
    # NULL == NULL must count as "unchanged" (eqNullSafe), so a batch
    # row re-stating a NULL-valued target row is suppressed
    out = M.merge_change_feed(
        tables(TARGET), tables([(4, None, 4.0)]), ["k"]
    )
    assert out.count() == 0
    # ... while NULL -> value is a real update
    out = M.merge_change_feed(tables(TARGET), tables([(4, "x", 4.0)]), ["k"])
    assert [(r.op, r.k) for r in out.collect()] == [("U", 4)]


def test_incremental_join_view_delta_rule(spark):
    """IVM law: maintaining the join view across APPEND batches equals
    recomputing it, the overlap term is not double-counted, and empty
    deltas are no-ops."""
    L = spark.createDataFrame(
        [(1, "l1"), (2, "l2")], "k long, lv string"
    )
    R = spark.createDataFrame(
        [(1, "r1"), (3, "r3")], "k long, rv string"
    )
    dL = spark.createDataFrame([(3, "l3"), (4, "l4")], "k long, lv string")
    dR = spark.createDataFrame([(2, "r2"), (4, "r4")], "k long, rv string")
    v0 = L.join(R, on=["k"])
    v1, dv = M.incremental_join_view(v0, L, dL, R, dR, ["k"])
    full = L.unionByName(dL).join(R.unionByName(dR), on=["k"])
    canon = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert canon(v1) == canon(full)
    # the dL x dR overlap (k=4) appears exactly once
    assert canon(dv) == [(2, "l2", "r2"), (3, "l3", "r3"), (4, "l4", "r4")]
    # empty deltas: view unchanged, delta empty
    empty = spark.createDataFrame([], "k long, lv string")
    empty_r = spark.createDataFrame([], "k long, rv string")
    v2, dv2 = M.incremental_join_view(v1, L.unionByName(dL), empty,
                                      R.unionByName(dR), empty_r, ["k"])
    assert canon(v2) == canon(full) and dv2.count() == 0
    # second append batch folds: maintain(maintain(v)) == recompute
    dL2 = spark.createDataFrame([(5, "l5")], "k long, lv string")
    dR2 = spark.createDataFrame([(5, "r5"), (1, "r1b")], "k long, rv string")
    v3, _ = M.incremental_join_view(
        v1, L.unionByName(dL), dL2, R.unionByName(dR), dR2, ["k"]
    )
    full3 = (
        L.unionByName(dL).unionByName(dL2)
        .join(R.unionByName(dR).unionByName(dR2), on=["k"])
    )
    assert canon(v3) == canon(full3)


def test_incremental_join_view_keyed_updates_deletes(spark):
    """Keyed IVM law: maintaining the view under updates + deletes +
    inserts on BOTH sides equals recomputing it from the post-change
    sides; idempotent upserts and deletes of absent keys are no-ops;
    the signed delta nets to the recompute difference."""
    # left keyed by lk (non-unique join col k), right keyed by rk
    L = spark.createDataFrame(
        [(10, 1, "l1"), (11, 1, "l1b"), (12, 2, "l2"), (13, 3, "l3")],
        "lk long, k long, lv string",
    )
    R = spark.createDataFrame(
        [(20, 1, "r1"), (21, 2, "r2"), (22, 3, "r3"), (23, 3, "r3b")],
        "rk long, k long, rv string",
    )
    v0 = L.join(R, on=["k"]).select("k", "lk", "lv", "rk", "rv")
    # left: update lk=10's value, delete lk=12, insert lk=14 (k=2),
    # restate lk=13 unchanged (must be a no-op)
    l_ups = spark.createDataFrame(
        [(10, 1, "L1*"), (14, 2, "l4"), (13, 3, "l3")],
        "lk long, k long, lv string",
    )
    l_del = spark.createDataFrame([(12,), (999,)], "lk long")  # 999 absent
    # right: update rk=22, delete rk=20, insert rk=24 (k=1)
    r_ups = spark.createDataFrame(
        [(22, 3, "R3*"), (24, 1, "r4")], "rk long, k long, rv string"
    )
    r_del = spark.createDataFrame([(20,)], "rk long")
    v1, dv = M.incremental_join_view_keyed(
        v0, L, R, ["k"], ["lk"], ["rk"],
        left_upserts=l_ups, left_deletes=l_del,
        right_upserts=r_ups, right_deletes=r_del,
    )
    L2 = spark.createDataFrame(
        [(10, 1, "L1*"), (11, 1, "l1b"), (13, 3, "l3"), (14, 2, "l4")],
        "lk long, k long, lv string",
    )
    R2 = spark.createDataFrame(
        [(21, 2, "r2"), (22, 3, "R3*"), (23, 3, "r3b"), (24, 1, "r4")],
        "rk long, k long, rv string",
    )
    full = L2.join(R2, on=["k"]).select("k", "lk", "lv", "rk", "rv")
    canon = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert canon(v1) == canon(full)
    # signed delta: applying it to v0 as a bag reproduces v1
    plus = dv.filter(F.col("m") > 0).drop("m")
    minus = dv.filter(F.col("m") < 0).drop("m")
    assert canon(v0.exceptAll(minus).unionByName(plus)) == canon(full)
    # the no-op restatement (lk=13) produced no delta rows
    assert dv.filter(F.col("lk") == 13).filter(
        ~F.col("rk").isin(20, 22)
    ).count() == 0
    # all-empty changes: view unchanged, delta empty
    v2, dv2 = M.incremental_join_view_keyed(
        v1, L2, R2, ["k"], ["lk"], ["rk"]
    )
    assert canon(v2) == canon(full) and dv2.count() == 0


def test_apply_feed_reproduces_snapshot(spark):
    """The law that makes the feed trustworthy: target + feed == snapshot.
    Run on the real orders fixture with the q55 derivation so it holds
    on data with every arm populated, not just the toy rows."""
    from tests.conftest import SF_DIR
    from kaj_query_engine_spark.workload.core import t

    o = t(spark, SF_DIR, "orders")
    key = F.col("o_orderkey")
    target = o.filter(key % 10 < 8)
    source = o.filter(key % 3 == 0).withColumn(
        "o_totalprice",
        F.when(key % 2 == 0, F.col("o_totalprice") + F.lit(1000.0)).otherwise(
            F.col("o_totalprice")
        ),
    )
    delete = F.col("o_orderstatus") == "F"
    snap = M.merge_upsert(target, source, ["o_orderkey"], delete_condition=delete)
    feed = M.merge_change_feed(
        target, source, ["o_orderkey"], delete_condition=delete
    )
    # apply: drop D/U keys from target, then add back I/U post-images
    dels = feed.filter(F.col("op").isin("D", "U")).select("o_orderkey")
    upserts = feed.filter(F.col("op").isin("I", "U")).drop("op")
    applied = (
        target.join(dels, "o_orderkey", "left_anti")
        .unionByName(upserts.select(*target.columns))
    )
    assert M.snapshot_diff(applied, snap, ["o_orderkey"]).count() == 0
    # and the diff of target vs snapshot carries exactly the feed's
    # change count (same I/U/D rows, pre-image on D)
    d = M.snapshot_diff(target, snap, ["o_orderkey"])
    assert (
        d.groupBy("op").count().orderBy("op").collect()
        == feed.groupBy("op").count().orderBy("op").collect()
    )


def test_schema_mismatch_raises(tables, spark):
    other = spark.createDataFrame([(1, "a")], "k long, v string")
    with pytest.raises(ValueError, match="identical column sets"):
        M.merge_upsert(tables(TARGET), other, ["k"])
    with pytest.raises(ValueError, match="keys absent"):
        M.merge_upsert(tables(TARGET), tables(TARGET), ["nope"])


def test_snapshot_diff_directions(tables):
    old = tables([(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)])
    new = tables([(2, "b", 2.0), (3, "C", 3.0), (9, "i", 9.0)])
    rows = {r.k: (r.op, r.v) for r in M.snapshot_diff(old, new, ["k"]).collect()}
    # 2 unchanged → absent; D carries pre-image, I/U the post-image
    assert rows == {1: ("D", "a"), 3: ("U", "C"), 9: ("I", "i")}


BASE = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in epoch micros


def t_(s: float) -> datetime:
    return datetime(2024, 1, 1, 0, 0, int(s))


def us(s: float) -> int:
    return BASE + int(s) * 1_000_000


@pytest.fixture()
def history(spark):
    def make(rows):
        return spark.createDataFrame(
            rows, "id long, k long, ts timestamp, st string"
        )

    return make


def scd2(df):
    return M.scd2_from_events(df, "k", "ts", "st", tiebreak="id")


def test_scd2_collapses_runs_and_chains_validity(history):
    out = scd2(
        history(
            [
                (1, 1, t_(0), "x"),
                (2, 1, t_(10), "x"),  # same state → collapsed
                (3, 1, t_(20), "y"),
                (4, 1, t_(30), "x"),  # back to x → NEW version
            ]
        )
    ).orderBy("valid_from_us").collect()
    assert [(r.state, r.valid_from_us, r.valid_to_us, r.is_current) for r in out] == [
        ("x", us(0), us(20), False),
        ("y", us(20), us(30), False),
        ("x", us(30), None, True),
    ]


def test_scd2_leading_null_state_and_single_event(history):
    out = scd2(
        history([(1, 1, t_(0), None), (2, 1, t_(5), None), (3, 1, t_(9), "a"),
                 (4, 2, t_(0), "solo")])
    )
    rows = sorted(
        ((r.k, r.state, r.valid_from_us, r.is_current) for r in out.collect()),
        key=lambda r: (r[0], r[2]),
    )
    # the leading NULL run must open a version (row_number guard), the
    # second NULL collapses into it; single-event key → one open version
    assert rows == [
        (1, None, us(0), False),
        (1, "a", us(9), True),
        (2, "solo", us(0), True),
    ]


def test_scd2_equal_ts_tiebreak_deterministic(history):
    # two events at the SAME timestamp: event-id order decides which
    # state the version chain passes through
    out = scd2(
        history([(1, 1, t_(0), "a"), (2, 1, t_(0), "b"), (3, 1, t_(7), "b")])
    ).orderBy("valid_from_us", "state").collect()
    assert [(r.state, r.valid_from_us, r.valid_to_us) for r in out] == [
        ("a", us(0), us(0)),  # zero-width version: superseded at same ts
        ("b", us(0), None),
    ]


def scd2_merge(dim, batch):
    return M.scd2_merge_batch(dim, batch, "k", "ts", "st", tiebreak="id")


def test_scd2_incremental_equals_rebuild(history):
    full = [
        (1, 1, t_(0), "x"), (2, 1, t_(10), "x"), (3, 1, t_(20), "y"),
        (4, 2, t_(5), "a"),
        # batch half: state change, re-statement (collapses), new key
        (5, 1, t_(30), "x"), (6, 2, t_(35), "a"), (7, 3, t_(40), "n"),
    ]
    dim = scd2(history([r for r in full if r[0] <= 4]))
    batch = history([r for r in full if r[0] > 4])
    merged = scd2_merge(dim, batch)
    rebuilt = scd2(history(full))
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )
    # untouched key 2's open version must survive a batch that merely
    # re-states its state; key 3 appears with one open version
    rows = {(r.k, r.state): r.is_current for r in merged.collect()}
    assert rows[(2, "a")] and rows[(3, "n")]


def test_scd2_incremental_redelivery_idempotent(history):
    dim = scd2(history([(1, 1, t_(0), "x"), (2, 1, t_(10), "y")]))
    batch = history([(3, 1, t_(20), "z")])
    once = scd2_merge(dim, batch)
    twice = scd2_merge(once, batch)  # re-delivered at-least-once
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )


def test_merge_agg_state_absent_side_and_word_boundary(spark):
    state = spark.createDataFrame(
        [(1, 2, 10.0, -5.0, 5.0), (2, 1, 1.0, 1.0, 1.0)],
        "k long, n long, s double, mn double, mx double",
    )
    batch = spark.createDataFrame(
        [(1, 3, 6.0, -9.0, 2.0), (3, 1, 7.0, 7.0, 7.0)],
        "k long, n long, s double, mn double, mx double",
    )
    out = {
        r.k: (r.n, r.s, r.mn, r.mx)
        for r in M.merge_agg_state(
            state, batch, ["k"],
            {"n": "a + b", "s": "a + b", "mn": "least(a, b)",
             "mx": "greatest(a, b)"},
        ).collect()
    }
    assert out == {
        1: (5, 16.0, -9.0, 5.0),  # merged: add/add/least/greatest
        2: (1, 1.0, 1.0, 1.0),    # state-only: verbatim, NOT zero-merged
        3: (1, 7.0, 7.0, 7.0),    # batch-only: verbatim (min intact —
        # a fake-zero coalesce would have broken mn for positive keys)
    }


def test_partitioned_merge_null_and_unsafe_partition_values(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, 1, "a")], "k long, p long, v string"
    ).write.partitionBy("p").parquet(path)
    null_batch = spark.createDataFrame(
        [(2, None, "b")], "k long, p long, v string"
    )
    with pytest.raises(ValueError, match="NULL partition"):
        M.merge_into_partitioned(path, null_batch, ["k"], "p")
    path2 = str(tmp_path / "t2")
    spark.createDataFrame(
        [(1, "x y", "a")], "k long, p string, v string"
    ).write.partitionBy("p").parquet(path2)
    unsafe = spark.createDataFrame(
        [(2, "x y", "b")], "k long, p string, v string"
    )
    with pytest.raises(ValueError, match="path "):
        M.merge_into_partitioned(path2, unsafe, ["k"], "p")


def test_scd2_merge_batch_string_tiebreak(spark):
    hist = spark.createDataFrame(
        [("e1", 1, t_(0), "x"), ("e2", 1, t_(10), "y")],
        "eid string, k long, ts timestamp, st string",
    )
    dim = M.scd2_from_events(hist, "k", "ts", "st", tiebreak="eid")
    batch = spark.createDataFrame(
        [("e3", 1, t_(20), "z")], "eid string, k long, ts timestamp, st string"
    )
    merged = M.scd2_merge_batch(dim, batch, "k", "ts", "st", tiebreak="eid")
    full = M.scd2_from_events(
        spark.createDataFrame(
            [("e1", 1, t_(0), "x"), ("e2", 1, t_(10), "y"),
             ("e3", 1, t_(20), "z")],
            "eid string, k long, ts timestamp, st string",
        ),
        "k", "ts", "st", tiebreak="eid",
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_merge_agg_state_column_named_b(spark):
    # the one-pass regex fix: a state column literally named 'b' must
    # not have its qualified form re-substituted
    state = spark.createDataFrame([(1, 10)], "k long, b long")
    batch = spark.createDataFrame([(1, 5)], "k long, b long")
    out = M.merge_agg_state(state, batch, ["k"], {"b": "a + b"}).collect()
    assert [(r.k, r.b) for r in out] == [(1, 15)]


def test_hll_state_merge_equals_one_shot_sketch(spark):
    # the sketch-merge law behind q88: union of per-half sketch states
    # estimates the SAME value as one sketch over all rows (HLL union
    # is lossless for lgK-matched sketches)
    rows = [(i % 7, i % 50) for i in range(400)]
    df = spark.createDataFrame(rows, "g long, u long")

    def st(d):
        return d.groupBy("g").agg(F.hll_sketch_agg("u", F.lit(14)).alias("hll"))

    merged = M.merge_agg_state(
        st(df.filter("u < 25")), st(df.filter("u >= 25")), ["g"],
        {"hll": "hll_union(a, b)"},
    ).select("g", F.hll_sketch_estimate("hll").alias("est"))
    one_shot = st(df).select("g", F.hll_sketch_estimate("hll").alias("est"))
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, one_shot.collect())
    )
