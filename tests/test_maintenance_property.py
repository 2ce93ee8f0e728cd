"""Property-based differential fuzz for the MERGE trio: random
target/batch tables (overlapping keys, NULL values, delete markers)
run through merge_upsert / merge_change_feed / snapshot_diff on Spark
AND through a brute-force pure-Python reference implementing the
MERGE contract literally — plus the two composition laws (apply-feed,
diff-of-merge) on every generated case."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kaj_query_engine_spark.operators import maintenance as M

val = st.one_of(st.none(), st.sampled_from(["a", "b", "DEL"]))
table = st.lists(
    st.tuples(st.integers(0, 9), val, st.one_of(st.none(), st.integers(0, 3))),
    max_size=12,
)


def dedup_keys(rows):
    # MERGE requires unique keys per side (real tables have a PK)
    seen, out = set(), []
    for k, v, n in rows:
        if k not in seen:
            seen.add(k)
            out.append((k, v, None if n is None else float(n)))
    return out


def ref_merge(target, source):
    """Brute-force MERGE contract: dict ops, no cleverness."""
    t = {k: (v, n) for k, v, n in target}
    snap = dict(t)
    feed = {}
    for k, v, n in source:
        delete = v == "DEL"
        if delete:
            if k in snap:
                del snap[k]
                feed[k] = ("D", v, n)
            continue  # delete of absent key: no-op
        if k not in t:
            snap[k] = (v, n)
            feed[k] = ("I", v, n)
        elif t[k] == (v, n):
            snap[k] = (v, n)  # bit-identical no-op: replaced, no feed row
        else:
            snap[k] = (v, n)
            feed[k] = ("U", v, n)
    return snap, feed


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(target=table, source=table)
def test_merge_trio_matches_reference(spark, target, source):
    target, source = dedup_keys(target), dedup_keys(source)
    tdf = spark.createDataFrame(target, "k long, v string, n double")
    sdf = spark.createDataFrame(source, "k long, v string, n double")
    delete = F.col("v") == "DEL"

    snap_ref, feed_ref = ref_merge(target, source)

    snap = M.merge_upsert(tdf, sdf, ["k"], delete_condition=delete)
    assert {r.k: (r.v, r.n) for r in snap.collect()} == snap_ref

    feed = M.merge_change_feed(tdf, sdf, ["k"], delete_condition=delete)
    assert {r.k: (r.op, r.v, r.n) for r in feed.collect()} == feed_ref

    # law 1: diff(target, snapshot) carries the same ops as the feed
    # (post-image on I/U; D rows exist for the same keys)
    diff = M.snapshot_diff(tdf, snap, ["k"])
    dmap = {r.k: r.op for r in diff.collect()}
    assert dmap == {k: op for k, (op, _, _) in feed_ref.items()}

    # law 2: applying the feed to the target reproduces the snapshot
    dels = feed.filter(F.col("op").isin("D", "U")).select("k")
    ups = feed.filter(F.col("op").isin("I", "U")).select("k", "v", "n")
    applied = tdf.join(dels, "k", "left_anti").unionByName(ups)
    assert M.snapshot_diff(applied, snap, ["k"]).count() == 0


# ---- SCD2 property fuzz ---------------------------------------------

from datetime import datetime, timedelta  # noqa: E402

T0 = datetime(2024, 1, 1)
BASE_US = 1_704_067_200_000_000

def _vkey(t):
    # total order even with NULL state/valid_to (None < str comparisons
    # raise when earlier tuple elements tie — zero-width same-ts versions)
    k, vf, state, vt, cur = t
    return (k, vf, state is not None, state or "", vt is not None, vt or 0, cur)


hist = st.lists(
    st.tuples(
        st.integers(0, 3),             # key
        st.integers(0, 40),            # ts seconds (collisions allowed)
        st.one_of(st.none(), st.sampled_from(["x", "y"])),  # state
    ),
    max_size=18,
)


def ref_scd2(rows):
    """Brute-force reference: per key, sort by (ts, id), collapse
    consecutive same-state runs, chain validity."""
    out = {}
    per_key: dict = {}
    for i, (k, s, state) in enumerate(rows):
        per_key.setdefault(k, []).append((s, i, state))
    for k, evs in per_key.items():
        evs.sort()
        versions = []
        prev = object()
        for s, _i, state in evs:
            if state != prev:
                versions.append([state, BASE_US + s * 1_000_000, None])
                prev = state
        for a, b in zip(versions, versions[1:]):
            a[2] = b[1]
        out[k] = [
            (state, vf, vt, vt is None) for state, vf, vt in versions
        ]
    # MULTISET, not a dict: two versions of a key can share valid_from
    # (a zero-width version superseded at the same timestamp), and a
    # (k, vf)-keyed dict would silently drop one on both sides
    return sorted(
        (
            (k, vf, state, vt, cur)
            for k, vs in out.items()
            for state, vf, vt, cur in vs
        ),
        key=_vkey,
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=hist, cut=st.integers(5, 35))
def test_scd2_build_and_incremental_match_reference(spark, rows, cut):
    df = spark.createDataFrame(
        [(i, k, T0 + timedelta(seconds=s), state) for i, (k, s, state) in enumerate(rows)],
        "id long, k long, ts timestamp, st string",
    )
    want = ref_scd2(rows)
    full = M.scd2_from_events(df, "k", "ts", "st", tiebreak="id")
    got = sorted(
        (
            (r.k, r.valid_from_us, r.state, r.valid_to_us, r.is_current)
            for r in full.collect()
        ),
        key=_vkey,
    )
    assert got == want
    # incremental: any global-time split is append-only per key, so
    # merge(dim(before), batch(after)) must equal the full rebuild
    dim = M.scd2_from_events(
        df.filter(F.col("ts") < T0 + timedelta(seconds=cut)),
        "k", "ts", "st", tiebreak="id",
    )
    merged = M.scd2_merge_batch(
        dim,
        df.filter(F.col("ts") >= T0 + timedelta(seconds=cut)),
        "k", "ts", "st", tiebreak="id",
    )
    got_inc = sorted(
        (
            (r.k, r.valid_from_us, r.state, r.valid_to_us, r.is_current)
            for r in merged.collect()
        ),
        key=_vkey,
    )
    assert got_inc == want
