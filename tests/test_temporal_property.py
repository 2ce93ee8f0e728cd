"""Property-based tests for temporal operators: randomized inputs
checked against brute-force O(n²) Python references — the operators'
shuffle-minimal implementations must agree with the obvious spec."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kaj_query_engine_spark.operators import temporal as T

T0 = datetime(2024, 1, 1)


def ts(seconds: int) -> datetime:
    return T0 + timedelta(seconds=seconds)


events_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 500)),
    min_size=1,
    max_size=25,
    unique=True,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=events_strategy, gap=st.integers(1, 120))
def test_sessionize_matches_reference(spark, rows, gap):
    df = spark.createDataFrame(
        [(u, ts(s)) for u, s in rows], "user_id long, ts timestamp"
    )
    got = {
        (r.user_id, r.ts): r.session_id
        for r in T.sessionize(df, "user_id", "ts", gap).collect()
    }
    # reference: per user, sort by ts, new session when diff > gap
    by_user: dict[int, list[int]] = {}
    for u, s in rows:
        by_user.setdefault(u, []).append(s)
    for u, times in by_user.items():
        sid = 0
        prev = None
        for s in sorted(times):
            if prev is None or s - prev > gap:
                sid += 1
            prev = s
            assert got[(u, ts(s))] == sid, (u, s, gap)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=events_strategy, right=events_strategy)
def test_asof_join_matches_reference(spark, left, right):
    ldf = spark.createDataFrame(
        [(u, ts(s)) for u, s in left], "user_id long, ts timestamp"
    )
    rdf = spark.createDataFrame(
        [(u, ts(s), float(s)) for u, s in right],
        "user_id long, ts timestamp, value double",
    )
    out = T.asof_join(ldf, rdf, "user_id", "ts", "ts", ["value"])
    got = {(r.user_id, r.ts): r.asof_value for r in out.collect()}
    assert len(got) == len(left)  # every left row survives (left join)
    for u, s in left:
        candidates = [rs for ru, rs in right if ru == u and rs <= s]
        want = float(max(candidates)) if candidates else None
        assert got[(u, ts(s))] == want, (u, s)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=events_strategy,
    right=events_strategy,
    lo=st.integers(0, 50),
    width=st.integers(1, 200),
)
def test_range_join_matches_reference(spark, left, right, lo, width):
    up = lo + width
    ldf = spark.createDataFrame(
        [(u, ts(s)) for u, s in left], "user_id long, ts timestamp"
    )
    rdf = spark.createDataFrame(
        [(u, ts(s)) for u, s in right], "user_id long, ts timestamp"
    )
    out = T.range_join(ldf, rdf, "user_id", "ts", "ts", lo, up)
    got = {(r.user_id, r.ts, r.r_ts) for r in out.collect()}
    want = {
        (u, ts(s), ts(rs))
        for u, s in left
        for ru, rs in right
        if ru == u and s + lo < rs <= s + up
    }
    assert got == want

# ---- funnel property fuzz -------------------------------------------

funnel_events = st.lists(
    st.tuples(
        st.integers(0, 2),      # user
        st.integers(0, 60),     # ts seconds (collisions allowed)
        st.sampled_from(["a", "b", "c", "x"]),
    ),
    max_size=20,
)


def ref_funnel(rows, steps, within_us=None):
    """Brute-force greedy reference: per user, scan events sorted by
    (ts, id); match the next step on the earliest event strictly
    after the previous match (and within the first-touch window)."""
    out = {}
    per_user: dict = {}
    for i, (u, s, et) in enumerate(rows):
        per_user.setdefault(u, []).append((s * 1_000_000, i, et))
    for u, evs in per_user.items():
        evs.sort()
        matched = []
        prev = -1
        for us_, _i, et in evs:
            if len(matched) >= len(steps):
                break
            if et != steps[len(matched)] or us_ <= prev:
                continue
            if within_us is not None and matched and us_ > matched[0] + within_us:
                continue
            matched.append(us_)
            prev = us_
        out[u] = (
            len(matched),
            tuple(matched + [None] * (len(steps) - len(matched))),
        )
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=funnel_events,
    steps=st.sampled_from([["a", "b"], ["a", "b", "a"], ["b", "a", "c"]]),
    window=st.one_of(st.none(), st.integers(1, 40)),
)
def test_funnel_matches_reference(spark, rows, steps, window):
    if not rows:
        return
    df = spark.createDataFrame(
        [(i, u, ts(s), et) for i, (u, s, et) in enumerate(rows)],
        "id long, user_id long, ts timestamp, et string",
    )
    within_us = window * 1_000_000 if window is not None else None
    out = T.funnel(
        df, "user_id", "ts", "et", steps, tiebreak="id", within=within_us
    ).collect()
    base = 1_704_067_200_000_000  # session epoch offset for 2024-01-01
    got = {
        r.user_id: (
            r.stage,
            tuple(
                (getattr(r, f"step{i + 1}_us") - base)
                if getattr(r, f"step{i + 1}_us") is not None
                else None
                for i in range(len(steps))
            ),
        )
        for r in out
    }
    assert got == ref_funnel(rows, steps, within_us)
