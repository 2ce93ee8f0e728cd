"""Plan-quality gates as tests: the physical-plan properties that
predict 100 TB behavior must hold on every change (the full set runs
via tools/explain_audit.py; this is the cheap always-on subset that
needs no scratch writes)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from kaj_query_engine_spark.workload import all_queries
from tests.conftest import SF_DIR

CASES = {
    "q00_flagship_revenue": (
        ["BroadcastHashJoin", "EqualTo(c_mktsegment,BUILDING)", "partial_"],
        ["SortMergeJoin", "CartesianProduct"],
    ),
    # DISTINCT legitimately shuffles; the gate is that both filters are
    # pushed to the scan and the shuffle is hash (no range sort before
    # the driver-side ORDER BY is collapsed into it).
    "q02_select_distinct_orderby": (
        ["PushedFilters: [IsNotNull(c_mktsegment), IsNotNull(c_acctbal), "
         "EqualTo(c_mktsegment,BUILDING)", "HashAggregate"],
        ["CartesianProduct"],
    ),
    "q23_limit_topk": (["TakeOrderedAndProject"], ["Exchange rangepartitioning"]),
    "q73_asof_join": (
        ["Window", "Union"],
        ["SortMergeJoin", "CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    "q74_range_join": ([], ["CartesianProduct", "BroadcastNestedLoopJoin"]),
    "q10_theta_join": (["BroadcastNestedLoopJoin"], ["CartesianProduct"]),
    # banded-LSH near-dup: map-side bucketing + one hash shuffle into
    # the in-bucket kernel — no join of any kind before the kernel
    "q62_embedding_neardup": (
        ["FlatMapGroupsInPandas", "Generate"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"],
    ),
    # training mix: map-side hash sample filter + ONE hash exchange on
    # shard into per-shard window sorts
    "q47_training_mix": (
        ["Window", "hashpartitioning(shard"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin",
         "rangepartitioning("],
    ),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_plan_properties(spark, name):
    need, forbid = CASES[name]
    df = all_queries()[name].spark(spark, SF_DIR)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    for s in need:
        assert s in plan, f"{name}: plan lost property {s!r}\n{plan}"
    for s in forbid:
        assert s not in plan, f"{name}: plan regressed to {s!r}\n{plan}"
