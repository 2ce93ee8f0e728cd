"""Plan-quality audit: prints the formatted physical plan for headline
queries and asserts the plan properties that matter at 100 TB —
filters pushed to the scan, columns pruned, small sides broadcast, no
nested-loop joins where a hash/sort-merge join belongs, top-k not
sorting the world.

Usage: python tools/explain_audit.py [sf_dir] [query_filter]
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from kaj_query_engine_spark.session import get_spark
from kaj_query_engine_spark.workload import all_queries

# query -> (must_contain, must_not_contain) substrings of the formatted plan
CHECKS: dict[str, tuple[list[str], list[str]]] = {
    "q00_flagship_revenue": (
        ["BroadcastHashJoin", "EqualTo(c_mktsegment,BUILDING)", "partial_"],
        ["SortMergeJoin", "CartesianProduct"],
    ),
    "q02_select_distinct_orderby": (
        # dialect-built filters reach the parquet scan; scan reads only
        # the referenced columns; DISTINCT is a hash aggregate (its
        # Exchange is legitimate), not a sort-based dedup
        ["PushedFilters: [IsNotNull(c_mktsegment), IsNotNull(c_acctbal), "
         "EqualTo(c_mktsegment,BUILDING)",
         "ReadSchema: struct<c_custkey:bigint,c_acctbal:double,c_mktsegment:string>",
         "HashAggregate"],
        ["CartesianProduct", "SortAggregate"],
    ),
    "q07_join4": (
        # dialect 4-way join: range filter pushed to the part scan, all
        # joins hash joins with the filtered/small sides broadcast
        ["PushedFilters: [IsNotNull(p_retailprice), GreaterThan(p_retailprice,950.0)",
         "BroadcastHashJoin"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    "q11_groupby_having": (
        # two-phase aggregate: map-side partial before the exchange
        ["HashAggregate", "Exchange", "partial_"],
        ["SortAggregate"],
    ),
    "q23_limit_topk": (
        ["TakeOrderedAndProject"],
        ["Sort ", "Exchange rangepartitioning"],
    ),
    "q50_dedup_exact": (
        ["HashAggregate", "partial_"],
        [],
    ),
    "q61_ann_lsh": (
        ["BroadcastHashJoin"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    "q63_ann_ivf": (
        # IVF served from the materialized cid-partitioned index:
        # probe sets broadcast (the index never shuffles to meet
        # them), and dynamic partition pruning turns the probe join
        # into PartitionFilters on the index scan — only the probed
        # lists' directories are read
        ["BroadcastHashJoin", "dynamicpruningexpression"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    "q33_table_time_travel": (
        # three aggregate arms over manifest-file scans, each with a
        # map-side partial; the version change feed is ONE full-outer
        # join (full outer cannot broadcast — SMJ is the correct
        # shape, not a smell here)
        ["Union", "HashAggregate", "SortMergeJoin FullOuter"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    "q18_shortest_paths": (
        # like q71: the iterative relaxation ran eagerly through
        # localCheckpoint; the returned plan is the bucket histogram
        # over the checkpointed distance table
        ["Scan ExistingRDD", "HashAggregate"],
        ["CartesianProduct", "SortAggregate", "BroadcastNestedLoopJoin"],
    ),
    "q71_bfs_reach": (
        # the iterative BFS ran eagerly through localCheckpoint; the
        # returned plan is the per-hop aggregate over the checkpointed
        # visited set — two-phase hash aggregate, nothing quadratic
        ["Scan ExistingRDD", "HashAggregate"],
        ["CartesianProduct", "SortAggregate", "BroadcastNestedLoopJoin"],
    ),
    "q73_asof_join": (
        # union trick: exactly ONE exchange (the window shuffle)
        ["Window", "Union"],
        ["SortMergeJoin", "CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    "q74_range_join": (
        # band join must plan as an equi-join on (key, bucket)
        ["Join", "Exchange"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    "q35_partition_pruning": (
        # branch A: layout filter prunes directories, not just row
        # groups; branch B: both Z-order-clustered columns reach the
        # scan as pushed range predicates (file skipping via footer
        # min/max over the Morton-compact files)
        [
            "PartitionFilters: [event_type",
            # pin the PREDICATE reaching the scan, not the literal's
            # rendering (Spark-version-dependent formatting)
            "GreaterThanOrEqual(user_id,",
            "GreaterThanOrEqual(value,",
        ],
        [],
    ),
    "q36_bucketed_join": (
        # co-located bucketed join: SMJ with no shuffle on either side
        ["SortMergeJoin", "Bucketed: true"],
        ["Exchange hashpartitioning"],
    ),
    "q10_theta_join": (
        # genuinely non-equi: nested-loop is the right plan, but the
        # small side must be broadcast
        ["BroadcastNestedLoopJoin"],
        ["CartesianProduct"],
    ),
    "q62_embedding_neardup": (
        # banded-LSH candidates: bucketing is map-only, candidates meet
        # the numpy kernel through ONE hash shuffle — never a self-join
        ["FlatMapGroupsInPandas", "Generate"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"],
    ),
    "q48_decontaminate": (
        # benchmark shingles broadcast; corpus side explodes map-only
        # and aggregates with a partial phase — no corpus self-join
        ["BroadcastHashJoin", "Generate", "partial_"],
        ["CartesianProduct", "SortMergeJoin", "BroadcastNestedLoopJoin"],
    ),
    "q47_training_mix": (
        # sampling is a map-side hash filter (no shuffle); packing is
        # ONE hash exchange on shard into per-shard window sorts — no
        # join, no global range sort
        ["Window", "hashpartitioning(shard"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin",
         "rangepartitioning("],
    ),
    "q37_salted_agg": (
        # two-stage salted aggregation: both stages are hash
        # aggregates with map-side partials; no join, no global sort
        ["HashAggregate", "partial_"],
        ["CartesianProduct", "SortMergeJoin", "BroadcastNestedLoopJoin",
         "rangepartitioning("],
    ),
    "q45_sketch_aggregates": (
        # sketch pass stays a single partial-aggregated scan pipeline —
        # the r3 restructure keeps the N-distinct Expand out of the plan
        ["HashAggregate", "partial_"],
        ["Expand", "CartesianProduct"],
    ),
    "q52_ngram_jaccard": (
        # both branches equi-join shaped: the inverted-index bucket
        # explode (Generate) + partial aggregates; the pipeline
        # branch's per-candidate verify joins are hash/merge equi
        # joins — never a cartesian or nested-loop pair blowup
        ["Generate", "HashAggregate", "partial_", "Union"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    "q51_minhash_lsh": (
        # minhash bands bucket via explode + groupBy (map-only until
        # the band-bucket exchange); pair generation never self-joins.
        # The incr branch probes the materialized band index with the
        # batch's keys BROADCAST (batch-bounded side), so the corpus
        # index scan is map-only — an SMJ anywhere would mean a
        # corpus-sized sort/shuffle snuck in
        ["Generate", "HashAggregate", "BroadcastHashJoin", "Union"],
        ["CartesianProduct", "SortMergeJoin", "BroadcastNestedLoopJoin"],
    ),
    "q72_sessionize": (
        # sessionization: per-user windows over ONE hash exchange —
        # never a global range sort
        ["Window", "hashpartitioning("],
        ["CartesianProduct", "rangepartitioning("],
    ),
    "q75_time_rollup": (
        # time-bucket rollup aggregates with a map-side partial phase
        ["HashAggregate", "partial_"],
        ["CartesianProduct", "SortMergeJoin"],
    ),
    "q49_doc_chunks": (
        # sliding-window chunking is pure JVM explode+slice — the plan
        # must carry ZERO exchanges of any kind (its parallelism is the
        # scan's) and no Python stage
        ["Generate", "codegen id :"],
        ["Exchange", "Join", "MapInPandas", "BatchEvalPython"],
    ),
    "q21_html_extract": (
        # HTML wrap + regex extraction is pure JVM string work in one
        # whole-stage-codegen projection: zero exchanges, zero joins,
        # no Python stage — the scan's parallelism is the query's
        ["codegen id :"],
        ["Exchange", "Join", "MapInPandas", "BatchEvalPython", "Generate"],
    ),
    "q93_codec_decode": (
        # the merged real-codec family (ex q93/94/95/97/98/99): every
        # branch is the same shape — ONE deliberate hash exchange (the
        # small-input/large-compute spread before the pure-stdlib
        # encoder, same as q40), then mapInPandas generate → decode →
        # digest projection — and the branches meet in a Union. No
        # joins (a join would mean a generator started shuffling the
        # corpus to reattach columns) and no sorts anywhere.
        ["MapInPandas", "Union", "hashpartitioning("],
        ["Join", "CartesianProduct", "rangepartitioning("],
    ),
    "q90_media_pipeline": (
        # merged media trio (ex q90/q92/q96): 'frames' is a join-free
        # JVM explode + binary substring, 'features' one mapInPandas
        # pass, 'stream' a pre-materialized availableNow result
        # (LocalTableScan) — unioned; nothing may join or range-sort
        ["Union", "MapInPandas"],
        ["CartesianProduct", "rangepartitioning("],
    ),
    "q55_merge_upsert": (
        # MERGE + CDC + diff: every branch is a full-outer EQUI join
        # on the key (SMJ — full outer is not broadcastable, and at
        # real scale the target side is bucketed, making its exchange
        # vanish; see sources/layout.py). A nested-loop or cartesian
        # here would mean the key equi-condition fell out of the join
        ["SortMergeJoin FullOuter", "Union"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    "q66_merge_evolve": (
        # schema evolution must not change the join shape: still ONE
        # full-outer equi SMJ per branch — the NULL-padding and
        # per-column effective-row picks are pure projections
        ["SortMergeJoin FullOuter", "Union"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    "q68_span_dedup": (
        # positional grams through ONE corpus-wide window on the gram
        # (the duplicate test) + the per-doc island sort — window
        # machinery, no joins at all
        ["Window", "Generate"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"],
    ),
    "q91_kmeans_int": (
        # round-14 shape: the nearest-centroid argmin is MAP-SIDE
        # (transform + array_min over the k×dim array-literal centroid
        # table — no join at all; the former BroadcastNestedLoopJoin
        # fan-out was an exchange pair per iteration), the c_sum
        # attach is a broadcast hash join, and the per-cluster agg is
        # two-phase; ANY join machinery in the assignment path is the
        # failure mode now
        ["BroadcastHashJoin", "HashAggregate", "partial_"],
        ["CartesianProduct", "SortMergeJoin",
         "BroadcastNestedLoopJoin"],
    ),
    "q69_span_decontaminate": (
        # benchmark membership must be a BROADCAST semi-join (the
        # corpus side stays map-only, no corpus-wide gram shuffle —
        # q68's within-corpus window must NOT be the mechanism here);
        # the island merge is the only per-doc sort
        ["BroadcastHashJoin", "LeftSemi", "Window", "Generate"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"],
    ),
    "q67_incremental_join": (
        # IVM delta rule: both delta terms join a small delta against
        # a stored side — the planner must broadcast the deltas; the
        # full L-x-R recompute must NOT appear (no third join shape)
        ["BroadcastHashJoin", "Union"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    "q88_incremental_distinct": (
        # sketch states build as partial-able ObjectHashAggregates,
        # merge through ONE full-outer join, and the exact-distinct
        # verifier rides the single-distinct rewrite (no Expand)
        ["ObjectHashAggregate", "SortMergeJoin FullOuter",
         "BroadcastHashJoin"],
        ["Expand", "CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    "q40_text_stats": (
        # one-scan per-doc profile + the round-14 CCNet LM columns:
        # the deliberate spread exchange (small-input/large-compute),
        # pure-JVM lambda folds (no Python stage), and the
        # data-relative perplexity cut as a 1-row bounded broadcast
        # (the established 1-row-agg BNLJ shape). Never a range sort,
        # never a corpus-sized join
        ["hashpartitioning(doc_id", "BroadcastNestedLoopJoin"],
        ["SortMergeJoin", "rangepartitioning(", "CartesianProduct",
         "MapInPandas", "BatchEvalPython"],
    ),
    "q43_temperature_mix": (
        # temperature branch: budget computation is a 1-row bounded
        # broadcast (the BNLJ cross there is the established 1-row-agg
        # shape) reaching the rank windows through a broadcast hash
        # join. dsir branch (round 14): scoring is a pure-JVM per-row
        # fold against the literal ratio table (no Python stage
        # anywhere), the selection a TakeOrderedAndProject (top-k,
        # never a global range sort), and the k-row selection
        # broadcasts back onto the corpus for lang. Branches meet in
        # a Union.
        ["Window", "hashpartitioning(lang", "BroadcastHashJoin",
         "TakeOrderedAndProject", "Union"],
        ["SortMergeJoin", "rangepartitioning(", "CartesianProduct",
         "BatchEvalPython", "MapInPandas"],
    ),
    "q44_incremental_agg": (
        # state merge: partial-aggregated per-side states, ONE
        # full-outer equi-join on the key
        ["SortMergeJoin FullOuter", "HashAggregate", "partial_"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "Expand"],
    ),
    "q65_hybrid_retrieval": (
        # lexical side: query terms broadcast into the tf/df postings;
        # both rank stages push the top-k bound INTO the window
        # (WindowGroupLimit — no full per-query sort materialized);
        # the only nested loop is the bounded broadcast query×corpus
        # cosine (q60's accepted shape)
        ["BroadcastHashJoin", "WindowGroupLimit"],
        ["Expand", "CartesianProduct"],
    ),
    "q59_pit_join": (
        # point-in-time join rides the as-of union trick: Window +
        # Union, ONE hash exchange family — the naive interval-join
        # plan (nested loop) is exactly what must NOT appear
        ["Window", "Union"],
        ["SortMergeJoin", "CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    "q42_group_sample": (
        # per-group hash-rank sample: one hash exchange + per-group
        # sort; no global range sort, no join
        ["Window", "hashpartitioning(lang"],
        ["Join", "CartesianProduct", "rangepartitioning("],
    ),
    "q58_constraint_audit": (
        # N constraints = ONE partial-aggregated pass per table (the
        # single-distinct rewrite keeps Expand out — the q45 trap);
        # referential probes are single-pass marker LEFT joins (hash,
        # broadcastable) counting checked+orphans in one agg
        ["HashAggregate", "partial_", "BroadcastHashJoin"],
        ["Expand", "SortMergeJoin", "BroadcastNestedLoopJoin",
         "CartesianProduct"],
    ),
    "q78_funnel": (
        # funnel fold: ONE groupBy(user) collect (object hash agg) —
        # no joins at all, no global sort; the chained-min shape the
        # oracle uses (k dependent joins) is exactly what this plan
        # must NOT contain
        ["ObjectHashAggregate"],
        ["Join", "CartesianProduct", "rangepartitioning("],
    ),
    "q79_retention_cohorts": (
        # cohort assignment joins back on the key (broadcast at
        # fixture scale; hash co-partitioned at scale) — never a
        # nested loop; final (cohort, offset) agg has a partial phase
        ["HashAggregate", "partial_"],
        ["CartesianProduct", "BroadcastNestedLoopJoin",
         "rangepartitioning("],
    ),
    "q41_bpe_tokenizer": (
        # tokenizer workload: the learn happened at model-build time
        # (write-once behind the staleness token), so the QUERY plan
        # is pure map: parquet model scan + ONE Arrow encode pass
        # (stack() fans out both per-doc branches from it) — zero
        # exchanges, zero joins, corpus scanned once
        ["MapInPandas", "Union", "Generate"],
        ["Exchange", "Join", "CartesianProduct", "BatchEvalPython"],
    ),
    "q12_semantic_dedup": (
        # SemDeDup, three tagged branches (round 13): within-cluster
        # (or within-(cluster, hash-cell) for 'capped') pairs ONLY —
        # every pair join is an equi-join (broadcast at fixture
        # scale, shuffle-on-key at 100 TB), never a cartesian pair
        # enumeration; the only nested-loop joins are the bounded
        # k x dim centroid broadcasts the Lloyd iterations share with
        # q91, and the capped branch's per-cluster count frame rides
        # a broadcast too (bounded by k rows). Per-cluster stats
        # partial-aggregate map-side; branches meet in a Union.
        ["HashAggregate", "partial_", "BroadcastHashJoin", "Union"],
        ["CartesianProduct"],
    ),
    "q57_scd2_incremental": (
        # both SCD2 arms in one plan (q56 merged in, round 11): the
        # 'full' rebuild arm contributes its window-over-one-hash-
        # exchange shape; the incremental arm's batch key set is
        # bounded, so BOTH the untouched-keys anti-join and the
        # touched-keys semi-join must broadcast it (planner's own
        # size estimate, no hint) — the dimension side stays map-only
        ["BroadcastHashJoin LeftAnti", "BroadcastHashJoin LeftSemi",
         "Window", "hashpartitioning(user_id", "Union"],
        ["CartesianProduct", "SortMergeJoin", "BroadcastNestedLoopJoin"],
    ),
}


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    flt = sys.argv[2] if len(sys.argv) > 2 else ""
    spark = get_spark("explain-audit", master="local[8]", shuffle_partitions=8)
    qs = all_queries()
    failures = []
    for name, (need, forbid) in CHECKS.items():
        if flt and flt not in name:
            continue
        plan = formatted_plan(qs[name].spark(spark, sf_dir))
        probs = [f"missing: {s}" for s in need if s not in plan] + [
            f"forbidden: {s}" for s in forbid if s in plan
        ]
        if probs:
            failures.append(name)
            print(f"BAD  {name}")
            for p in probs:
                print(f"      {p}")
            if flt:
                print(plan)
        else:
            print(f"GOOD {name}")
    print(f"\n{len(failures)} plan problems" + (f": {failures}" if failures else ""))


if __name__ == "__main__":
    main()
