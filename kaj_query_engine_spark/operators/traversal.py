"""Graph traversal: multi-source BFS hop distances over an edge
list — the reachability/contamination-radius primitive of corpus
curation, kept separate from the PageRank scoring module
(``operators/graph.py``) so each stays a small, single-purpose unit.

Shares the graph family's oracle-exactness rule (integer hops, one
deterministic MIN rule) and its Pregel-lite scale discipline — see
:func:`~kaj_query_engine_spark.operators.graph.pagerank_int`'s module
docstring for the full rationale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Multi-source BFS over directed (src, dst) edges: the minimum
    hop count from any seed to every node reachable within
    ``max_hops``. Returns (id, hop) with hop ∈ [0, max_hops] — exact
    integers, so an unrolled level-by-level SQL oracle matches
    bit-for-bit (the same oracle-exactness rule as ``pagerank_int``:
    no floats, one deterministic MIN rule).

    Corpus-curation use: reachability/contamination radius — "every
    document within k dedup-graph hops of a benchmark-tainted seed",
    the graph-propagation counterpart of q69's span decontamination.

    Scale shape (Pregel-lite, same discipline as :func:`pagerank_int`
    and the CC pointer-doubling in ``operators/dedup``): per hop, ONE
    equi-join of the current frontier against the edge list + one
    distinct + one anti-join against the visited set. The frontier is
    usually small relative to the graph, so the planner broadcasts it
    from its own size estimate (no hint — sizes change per hop, and a
    late frontier can be graph-sized). Visited grows monotonically;
    ``localCheckpoint`` on cadence bounds lineage. No driver-side
    data movement — the loop is a fixed hop count, no convergence
    collect (callers wanting full BFS pass the graph diameter;
    iterating to emptiness would need a per-round count, which
    ``cluster_duplicates`` shows how to bound when needed).

    ``edges`` column order is positional (src, dst); symmetrize for
    undirected reach. ``seeds`` is a one-column frame of node ids."""
    if max_hops < 0:
        raise ValueError("bfs_hops needs max_hops >= 0")
    a, b = edges.columns[:2]
    e = edges.select(F.col(a).alias("src"), F.col(b).alias("dst")).persist()
    sid = seeds.columns[0]
    visited = (
        seeds.select(F.col(sid).alias("id"))
        .distinct()
        .withColumn("hop", F.lit(0))
        .localCheckpoint(eager=True)
    )
    frontier = visited.select("id")
    for hop in range(1, max_hops + 1):
        # ONE exchange per hop (round-14, guide §2.4): raw neighbor
        # candidates (the former .distinct() is subsumed by the
        # groupBy below, whose map-side partial agg dedups early)
        # union with the tagged visited set; a single groupBy(id)
        # tells which candidate ids are NEW (no tagged row) — the
        # separate distinct exchange + anti-join against visited
        # disappear, results bit-identical (frontier = candidate ids
        # minus visited, exactly the anti-join's set).
        frontier = (
            frontier.join(e, frontier.id == e.src)
            .select(F.col("dst").alias("id"), F.lit(False).alias("_v"))
            .unionByName(
                visited.select("id", F.lit(True).alias("_v"))
            )
            .groupBy("id")
            .agg(F.max("_v").alias("_seen"))
            .filter(~F.col("_seen"))
            .select("id")
        )
        visited = visited.unionByName(
            frontier.withColumn("hop", F.lit(hop))
        )
        if hop % checkpoint_every == 0 or hop == max_hops:
            visited = visited.localCheckpoint(eager=True)
            # re-anchor the frontier on the checkpointed plan so the
            # next round's anti-join does not recompute this round
            frontier = visited.filter(F.col("hop") == hop).select("id")
    e.unpersist()
    return visited


def sssp_int(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Multi-source shortest paths over integer-weighted directed
    edges, ``rounds`` Bellman-Ford relaxations: returns (id, dist)
    where dist is the minimum seed-to-node weight over paths of at
    most ``rounds`` edges — exact int64 arithmetic, so an unrolled
    round-by-round SQL oracle matches bit-for-bit (the graph family's
    oracle-exactness rule; float weights would drift under MIN ties).

    Delta relaxation (the standard frontier optimization, equivalent
    to full relaxation round-for-round): only nodes whose distance
    IMPROVED last round propagate — a settled node's out-relaxations
    were already applied at its current distance, so re-relaxing it
    cannot improve anything. Per round: ONE frontier⋈edges equi-join
    + a per-node MIN partial-agg merge + the improvement anti-filter;
    the frontier usually shrinks toward convergence, so late rounds
    are cheap. ``localCheckpoint`` cadence bounds lineage; no driver
    collects (fixed round count — run graph-diameter rounds for full
    convergence).

    ``edges`` columns are positional (src, dst, weight); weights must
    be non-negative for the at-most-k-edges semantics to be the
    useful one (negative weights still compute correctly as k-edge
    Bellman-Ford, but "shortest within k hops" stops being monotone).
    ``seeds`` is a one-column frame of node ids (distance 0)."""
    if rounds < 0:
        raise ValueError("sssp_int needs rounds >= 0")
    a, b, c = edges.columns[:3]
    e = edges.select(
        F.col(a).alias("src"),
        F.col(b).alias("dst"),
        F.col(c).cast("long").alias("w"),
    ).persist()
    sid = seeds.columns[0]
    dist = (
        seeds.select(F.col(sid).alias("id"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    frontier = dist
    for r in range(1, rounds + 1):
        # ONE exchange per round (round-14, guide §2.4): raw
        # relaxations (no intermediate per-candidate groupBy — the
        # merge's map-side partial aggregation combines them anyway)
        # union with the tagged current distances, and a single
        # groupBy(id) yields BOTH the merged minimum and the previous
        # distance (min over the tagged rows) — so the improvement
        # test needs no join against the old table. Replaces the
        # former union+groupBy(min) PLUS merged⋈old left join (two
        # more exchanges through an opaque checkpoint partitioning)
        # with bit-identical results: new dist = min(old ∪ cand),
        # frontier = ids whose min beats (or has no) old distance.
        cand = frontier.join(e, frontier.id == e.src).select(
            F.col("dst").alias("id"),
            (F.col("dist") + F.col("w")).alias("dist"),
            F.lit(False).alias("_o"),
        )
        merged = (
            dist.select("id", "dist", F.lit(True).alias("_o"))
            .unionByName(cand)
            .groupBy("id")
            .agg(
                F.min("dist").alias("dist"),
                F.min(F.when(F.col("_o"), F.col("dist"))).alias("_old"),
            )
        )
        frontier = merged.filter(
            F.col("_old").isNull() | (F.col("dist") < F.col("_old"))
        ).select("id", "dist")
        dist = merged.select("id", "dist")
        if r % checkpoint_every == 0 or r == rounds:
            dist = dist.localCheckpoint(eager=True)
            # checkpoint the frontier TOO (round-9 review, plan-audit
            # note): the former semi-join of dist against the
            # pre-checkpoint frontier plan re-executed one round's
            # frontier lineage on the next iteration; materializing
            # the (usually small) frontier itself truncates its
            # lineage for the same price paid once, not per reuse.
            # Skipped on the FINAL round — that frontier is never
            # used again, so its eager job would be pure waste
            if r < rounds:
                frontier = frontier.localCheckpoint(eager=True)
    e.unpersist()
    return dist
