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
        frontier = (
            frontier.join(e, frontier.id == e.src)
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
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
