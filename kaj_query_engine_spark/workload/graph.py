"""Graph-reach workload: multi-source BFS over the order–part
bipartite graph (which parts do seed orders touch; which orders share
those parts; and so on) — the reachability/contamination-radius
primitive of corpus curation ("every document within k dedup-graph
hops of a tainted seed"), exercised here on the TPC-H-ish fixtures so
the oracle is cheap and exact.

The reference engine has no graph constructs at all (SELECT-only
grammar, ``/root/reference/src/qp/parser/parser.cup``) — extension
surface, same family as q64's PageRank (``operators/graph.py``).

Oracle-exactness rule (the q64/q91 discipline): hops are exact
integers with one deterministic MIN rule, so the DuckDB oracle just
unrolls the levels — h0 = seeds, h(k) = neighbors(h(k−1)) minus
everything seen — and aggregates per hop with integer id checksums.
No floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kaj_query_engine_spark.workload.core import t
from kaj_query_engine_spark.workload.registry import register

# node id space: orders at 2k, parts at 2k+1 (the ids collide raw)
_BFS_SEED_MOD = 97
_BFS_HOPS = 4

_BFS_LEVELS = []
for _h in range(1, _BFS_HOPS + 1):
    _prev = " UNION ALL ".join(f"SELECT id FROM h{_j}" for _j in range(_h))
    _BFS_LEVELS.append(
        f"h{_h} AS (SELECT DISTINCT e.dst AS id FROM e "
        f"JOIN h{_h - 1} f ON e.src = f.id "
        f"WHERE e.dst NOT IN ({_prev}))"
    )
_BFS_ORACLE = (
    "WITH e AS (SELECT l_orderkey * 2 AS src, l_partkey * 2 + 1 AS dst "
    "FROM lineitem "
    "UNION ALL SELECT l_partkey * 2 + 1, l_orderkey * 2 FROM lineitem), "
    "h0 AS (SELECT DISTINCT o_orderkey * 2 AS id FROM orders "
    f"WHERE o_orderkey % {_BFS_SEED_MOD} = 0), "
    + ", ".join(_BFS_LEVELS)
    + " "
    + " UNION ALL ".join(
        f"SELECT {h} AS hop, CAST(count(*) AS BIGINT) AS n, "
        f"CAST(sum(id) AS BIGINT) AS id_sum FROM h{h}"
        for h in range(_BFS_HOPS + 1)
    )
)


@register(
    "q71_bfs_reach",
    _BFS_ORACLE,
    "multi-source BFS reach: minimum hop count from seed orders "
    f"(o_orderkey % {_BFS_SEED_MOD} = 0) over the symmetrized "
    "order–part bipartite graph, 4 hops — the contamination-radius "
    "primitive (q69's span decontamination propagated through a "
    "graph). Pregel-lite: per hop ONE frontier⋈edges equi-join + "
    "distinct + anti-join vs visited, frontier broadcast from its own "
    "size estimate, localCheckpoint cadence bounds lineage, zero "
    "driver collects. Exact integer hops → the oracle unrolls the "
    "levels and hash-matches bit-for-bit",
)
def q71(spark, sf_dir):
    from kaj_query_engine_spark.operators.traversal import bfs_hops

    li = t(spark, sf_dir, "lineitem")
    fwd = li.select(
        (F.col("l_orderkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    )
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    seeds = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % _BFS_SEED_MOD == 0)
        .select((F.col("o_orderkey") * 2).alias("id"))
    )
    hops = bfs_hops(edges, seeds, _BFS_HOPS)
    return hops.groupBy("hop").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("id").alias("id_sum"),
    )


# q18: multi-source weighted shortest paths (k-round Bellman-Ford),
# weights = l_quantity (integral in the fixture, cast BIGINT).
_SP_ROUNDS = 4
_SP_LEVELS = []
for _r in range(1, _SP_ROUNDS + 1):
    _SP_LEVELS.append(
        f"r{_r} AS (SELECT id, MIN(dist) AS dist FROM ("
        f"SELECT id, dist FROM r{_r - 1} "
        f"UNION ALL SELECT e.dst AS id, p.dist + e.w AS dist "
        f"FROM r{_r - 1} p JOIN e ON e.src = p.id) GROUP BY id)"
    )
_SP_ORACLE = (
    "WITH e AS (SELECT l_orderkey * 2 AS src, l_partkey * 2 + 1 AS dst, "
    "CAST(l_quantity AS BIGINT) AS w FROM lineitem "
    "UNION ALL SELECT l_partkey * 2 + 1, l_orderkey * 2, "
    "CAST(l_quantity AS BIGINT) FROM lineitem), "
    "r0 AS (SELECT DISTINCT o_orderkey * 2 AS id, CAST(0 AS BIGINT) "
    f"AS dist FROM orders WHERE o_orderkey % {_BFS_SEED_MOD} = 0), "
    + ", ".join(_SP_LEVELS)
    + " SELECT CAST(dist // 16 AS BIGINT) AS bucket, "
    "CAST(count(*) AS BIGINT) AS n, CAST(sum(id) AS BIGINT) AS id_sum, "
    f"CAST(sum(dist) AS BIGINT) AS dist_sum FROM r{_SP_ROUNDS} GROUP BY 1"
)


@register(
    "q18_shortest_paths",
    _SP_ORACLE,
    "multi-source weighted shortest paths: 4 Bellman-Ford rounds from "
    f"the q71 seed orders (o_orderkey % {_BFS_SEED_MOD} = 0) over the "
    "symmetrized order-part graph weighted by l_quantity — minimum "
    "seed-to-node weight over paths of at most 4 edges, exact int64, "
    "histogrammed by dist div 16. DELTA relaxation: only nodes whose "
    "distance improved last round propagate (round-for-round equal to "
    "full relaxation — a settled node's out-relaxations were already "
    "applied), one frontier⋈edges join + per-node MIN merge per "
    "round, localCheckpoint cadence, zero driver collects; the oracle "
    "unrolls the rounds with FULL relaxation, so the hash match also "
    "pins delta==full",
)
def q18(spark, sf_dir):
    from kaj_query_engine_spark.operators.traversal import sssp_int

    li = t(spark, sf_dir, "lineitem")
    fwd = li.select(
        (F.col("l_orderkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    edges = fwd.unionByName(
        fwd.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    )
    seeds = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % _BFS_SEED_MOD == 0)
        .select((F.col("o_orderkey") * 2).alias("id"))
    )
    dist = sssp_int(edges, seeds, _SP_ROUNDS)
    return dist.groupBy(
        F.expr("dist div 16").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("id").alias("id_sum"),
        F.sum("dist").alias("dist_sum"),
    )
