"""Integer fixed-point k-means — ORACLE-EXACT iterative clustering.

Lloyd's algorithm is the data-mix workhorse of a training pipeline
(topic balancing, domain discovery, cluster-stratified sampling), but
float centroids make every implementation engine-specific at the last
bit. This one follows the repo's PageRank/BPE recipe for iterative
algorithms: do ALL arithmetic in integers so a DuckDB oracle can
reproduce the run bit-for-bit —

- vectors quantize once to a global fixed-point grid:
  ``floor(v * scale + 0.5)`` in double precision (identical IEEE ops
  in both engines; float32 inputs promote to double exactly);
- distances are integer squared-L2 (BIGINT-safe: |q| <= scale/2 per
  dim, 64 dims => diff^2 sums < 2^33);
- assignment ties break on the smaller centroid index via
  ``min(struct(dist, j))``;
- centroid updates are FLOOR-division means computed with the
  pmod trick ``(s - pmod(s, n)) div n`` — the numerator is exactly
  divisible, so truncating and flooring division agree and DuckDB's
  ``//`` reproduces it;
- an empty cluster keeps its previous centroid.

Scale: per iteration the k x dim integer centroid table rides into
the plan as an array literal and the nearest-centroid argmin is
computed per ROW (transform + array_min over struct(dist, j)) — fully
map-side, no crossJoin, no groupBy(id), no per-iteration broadcast —
followed by one (j, dim)-grouped partial-aggregated mean; no
all-pairs anything; driver state is the k x dim centroid table
(bounded, the same "centroid-bounded collect" contract as the IVF
index builder). The quantized corpus is computed once and persisted
across iterations.

No counterpart in the reference engine (3 scalar types, no arrays,
no iteration — ``/root/reference/src/qp/utils/Attribute.java:11-13``);
training-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def quantize_fixed(vecs: DataFrame, id_col: str, vec_col: str, scale: int) -> DataFrame:
    """(id, q): the global fixed-point quantization both engines share."""
    return vecs.select(
        F.col(id_col).alias("id"),
        F.transform(
            F.col(vec_col),
            lambda v: F.floor(v.cast("double") * float(scale) + F.lit(0.5)).cast(
                "long"
            ),
        ).alias("q"),
    )


def kmeans_assign_int(
    vecs: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iterations: int = 3,
    scale: int = 10_000,
    *,
    final_centroids: bool = True,
) -> tuple[DataFrame, DataFrame, list[tuple[int, list[int]]]]:
    """Run ``iterations`` Lloyd steps; init = the quantized vectors of
    the ``k`` smallest ids. Returns ``(assigned, quantized, cents)``:
    the FINAL (id, j) assignment frame, the persisted quantized
    corpus, and the final integer centroids — the building block both
    :func:`kmeans_int` (per-cluster checksums) and the semantic-dedup
    operator (within-cluster pair generation) compose, sharing the
    oracle-exact iteration bit-for-bit.

    ``final_centroids=False`` skips the LAST iteration's centroid
    update (round-15, guide §2.4/§5): the returned assignment is
    computed from the previous iteration's centroids BEFORE the
    update, so skipping it cannot change ``assigned`` — it only
    leaves the returned ``cents`` at their pre-update values. The
    semantic-dedup callers consume only the assignment and were
    paying one full posexplode+groupBy+collect job per run (the
    entire corpus exploded to N×dim rows, shuffled, aggregated,
    pulled to the driver) for centroids they discard; callers that
    read ``cents`` (:func:`kmeans_int`) keep the default."""
    if iterations < 1:
        raise ValueError("kmeans_assign_int needs iterations >= 1")
    # persisted across the iterations (and still referenced by the
    # returned plan); Spark reclaims the cache with the session — the
    # materialize-then-unpersist discipline is the caller's at scale
    q = quantize_fixed(vecs, id_col, vec_col, scale).persist()
    init = q.orderBy("id").limit(k).collect()  # centroid-bounded
    cents: list[tuple[int, list[int]]] = [
        (j, list(r.q)) for j, r in enumerate(init)
    ]
    best = None
    for it in range(iterations):
        # MAP-SIDE argmin (round-14 optimization, guide §2.4 "remove
        # shuffles outright"): the centroids are a driver-held k×dim
        # list, so the nearest-centroid choice needs no crossJoin +
        # groupBy(id) — both shuffled k·N rows and cost two AQE query
        # stages per iteration. Build the centroid table as an array
        # literal and fold it per ROW: transform((c, j) → struct(dist,
        # j)) then array_min, whose struct ordering (dist, then j) is
        # exactly the old min(struct(dist, j)) tie-break — smaller
        # index wins ties. The literal array is the transform's
        # COLLECTION argument, evaluated once per row, never a free
        # expression inside the lambda (the q43 HOF lesson); the
        # distance arithmetic is the identical zip_with/aggregate
        # expression, so the assignment is bit-for-bit the old one
        # (oracle-pinned). createDataFrame/broadcast per iteration
        # disappear with the join.
        cs = F.array(
            *[F.array(*[F.lit(int(v)) for v in c]) for _j, c in cents]
        )
        dist_to = lambda c: F.aggregate(  # noqa: E731
            F.zip_with("q", c, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        # aliases inside HOF lambdas are dropped (fields come out
        # col1/col2) — the positional no-op cast names them explicitly
        jcol = F.array_min(
            F.transform(
                cs,
                lambda c, i: F.struct(dist_to(c), i.cast("long")),
            ).cast("array<struct<dist:bigint,j:bigint>>")
        )["j"]
        assigned = q.select("id", jcol.alias("j"))
        best = assigned
        if not final_centroids and it == iterations - 1:
            # assignment-only caller: the update below would feed an
            # iteration that never runs
            break
        # the centroid update reads (j, q) straight off the same
        # map-only projection — the old q ⋈ assigned re-join on id
        # (one more exchange pair per iteration) is gone. The argmin
        # MUST be a separate select below the posexplode: a generator
        # evaluates its required child expressions per OUTPUT element,
        # so folding jcol into the exploding projection re-runs the
        # whole k×dim argmin dim times per row (measured 8.6 s vs
        # 1.6 s for this collect at sf0.1) — the same
        # free-expression-per-element trap as HOF lambdas (PERF.md
        # round 14), surfacing through Generate instead.
        # the (j, i, cv) rows are collected straight off the partial
        # aggregate and the per-cluster arrays assembled DRIVER-side
        # (round-14, guide §2.4): the former second groupBy(j) +
        # collect_list/array_sort added one more exchange and AQE
        # stage per iteration only to re-shape ≤ k×dim rows the
        # driver was about to hold anyway (the same centroid-bounded
        # collect contract either way)
        rows = (
            q.select(jcol.alias("j"), "q")
            .select("j", F.posexplode("q").alias("i", "v"))
            .groupBy("j", "i")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .select("j", "i", F.expr("(s - pmod(s, n)) div n").alias("cv"))
            .collect()
        )
        acc: dict = {}
        for r in rows:
            acc.setdefault(r.j, {})[r.i] = int(r.cv)
        got = {
            j: [d[i] for i in range(len(d))] for j, d in acc.items()
        }
        cents = [(j, got.get(j, c)) for j, c in cents]  # empty: keep
    return best, q, cents


def kmeans_int(
    vecs: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iterations: int = 3,
    scale: int = 10_000,
) -> DataFrame:
    """Run ``iterations`` Lloyd steps; init = the quantized vectors of
    the ``k`` smallest ids. Returns one row per non-empty cluster of
    the FINAL assignment: (cluster, n, id_sum, c_sum) where ``id_sum``
    checksums the membership and ``c_sum`` the final centroid — all
    BIGINT, so the unrolled-CTE oracle matches bit-for-bit."""
    best, q, cents = kmeans_assign_int(
        vecs, id_col, vec_col, k, iterations, scale
    )
    csum_df = vecs.sparkSession.createDataFrame(
        [(j, sum(c)) for j, c in cents], "j long, c_sum long"
    )
    # the assignment frame already carries (id, j) — the old q ⋈ best
    # re-join on id added an exchange pair for columns the aggregate
    # never read (round-14, guide §2.4)
    return (
        best.groupBy("j")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("id").alias("id_sum"),
        )
        .join(F.broadcast(csum_df), "j")
        .select(F.col("j").alias("cluster"), "n", "id_sum", "c_sum")
    )
