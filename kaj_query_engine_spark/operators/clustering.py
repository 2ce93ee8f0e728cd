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

Scale: per iteration, ONE broadcast of k x dim integer centroids
against the quantized corpus (map-side distance + argmin), one
groupBy(id) argmin, and one (j, dim)-grouped partial-aggregated mean —
no all-pairs anything; driver state is the k x dim centroid table
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
) -> tuple[DataFrame, DataFrame, list[tuple[int, list[int]]]]:
    """Run ``iterations`` Lloyd steps; init = the quantized vectors of
    the ``k`` smallest ids. Returns ``(assigned, quantized, cents)``:
    the FINAL (id, j) assignment frame, the persisted quantized
    corpus, and the final integer centroids — the building block both
    :func:`kmeans_int` (per-cluster checksums) and the semantic-dedup
    operator (within-cluster pair generation) compose, sharing the
    oracle-exact iteration bit-for-bit."""
    if iterations < 1:
        raise ValueError("kmeans_assign_int needs iterations >= 1")
    spark = vecs.sparkSession
    # persisted across the iterations (and still referenced by the
    # returned plan); Spark reclaims the cache with the session — the
    # materialize-then-unpersist discipline is the caller's at scale
    q = quantize_fixed(vecs, id_col, vec_col, scale).persist()
    init = q.orderBy("id").limit(k).collect()  # centroid-bounded
    cents: list[tuple[int, list[int]]] = [
        (j, list(r.q)) for j, r in enumerate(init)
    ]
    best = None
    for _ in range(iterations):
        cdf = spark.createDataFrame(cents, "j long, c array<bigint>")
        dist = F.aggregate(
            F.zip_with("q", "c", lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        assigned = (
            q.crossJoin(F.broadcast(cdf))
            .select("id", dist.alias("dist"), "j")
            .groupBy("id")
            .agg(F.min(F.struct("dist", "j")).alias("m"))
            .select("id", F.col("m.j").alias("j"))
        )
        best = assigned
        upd = (
            q.join(assigned, "id")
            .select("j", F.posexplode("q").alias("i", "v"))
            .groupBy("j", "i")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .withColumn("cv", F.expr("(s - pmod(s, n)) div n"))
            .groupBy("j")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "cv"))),
                    lambda x: x["cv"],
                ).alias("c")
            )
        )
        got = {r.j: [int(v) for v in r.c] for r in upd.collect()}
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
    return (
        q.join(best, "id")
        .groupBy("j")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("id").alias("id_sum"),
        )
        .join(F.broadcast(csum_df), "j")
        .select(F.col("j").alias("cluster"), "n", "id_sum", "c_sum")
    )
