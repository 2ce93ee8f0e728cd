"""Similarity search over embedding columns (array<float>).

Two paths, both pure DataFrame ops (the arithmetic is JVM-side
``zip_with``/``aggregate`` — no Python in the hot path):

- **Brute-force cosine top-k** — the exactness baseline. Cross join of
  a *broadcast* query set against the corpus: one pass over the corpus
  per batch of queries, no shuffle of the big side. At 100 TB this is
  the right shape when |queries| is small (the corpus never moves).
- **LSH-bucketed (random hyperplane) ANN** — the scale path. Each
  vector gets a sign-bucket from B fixed hyperplanes; queries compare
  only within their bucket (candidates ≈ N/2^B), then exact-cosine
  rank. Hyperplanes are deterministic ±1 vectors derived from a fixed
  seed so results are reproducible and oracle-checkable.

Determinism for the oracle: the dot product folds left over the array
in index order (``F.aggregate`` ↔ DuckDB ``list_reduce``), so the
double arithmetic is bit-identical across engines.

No counterpart in the reference engine — north-star extension surface.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LSH_PLANES = 4  # 2^4 = 16 buckets
LSH_SEED = 7
EMB_DIM = 64


def _dvec(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Order-fixed left-fold dot product (oracle mirror:
    ``list_reduce(list_transform(list_zip(a,b), p -> p[1]*p[2]),
    (x,y) -> x+y)``)."""
    prods = F.zip_with(a, b, lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def hyperplane_signs(
    planes: int = LSH_PLANES, dim: int = EMB_DIM, seed: int = LSH_SEED
) -> list[list[float]]:
    """Deterministic ±1 hyperplanes (fixed seed — same literals are
    embedded in the DuckDB oracle SQL)."""
    rng = random.Random(seed)
    return [[rng.choice([-1.0, 1.0]) for _ in range(dim)] for _ in range(planes)]


def lsh_bucket(vec: Column, signs: list[list[float]]) -> Column:
    """Sign-bit bucket string, one char per hyperplane."""
    bits = []
    for plane in signs:
        lit = F.array(*[F.lit(s) for s in plane])
        bits.append(F.when(dot(vec, lit) > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors per query: (q_id, vec_id, rank, cos).

    ``queries`` is broadcast; the corpus is scanned once. Ties broken
    by neighbor id for determinism.
    """
    from pyspark.sql import Window as W

    q = queries.select(
        F.col(id_col).alias("q_id"), _dvec(F.col(vec_col)).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"), _dvec(F.col(vec_col)).alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("cos"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "rank", F.round("cos", 6).alias("cos"))
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    planes: int = LSH_PLANES,
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's LSH bucket,
    then exact cosine rank. Same output shape as brute_force_topk.

    Scale shape: corpus bucketing is a map-only pass; the join is an
    equi-join on the bucket key (2^planes distinct values — at real
    scale use more planes / multi-probe so buckets stay executor-sized).
    """
    from pyspark.sql import Window as W

    signs = hyperplane_signs(planes)
    q = queries.select(
        F.col(id_col).alias("q_id"),
        _dvec(F.col(vec_col)).alias("q_vec"),
    ).withColumn("bucket", lsh_bucket(F.col("q_vec"), signs))
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        _dvec(F.col(vec_col)).alias("c_vec"),
    ).withColumn("bucket", lsh_bucket(F.col("c_vec"), signs))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id", "vec_id", cosine(F.col("q_vec"), F.col("c_vec")).alias("cos")
        )
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "rank", F.round("cos", 6).alias("cos"))
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
) -> DataFrame:
    """All pairs (i < j) with cosine >= threshold — embedding-space
    near-duplicate detection. Brute force here; at scale, run lsh_bucket
    first and pair only within buckets (same trade as MinHash-LSH)."""
    e = df.select(F.col(id_col).alias("id"), _dvec(F.col(vec_col)).alias("v"))
    e = e.withColumn("nrm", norm(F.col("v")))
    a = e.select(
        F.col("id").alias("i"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    b = e.select(
        F.col("id").alias("j"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    pairs = a.join(F.broadcast(b), F.col("i") < F.col("j")).select(
        "i",
        "j",
        (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cos"),
    )
    return pairs.filter(F.col("cos") >= threshold).select(
        "i", "j", F.round("cos", 6).alias("cos")
    )
