"""Hybrid retrieval: exact-integer lexical scoring + vector ranks,
fused with reciprocal-rank fusion — the search surface that
complements the ANN stack (``operators/similarity``): corpus curation
and eval tooling constantly ask "find the documents most related to
this one" with BOTH signals, and RRF is the standard way to combine
rankings without score calibration.

Exactness design (the q64 lesson applied to retrieval): BM25's floats
(log idf, length normalization) are not oracle-checkable across
engines, but the RANKINGS a fusion consumes don't need them —

- lexical score = Σ_terms  tf(term, doc) · (SCALE div df(term)) —
  integer rarity weighting (rarer term → bigger weight), exact in any
  engine, no logs;
- vector ranks come from the exact cosine top-k
  (``similarity.brute_force_topk`` — dot products fold left in index
  order on both engines, so even the doubles are bit-identical);
- RRF = Σ_signals SCALE div (k0 + rank) — pure integers.

Ties everywhere break by doc id. Result: a fused ranking that
hash-matches the oracle bit-for-bit.

Scale shape: tokenize+tf is one explode + one partial-aggregated
groupBy; document frequency one more; query terms are a bounded set
(broadcast join); per-query candidate scoring is an equi-join on the
term; ranks are per-query windows over candidate sets bounded by the
query's term postings. Nothing is all-pairs; the corpus never crosses
a driver boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

SCALE = 10**9
RRF_K0 = 60


def _tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    # whitespace tokens, same convention as functions.text.tokens /
    # the q40 oracle fragment (string_split(trim(text), ' '))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.col(text_col)), " ")).alias("term"),
    )


def lexical_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_ids: list[int],
    k: int = 10,
) -> DataFrame:
    """Per query doc: top-k other docs by integer rarity-weighted term
    overlap — (q_id, doc_id, lex_rank, score). The query's own doc is
    excluded (it would trivially rank first)."""
    toks = _tokens(docs, id_col, text_col)
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    posting = toks.distinct()
    dfreq = posting.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = (
        posting.filter(F.col("doc_id").isin(query_ids))
        .select(F.col("doc_id").alias("q_id"), "term")
    )
    scored = (
        qterms.join(tf, "term")
        .filter(F.col("doc_id") != F.col("q_id"))
        .join(dfreq, "term")
        .groupBy("q_id", "doc_id")
        .agg(
            F.sum(F.expr(f"tf * ({SCALE} div df)")).alias("score")
        )
    )
    w = W.partitionBy("q_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("lex_rank", F.row_number().over(w))
        .filter(F.col("lex_rank") <= k)
        .select("q_id", "doc_id", "lex_rank", "score")
    )


def rrf_fuse(
    lex: DataFrame,
    vec: DataFrame,
    k0: int = RRF_K0,
) -> DataFrame:
    """Reciprocal-rank fusion of the lexical and vector top-k lists:
    rrf = Σ SCALE div (k0 + rank) over the signals that ranked the
    doc; absent signals contribute 0 and report rank 0. One full-outer
    equi-join on (q_id, doc_id) — both sides are top-k bounded."""
    l = lex.select("q_id", "doc_id", "lex_rank")
    v = vec.select(
        F.col("q_id"), F.col("vec_id").alias("doc_id"),
        F.col("rank").alias("vec_rank"),
    )
    j = l.join(v, ["q_id", "doc_id"], "full_outer")
    part = f"coalesce({SCALE} div ({k0} + {{r}}), 0L)"
    return j.select(
        "q_id",
        "doc_id",
        (
            F.expr(part.format(r="lex_rank"))
            + F.expr(part.format(r="vec_rank"))
        ).alias("rrf"),
        F.coalesce("lex_rank", F.lit(0)).alias("lex_rank"),
        F.coalesce("vec_rank", F.lit(0)).alias("vec_rank"),
    )
