"""Similarity-search workload over ``embeddings`` (array<float>, 64-d):
brute-force cosine top-k, LSH-bucketed ANN, embedding near-dup pairs.

Oracle construction: the dot product folds left over the array in
index order on both engines (Spark ``F.aggregate`` ↔ DuckDB
``list_reduce``), so cosine doubles are bit-identical and ranking is
deterministic (ties broken by id).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kaj_query_engine_spark.operators import similarity as S
from kaj_query_engine_spark.workload.core import t
from kaj_query_engine_spark.workload.registry import register

N_QUERIES = 5  # query set: vec_id < 5
TOP_K = 10

_DOT_AB = (
    "list_reduce(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]), "
    "(x, y) -> x + y)"
)


def _norm(v: str) -> str:
    return f"sqrt({_DOT_AB.format(a=v, b=v)})"


def _topk_oracle(candidate_filter: str) -> str:
    cos = (
        f"{_DOT_AB.format(a='q.q_vec', b='e.v')} / (q.q_nrm * {_norm('e.v')})"
    )
    return (
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
        "q AS (SELECT vec_id AS q_id, v AS q_vec, "
        f"{_norm('v')} AS q_nrm FROM e WHERE vec_id < {N_QUERIES}), "
        f"scored AS (SELECT q.q_id, e.vec_id, {cos} AS c "
        f"FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id{candidate_filter}), "
        "r AS (SELECT q_id, vec_id, CAST(row_number() OVER ("
        "PARTITION BY q_id ORDER BY c DESC, vec_id) AS INT) AS rank, "
        "round(c, 6) AS cos FROM scored) "
        f"SELECT q_id, vec_id, rank, cos FROM r WHERE rank <= {TOP_K}"
    )


@register(
    "q60_ann_brute_force",
    _topk_oracle(""),
    "exact cosine top-10 for 5 query vectors: broadcast queries x one "
    "corpus scan (the corpus never shuffles)",
)
def q60(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES)
    return S.brute_force_topk(e, q, k=TOP_K)


ANN_PLANES = 8  # 256 buckets; pinned so the oracle can mirror exactly


def _lsh_oracle(planes: int = ANN_PLANES) -> str:
    signs = S.hyperplane_signs(planes)
    plane_bits = []
    for plane in signs:
        lit = "[" + ", ".join(str(s) for s in plane) + "]::DOUBLE[]"
        plane_bits.append(
            f"CASE WHEN {_DOT_AB.format(a='v', b=lit)} > 0 "
            "THEN '1' ELSE '0' END"
        )
    bucket = " || ".join(plane_bits)
    probes = "[" + ", ".join(S.probe_exprs("bucket", planes)) + "]"
    cos = (
        f"{_DOT_AB.format(a='q.q_vec', b='e.v')} / (q.q_nrm * {_norm('e.v')})"
    )
    return (
        "WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
        f"e AS (SELECT vec_id, v, {bucket} AS bucket FROM e0), "
        f"q AS (SELECT vec_id AS q_id, v AS q_vec, {probes} AS probes, "
        f"{_norm('v')} AS q_nrm FROM e WHERE vec_id < {N_QUERIES}), "
        f"scored AS (SELECT q.q_id, e.vec_id, {cos} AS c "
        "FROM e JOIN q ON list_contains(q.probes, e.bucket) "
        "WHERE e.vec_id <> q.q_id), "
        "r AS (SELECT q_id, vec_id, CAST(row_number() OVER ("
        "PARTITION BY q_id ORDER BY c DESC, vec_id) AS INT) AS rank, "
        "round(c, 6) AS cos FROM scored) "
        f"SELECT q_id, vec_id, rank, cos FROM r WHERE rank <= {TOP_K}"
    )


@register(
    "q61_ann_lsh",
    _lsh_oracle(),
    "LSH-bucketed ANN (8 fixed random hyperplanes → 256 sign buckets) "
    "with Hamming-1 multi-probe: candidates restricted to the query's "
    "probe buckets, then exact rank — the 100 TB scale path (planes "
    "sizes buckets to the corpus; candidates per query stay constant "
    "in N)",
)
def q61(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES)
    return S.lsh_topk(e, q, k=TOP_K, planes=ANN_PLANES)


IVF_CENTROIDS = 16  # pinned so the oracle can mirror exactly
IVF_NPROBE = 4
# the float index's layout-params string — ONE definition, shared by
# the float token and (embedded) the derived quantized index's token
_IVF_PARAMS = f"ivf:{IVF_CENTROIDS}:v1"


def _ivf_oracle(
    n_centroids: int = IVF_CENTROIDS,
    nprobe: int = IVF_NPROBE,
    cent_where: str = "",
) -> str:
    """``cent_where`` restricts the centroid SEED POOL (the 'incr'
    branch trains the quantizer on the base corpus only; held-out
    vectors are assigned to those frozen centroids afterwards —
    assignment and querying always cover ALL of e)."""
    seed_h = "('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT"
    cos_vc = (
        f"{_DOT_AB.format(a='e.v', b='cent.cvec')} / "
        f"({_norm('e.v')} * {_norm('cent.cvec')})"
    )
    cos_qc = (
        f"{_DOT_AB.format(a='q.q_vec', b='cent.cvec')} / "
        f"(q.q_nrm * {_norm('cent.cvec')})"
    )
    cos_qa = (
        f"{_DOT_AB.format(a='p.q_vec', b='a.v')} / (p.q_nrm * {_norm('a.v')})"
    )
    return (
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
        f"cent AS (SELECT vec_id AS cid, v AS cvec FROM e {cent_where} "
        f"ORDER BY {seed_h}, vec_id LIMIT {n_centroids}), "
        "asg AS (SELECT e.vec_id, e.v, cent.cid, row_number() OVER ("
        f"PARTITION BY e.vec_id ORDER BY {cos_vc} DESC, cent.cid) AS rn "
        "FROM e CROSS JOIN cent), "
        "a AS (SELECT vec_id, v, cid FROM asg WHERE rn = 1), "
        f"q AS (SELECT vec_id AS q_id, v AS q_vec, {_norm('v')} AS q_nrm "
        f"FROM e WHERE vec_id < {N_QUERIES}), "
        "qp AS (SELECT q.q_id, q.q_vec, q.q_nrm, cent.cid, row_number() OVER ("
        f"PARTITION BY q.q_id ORDER BY {cos_qc} DESC, cent.cid) AS rn "
        "FROM q CROSS JOIN cent), "
        f"p AS (SELECT q_id, q_vec, q_nrm, cid FROM qp WHERE rn <= {nprobe}), "
        f"scored AS (SELECT p.q_id, a.vec_id, {cos_qa} AS c "
        "FROM a JOIN p ON a.cid = p.cid WHERE a.vec_id <> p.q_id), "
        "r AS (SELECT q_id, vec_id, CAST(row_number() OVER ("
        "PARTITION BY q_id ORDER BY c DESC, vec_id) AS INT) AS rank, "
        "round(c, 6) AS cos FROM scored) "
        f"SELECT q_id, vec_id, rank, cos FROM r WHERE rank <= {TOP_K}"
    )


# int8 quantization oracle mirror (operators.similarity.quantize_vectors):
# scale = max|x|/127, q_i = floor(x_i/scale + 0.5) — half-up, NOT
# banker's (DuckDB round() is half-away and Spark bround() half-even;
# floor(+0.5) is the one form both engines express identically)
_QSCALE = "list_max(list_transform({v}, x -> abs(x))) / 127.0"


def _qvec(v: str) -> str:
    return (
        f"CASE WHEN ({_QSCALE.format(v=v)}) > 0 THEN "
        f"list_transform({v}, x -> CAST(floor(x / ({_QSCALE.format(v=v)}) "
        "+ 0.5) AS BIGINT)) "
        f"ELSE list_transform({v}, x -> CAST(0 AS BIGINT)) END"
    )


def _quant_ivf_oracle(n_centroids: int, nprobe: int, top: int = TOP_K) -> str:
    """The quantized-scoring IVF branch: identical centroid choice,
    assignment, and probe selection as :func:`_ivf_oracle` (exact
    float vectors), but candidate scoring on int8-quantized vectors —
    scales cancel in cosine, so the score is integer dots over
    quantized components."""
    seed_h = "('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT"
    cos_vc = (
        f"{_DOT_AB.format(a='e.v', b='cent.cvec')} / "
        f"({_norm('e.v')} * {_norm('cent.cvec')})"
    )
    cos_qc = (
        f"{_DOT_AB.format(a='q.q_vec', b='cent.cvec')} / "
        f"(q.q_nrm * {_norm('cent.cvec')})"
    )
    qcos = (
        f"{_DOT_AB.format(a='p.q_qv', b='a.qv')} * 1.0 / (p.q_qnrm * a.qnrm)"
    )
    return (
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
        "cent AS (SELECT vec_id AS cid, v AS cvec FROM e "
        f"ORDER BY {seed_h}, vec_id LIMIT {n_centroids}), "
        "asg AS (SELECT e.vec_id, e.v, cent.cid, row_number() OVER ("
        f"PARTITION BY e.vec_id ORDER BY {cos_vc} DESC, cent.cid) AS rn "
        "FROM e CROSS JOIN cent), "
        f"a0 AS (SELECT vec_id, {_qvec('v')} AS qv, cid FROM asg WHERE rn = 1), "
        f"a AS (SELECT vec_id, qv, {_norm('qv')} AS qnrm, cid FROM a0), "
        f"q AS (SELECT vec_id AS q_id, v AS q_vec, {_norm('v')} AS q_nrm "
        f"FROM e WHERE vec_id < {N_QUERIES}), "
        f"qq0 AS (SELECT q_id, {_qvec('q_vec')} AS q_qv FROM q), "
        f"qq AS (SELECT q_id, q_qv, {_norm('q_qv')} AS q_qnrm FROM qq0), "
        "qp AS (SELECT q.q_id, cent.cid, row_number() OVER ("
        f"PARTITION BY q.q_id ORDER BY {cos_qc} DESC, cent.cid) AS rn "
        "FROM q CROSS JOIN cent), "
        "p AS (SELECT qp.q_id, qq.q_qv, qq.q_qnrm, qp.cid FROM qp "
        f"JOIN qq ON qp.q_id = qq.q_id WHERE qp.rn <= {nprobe}), "
        f"scored AS (SELECT p.q_id, a.vec_id, {qcos} AS c "
        "FROM a JOIN p ON a.cid = p.cid WHERE a.vec_id <> p.q_id), "
        "r AS (SELECT q_id, vec_id, CAST(row_number() OVER ("
        "PARTITION BY q_id ORDER BY c DESC, vec_id) AS INT) AS rank, "
        "round(c, 6) AS cos FROM scored) "
        f"SELECT q_id, vec_id, rank, cos FROM r WHERE rank <= {top}"
    )


def _rescored_ivf_oracle(n_centroids: int, nprobe: int, overfetch: int = 4) -> str:
    """Two-tier oracle: the quantized branch at k·overfetch proposes,
    exact float cosine over ONLY those candidates re-ranks."""
    cand = _quant_ivf_oracle(n_centroids, nprobe, TOP_K * overfetch)
    cos = f"{_DOT_AB.format(a='q.q_vec', b='e.v')} / (q.q_nrm * {_norm('e.v')})"
    return (
        f"WITH qc AS ({cand}), "
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
        f"q AS (SELECT vec_id AS q_id, v AS q_vec, {_norm('v')} AS q_nrm "
        f"FROM e WHERE vec_id < {N_QUERIES}), "
        f"rescored AS (SELECT qc.q_id, qc.vec_id, {cos} AS c FROM qc "
        "JOIN q ON qc.q_id = q.q_id JOIN e ON qc.vec_id = e.vec_id), "
        "r AS (SELECT q_id, vec_id, CAST(row_number() OVER ("
        "PARTITION BY q_id ORDER BY c DESC, vec_id) AS INT) AS rank, "
        "round(c, 6) AS cos FROM rescored) "
        f"SELECT q_id, vec_id, rank, cos FROM r WHERE rank <= {TOP_K}"
    )


def materialized_quantized_ivf_index(spark, sf_dir):
    """Build-once int8-quantized inverted file, DERIVED from the same
    assignment as :func:`materialized_ivf_index` (list membership must
    not drift between the float and quantized branches): (cid, vec_id,
    qvec, scale, qnrm) parquet partitioned by cid under ``.scratch``.
    At 100 TB this is the index actually served — 8× less bytes per
    probed list — with the float index retained corpus-side for
    rescoring tiers."""
    from kaj_query_engine_spark.workload.scale import (
        _SCRATCH,
        _layout_current,
        _layout_token,
        _stamp_layout,
        _tag,
    )

    src = f"{sf_dir}/embeddings.parquet"
    path = str(_SCRATCH / _tag(sf_dir) / "ivf_quantized")
    # the token embeds the FLOAT index's params string (_IVF_PARAMS):
    # this index is derived from that one's assignment, so bumping the
    # float index's version must invalidate the quantized copy too —
    # otherwise it would keep serving the old list membership
    token = _layout_token(src, f"ivfq-from({_IVF_PARAMS}):v1")
    if not _layout_current(token, path):
        _, assigned = materialized_ivf_index(spark, sf_dir)
        qa = S.quantize_vectors(
            assigned.select("vec_id", F.col("c_vec").alias("embedding")),
            "vec_id",
            "embedding",
        )
        qa.join(assigned.select("vec_id", "cid"), "vec_id").write.mode(
            "overwrite"
        ).partitionBy("cid").parquet(path)
        _stamp_layout(token, path)
    return spark.read.parquet(path)


def materialized_ivf_index(spark, sf_dir):
    """Build-once IVF index for the ``embeddings`` fixture: returns
    ``(centroids, assigned)`` read from a parquet materialization under
    ``.scratch`` — ``assigned`` written ``partitionBy(cid)`` so each
    inverted list is its own directory and a probe join reads only the
    probed lists. Rebuilt only when the staleness token says the source
    fixture (or the index params) changed — the same amortization rule
    as q35's layout copies; every later call in the session (and every
    later session over the same fixture) serves from disk.

    The build uses :func:`ivf_build` (the JVM left-fold path) so the
    materialized cosines stay bit-identical to the DuckDB oracle; a
    production pipeline building real indexes would swap in
    :func:`ivf_build_fast` (numpy matmul per Arrow batch) — identical
    contract, last-bit cosine differences.
    """
    from kaj_query_engine_spark.workload.scale import (
        _SCRATCH,
        _layout_current,
        _layout_token,
        _stamp_layout,
        _tag,
    )

    src = f"{sf_dir}/embeddings.parquet"
    base = _SCRATCH / _tag(sf_dir)
    cpath, apath = str(base / "ivf_centroids"), str(base / "ivf_assigned")
    token = _layout_token(src, _IVF_PARAMS)
    if not (_layout_current(token, cpath) and _layout_current(token, apath)):
        cent, assigned = S.ivf_build(
            t(spark, sf_dir, "embeddings"), n_centroids=IVF_CENTROIDS
        )
        cent.write.mode("overwrite").parquet(cpath)
        assigned.write.mode("overwrite").partitionBy("cid").parquet(apath)
        _stamp_layout(token, cpath)
        _stamp_layout(token, apath)
    return spark.read.parquet(cpath), spark.read.parquet(apath)


# the 'incr' branch's held-out class: these vectors are NOT in the
# base index build; they join it through frozen-centroid assignment
_INCR_HOLDOUT_MOD, _INCR_HOLDOUT_REM = 10, 7
_INCR_BASE_WHERE = (
    f"WHERE vec_id % {_INCR_HOLDOUT_MOD} != {_INCR_HOLDOUT_REM}"
)


def materialized_incr_ivf_base(spark, sf_dir):
    """Build-once BASE-corpus IVF index (held-out class excluded) for
    q63's 'incr' branch — same staleness-token amortization as the
    full-corpus index; the per-query work is the INGEST (frozen-
    centroid assignment of the held-out batch) plus the probe."""
    from kaj_query_engine_spark.workload.scale import (
        _SCRATCH,
        _layout_current,
        _layout_token,
        _stamp_layout,
        _tag,
    )

    src = f"{sf_dir}/embeddings.parquet"
    base = _SCRATCH / _tag(sf_dir)
    cpath = str(base / "ivf_incr_centroids")
    apath = str(base / "ivf_incr_assigned")
    token = _layout_token(
        src,
        f"ivf-incr:{IVF_CENTROIDS}:"
        f"holdout{_INCR_HOLDOUT_MOD}r{_INCR_HOLDOUT_REM}:v1",
    )
    if not (_layout_current(token, cpath) and _layout_current(token, apath)):
        corpus = t(spark, sf_dir, "embeddings").filter(
            F.col("vec_id") % _INCR_HOLDOUT_MOD != _INCR_HOLDOUT_REM
        )
        cent, assigned = S.ivf_build(corpus, n_centroids=IVF_CENTROIDS)
        cent.write.mode("overwrite").parquet(cpath)
        assigned.write.mode("overwrite").partitionBy("cid").parquet(apath)
        _stamp_layout(token, cpath)
        _stamp_layout(token, apath)
    return spark.read.parquet(cpath), spark.read.parquet(apath)


def _ivf_oracle_tagged() -> str:
    ivf4, ivf_full = _ivf_oracle(nprobe=IVF_NPROBE), _ivf_oracle(
        nprobe=IVF_CENTROIDS
    )
    quant = _quant_ivf_oracle(IVF_CENTROIDS, IVF_NPROBE)
    resc = _rescored_ivf_oracle(IVF_CENTROIDS, IVF_NPROBE)
    incr = _ivf_oracle(nprobe=IVF_NPROBE, cent_where=_INCR_BASE_WHERE)
    return (
        f"SELECT 'probe4' AS path, * FROM ({ivf4}) "
        f"UNION ALL SELECT 'probe_all' AS path, * FROM ({ivf_full}) "
        f"UNION ALL SELECT 'quant' AS path, * FROM ({quant}) "
        f"UNION ALL SELECT 'rescored' AS path, * FROM ({resc}) "
        f"UNION ALL SELECT 'incr' AS path, * FROM ({incr})"
    )


@register(
    "q63_ann_ivf",
    _ivf_oracle_tagged(),
    "IVF-flat ANN served from a MATERIALIZED index (16 md5-seed-"
    "sampled centroids; assignment parquet partitioned by cid, built "
    "once behind the q35-style staleness token — the O(N*K) build "
    "never runs per query): branch 'probe4' scans the 4 nearest "
    "inverted lists per query, branch 'probe_all' probes every list "
    "(exact search served from the same index, the recall ceiling); "
    "list sizes adapt to the data distribution, and at 100 TB the "
    "cid-partitioned layout means a probe touches only its lists' "
    "directories; branch 'quant' serves the same probes from the "
    "int8-QUANTIZED inverted file (8x smaller lists; scales cancel "
    "in cosine, so scoring is deterministic integer arithmetic — "
    "identical list choice, quantized scores, oracle-exact); branch "
    "'rescored' is the two-tier serving pattern: the quantized tier "
    "proposes 4x overfetched candidates, exact float cosine re-ranks "
    "ONLY those (candidate ids broadcast into one map-only float-"
    "index scan); branch 'incr' is INCREMENTAL INDEX MAINTENANCE — a "
    "held-out tenth of the corpus joins the base-built index through "
    "frozen-centroid assignment (K broadcast cosines per new vector, "
    "the stored index never read or re-clustered — O(batch*K) ingest "
    "regardless of index size) and queries see base+delta unioned; "
    "the oracle trains its centroid CTE on the base subset only",
)
def q63(spark, sf_dir):
    # FUSED probe serving (round-15, guide §2.4 / verdict #5): the five
    # branches used to run five complete ivf_query* pipelines — five
    # index scans and SIX top-k window exchanges (rescored ranks twice).
    # Three fusions, each a pure sharing of identical sub-computations:
    #
    #  (a) probe4 ⊆ probe_all over the SAME float index: rank every
    #      centroid once per query (the identical probe window both
    #      calls ran), scan `assigned` ONCE, and tag each scored pair
    #      'probe_all' always / 'probe4' when its list's crank <=
    #      nprobe — exactly the pair sets the two separate calls
    #      scored, because ivf_query filters probes by crank BEFORE
    #      the list join and changes nothing else.
    #  (b) rescored's tier-1 IS the quant pipeline at k*overfetch:
    #      rank the quantized scores once; rank <= TOP_K rows are the
    #      'quant' branch (row_number over the same deterministic
    #      (desc cos, asc vec_id) order — the k parameter only
    #      filters), rank <= TOP_K*overfetch rows are the rescore
    #      candidates. One quantized-index scan and one tier-1 window
    #      instead of two of each.
    #  (c) every branch's FINAL top-k window shuffled by q_id
    #      separately; tagging the scored pairs and ranking once over
    #      (path, q_id) is the same per-branch ordering (the tag
    #      leads the partition key, so branches never mix) — one
    #      exchange instead of five.
    #
    # Values are pinned branch-per-branch by the oracle (five
    # independent SQL recomputes) and the operator-vs-fused pin test
    # (test_dedup_similarity.py::test_q63_fused_matches_operator_calls).
    from pyspark.sql import Window as W

    from kaj_query_engine_spark.operators.similarity import (
        _dvec,
        dot,
        norm,
        qdot,
        quantize_vectors,
    )

    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES)
    cent, assigned = materialized_ivf_index(spark, sf_dir)
    qidx = materialized_quantized_ivf_index(spark, sf_dir)
    overfetch = 4  # ivf_query_rescored's default, pinned by the oracle

    qe = q.select(
        F.col("vec_id").alias("q_id"), _dvec(F.col("embedding")).alias("q_vec")
    ).withColumn("q_nrm", norm(F.col("q_vec")))
    probe_cos = dot(F.col("q_vec"), F.col("cvec")) / (
        F.col("q_nrm") * F.col("cnrm")
    )
    wq = W.partitionBy("q_id").orderBy(F.desc(probe_cos), F.asc("cid"))
    # (a) one probe ranking over ALL centroids; crank carries the
    # probe4 membership into the single index scan
    probes = (
        qe.crossJoin(F.broadcast(cent))
        .withColumn("crank", F.row_number().over(wq))
        .select("q_id", "q_vec", "q_nrm", "cid", "crank")
    )
    fcos = dot(F.col("q_vec"), F.col("c_vec")) / (
        F.col("q_nrm") * F.col("c_nrm")
    )
    # two-step select: the 64-dim dot materializes as a column BEFORE
    # the generator — Generate re-evaluates its child expressions per
    # OUTPUT element (the q43/clustering lesson), which would run the
    # fold twice for every dual-tagged pair
    scored_f = (
        assigned.join(F.broadcast(probes), "cid")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            F.when(
                F.col("crank") <= IVF_NPROBE,
                F.array(F.lit("probe4"), F.lit("probe_all")),
            )
            .otherwise(F.array(F.lit("probe_all")))
            .alias("_tags"),
            "q_id",
            "vec_id",
            fcos.alias("cos"),
        )
        .select(
            F.explode("_tags").alias("path"), "q_id", "vec_id", "cos"
        )
    )

    # (b) quantized tier once: quant branch + rescore candidates
    qq = quantize_vectors(q.select("vec_id", "embedding"), "vec_id").select(
        F.col("vec_id").alias("q_id"),
        F.col("qvec").alias("q_qvec"),
        F.col("qnrm").alias("q_qnrm"),
    )
    probes_q = (
        probes.filter(F.col("crank") <= IVF_NPROBE)
        .select("q_id", "cid")
        .join(F.broadcast(qq), "q_id")
    )
    qcos = qdot(F.col("q_qvec"), F.col("qvec")).cast("double") / (
        F.col("q_qnrm") * F.col("qnrm")
    )
    wt1 = W.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    ranked_q = (
        qidx.join(F.broadcast(probes_q), "cid")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", qcos.alias("cos"))
        .withColumn("rank", F.row_number().over(wt1))
        .filter(F.col("rank") <= TOP_K * overfetch)
    )
    scored_q = ranked_q.filter(F.col("rank") <= TOP_K).select(
        F.lit("quant").alias("path"), "q_id", "vec_id", "cos"
    )
    cand = ranked_q.select("q_id", "vec_id")
    scored_r = (
        assigned.select("vec_id", "c_vec", "c_nrm")
        .join(F.broadcast(cand), "vec_id")
        .join(F.broadcast(qe), "q_id")
        .select(
            F.lit("rescored").alias("path"),
            "q_id",
            "vec_id",
            fcos.alias("cos"),
        )
    )

    # incr: frozen-centroid delta assignment over the base index —
    # different index, same final-window fusion
    cent_i, assigned_i = materialized_incr_ivf_base(spark, sf_dir)
    batch = e.filter(
        F.col("vec_id") % _INCR_HOLDOUT_MOD == _INCR_HOLDOUT_REM
    )
    delta = S.ivf_assign(cent_i, batch)
    a_i = assigned_i.unionByName(delta.select(*assigned_i.columns))
    probe_cos_i = dot(F.col("q_vec"), F.col("cvec")) / (
        F.col("q_nrm") * F.col("cnrm")
    )
    wq_i = W.partitionBy("q_id").orderBy(F.desc(probe_cos_i), F.asc("cid"))
    probes_i = (
        qe.crossJoin(F.broadcast(cent_i))
        .withColumn("crank", F.row_number().over(wq_i))
        .filter(F.col("crank") <= IVF_NPROBE)
        .select("q_id", "q_vec", "q_nrm", "cid")
    )
    scored_i = (
        a_i.join(F.broadcast(probes_i), "cid")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            F.lit("incr").alias("path"), "q_id", "vec_id", fcos.alias("cos")
        )
    )

    # (c) ONE final top-k exchange for all five branches
    wf = W.partitionBy("path", "q_id").orderBy(
        F.desc("cos"), F.asc("vec_id")
    )
    return (
        scored_f.unionByName(scored_q)
        .unionByName(scored_r)
        .unionByName(scored_i)
        .withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "path", "q_id", "vec_id", "rank", F.round("cos", 6).alias("cos")
        )
    )


def _bucket_expr(v: str, band: list[list[float]]) -> str:
    bits = []
    for plane in band:
        lit = "[" + ", ".join(str(s) for s in plane) + "]::DOUBLE[]"
        bits.append(
            f"CASE WHEN {_DOT_AB.format(a=v, b=lit)} > 0 THEN '1' ELSE '0' END"
        )
    return " || ".join(bits)


def _neardup_oracle(threshold: float) -> str:
    """Mirror of the banded-LSH candidate filter: the oracle scores
    exactly the pairs sharing >= 1 band bucket (the OR-join emits each
    qualifying pair once, so no DISTINCT is needed oracle-side)."""
    bands = S.band_hyperplanes()
    cols = ", ".join(
        f"{_bucket_expr('v', band)} AS b{i}" for i, band in enumerate(bands)
    )
    collide = " OR ".join(f"a.b{i} = b.b{i}" for i in range(len(bands)))
    cos = f"{_DOT_AB.format(a='a.v', b='b.v')} / (a.nrm * b.nrm)"
    return (
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
        f"n AS (SELECT vec_id, v, {_norm('v')} AS nrm, {cols} FROM e) "
        f"SELECT a.vec_id AS i, b.vec_id AS j, round({cos}, 6) AS cos "
        f"FROM n a JOIN n b ON a.vec_id < b.vec_id AND ({collide}) "
        f"WHERE {cos} >= {threshold}"
    )


@register(
    "q62_embedding_neardup",
    _neardup_oracle(0.45),
    "embedding-cosine near-duplicate pairs (threshold 0.45) via banded "
    "sign-LSH candidates + exact in-bucket numpy verification — "
    "sub-quadratic: only colliding pairs are scored; rows_per_band "
    "auto-sizes to the corpus (floor 4, so the oracle's fixed 4x4 "
    "band mirror stays exact for any fixture up to 8192 vectors); "
    "the oracle applies the identical band filter",
)
def q62(spark, sf_dir):
    # default rows_per_band=None → auto-sized; resolves to the oracle's
    # 4×4 banding at every fixture scale (N <= 8192 — see
    # NEARDUP_TARGET_BUCKET). A regenerated fixture outgrowing that
    # bound fails LOUDLY here rather than silently hash-mismatching.
    n = t(spark, sf_dir, "embeddings").count()
    if n > S.NEARDUP_TARGET_BUCKET * 2**S.NEARDUP_ROWS:
        raise ValueError(
            f"q62 oracle mirrors the fixed 4x4 banding, but auto-sizing "
            f"would pick more planes for {n} vectors — regenerate the "
            "oracle SQL for the new banding"
        )
    return S.embedding_neardup_pairs(
        t(spark, sf_dir, "embeddings"), threshold=0.45
    )


# --------------------------------------------------------------------
# q65: hybrid retrieval — integer lexical + exact cosine, RRF-fused
# --------------------------------------------------------------------

Q_DOCS = (0, 100, 200)  # query documents (embeddings aligned by id)
R_SCALE = 10**9
R_K0 = 60
R_K = 10


def _hybrid_oracle() -> str:
    qids = ", ".join(str(q) for q in Q_DOCS)
    cos = (
        f"{_DOT_AB.format(a='q.q_vec', b='e.v')} / (q.q_nrm * {_norm('e.v')})"
    )
    rrf = (
        f"COALESCE({R_SCALE} // ({R_K0} + l.lex_rank), 0) + "
        f"COALESCE({R_SCALE} // ({R_K0} + v.vec_rank), 0)"
    )
    return (
        "WITH toks AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) "
        "AS term FROM documents), "
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2), "
        "posting AS (SELECT DISTINCT doc_id, term FROM toks), "
        "dfreq AS (SELECT term, count(*) AS df FROM posting GROUP BY 1), "
        f"qt AS (SELECT doc_id AS q_id, term FROM posting "
        f"WHERE doc_id IN ({qids})), "
        "lex AS (SELECT qt.q_id, tf.doc_id, "
        f"sum(tf.tf * ({R_SCALE} // dfreq.df)) AS score "
        "FROM qt JOIN tf USING (term) JOIN dfreq USING (term) "
        "WHERE tf.doc_id <> qt.q_id GROUP BY 1, 2), "
        "lexr AS (SELECT q_id, doc_id, CAST(row_number() OVER ("
        "PARTITION BY q_id ORDER BY score DESC, doc_id) AS INT) AS lex_rank "
        f"FROM lex QUALIFY lex_rank <= {R_K}), "
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
        f"q AS (SELECT vec_id AS q_id, v AS q_vec, {_norm('v')} AS q_nrm "
        f"FROM e WHERE vec_id IN ({qids})), "
        f"scored AS (SELECT q.q_id, e.vec_id, {cos} AS c "
        "FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id), "
        "vecr AS (SELECT q_id, vec_id AS doc_id, CAST(row_number() OVER ("
        "PARTITION BY q_id ORDER BY c DESC, vec_id) AS INT) AS vec_rank "
        f"FROM scored QUALIFY vec_rank <= {R_K}) "
        "SELECT COALESCE(l.q_id, v.q_id) AS q_id, "
        "COALESCE(l.doc_id, v.doc_id) AS doc_id, "
        f"CAST({rrf} AS BIGINT) AS rrf, "
        "COALESCE(l.lex_rank, 0) AS lex_rank, "
        "COALESCE(v.vec_rank, 0) AS vec_rank "
        "FROM lexr l FULL OUTER JOIN vecr v "
        "ON l.q_id = v.q_id AND l.doc_id = v.doc_id"
    )


@register(
    "q65_hybrid_retrieval",
    _hybrid_oracle(),
    "hybrid retrieval for 3 query documents: lexical top-10 by "
    "INTEGER rarity-weighted term overlap (tf x (SCALE div df) — no "
    "BM25 logs/floats, so the scores are exact in any engine) fused "
    "with the exact-cosine top-10 (bit-identical doubles via the "
    "index-order fold) through integer reciprocal-rank fusion "
    "(SCALE div (60 + rank)). Rankings, not calibrated scores, cross "
    "the fusion boundary — the whole result hash-matches the oracle "
    "bit-for-bit. One explode + two partial-agg passes for tf/df, "
    "broadcast query terms, per-query windows over posting-bounded "
    "candidates; vector side covers the embedded subset of the corpus",
)
def q65(spark, sf_dir):
    from kaj_query_engine_spark.operators import retrieval as R

    d = t(spark, sf_dir, "documents")
    e = t(spark, sf_dir, "embeddings")
    lex = R.lexical_topk(d, "doc_id", "text", list(Q_DOCS), k=R_K)
    q = e.filter(F.col("vec_id").isin(list(Q_DOCS)))
    vec = S.brute_force_topk(e, q, k=R_K)
    return R.rrf_fuse(lex, vec)


# q91: integer fixed-point k-means — ORACLE-EXACT iterative clustering
# (the PageRank/BPE recipe applied to Lloyd's algorithm: quantize once
# to a shared fixed-point grid, integer squared-L2 distances, argmin
# ties to the smaller centroid index, floor-division centroid means
# via the pmod trick). The oracle unrolls the three Lloyd iterations
# as a CTE chain and must match bit-for-bit.
_KM_K = 8
_KM_T = 3
_KM_SCALE = 10_000
_KM_DIM = 64


def _kmeans_cte() -> str:
    """The shared unrolled-Lloyd WITH-chain (qv quantization, c0 init,
    a{t}/u{t}/c{t} per iteration) up to the final assignment
    ``a{_KM_T}`` — q91's oracle selects cluster checksums from it,
    q12's semantic dedup builds within-cluster pairs on top of it, so
    both mirror the SAME bit-exact clustering."""
    dist = (
        "list_sum(list_transform(range(1, {d}), "
        "i -> (q[i] - c[i]) * (q[i] - c[i])))"
    ).format(d=_KM_DIM + 1)
    parts = [
        "WITH qv AS (SELECT vec_id AS id, list_transform(embedding, "
        f"v -> CAST(floor(CAST(v AS DOUBLE) * {_KM_SCALE}.0 + 0.5) AS BIGINT)"
        ") AS q FROM embeddings), "
        "c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS BIGINT) "
        f"AS j, q AS c FROM (SELECT id, q FROM qv ORDER BY id LIMIT {_KM_K}))"
    ]
    for it in range(1, _KM_T + 1):
        prev = f"c{it - 1}"
        parts.append(
            f"a{it} AS (SELECT id, q, j FROM ("
            f"SELECT qv.id, qv.q, {prev}.j, ROW_NUMBER() OVER ("
            f"PARTITION BY qv.id ORDER BY {dist.replace('c[', prev + '.c[')}"
            f", {prev}.j) AS rn FROM qv, {prev}) WHERE rn = 1)"
        )
        parts.append(
            f"u{it} AS (SELECT j, i, SUM(q[i]) AS s, COUNT(*) AS n "
            f"FROM a{it}, range(1, {_KM_DIM + 1}) r(i) GROUP BY j, i)"
        )
        parts.append(
            f"c{it} AS (SELECT j, list(CAST((s - ((s % n + n) % n)) // n "
            f"AS BIGINT) ORDER BY i) AS c FROM u{it} GROUP BY j "
            f"UNION ALL SELECT j, c FROM {prev} "
            f"WHERE j NOT IN (SELECT DISTINCT j FROM a{it}))"
        )
    return ", ".join(parts)


def _kmeans_oracle() -> str:
    final_a = f"a{_KM_T}"
    final_c = f"c{_KM_T}"
    return (
        _kmeans_cte()
        + f" SELECT {final_a}.j AS cluster, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(id) AS BIGINT) AS id_sum, cs.c_sum "
        f"FROM {final_a} JOIN (SELECT j, CAST(list_sum(c) AS BIGINT) "
        f"AS c_sum FROM {final_c}) cs ON {final_a}.j = cs.j "
        f"GROUP BY {final_a}.j, cs.c_sum"
    )


@register(
    "q91_kmeans_int",
    _kmeans_oracle(),
    "integer fixed-point k-means over the embeddings (Lloyd's "
    f"algorithm, k={_KM_K}, {_KM_T} iterations) — ORACLE-EXACT "
    "iterative clustering, the PageRank/BPE recipe applied to the "
    "training pipeline's data-mix workhorse (topic balancing, domain "
    "discovery, cluster-stratified sampling): vectors quantize once "
    f"to a global 1/{_KM_SCALE} fixed-point grid, distances are "
    "integer squared-L2, ties break to the smaller centroid index, "
    "centroid means are floor divisions via the pmod trick — so the "
    "unrolled-CTE DuckDB oracle reproduces all three iterations "
    "bit-for-bit. Per iteration: one broadcast of the k x dim integer "
    "centroid table against the quantized corpus (map-side distance + "
    "argmin) and one (cluster, dim)-grouped partial-aggregated mean; "
    "driver state is the bounded centroid table, same contract as the "
    "IVF builder",
)
def q91(spark, sf_dir):
    from kaj_query_engine_spark.operators.clustering import kmeans_int

    return kmeans_int(
        t(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        k=_KM_K, iterations=_KM_T, scale=_KM_SCALE,
    )


# q12: SemDeDup — semantic near-duplicate pruning (Abbas et al. 2023,
# arXiv:2303.09540), the fifth dedup family (exact / MinHash / SimHash
# / span / SEMANTIC). Clusters are q91's integer fixed-point k-means
# verbatim (shared CTE chain, bit-exact); the duplicate test is the
# integer squared-cosine comparison dot² · DEN >= NUM · |a|²|b|² on a
# coarser overflow-safe grid, so the whole pipeline — iterative
# clustering included — hash-matches DuckDB.
_SD_SCALE = 512  # 1/512 grid: |q| <= ~300/dim keeps every product in BIGINT
_SD_NUM, _SD_DEN = 49, 400  # cos²θ >= 49/400 i.e. cosine >= 0.35


# Round 13: the DEPLOYMENT knobs (assigned= injection and
# max_cluster_rows skew capping, added round 12) get their own
# driver-checked oracle branches. The capped branch's hash-cell split
# is pmod(xxhash64(id), cells) — Spark's XXH64 (seed 42) over the
# id's 8 little-endian bytes — which DuckDB lacks, so the oracle
# REIMPLEMENTS XXH64-of-int64 in pure SQL: HUGEINT modular
# arithmetic (32-bit-split multiplies keep every product < 2^96),
# UBIGINT xor, staged through lateral column aliases. Verified
# value-identical to F.xxhash64 across the full long range including
# both extremes (tests/test_dedup_similarity.py).
_SD_CAP = 32  # sf0.01 clusters avg ~62 rows -> 2-3 cells; sf0.1 ~8

_XX_M = "18446744073709551616"  # 2^64
_XX_P1 = "11400714785074694791"
_XX_P2 = "14029467366897019727"
_XX_P3 = "1609587929392839161"
_XX_P4 = "9650029242287828579"
_XX_H0 = str((42 + 2870177450012600261 + 8) % 2**64)  # seed+P5+len


def _xx_mulmod(a: str, b: str) -> str:
    """(a*b) mod 2^64 for HUGEINT operands in [0, 2^64)."""
    return (
        f"((({a}) % 4294967296) * (({b}) % 4294967296) + "
        f"(((({a}) % 4294967296) * (({b}) // 4294967296) + "
        f"(({a}) // 4294967296) * (({b}) % 4294967296)) % 4294967296)"
        f" * 4294967296) % {_XX_M}"
    )


def _xx_rotl(x: str, r: int) -> str:
    lo = 2 ** (64 - r)
    return f"((({x}) % {lo}) * {2 ** r} + (({x}) // {lo}))"


def _xx_xor(a: str, b: str) -> str:
    return (
        f"CAST(xor(CAST(({a}) AS UBIGINT), CAST(({b}) AS UBIGINT)) "
        "AS HUGEINT)"
    )


def _xxh64_cte_chain(src: str) -> tuple[str, str]:
    """CTE-chain fragments computing ``xx`` = Spark xxhash64(id)
    (BIGINT, seed 42) for every id in CTE ``src``. Each step is
    MATERIALIZED: chained aliases inline MULTIPLICATIVELY in DuckDB
    (every modular-arithmetic step references its input ~4-8×, so an
    un-materialized 8-step chain explodes past 10^5 expression nodes
    and never finishes — measured, not theoretical). Returns
    (fragment to splice after a leading CTE, final CTE name); the
    final CTE has columns (id, xx)."""
    steps = [
        f"((CAST(id AS HUGEINT) % {_XX_M}) + {_XX_M}) % {_XX_M} AS h",
        _xx_rotl(_xx_mulmod("h", _XX_P2), 31) + " AS h",
        _xx_xor(_XX_H0, _xx_mulmod("h", _XX_P1)) + " AS h",
        f"({_xx_mulmod(_xx_rotl('h', 27), _XX_P1)} + {_XX_P4}) % {_XX_M}"
        " AS h",
        _xx_mulmod(_xx_xor("h", "h // 8589934592"), _XX_P2) + " AS h",
        _xx_mulmod(_xx_xor("h", "h // 536870912"), _XX_P3) + " AS h",
        _xx_xor("h", "h // 4294967296") + " AS h",
    ]
    prev = src
    parts = []
    for i, expr in enumerate(steps):
        name = f"xxs{i}"
        parts.append(
            f"{name} AS MATERIALIZED (SELECT id, {expr} FROM {prev})"
        )
        prev = name
    parts.append(
        "xxh AS (SELECT id, CASE WHEN h >= 9223372036854775808 "
        f"THEN CAST(h - {_XX_M} AS BIGINT) "
        f"ELSE CAST(h AS BIGINT) END AS xx FROM {prev})"
    )
    return ", ".join(parts), "xxh"


def _q12_tagged_oracle() -> str:
    """All three q12 branches through ONE WITH clause: the Lloyd
    chain and the quantized member frame ``m`` are shared
    (MATERIALIZED — DuckDB otherwise re-executes the full unrolled
    k-means once per referencing branch) and only the pair-forming
    differs: 'base'/'assigned' pair within a cluster, 'capped' pairs
    within a (cluster, hash-cell) where cells = ceil(n/_SD_CAP) and
    cell = pmod(xxhash64(id), cells) — dup_pairs/dropped shrink
    accordingly (the documented recall trade), membership counts are
    untouched."""
    qd = (
        "SELECT vec_id AS id, list_transform(embedding, "
        f"v -> CAST(floor(CAST(v AS DOUBLE) * {_SD_SCALE}.0 + 0.5) "
        "AS BIGINT)) AS q FROM embeddings"
    )

    def agg(dups: str, drp: str, res: str) -> str:
        """Per-cluster rollup CTE ``res`` from a duplicate-pair CTE."""
        return (
            f"{drp} AS (SELECT DISTINCT j, idb AS id FROM {dups}), "
            f"{res} AS (SELECT mm.j AS cluster, mm.n, "
            "CAST(COALESCE(pp.dup_pairs, 0) AS BIGINT) AS dup_pairs, "
            "CAST(COALESCE(dd.dropped, 0) AS BIGINT) AS dropped, "
            "CAST(COALESCE(ss.survivor_id_sum, 0) AS BIGINT) "
            "AS survivor_id_sum "
            "FROM (SELECT j, CAST(count(*) AS BIGINT) AS n FROM m "
            "GROUP BY j) mm "
            f"LEFT JOIN (SELECT j, count(*) AS dup_pairs FROM {dups} "
            "GROUP BY j) pp ON mm.j = pp.j "
            f"LEFT JOIN (SELECT j, count(*) AS dropped FROM {drp} "
            "GROUP BY j) dd ON mm.j = dd.j "
            "LEFT JOIN (SELECT m.j, sum(m.id) AS survivor_id_sum FROM m "
            f"LEFT JOIN {drp} ON m.j = {drp}.j AND m.id = {drp}.id "
            f"WHERE {drp}.id IS NULL GROUP BY m.j) ss ON mm.j = ss.j)"
        )

    dot = (
        f"list_sum(list_transform(range(1, {_KM_DIM + 1}), "
        "i -> x.q[i]*y.q[i]))"
    )
    dup_test = f"dot > 0 AND dot*dot*{_SD_DEN} >= {_SD_NUM}*na2*nb2"
    return (
        _kmeans_cte()
        + f", qd AS ({qd})"
        ", m AS MATERIALIZED (SELECT a.id, a.j, qd.q, "
        "list_sum(list_transform(qd.q, x -> x*x)) AS n2 "
        f"FROM a{_KM_T} a JOIN qd ON a.id = qd.id)"
        # ---- base pairing: within a cluster --------------------------
        f", pb AS (SELECT x.j, x.id AS ida, y.id AS idb, {dot} AS dot, "
        "x.n2 AS na2, y.n2 AS nb2 "
        "FROM m x JOIN m y ON x.j = y.j AND x.id < y.id), "
        f"db AS (SELECT j, ida, idb FROM pb WHERE {dup_test}), "
        + agg("db", "drpb", "resb")
        # ---- capped pairing: within a (cluster, hash cell) -----------
        + ", cnt AS (SELECT j, GREATEST(1, CAST(CEIL(count(*) / "
        f"{_SD_CAP}.0) AS BIGINT)) AS cells FROM m GROUP BY j)"
        ", ids AS (SELECT id FROM m), "
        + _xxh64_cte_chain("ids")[0]
        + ", cm AS (SELECT m.j, m.id, m.q, m.n2, "
        "((xxh.xx % cnt.cells) + cnt.cells) % cnt.cells AS cell "
        "FROM m JOIN xxh ON m.id = xxh.id "
        "JOIN cnt ON m.j = cnt.j)"
        f", pc AS (SELECT x.j, x.id AS ida, y.id AS idb, {dot} AS dot, "
        "x.n2 AS na2, y.n2 AS nb2 "
        "FROM cm x JOIN cm y ON x.j = y.j AND x.cell = y.cell "
        "AND x.id < y.id), "
        f"dc AS (SELECT j, ida, idb FROM pc WHERE {dup_test}), "
        + agg("dc", "drpc", "resc")
        # ---- tagged union: 'assigned' must equal 'base' exactly ------
        + " SELECT 'base' AS path, * FROM resb"
        " UNION ALL SELECT 'assigned' AS path, * FROM resb"
        " UNION ALL SELECT 'capped' AS path, * FROM resc"
    )


_Q12_ORACLE = _q12_tagged_oracle()


@register(
    "q12_semantic_dedup",
    _Q12_ORACLE,
    "SemDeDup (Abbas et al. 2023) over the embeddings, all three "
    "deployment shapes tagged in one result: 'base' = k-means cluster "
    f"the embedding space (q91's integer fixed-point Lloyd, k={_KM_K}, "
    f"{_KM_T} iterations, shared CTE chain — bit-exact), then pairwise "
    "cosine WITHIN clusters only — sub-quadratic by construction — "
    "dropping the larger id of every pair with "
    f"cos² >= {_SD_NUM}/{_SD_DEN}, tested as ONE integer comparison "
    "dot²·DEN >= NUM·|a|²|b|² on a coarser overflow-safe grid. "
    "'assigned' = the 100 TB path: the cluster assignment is built "
    "ONCE upstream (the paper's deployment regime — assignment as "
    "pipeline infrastructure, amortized like the IVF index) and "
    "INJECTED via assigned=; result must equal 'base' exactly — the "
    "internal-vs-injected Lloyd differential is pinned in pytest "
    "(test_dedup_similarity.py::test_semantic_dedup_injected_"
    "assignment_and_pair_cap) so the bench serves BOTH tags from the "
    "one shared persisted assignment (round-14 trim: one Lloyd run, "
    "not two). "
    f"'capped' = max_cluster_rows={_SD_CAP}: oversized clusters "
    "deterministically sub-split into ceil(n/cap) hash cells via "
    "pmod(xxhash64(id), cells) and pairs form within a cell only — "
    "bounded worst-case pair work under total clustering skew; the "
    "oracle reimplements Spark's XXH64(seed 42) in pure SQL (HUGEINT "
    "modular arithmetic) so the recall trade is hash-pinned, not "
    "approximated. One shuffle on (cluster, cell) for the pair join; "
    "dot/norm folds are JVM-side zip_with/aggregate",
)
def q12(spark, sf_dir):
    from kaj_query_engine_spark.operators.clustering import (
        kmeans_assign_int,
    )
    from kaj_query_engine_spark.operators.dedup import (
        _semantic_dedup_variants,
    )

    emb = t(spark, sf_dir, "embeddings")
    kw = dict(
        k=_KM_K, iterations=_KM_T, cluster_scale=_KM_SCALE,
        dedup_scale=_SD_SCALE, thr_num=_SD_NUM, thr_den=_SD_DEN,
    )
    # ONE build-once assignment shared by all three branches (round-14
    # trim: the 'base' tag used to run semantic_dedup's INTERNAL Lloyd
    # as a live internal==injected differential, doubling the Lloyd
    # cost at bench time; that differential is pinned in pytest on
    # cheap data — test_semantic_dedup_injected_assignment_and_pair_cap
    # asserts inj == base — and
    # the oracle's base/assigned tags both read the same resb CTE, so
    # serving both from the shared assignment changes nothing the
    # driver hashes). Persisted: its lineage is the full iterative
    # Lloyd run — same contract as inside semantic_dedup itself;
    # reclaimed by the bench driver's per-query clearCache().
    # final_centroids=False (round-15, §2.4): q12 consumes only the
    # assignment; the last iteration's centroid-update job (posexplode
    # + groupBy + collect over the whole corpus) fed nothing
    pa, _q, _cents = kmeans_assign_int(
        emb, "vec_id", "embedding", _KM_K, _KM_T, _KM_SCALE,
        final_centroids=False,
    )
    pa = pa.persist()
    # base + capped through ONE fused plan (round-14, guide §2.4): the
    # member frame, the within-(cluster, cell) pair join and the
    # rollup each execute once for both variants instead of once per
    # semantic_dedup call — per-variant rows are bit-identical to the
    # separate calls (the variant tag leads the join key, so pairs
    # never cross it)
    rollup = _semantic_dedup_variants(
        emb, "vec_id", "embedding", assigned=pa,
        variants=[("base", None), ("capped", _SD_CAP)], **kw
    )
    # 'base' and 'assigned' are the SAME frame by construction (the
    # differential is pytest-pinned; the oracle reads one resb CTE for
    # both tags) — explode the two tags onto the one computed variant
    # rather than unioning the frame with itself (row order is
    # irrelevant to the driver's order-insensitive hash)
    return rollup.select(
        F.explode(
            F.when(
                F.col("_variant") == "base",
                F.array(F.lit("base"), F.lit("assigned")),
            ).otherwise(F.array(F.lit("capped")))
        ).alias("path"),
        "cluster",
        "n",
        "dup_pairs",
        "dropped",
        "survivor_id_sum",
    )
