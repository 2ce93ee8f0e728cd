"""Deduplication workload over ``documents`` — exact, MinHash+LSH,
SimHash, n-gram Jaccard (north-star extensions; no reference
counterpart). Oracle SQL is generated from the same parameters as the
Spark operators so the two stay in lockstep.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kaj_query_engine_spark.operators import dedup as D
from kaj_query_engine_spark.workload.core import FP_SQL, t
from kaj_query_engine_spark.workload.registry import register

_SHINGLES = (
    "list_distinct(CASE WHEN len(w) >= 3 THEN "
    "list_transform(generate_series(1, len(w) - 2), "
    "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) "
    "ELSE CAST([] AS VARCHAR[]) END)"
)
_WORDS = "SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents"
_SH_CTE = (
    f"WITH words AS ({_WORDS}), "
    f"sh AS (SELECT doc_id, unnest({_SHINGLES}) AS sh FROM words)"
)

# df-cut for q52's 'capped' branch: small enough that the sf0.01
# fixture (max shingle df = 7) actually drops shingles, so the
# oracle exercises the reduced-universe semantics for real
_CAP_DF = 5


@register(
    "q50_dedup_exact",
    "WITH g AS (SELECT min(doc_id) AS doc_id, count(*) AS n FROM documents "
    f"GROUP BY {FP_SQL.format(col='text')}) "
    "SELECT d.doc_id, d.lang, d.source, d.n_chars, g.n FROM documents d "
    "JOIN g USING (doc_id)",
    "exact dedup end-to-end: hash-groupBy on the content fingerprint "
    "(one shuffle on the 16-byte digest; map-side partial agg) → keep "
    "the min-id representative per group → join back to materialize "
    "the surviving documents with their duplicate count",
)
def q50(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    keep = D.exact_duplicates(d, "doc_id", "text").select(
        F.col("keep_id").alias("doc_id"), "n"
    )
    return d.join(keep, "doc_id").select("doc_id", "lang", "source", "n_chars", "n")


def _minhash_cand_ctes() -> str:
    """The MinHash+LSH candidate-pair CTE chain (everything after
    ``_SH_CTE``), ending in ``cand(d1, d2)`` — shared between the
    standalone q51 oracle and the composed verify branch of q52."""
    k, b, r = D.NUM_HASHES, D.NUM_BANDS, D.ROWS_PER_BAND
    base = "('0x' || substr(md5(sh), 1, 15))::BIGINT"
    sig_cols = ", ".join(
        f"min(xor({base}, {salt})) AS s{i}"
        for i, salt in enumerate(D.minhash_salts(k))
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({key}) AS key FROM sig".format(
            b=i,
            key=" || '|' || ".join(
                f"CAST(s{i * r + j} AS VARCHAR)" for j in range(r)
            ),
        )
        for i in range(b)
    )
    return (
        f"sig AS (SELECT doc_id, {sig_cols} FROM sh GROUP BY doc_id), "
        f"bands AS ({band_selects}), "
        "width AS (SELECT band, key, count(*) AS w FROM bands GROUP BY 1, 2), "
        "cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2 "
        "FROM bands a JOIN bands b "
        "ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id "
        "JOIN width w ON a.band = w.band AND a.key = w.key "
        f"AND w.w <= {D.MAX_BUCKET})"
    )


def _minhash_pairs_sql() -> str:
    """The plain whole-corpus candidate-pair query — q54's transitive-
    closure oracle embeds this inside ``WITH RECURSIVE pairs AS (...)``,
    where a top-level UNION ALL would be (mis)read as a recursive CTE
    definition, so it must stay union-free."""
    return f"{_SH_CTE}, {_minhash_cand_ctes()} SELECT d1, d2 FROM cand"


def _minhash_oracle() -> str:
    # 'incr' is definitionally the full candidate set restricted to
    # pairs involving a batch doc (doc_id % 5 = 0) — the Spark side
    # computes it NEVER touching the old docs' text (materialized
    # band-bucket index), and the equality of the two constructions is
    # what the hash check proves
    return (
        f"{_SH_CTE}, {_minhash_cand_ctes()} "
        "SELECT 'all' AS path, d1, d2 FROM cand "
        "UNION ALL SELECT 'incr' AS path, d1, d2 FROM cand "
        "WHERE d1 % 5 = 0 OR d2 % 5 = 0"
    )


def materialized_band_index(spark, sf_dir):
    """Build-once LSH band-bucket index over the OLD docs (doc_id
    % 5 != 0) — parquet under ``.scratch`` behind the q35-style
    staleness token, so the corpus-side signature compute runs once
    per fixture generation and every batch thereafter probes it from
    disk (the q63 materialized-IVF amortization, applied to dedup)."""
    from kaj_query_engine_spark.workload.scale import (
        _SCRATCH,
        _layout_current,
        _layout_token,
        _stamp_layout,
        _tag,
    )

    src = f"{sf_dir}/documents.parquet"
    path = str(_SCRATCH / _tag(sf_dir) / "band_index")
    token = _layout_token(
        src,
        f"bands:{D.NUM_HASHES}:{D.NUM_BANDS}:{D.MAX_BUCKET}:split5:v1",
    )
    if not _layout_current(token, path):
        old = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 != 0)
        D.band_bucket_index(old, "doc_id", "text").write.mode(
            "overwrite"
        ).parquet(path)
        _stamp_layout(token, path)
    return spark.read.parquet(path)


def materialized_fp_index(spark, sf_dir):
    """Build-once exact-dedup fingerprint index over the OLD docs
    (doc_id % 5 != 0): the :func:`operators.dedup.exact_duplicates`
    output (h, n, keep_id) as parquet under ``.scratch`` behind the
    staleness token — the exact-layer sibling of
    :func:`materialized_band_index`, shared by the batch probe
    operator and the streaming corpus filter (q82's 'docs' branch)."""
    from kaj_query_engine_spark.workload.scale import (
        _SCRATCH,
        _layout_current,
        _layout_token,
        _stamp_layout,
        _tag,
    )

    src = f"{sf_dir}/documents.parquet"
    path = str(_SCRATCH / _tag(sf_dir) / "fp_index")
    token = _layout_token(src, "fp:split5:v1")
    if not _layout_current(token, path):
        old = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 != 0)
        D.exact_duplicates(old, "doc_id", "text").write.mode(
            "overwrite"
        ).parquet(path)
        _stamp_layout(token, path)
    return spark.read.parquet(path)


@register(
    "q51_minhash_lsh",
    _minhash_oracle(),
    "MinHash (one md5 per shingle, 12 XOR-permutation min-hashes) + "
    "LSH banding (4 bands x 3) with the junk-cluster bucket-width cap "
    f"(<= {D.MAX_BUCKET} docs/bucket). Branch 'all': candidate "
    "near-dup pairs over the whole corpus, no all-pairs comparison. "
    "Branch 'incr': the incremental-ingest path — docs with doc_id % "
    "5 = 0 play an incoming crawl batch, deduped against the rest of "
    "the corpus via its MATERIALIZED band-bucket index (built once "
    "behind the staleness token; over-wide buckets tombstoned so the "
    "junk cap stays exact on combined width) — one map-only corpus "
    "scan, zero corpus recompute, everything else batch-bounded",
)
def q51(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    full = D.minhash_lsh_candidates(d, "doc_id", "text")
    incr = D.incremental_lsh_candidates(
        materialized_band_index(spark, sf_dir),
        d.filter(F.col("doc_id") % 5 == 0),
        "doc_id",
        "text",
    )
    return full.select(F.lit("all").alias("path"), "d1", "d2").unionAll(
        incr.select(F.lit("incr").alias("path"), "d1", "d2")
    )


@register(
    "q52_ngram_jaccard",
    f"{_SH_CTE}, {_minhash_cand_ctes()}, "
    "cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1), "
    "pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common "
    "FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2), "
    "allp AS (SELECT d1, d2, common * 1.0 / (c1.n_sh + c2.n_sh - common) AS jaccard "
    "FROM pairs JOIN cnt c1 ON d1 = c1.doc_id JOIN cnt c2 ON d2 = c2.doc_id "
    "WHERE common * 1.0 / (c1.n_sh + c2.n_sh - common) >= 0.4), "
    "vcommon AS (SELECT c.d1, c.d2, count(*) AS common FROM cand c "
    "JOIN sh a ON a.doc_id = c.d1 JOIN sh b ON b.doc_id = c.d2 AND b.sh = a.sh "
    "GROUP BY 1, 2), "
    "ver AS (SELECT d1, d2, common * 1.0 / (c1.n_sh + c2.n_sh - common) AS jaccard "
    "FROM vcommon JOIN cnt c1 ON d1 = c1.doc_id JOIN cnt c2 ON d2 = c2.doc_id "
    "WHERE common * 1.0 / (c1.n_sh + c2.n_sh - common) >= 0.4), "
    f"shc AS (SELECT doc_id, sh FROM sh QUALIFY count(*) OVER (PARTITION BY sh) <= {_CAP_DF}), "
    "cntc AS (SELECT doc_id, count(*) AS n_sh FROM shc GROUP BY 1), "
    "pairsc AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common "
    "FROM shc a JOIN shc b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2), "
    "capp AS (SELECT d1, d2, common * 1.0 / (c1.n_sh + c2.n_sh - common) AS jaccard "
    "FROM pairsc JOIN cntc c1 ON d1 = c1.doc_id JOIN cntc c2 ON d2 = c2.doc_id "
    "WHERE common * 1.0 / (c1.n_sh + c2.n_sh - common) >= 0.4) "
    "SELECT 'all' AS path, * FROM allp "
    "UNION ALL SELECT 'pipeline' AS path, * FROM ver "
    "UNION ALL SELECT 'capped' AS path, * FROM capp",
    "exact 3-gram Jaccard pairs >= 0.4, three tagged branches: 'all' "
    "is the inverted-index exact verifier over the whole corpus "
    "(ground truth; above-linear on vocabulary-saturating corpora — "
    "guarded by an executor-side df-budget tripwire), 'pipeline' is "
    "the 100 TB composition — MinHash+LSH candidates verified exactly "
    "per pair (two equi-join probes + one array intersection per "
    "candidate; O(candidates), never all-pairs) — and 'capped' is the "
    f"df-cut variant (Jaccard over shingles with doc-freq <= {_CAP_DF}"
    "; bounds the bucket explosion, standard stopword-cut semantics). "
    "Raw int/int division — bit-identical across engines, no rounding",
)
def q52(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    allp = D.ngram_jaccard_pairs(d, "doc_id", "text", threshold=0.4)
    cand = D.minhash_lsh_candidates(d, "doc_id", "text")
    ver = D.verify_candidate_pairs(d, cand, "doc_id", "text", threshold=0.4)
    capped = D.ngram_jaccard_pairs(
        d, "doc_id", "text", threshold=0.4, max_df=_CAP_DF
    )
    return (
        allp.select(F.lit("all").alias("path"), "*")
        .unionAll(ver.select(F.lit("pipeline").alias("path"), "*"))
        .unionAll(capped.select(F.lit("capped").alias("path"), "*"))
    )


@register(
    "q54_dedup_clusters",
    f"WITH RECURSIVE pairs AS ({_minhash_pairs_sql()}), "
    "edges AS (SELECT d1 AS a, d2 AS b FROM pairs "
    "UNION SELECT d2, d1 FROM pairs), "
    "reach AS (SELECT a, b FROM edges "
    "UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a) "
    "SELECT a AS id, least(a, min(b)) AS cluster FROM reach "
    "WHERE a <> b GROUP BY a",
    "near-dup clusters: iterative min-label propagation (connected "
    "components) over the MinHash candidate pairs — the Pregel-lite "
    "DataFrame loop; oracle = recursive-CTE transitive closure",
)
def q54(spark, sf_dir):
    pairs = D.minhash_lsh_candidates(t(spark, sf_dir, "documents"), "doc_id", "text")
    return D.cluster_duplicates(pairs)


def _simhash_oracle(bits: int = 32) -> str:
    hi = "('8','9','a','b','c','d','e','f')"
    votes = ", ".join(
        f"sum(CASE WHEN substr(md5(tok), {i + 1}, 1) IN {hi} "
        f"THEN 1 ELSE -1 END) AS v{i}"
        for i in range(bits)
    )
    chars = " || ".join(
        f"CASE WHEN v{i} > 0 THEN '1' ELSE '0' END" for i in range(bits)
    )
    return (
        "WITH tok AS (SELECT doc_id, "
        "unnest(list_distinct(string_split(trim(text), ' '))) AS tok "
        "FROM documents), "
        f"votes AS (SELECT doc_id, {votes} FROM tok GROUP BY doc_id) "
        f"SELECT doc_id AS id, {chars} AS simhash FROM votes"
    )


@register(
    "q53_simhash",
    _simhash_oracle(),
    "32-bit SimHash fingerprints: per-bit majority vote over md5 "
    "nibbles of distinct tokens (linear, join-free)",
)
def q53(spark, sf_dir):
    return D.simhash_fingerprints(t(spark, sf_dir, "documents"), "doc_id", "text")


# --------------------------------------------------------------------
# q64: integer fixed-point PageRank over the candidate graph
# --------------------------------------------------------------------

def _pagerank_oracle(iterations: int = 4) -> str:
    """The pagerank_int recurrence unrolled as chained CTEs — exact
    integer arithmetic makes an ITERATIVE NUMERIC algorithm
    hash-checkable across engines (float PageRank never is: neighbor
    sums reassociate per engine/partitioning and drift compounds)."""
    from kaj_query_engine_spark.operators.graph import DAMPING_PCT, SCALE

    d = DAMPING_PCT
    ctes = [
        f"e AS (SELECT d1 AS a, d2 AS b FROM pairs "
        f"UNION ALL SELECT d2, d1 FROM pairs)",
        "deg AS (SELECT a, count(*) AS d FROM e GROUP BY 1)",
        "nn AS (SELECT count(*) AS cnt FROM deg)",
        f"consts AS (SELECT {SCALE} // cnt AS init, "
        f"({100 - d} * ({SCALE} // cnt)) // 100 AS base FROM nn)",
        "r0 AS (SELECT a AS id, (SELECT init FROM consts) AS rank FROM deg)",
    ]
    for i in range(1, iterations + 1):
        p = f"r{i - 1}"
        ctes.append(
            f"r{i} AS (SELECT n.id, (SELECT base FROM consts) + "
            f"({d} * COALESCE(s.c, 0)) // 100 AS rank "
            f"FROM r0 n LEFT JOIN (SELECT e.b AS id, "
            f"sum(r.rank // dg.d) AS c FROM {p} r "
            f"JOIN e ON e.a = r.id JOIN deg dg ON dg.a = r.id "
            f"GROUP BY 1) s ON s.id = n.id)"
        )
    return (
        f"{_SH_CTE}, {_minhash_cand_ctes()}, "
        "pairs AS (SELECT d1, d2 FROM cand), "
        + ", ".join(ctes)
        + f" SELECT id AS doc_id, CAST(rank AS BIGINT) AS rank FROM r{iterations}"
    )


@register(
    "q64_pagerank",
    _pagerank_oracle(),
    "document-authority scoring: integer fixed-point PageRank (4 "
    "iterations, damping 85/100, SCALE=1e12 micro-rank units) over "
    "the symmetrized MinHash candidate graph — floor-division "
    "fixed-point makes an ITERATIVE NUMERIC algorithm hash-exact "
    "across engines (float PageRank is not oracle-checkable: "
    "neighbor-sum reassociation drift compounds per iteration). "
    "Pregel-lite shape: edges/degrees persisted once, one equi-join "
    "+ one partial-agg groupBy per iteration, localCheckpoint bounds "
    "lineage, zero driver-side data movement",
)
def q64(spark, sf_dir):
    from kaj_query_engine_spark.operators.graph import pagerank_int

    pairs = D.minhash_lsh_candidates(
        t(spark, sf_dir, "documents"), "doc_id", "text"
    )
    edges = pairs.select(
        F.col("d1").alias("src"), F.col("d2").alias("dst")
    ).unionByName(
        pairs.select(F.col("d2").alias("src"), F.col("d1").alias("dst"))
    )
    return pagerank_int(edges, iterations=4).withColumnRenamed("id", "doc_id")


# q68: span-level exact-substring dedup (ExactSubstr, Lee et al. 2022)
# — duplicated k-gram positions merged into maximal islands. The
# oracle mirrors the relational reformulation arm-for-arm: positional
# grams (NOT distinct — within-doc repetition counts), a corpus-wide
# window count as the duplicate test, and the classic island merge.
_SPAN_K = 8
_SPAN_ORACLE = (
    "WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t "
    "FROM documents), "
    "g0 AS (SELECT doc_id, unnest(list_transform("
    f"range(1, len(t) - {_SPAN_K - 2}), "
    "i -> {'pos': i - 1, "
    f"'gram': array_to_string(t[i:i+{_SPAN_K - 1}], ' ')}})) AS u "
    f"FROM toks WHERE len(t) >= {_SPAN_K}), "
    "g AS (SELECT doc_id, u.pos AS pos, u.gram AS gram FROM g0), "
    "d AS (SELECT doc_id, pos FROM (SELECT doc_id, pos, "
    "count(*) OVER (PARTITION BY gram) AS c FROM g) WHERE c >= 2), "
    "i AS (SELECT doc_id, pos, CASE WHEN pos > COALESCE("
    f"max(pos + {_SPAN_K}) OVER (PARTITION BY doc_id ORDER BY pos "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) "
    "THEN 1 ELSE 0 END AS st FROM d), "
    "isl AS (SELECT doc_id, pos, SUM(st) OVER (PARTITION BY doc_id "
    "ORDER BY pos ROWS UNBOUNDED PRECEDING) AS gid FROM i) "
    "SELECT doc_id AS id, CAST(MIN(pos) AS INT) AS span_start, "
    f"CAST(MAX(pos) + {_SPAN_K} AS INT) AS span_end, "
    "CAST(COUNT(*) AS INT) AS n_positions "
    "FROM isl GROUP BY doc_id, gid"
)


@register(
    "q68_span_dedup",
    f"SELECT 'exact' AS path, * FROM ({_SPAN_ORACLE}) "
    f"UNION ALL SELECT 'hashed' AS path, * FROM ({_SPAN_ORACLE})",
    "span-level exact-substring dedup (the ExactSubstr shape of Lee "
    f"et al. 2022, relationally): every {_SPAN_K}-token gram position "
    "occurring 2+ times ANYWHERE in the corpus is flagged — "
    "positional grams, not distinct, so within-doc repetition counts "
    "— and overlapping/adjacent flagged windows merge into maximal "
    "per-doc islands [span_start, span_end) the trainer cuts. TWO "
    "shuffles: a corpus-wide window count over the gram (the suffix "
    "array's role, played by a sort) and the per-doc island merge; "
    "hot boilerplate grams ride AQE's skew split. The 'hashed' branch "
    "is the 100 TB shuffle payload (hash_grams=True: xxhash64 of the "
    "gram, 8 fixed bytes instead of the ~50-byte string) checked "
    "against the SAME island oracle — the duplicate test must come "
    "out identical (probe: e=0.18 vs 0.32 exact at 16x)",
)
def q68(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")

    def branch(tag, hashed):
        return D.duplicated_spans(
            docs, "doc_id", "text", k=_SPAN_K, hash_grams=hashed
        ).select(F.lit(tag).alias("path"), "*")

    return branch("exact", False).unionAll(branch("hashed", True))


# q69: span-level benchmark decontamination — the q68 machinery with
# the duplicate test swapped for membership in the BENCHMARK gram set
# (docs with doc_id % 17 = 0 play the eval set; the corpus is the
# rest). The oracle reuses q68's positional-gram + island SQL with an
# EXISTS membership test instead of the corpus-wide window count.
def _decon_oracle(k: int) -> str:
    return (
        "WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t "
        "FROM documents), "
        "g0 AS (SELECT doc_id, unnest(list_transform("
        f"range(1, len(t) - {k - 2}), "
        "i -> {'pos': i - 1, "
        f"'gram': array_to_string(t[i:i+{k - 1}], ' ')}})) AS u "
        f"FROM toks WHERE len(t) >= {k}), "
        "g AS (SELECT doc_id, u.pos AS pos, u.gram AS gram FROM g0), "
        "bg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 17 = 0), "
        "d AS (SELECT doc_id, pos FROM g WHERE doc_id % 17 != 0 "
        "AND gram IN (SELECT gram FROM bg)), "
        "i AS (SELECT doc_id, pos, CASE WHEN pos > COALESCE("
        f"max(pos + {k}) OVER (PARTITION BY doc_id ORDER BY pos "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) "
        "THEN 1 ELSE 0 END AS st FROM d), "
        "isl AS (SELECT doc_id, pos, SUM(st) OVER (PARTITION BY doc_id "
        "ORDER BY pos ROWS UNBOUNDED PRECEDING) AS gid FROM i) "
        "SELECT doc_id AS id, CAST(MIN(pos) AS INT) AS span_start, "
        f"CAST(MAX(pos) + {k} AS INT) AS span_end, "
        "CAST(COUNT(*) AS INT) AS n_positions "
        "FROM isl GROUP BY doc_id, gid"
    )


@register(
    "q69_span_decontaminate",
    f"SELECT 'exact' AS path, * FROM ({_decon_oracle(_SPAN_K)}) "
    f"UNION ALL SELECT 'hashed' AS path, * FROM ({_decon_oracle(_SPAN_K)}) "
    f"UNION ALL SELECT 'k4' AS path, * FROM ({_decon_oracle(4)})",
    "span-level benchmark decontamination (the GPT-3 appendix-C / "
    "Lee et al. production shape, span-exact where q48's bloom "
    f"decontaminator is doc-level): every corpus {_SPAN_K}-token gram "
    "position found in the BENCHMARK gram set (docs with doc_id % 17 "
    "= 0 play the eval set) is flagged and merged into maximal "
    "per-doc islands the trainer cuts — cutting the island keeps the "
    "rest of the document. Scale shape BEATS q68: the benchmark gram "
    "set is small by construction, so the membership test is a "
    "BROADCAST left-semi join and the corpus-side plan is MAP-ONLY "
    "(no corpus-wide gram shuffle); the per-doc island sort is the "
    "only exchange. The 'hashed' branch broadcasts xxhash64 digests "
    "(8 bytes/gram — a 1M-gram benchmark fits in 8 MB; a collision "
    "only widens a cut, never leaks contamination) against the SAME "
    "island oracle; 'k4' re-runs at gram width 4 (aggressive eval "
    "protection — many more docs flagged on the fixture corpus), "
    "pinning the k-parametrization",
)
def q69(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    corpus = docs.filter(F.col("doc_id") % 17 != 0)

    def branch(tag, k, hashed):
        return D.contaminated_spans(
            corpus, bench, "doc_id", "text", k=k, hash_grams=hashed
        ).select(F.lit(tag).alias("path"), "*")

    return (
        branch("exact", _SPAN_K, False)
        .unionAll(branch("hashed", _SPAN_K, True))
        .unionAll(branch("k4", 4, False))
    )
