"""Text-analysis workload over the ``documents`` table — language ID,
quality scoring, token statistics, fingerprinting (north-star
extensions; no reference counterpart).

Oracle notes: ratios are raw int/int doubles (bit-identical across
engines — a single IEEE division), so no rounding is applied except
where the operator contract itself rounds (quality_score).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kaj_query_engine_spark.functions import text as TXT
from kaj_query_engine_spark.workload.core import t
from kaj_query_engine_spark.workload.registry import register

_SW = ", ".join(f"'{w}'" for w in TXT.EN_STOPWORDS)

# shared oracle fragments (DuckDB)
_TOKS = "string_split(trim(text), ' ')"
_NTOK = f"len({_TOKS})"
_NSTOP = f"len(list_filter({_TOKS}, x -> list_contains([{_SW}], x)))"
_AVGLEN = f"list_sum(list_transform({_TOKS}, x -> length(x))) * 1.0 / {_NTOK}"
_RATIO = f"({_NSTOP} * 1.0 / {_NTOK})"


@register(
    "q40_text_stats",
    "SELECT doc_id, "
    f"CAST({_NTOK} AS INT) AS n_tokens, "
    "CAST(length(text) AS INT) AS n_chars, "
    f"CAST(list_sum(list_transform({_TOKS}, x -> length(x))) AS INT) "
    "* 1.0 / "
    f"CAST({_NTOK} AS INT) AS avg_token_len, "
    f"{_NSTOP} * 1.0 / {_NTOK} AS stop_ratio, "
    "CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS INT) AS n_punct "
    "FROM documents",
    "per-document token statistics (token count, char count, avg token "
    "length, stopword ratio, punctuation count) — all JVM-side exprs",
)
def q40(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    txt = F.col("text")
    return d.select(
        "doc_id",
        TXT.token_count(txt).alias("n_tokens"),
        TXT.char_count(txt).alias("n_chars"),
        TXT.avg_token_len(txt).alias("avg_token_len"),
        TXT.stopword_ratio(txt).alias("stop_ratio"),
        TXT.punct_count(txt).alias("n_punct"),
    )


@register(
    "q41_lang_guess",
    "SELECT CASE "
    f"WHEN {_RATIO} >= 0.10 THEN 'en' "
    f"WHEN {_RATIO} >= 0.04 THEN 'mixed' "
    "ELSE 'other' END AS lang_pred, count(*) AS n "
    "FROM documents GROUP BY 1",
    "stopword-density language heuristic + distribution",
)
def q41(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return (
        d.select(TXT.lang_guess(F.col("text")).alias("lang_pred"))
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q42_quality_score",
    "SELECT doc_id, round("
    f"least(1.0, {_NTOK} * 1.0 / 50.0) * 0.4 + {_RATIO} * 0.3 + "
    f"least(1.0, ({_AVGLEN}) / 8.0) * 0.3, 6) AS quality "
    "FROM documents WHERE "
    f"(least(1.0, {_NTOK} * 1.0 / 50.0) * 0.4 + {_RATIO} * 0.3 + "
    f"least(1.0, ({_AVGLEN}) / 8.0) * 0.3) >= 0.5",
    "composite quality score + threshold filter (the keep/drop gate of "
    "a training-data pipeline)",
)
def q42(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    txt = F.col("text")
    n_tok = TXT.token_count(txt).cast("double")
    raw = (
        F.least(F.lit(1.0), n_tok / F.lit(50.0)) * 0.4
        + TXT.stopword_ratio(txt) * 0.3
        + F.least(F.lit(1.0), TXT.avg_token_len(txt) / F.lit(8.0)) * 0.3
    )
    return d.filter(raw >= 0.5).select(
        "doc_id", F.round(raw, 6).alias("quality")
    )


@register(
    "q44_bpe_token_count",
    "SELECT doc_id, "
    "CAST(len(regexp_extract_all(text, "
    "'''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+| +'"
    ")) AS INT) AS n_bpe, "
    f"CAST({_NTOK} AS INT) AS n_ws "
    "FROM documents",
    "BPE-style pre-tokenizer count (GPT-2 regex pieces) next to the "
    "whitespace count — the LLM-token budget estimator",
)
def q44(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TXT.bpe_ish_token_count(F.col("text")).alias("n_bpe"),
        TXT.token_count(F.col("text")).alias("n_ws"),
    )


@register(
    "q46_profile_topk",
    "SELECT col, val, n FROM ("
    "SELECT col, val, n, row_number() OVER ("
    "PARTITION BY col ORDER BY n DESC, val) AS rk FROM ("
    "SELECT 'lang' AS col, lang AS val, count(*) AS n FROM documents GROUP BY 2 "
    "UNION ALL "
    "SELECT 'source', source, count(*) FROM documents GROUP BY 2)) "
    "WHERE rk <= 3",
    "data profiling: exact top-3 most frequent values per categorical "
    "column (count + per-column row_number; ties broken by value)",
)
def q46(spark, sf_dir):
    from pyspark.sql import Window as W

    d = t(spark, sf_dir, "documents")
    counted = None
    for col in ("lang", "source"):
        c = d.groupBy(F.lit(col).alias("col"), F.col(col).alias("val")).agg(
            F.count(F.lit(1)).alias("n")
        )
        counted = c if counted is None else counted.unionByName(c)
    w = W.partitionBy("col").orderBy(F.desc("n"), F.asc("val"))
    return (
        counted.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("col", "val", "n")
    )


@register(
    "q43_fingerprint",
    "SELECT doc_id, "
    "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp "
    "FROM documents",
    "content fingerprint: md5 over casefolded, space-collapsed text",
)
def q43(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", TXT.doc_fingerprint(F.col("text")).alias("fp"))
