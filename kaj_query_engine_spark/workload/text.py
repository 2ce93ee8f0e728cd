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


_QUALITY = (
    f"least(1.0, {_NTOK} * 1.0 / 50.0) * 0.4 + {_RATIO} * 0.3 + "
    f"least(1.0, ({_AVGLEN}) / 8.0) * 0.3"
)


@register(
    "q40_text_stats",
    "SELECT doc_id, "
    f"CAST({_NTOK} AS INT) AS n_tokens, "
    "CAST(length(text) AS INT) AS n_chars, "
    f"CAST(list_sum(list_transform({_TOKS}, x -> length(x))) AS INT) "
    "* 1.0 / "
    f"CAST({_NTOK} AS INT) AS avg_token_len, "
    f"{_NSTOP} * 1.0 / {_NTOK} AS stop_ratio, "
    "CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS INT) AS n_punct, "
    "CAST(len(regexp_extract_all(text, "
    "'''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+| +'"
    ")) AS INT) AS n_bpe, "
    "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp, "
    f"CASE WHEN ({_QUALITY}) >= 0.5 THEN round({_QUALITY}, 6) END AS quality "
    "FROM documents",
    "per-document text profile in one scan: token/char counts, avg "
    "token length, stopword ratio, punctuation count, BPE-style "
    "pre-tokenizer count (GPT-2 regex pieces — the LLM-token budget "
    "estimator), the md5 content fingerprint, and the composite "
    "quality score with its keep/drop gate (NULL = dropped) — all "
    "JVM-side exprs",
)
def q40(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    txt = F.col("text")
    n_tok = TXT.token_count(txt).cast("double")
    raw = (
        F.least(F.lit(1.0), n_tok / F.lit(50.0)) * 0.4
        + TXT.stopword_ratio(txt) * 0.3
        + F.least(F.lit(1.0), TXT.avg_token_len(txt) / F.lit(8.0)) * 0.3
    )
    return d.select(
        "doc_id",
        TXT.token_count(txt).alias("n_tokens"),
        TXT.char_count(txt).alias("n_chars"),
        TXT.avg_token_len(txt).alias("avg_token_len"),
        TXT.stopword_ratio(txt).alias("stop_ratio"),
        TXT.punct_count(txt).alias("n_punct"),
        TXT.bpe_ish_token_count(txt).alias("n_bpe"),
        TXT.doc_fingerprint(txt).alias("fp"),
        F.when(raw >= 0.5, F.round(raw, 6)).alias("quality"),
    )


@register(
    "q46_profile_topk",
    "SELECT col, val, n FROM ("
    "SELECT col, val, n, row_number() OVER ("
    "PARTITION BY col ORDER BY n DESC, val) AS rk FROM ("
    "SELECT 'lang' AS col, lang AS val, count(*) AS n FROM documents GROUP BY 2 "
    "UNION ALL "
    "SELECT 'source', source, count(*) FROM documents GROUP BY 2 "
    "UNION ALL "
    "SELECT 'lang_pred', CASE "
    f"WHEN {_RATIO} >= 0.10 THEN 'en' "
    f"WHEN {_RATIO} >= 0.04 THEN 'mixed' "
    "ELSE 'other' END, count(*) FROM documents GROUP BY 2)) "
    "WHERE rk <= 3",
    "data profiling: exact top-3 most frequent values per categorical "
    "column (count + per-column row_number; ties broken by value) — "
    "including the computed stopword-density language-ID heuristic "
    "(lang_pred), so the language classifier's distribution is checked "
    "alongside the stored columns",
)
def q46(spark, sf_dir):
    from pyspark.sql import Window as W

    d = t(spark, sf_dir, "documents")
    cols = [
        ("lang", F.col("lang")),
        ("source", F.col("source")),
        ("lang_pred", TXT.lang_guess(F.col("text"))),
    ]
    counted = None
    for name, expr in cols:
        c = d.groupBy(F.lit(name).alias("col"), expr.alias("val")).agg(
            F.count(F.lit(1)).alias("n")
        )
        counted = c if counted is None else counted.unionByName(c)
    w = W.partitionBy("col").orderBy(F.desc("n"), F.asc("val"))
    return (
        counted.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("col", "val", "n")
    )
