"""Text-analysis column builders for large-scale training-data pipelines.

All of these are pure ``pyspark.sql.functions`` Column expressions —
JVM-side, whole-stage-codegen'd, zero Python in the hot path — so they
run at full scan speed over 100 TB of documents. No counterpart exists
in the reference engine (its grammar has no scalar functions,
``/root/reference/src/qp/parser/parser.cup:208-242``); these are the
north-star extension surface.

Determinism: every function is a deterministic expression over the
input string, so results are reproducible across engines — the
workload oracles mirror each one in DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny English stopword set used by the language heuristic and quality
# score. Kept deliberately small + fixed: it is part of the operator's
# contract (the DuckDB oracle hard-codes the same list).
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def tokens(col: Column) -> Column:
    """Whitespace tokens (single-space split after trim — mirrors
    ``string_split(trim(x), ' ')``)."""
    return F.split(F.trim(col), " ")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def char_count(col: Column) -> Column:
    return F.length(col)


def avg_token_len(col: Column) -> Column:
    """Mean token length; integer sum / integer count → double."""
    toks = tokens(col)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda acc, x: acc + x
    )
    return total / F.size(toks)


def stopword_ratio(col: Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or EN_STOPWORDS
    toks = tokens(col)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*sw)))
    return n_stop / F.size(toks)


def punct_count(col: Column) -> Column:
    """Number of punctuation characters (fixed class)."""
    return F.length(F.regexp_replace(col, r"[^.,;:!?]", ""))


def quality_score(col: Column) -> Column:
    """Composite document-quality heuristic in [0, 1]: token volume,
    stopword ratio, average word length. Deterministic double
    arithmetic (same expression tree in the oracle)."""
    n_tok = token_count(col).cast("double")
    return F.round(
        F.least(F.lit(1.0), n_tok / F.lit(50.0)) * 0.4
        + stopword_ratio(col) * 0.3
        + F.least(F.lit(1.0), avg_token_len(col) / F.lit(8.0)) * 0.3,
        6,
    )


def lang_guess(col: Column) -> Column:
    """N-gram-free language heuristic: classify by English stopword
    density. (A real system plugs in fastText/CLD3 via pandas_udf; the
    heuristic keeps the operator JVM-side and oracle-checkable.)"""
    ratio = stopword_ratio(col)
    return (
        F.when(ratio >= 0.10, "en").when(ratio >= 0.04, "mixed").otherwise("other")
    )


# GPT-2-style pre-tokenizer pattern, ASCII-only so the Java regex
# (Spark) and RE2 (DuckDB oracle) dialects agree exactly: contraction
# suffixes, letter runs, digit runs, punctuation runs, whitespace runs
# — each with an optional leading space glued on, as BPE vocabularies
# expect.
BPE_ISH_PATTERN = (
    "'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+| +"
)


def bpe_ish_tokens(col: Column) -> Column:
    """BPE-style pre-tokenization (regex pieces, no vocab): the token
    stream a byte-pair encoder would merge. Counting these approximates
    LLM token counts far better than whitespace words."""
    return F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), 0)


def bpe_ish_token_count(col: Column) -> Column:
    return F.size(bpe_ish_tokens(col))


def doc_fingerprint(col: Column) -> Column:
    """Content fingerprint: md5 of casefolded, whitespace-collapsed
    text. The exact-dedup key."""
    return F.md5(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "))


def shingles_of_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-grams over an ALREADY-MATERIALIZED token-array
    column — the unit of MinHash/Jaccard near-dedup and benchmark
    decontamination. Guarded so docs shorter than n words yield an
    empty array (F.sequence would otherwise run backwards).

    ``toks`` must be a bound column, not the raw ``tokens(text)``
    expression: higher-order lambdas run interpreted (outside codegen),
    so an inlined split would re-run once per gram — ~10× slower on
    50-token docs. Project ``tokens(text)`` to a column first.
    """
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-grams straight from a text column. Convenience
    form; hot paths should project :func:`tokens` first and use
    :func:`shingles_of_tokens` (see its interpreted-lambda note)."""
    return shingles_of_tokens(tokens(col), n)


def shingle_arrays(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(id, shingles) — one distinct-shingle ARRAY per document, the
    shared front half of decontamination and candidate-pair
    verification (the exploded form is ``operators.dedup.shingle_table``).

    Two-step select on purpose: ``tokens(text)`` materializes as a
    column BEFORE the shingle lambda (higher-order transforms run
    interpreted, so an inlined split would re-run once per gram), and
    downstream code that both ``size()``-es and explodes the array
    must reference this one alias twice so CollapseProject cannot
    inline the expensive expression into a post-Generate projection.
    """
    return df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("toks")
    ).select("id", shingles_of_tokens(F.col("toks"), n).alias("shingles"))
