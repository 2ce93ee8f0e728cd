"""BPE tokenizer pins. q41 also has a full DuckDB recursive-CTE
oracle (workload/text.py:_Q41_ORACLE) since round 7; these pins are
the independent, non-SQL leg of its correctness:

- hand-computed merges on a constructed frequency table;
- a DIFFERENTIAL encoder check on the real fixture corpus — the
  operator's greedy lowest-rank loop vs an independent
  apply-each-merge-in-rank-order implementation (the two classic,
  provably-equivalent BPE encodings, implemented separately);
- partitioning invariance (same corpus, different parallelism, same
  vocabulary — the determinism the tie-breaks exist for);
- the no-silent-caps coverage report.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from kaj_query_engine_spark.functions.text import BPE_ISH_PATTERN
from kaj_query_engine_spark.operators import bpe as B
from tests.conftest import SF_DIR


def freqs(spark, pairs):
    return spark.createDataFrame(pairs, "piece string, freq long")


def test_learn_hand_computed(spark):
    # pairs: (a,b) = 5+3 = 8 wins; then (ab,c) = 3
    model = B.learn_bpe(freqs(spark, [("ab", 5), ("abc", 3)]), num_merges=5)
    assert model.merges == (("a", "b"), ("ab", "c"))
    assert model.merge_counts == (8, 3)
    assert model.dropped_mass == 0 and model.kept_mass == 8


def test_learn_count_tie_breaks_lexicographic(spark):
    # (a,b) and (c,d) both count 4 → the lexicographically smaller
    # pair must win, independent of dict iteration order
    model = B.learn_bpe(freqs(spark, [("cd", 4), ("ab", 4)]), num_merges=1)
    assert model.merges == (("a", "b"),)


def test_learn_overlapping_pair_run(spark):
    # "aaaa": pair (a,a) counts 3; one merge pass rewrites it to
    # [aa, aa] (left-to-right, non-overlapping), so the next merge is
    # (aa, aa) — the retract/re-add bookkeeping must survive overlaps
    model = B.learn_bpe(freqs(spark, [("aaaa", 2)]), num_merges=2)
    assert model.merges == (("a", "a"), ("aa", "aa"))


def test_coverage_report_no_silent_caps(spark):
    model = B.learn_bpe(
        freqs(spark, [("aa", 10), ("bb", 6), ("cc", 1)]),
        num_merges=1,
        max_pieces=2,
    )
    assert model.kept_mass == 16
    assert model.dropped_mass == 1
    assert model.dropped_pieces == 1


def _ref_encode_count(piece: str, merges) -> int:
    """Independent reference: apply each merge in rank order across
    the whole symbol list (vs the operator's greedy lowest-rank loop)."""
    syms = list(piece)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return len(syms)


@pytest.fixture(scope="module")
def fixture_model(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return docs, B.learn_bpe(
        B.piece_frequencies(docs, "text"), num_merges=64
    )


def test_encode_differential_on_fixture(spark, fixture_model):
    docs, model = fixture_model
    out = {
        r.doc_id: (r.n_bpe_tokens, r.n_pieces)
        for r in B.encode_token_counts(docs, "doc_id", "text", model)
        .collect()
    }
    pat = re.compile(BPE_ISH_PATTERN)
    rows = docs.select("doc_id", "text").collect()
    assert len(out) == len(rows)
    for r in rows:
        pieces = pat.findall(r.text or "")
        want = sum(_ref_encode_count(p, model.merges) for p in pieces)
        got_tokens, got_pieces = out[r.doc_id]
        assert got_pieces == len(pieces), r.doc_id
        assert got_tokens == want, r.doc_id
    # merging can only shorten: pieces <= tokens would invert — check
    # the global ordering invariant chars >= tokens >= pieces
    tot_tokens = sum(v[0] for v in out.values())
    tot_pieces = sum(v[1] for v in out.values())
    assert tot_pieces <= tot_tokens


def test_learn_partitioning_invariant(spark, fixture_model):
    docs, model = fixture_model
    redistributed = B.learn_bpe(
        B.piece_frequencies(docs.repartition(13), "text"), num_merges=64
    )
    assert redistributed.merges == model.merges
    assert redistributed.merge_counts == model.merge_counts


def test_encode_unknown_chars_and_empty(spark):
    model = B.learn_bpe(freqs(spark, [("ab", 3)]), num_merges=1)
    docs = spark.createDataFrame(
        [(1, "ab xyz"), (2, None), (3, "")], "doc_id long, text string"
    )
    rows = {
        r.doc_id: (r.n_bpe_tokens, r.n_pieces)
        for r in B.encode_token_counts(docs, "doc_id", "text", model).collect()
    }
    # "ab" → 1 token; " xyz" (leading-space piece) → no merges apply →
    # 4 symbols; NULL/empty text → zero of both
    assert rows == {1: (5, 2), 2: (0, 0), 3: (0, 0)}


def test_encode_string_doc_ids(spark):
    model = B.learn_bpe(freqs(spark, [("ab", 3)]), num_merges=1)
    docs = spark.createDataFrame(
        [("u://1", "ab"), ("u://2", "ab ab")], "doc_id string, text string"
    )
    rows = {
        r.doc_id: r.n_bpe_tokens
        for r in B.encode_token_counts(docs, "doc_id", "text", model).collect()
    }
    assert rows == {"u://1": 1, "u://2": 3}  # "ab"=1; "ab"+" ab"(no merge: ' a','b')
