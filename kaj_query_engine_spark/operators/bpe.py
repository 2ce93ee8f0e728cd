"""BPE tokenizer training + distributed encoding.

The reference engine has no tokenizer surface at all (its grammar is
SELECT-only — ``/root/reference/src/qp/parser/parser.cup``); this is
part of the training-data-pipeline extension: token counts drive
mixture weights, packing (``operators/pipeline.py``) and cost
estimates, and a vocabulary learned ON the corpus is the first step
of any LLM data run.

Scale design — the whole point of this module's shape:

- **The corpus never reaches the driver.** Classic BPE training
  (Sennrich et al. 2016) operates on the WORD-FREQUENCY table, not
  the corpus: merge counts are sums of ``freq(word) ×
  pairs-in-word``. The word/piece table is vocabulary-bounded —
  Heaps' law: ~O(corpus^β), β≈0.5 — so at 100 TB the pivot is one
  shuffle (explode pieces → partial-aggregated groupBy), and the
  driver-side learner touches only the bounded (piece, freq) table.
  This mirrors how production trainers (sentencepiece, HF tokenizers)
  ingest corpora: counts in, merges out.
- **No silent caps**: the learner keeps the ``max_pieces`` most
  frequent pieces and REPORTS the kept/dropped occurrence mass in the
  returned model, so truncated coverage is visible, never assumed.
- **Encoding is map-only.** The merge ranks broadcast (a few hundred
  KB), and an Arrow ``mapInPandas`` applies them per pre-token with a
  per-batch piece→tokens cache — Zipf's law makes the hit rate high,
  so the merge loop runs roughly once per DISTINCT piece per batch,
  not once per token.

Pre-tokenization reuses ``functions.text.bpe_ish_tokens`` (the
GPT-2-style regex, JVM-side), so counts compose with the rest of the
text stack.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kaj_query_engine_spark.functions.text import bpe_ish_tokens


def piece_frequencies(docs: DataFrame, text_col: str) -> DataFrame:
    """(piece, freq) over the corpus: ONE explode + ONE
    partial-aggregated groupBy — the vocabulary-bounded pivot every
    downstream step works from."""
    return (
        docs.select(
            F.explode(bpe_ish_tokens(F.col(text_col))).alias("piece")
        )
        .groupBy("piece")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


@dataclass(frozen=True)
class BpeModel:
    """Learned merge list (rank order) + the truncation report."""

    merges: tuple[tuple[str, str], ...]
    merge_counts: tuple[int, ...]  # pair count at the time of each merge
    kept_mass: int  # occurrences covered by the learner's piece table
    dropped_mass: int  # occurrences beyond max_pieces — REPORTED, not silent
    dropped_pieces: int

    def ranks(self) -> dict[tuple[str, str], int]:
        return {pair: i for i, pair in enumerate(self.merges)}


def learn_bpe(
    piece_freqs: DataFrame,
    num_merges: int = 200,
    max_pieces: int = 50_000,
) -> BpeModel:
    """Learn ``num_merges`` BPE merges from a (piece, freq) table.

    The ONLY driver materialization is the top-``max_pieces`` slice of
    the piece table — bounded by construction (and the dropped
    occurrence mass is measured and carried in the model). Ties are
    broken deterministically everywhere: piece selection by
    (freq DESC, piece ASC), merge selection by (count DESC, pair ASC)
    — same data in, same vocabulary out, at any parallelism.
    """
    totals = piece_freqs.agg(
        F.sum("freq").alias("mass"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    top = (
        piece_freqs.orderBy(F.col("freq").desc(), F.col("piece").asc())
        .limit(max_pieces)
        .collect()
    )
    kept_mass = sum(r.freq for r in top)
    total_mass = totals.mass or 0
    words: list[list[str]] = [list(r.piece) for r in top]
    freqs: list[int] = [r.freq for r in top]

    # pair -> total count; pair -> set of word indexes containing it
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}

    def add_word(wi: int, sign: int) -> None:
        syms = words[wi]
        f = freqs[wi] * sign
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + f
            if sign > 0:
                pair_words.setdefault((a, b), set()).add(wi)

    for wi in range(len(words)):
        add_word(wi, +1)

    merges: list[tuple[str, str]] = []
    merge_counts: list[int] = []
    for _ in range(num_merges):
        live = [(c, p) for p, c in pair_counts.items() if c > 0]
        if not live:
            break
        best_count, best = max(live, key=lambda cp: (cp[0], _neg(cp[1])))
        merges.append(best)
        merge_counts.append(best_count)
        joined = best[0] + best[1]
        for wi in sorted(pair_words.get(best, ())):
            syms = words[wi]
            if best not in zip(syms, syms[1:]):
                continue  # stale index entry (word rewritten earlier)
            add_word(wi, -1)  # retract old pair counts
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = out
            add_word(wi, +1)
        pair_counts[best] = 0  # fully merged everywhere

    return BpeModel(
        merges=tuple(merges),
        merge_counts=tuple(merge_counts),
        kept_mass=kept_mass,
        dropped_mass=total_mass - kept_mass,
        dropped_pieces=(totals.n or 0) - len(top),
    )


class _neg:
    """Reverse-order wrapper so max() breaks count ties by SMALLEST
    pair lexicographically (deterministic without sorting all pairs)."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __lt__(self, other):  # max() picks the lexicographically least
        return self.v > other.v

    def __eq__(self, other):
        return self.v == other.v


def _encode_piece(
    piece: str, ranks: dict[tuple[str, str], int], cache: dict[str, int]
) -> int:
    """Token count for one pre-token: greedy lowest-rank merging (the
    standard GPT-2 ``bpe()`` loop), memoized per batch."""
    hit = cache.get(piece)
    if hit is not None:
        return hit
    syms = list(piece)
    while len(syms) > 1:
        ranked = [
            (ranks.get((a, b)), i)
            for i, (a, b) in enumerate(zip(syms, syms[1:]))
            if (a, b) in ranks
        ]
        if not ranked:
            break
        rank, i = min(ranked)
        syms[i : i + 2] = [syms[i] + syms[i + 1]]
    cache[piece] = len(syms)
    return len(syms)


def encode_token_counts(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    model: BpeModel,
) -> DataFrame:
    """Per-document BPE token count under the learned vocabulary,
    plus the pre-token (piece) count for compression-ratio checks.
    Map-only: pre-tokenization stays JVM-side, the merge loop runs in
    ONE Arrow ``mapInPandas`` stage with the broadcast ranks and a
    per-batch piece cache (Zipf hit rate)."""
    spark = docs.sparkSession
    ranks_bc = spark.sparkContext.broadcast(model.ranks())
    id_type = docs.schema[id_col].dataType.simpleString()  # ids aren't
    # always longs — crawl corpora key by URL/UUID strings
    pieces = docs.select(
        F.col(id_col).alias("doc_id"),
        bpe_ish_tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("_pieces"),
    )

    def run(batches):
        ranks = ranks_bc.value
        cache: dict[str, int] = {}
        for pdf in batches:
            pdf["n_bpe_tokens"] = [
                sum(_encode_piece(p, ranks, cache) for p in ps)
                for ps in pdf["_pieces"]
            ]
            pdf["n_pieces"] = [len(ps) for ps in pdf["_pieces"]]
            yield pdf[["doc_id", "n_bpe_tokens", "n_pieces"]]

    return pieces.mapInPandas(
        run, f"doc_id {id_type}, n_bpe_tokens long, n_pieces long"
    )
