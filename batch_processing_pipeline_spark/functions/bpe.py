"""Byte-pair-encoding tokenizer: train on the compact vocab, apply at scale.

The two halves of a BPE tokenizer live at very different scales and this
module keeps them on the right sides of the cluster boundary:

* **Training** (``learn_bpe_merges``) iterates over the *(word, count)*
  relation — Zipf-compact (a vocabulary, not a corpus; millions of rows
  at web scale, not billions) — and runs the classic greedy merge loop
  driver-side, exactly how production tokenizer trainers operate. The
  distributed part of training is the word-count aggregation feeding it
  (same shape as ``bpe_merge_candidates``'s pair statistic).
* **Application** (``bpe_encode``) is the 100 TB side: the learned merge
  ranks broadcast to executors (a few KB), and an Arrow-batched pandas
  UDF encodes text with an executor-local per-word cache — thanks to
  Zipf, the cache hit rate approaches 1 and each DISTINCT word is
  encoded once per executor, not once per occurrence.

Encoding is the standard min-rank greedy loop (merge the lowest-rank
adjacent pair until none applies), so a merge table from any BPE trainer
with the same (first, second) pair convention drops in.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def learn_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 20,
    min_word_len: int = 2,
    max_vocab: int | None = 1_000_000,
) -> list[tuple[str, str]]:
    """Classic BPE training over the corpus' (word, count) relation.

    Deterministic: ties in pair frequency break lexicographically, so the
    same corpus always yields the same merge list.

    The driver collect is BOUNDED by ``max_vocab``: the distinct-"word"
    relation of 100 TB web text is not driver-sized (URLs/noise push it
    to billions), so training keeps the top-``max_vocab`` words by
    frequency (ties broken by the word itself — deterministic under any
    run order). Standard BPE trainers cap the training vocabulary the
    same way; Zipf means the dropped tail carries a vanishing share of
    corpus mass, and the pair statistics that drive merges are dominated
    by the kept head. ``None`` disables the cap (tests / bounded corpora
    only — TakeOrdered sizes its heap by k, so the cap must stay a real
    number on unbounded inputs).
    """
    s = F.lower(F.trim(F.col(text_col)))
    counted = (
        df.select(F.explode(F.split(s, r"\s+")).alias("w"))
        .where(F.length("w") >= min_word_len)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if max_vocab is not None:
        counted = counted.orderBy(F.desc("n"), F.asc("w")).limit(max_vocab)
    vocab = {r.w: r.n for r in counted.collect()}
    words = {w: list(w) for w in vocab}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            n = vocab[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy min-rank BPE encode of one word (GPT-2-style loop)."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Append ``out_col: array<string>`` — the BPE tokens of ``text_col``.

    Arrow-batched pandas UDF; the merge-rank dict ships once per executor
    via closure capture (KBs), and an executor-local word cache encodes
    each distinct word once (Zipf makes the hit rate ~1 on real text).
    """
    ranks = {pair: i for i, pair in enumerate(merges)}

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def run(text):
            if text is None:
                return []
            out = []
            for w in text.lower().strip().split():
                got = cache.get(w)
                if got is None:
                    got = cache[w] = encode_word(w, ranks)
                out.extend(got)
            return out

        return texts.map(run)

    return df.withColumn(out_col, enc(F.col(text_col)))
