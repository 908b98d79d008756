"""Byte-pair-encoding tokenizer (EXT) — train on the corpus, apply
distributed.

The classic Sennrich/GPT-2 training shape made warehouse-scalable the way
the original implementations actually work: BPE training never iterates
over the corpus — it iterates over the WORD-FREQUENCY TABLE.  So:

1. ``word_frequencies`` aggregates the corpus once (one shuffle, output
   is vocabulary-sized, Zipf-bounded);
2. ``train_bpe`` collects that table (bounded by ``max_vocab`` — an
   explicit contract, like the IVF training sample) and runs the exact
   greedy pair-merge loop driver-side;
3. ``apply_bpe`` broadcasts the merge ranks and tokenizes documents in
   Arrow-batched ``mapInPandas`` — embarrassingly scan-parallel.

Round-trip invariant: concatenating a word's subwords always rebuilds
the word (BPE only ever merges, never rewrites), which is what the
self-verifying query pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import tokens

#: end-of-word sentinel (GPT-2 uses a leading space; a suffix marker keeps
#: the toy-corpus tests readable).  Chosen outside the corpus alphabet.
EOW = "</w>"


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-shuffle (word, freq) aggregation — the only corpus-sized step
    of BPE training."""
    return (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def train_bpe(
    word_freqs, num_merges: int, max_vocab: int = 100_000
) -> list:
    """Greedy BPE merge training over a word-frequency table.

    ``word_freqs`` is the DataFrame from :func:`word_frequencies` (or a
    plain ``{word: freq}`` dict in tests).  The table is truncated to the
    ``max_vocab`` most frequent words first (deterministic freq-then-lex
    order) — the bounded-collect contract that keeps the driver step
    O(vocab), never O(corpus).  Returns the ordered merge list
    ``[(left, right), ...]``.
    """
    if isinstance(word_freqs, DataFrame):
        rows = (
            word_freqs.orderBy(F.col("freq").desc(), F.col("word"))
            .limit(max_vocab)
            .collect()
        )
        freqs = {r["word"]: r["freq"] for r in rows}
    else:
        freqs = dict(word_freqs)

    symbols = {w: tuple(w) + (EOW,) for w in freqs}
    merges: list = []
    for _ in range(num_merges):
        pair_counts: dict = {}
        for w, freq in freqs.items():
            syms = symbols[w]
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + freq
        if not pair_counts:
            break
        # deterministic: highest count, then lexicographic pair
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for w in freqs:
            syms = symbols[w]
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            symbols[w] = tuple(out)
    return merges


def encode_word(word: str, ranks: dict) -> list:
    """Apply merges (lowest rank first) to one word.  Pure function so
    the executor path and the tests share it."""
    syms = list(word) + [EOW]
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


def apply_bpe(
    df: DataFrame,
    merges: list,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize every document with a trained merge list — Arrow-batched
    ``mapInPandas``, merge ranks shipped once per task via closure
    (kilobytes).  Returns ``(id, n_words, n_subwords, roundtrip_ok)``
    where ``roundtrip_ok`` asserts the BPE invariant that subwords
    concatenate back to each word exactly.
    """
    import pandas as pd

    ranks = {tuple(m): i for i, m in enumerate(merges)}

    def run(batches):
        cache: dict = {}
        for pdf in batches:
            out = {"__id": [], "n_words": [], "n_subwords": [], "roundtrip_ok": []}
            for did, text in zip(pdf[id_col], pdf[text_col]):
                words = (text or "").lower().split()
                n_sub = 0
                ok = True
                for w in words:
                    subs = cache.get(w)
                    if subs is None:
                        subs = encode_word(w, ranks)
                        cache[w] = subs
                    n_sub += len(subs)
                    if "".join(subs).removesuffix(EOW) != w:
                        ok = False
                out["__id"].append(did)
                out["n_words"].append(len(words))
                out["n_subwords"].append(n_sub)
                out["roundtrip_ok"].append(ok)
            yield pd.DataFrame(out)

    return (
        df.select(F.col(id_col), F.col(text_col))
        .mapInPandas(
            run, f"__id long, n_words int, n_subwords int, roundtrip_ok boolean"
        )
        .withColumnRenamed("__id", id_col)
    )
