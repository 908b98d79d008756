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
    # explode_outer ≡ explode here (the != '' filter already drops the
    # NULL a null/empty token array emits) minus the inferred
    # size-filter that would inline the tokenize twice (r10, guide §7.2)
    return (
        df.select(
            F.explode_outer(tokens(F.lower(F.col(text_col)))).alias("word"))
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


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer (SentencePiece-style), Viterbi hard-EM
# ---------------------------------------------------------------------------
#
# Kudo 2018 (arXiv:1804.10959) trains the unigram LM by EM over piece
# probabilities; the hard-EM (Viterbi) variant below keeps the whole
# trajectory engine-portable: piece scores are QUANTIZED integer
# log-probs (round(ln(cnt/total) * 1e6)), the per-word DP maximizes an
# integer sum with a total deterministic tie order (score desc, fewer
# pieces, lexicographic segmentation), and the M-step is plain weighted
# counting — so a SQL oracle can replay every iteration exactly.
#
# Scale shape mirrors BPE above: training never iterates over the
# corpus, only over the WORD-FREQUENCY table; the E-step ships the
# (tiny, bounded) score table in a closure and segments distinct words
# in Arrow-batched mapInPandas; the M-step is one explode + groupBy.

#: DP caps — words longer than MAX_WORD_LEN are filtered out of
#: training (they are Zipf-tail noise), pieces are 1..MAX_PIECE_LEN.
MAX_WORD_LEN = 10
MAX_PIECE_LEN = 4


def unigram_viterbi(word: str, scores: dict) -> list[str] | None:
    """Best segmentation of ``word`` under integer piece ``scores``.

    Maximizes total score; ties prefer FEWER pieces, then the
    lexicographically smallest '|'-joined segmentation — a total order,
    so any engine replaying the same scores picks the same answer.
    Returns None if the word cannot be segmented (a piece is missing).
    """
    best: list = [None] * (len(word) + 1)
    best[0] = (0, 0, "")
    for i in range(1, len(word) + 1):
        cands = []
        for length in range(1, min(MAX_PIECE_LEN, i) + 1):
            prev = best[i - length]
            if prev is None:
                continue
            piece = word[i - length:i]
            s = scores.get(piece)
            if s is None:
                continue
            seg = piece if not prev[2] else prev[2] + "|" + piece
            cands.append((prev[0] + s, prev[1] + 1, seg))
        if cands:
            best[i] = min(cands, key=lambda c: (-c[0], c[1], c[2]))
    final = best[len(word)]
    return final[2].split("|") if final else None


def quantize_scores(counts: dict) -> dict:
    """counts -> integer log-prob scores: round(ln(cnt/total)*1e6)."""
    import math
    total = sum(counts.values())
    return {p: round(math.log(c / total) * 1_000_000)
            for p, c in counts.items()}


def unigram_words(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Training word-frequency table: lowercase [a-z]+ runs of length
    1..MAX_WORD_LEN, weighted by corpus occurrences.  One shuffle."""
    return (
        df.select(F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
        ).alias("word"))
        .filter(F.length("word").between(1, MAX_WORD_LEN))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def unigram_seed(words: DataFrame, num_multi: int = 200) -> DataFrame:
    """Seed vocabulary: EVERY single character (guarantees
    segmentability) plus the ``num_multi`` most frequent substrings of
    length 2..MAX_PIECE_LEN (weighted, OVERLAPPING occurrences; ties
    lexicographic).  Substring expansion is bounded by
    MAX_WORD_LEN * MAX_PIECE_LEN slots per distinct word."""
    subs = words.select(
        F.explode(F.expr(
            "flatten(transform(sequence(1, length(word)), s -> "
            f"transform(sequence(1, {MAX_PIECE_LEN}), l -> "
            "CASE WHEN s + l - 1 <= length(word) "
            "THEN substring(word, s, l) END)))"
        )).alias("piece"),
        F.col("freq"),
    ).filter(F.col("piece").isNotNull())
    counts = subs.groupBy("piece").agg(F.sum("freq").alias("cnt"))
    chars = counts.filter(F.length("piece") == 1)
    multi = (
        counts.filter(F.length("piece") >= 2)
        .orderBy(F.col("cnt").desc(), F.col("piece"))
        .limit(num_multi)
    )
    return chars.unionByName(multi)


def unigram_segment(words: DataFrame, scores: dict) -> DataFrame:
    """E-step: Viterbi-segment every distinct word under ``scores``
    (closure-shipped dict, vocabulary-bounded).  Adds ``seg`` ('|'
    joined) to the word table."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            segs = [
                "|".join(unigram_viterbi(w, scores) or [])
                for w in pdf["word"]
            ]
            out = pdf[["word", "freq"]].copy()
            out["seg"] = segs
            yield out

    return words.mapInPandas(run, "word string, freq long, seg string")


def unigram_train(words: DataFrame, iterations: int = 2,
                  num_multi: int = 200,
                  checkpoint: str | None = "local") -> DataFrame:
    """Viterbi hard-EM: seed -> (score -> segment -> count) x N.
    Returns the final E-step's weighted piece-usage table
    ``(piece, cnt, n_words)``.  Each iteration collects only the
    vocabulary-bounded count table (<= 26 + num_multi rows) — the
    broadcast-model contract of q255's classifier.  The word table is
    consumed by the seed build and every E-step, so it is checkpointed
    once (``checkpoint_frame`` seam) instead of re-tokenizing the
    corpus per action."""
    from ..checkpointing import checkpoint_frame
    words = checkpoint_frame(words, checkpoint)
    seed = unigram_seed(words, num_multi=num_multi)
    counts = {r["piece"]: int(r["cnt"]) for r in seed.collect()}
    seed_chars = [p for p in counts if len(p) == 1]
    usage = None
    for _ in range(iterations):
        segs = unigram_segment(words, quantize_scores(counts))
        usage = (
            segs.select(
                "word", "freq",
                F.explode(F.split("seg", r"\|")).alias("piece"))
            .filter(F.col("piece") != "")
            .groupBy("piece")
            .agg(F.sum("freq").alias("cnt"),
                 F.countDistinct("word").alias("n_words"))
        )
        rows = usage.collect()
        # next-iteration model: used multi pieces survive; single chars
        # always survive with add-one smoothing (SentencePiece keeps
        # characters so every word stays segmentable)
        counts = {r["piece"]: int(r["cnt"]) for r in rows
                  if len(r["piece"]) > 1}
        chars = {r["piece"]: int(r["cnt"]) + 1 for r in rows
                 if len(r["piece"]) == 1}
        for p in seed_chars:
            chars.setdefault(p, 1)
        counts.update(chars)
    return usage
