"""Distributed UNIGRAM-LM tokenizer training (SentencePiece-style).

Completes the tokenizer-training story next to ``llm/bpe.py``: BPE
grows a vocabulary bottom-up by merging; the unigram LM (Kudo 2018,
the algorithm behind T5/ALBERT/XLNet vocabularies) starts from a large
seed of candidate pieces and PRUNES top-down, re-estimating piece
probabilities by EM over the best segmentation of every word. This
module implements the deterministic Viterbi-EM (hard-EM) variant:
the E-step keeps only each word's single best segmentation — a
documented simplification of full forward-backward EM that keeps every
count an exact integer (bit-for-bit replayable; pytest-pinned against
the pure-python reference below).

Scale design (the ``bpe_train`` discipline):

- Training state is the distinct-word frequency table — one corpus
  scan builds it, and it stays a DataFrame (web-scale type counts
  exceed driver memory).
- Seed counting and every E-step are map-only Arrow passes over that
  table followed by ONE map-side-combined hash agg; per round the
  driver collects only the VOCAB-sized count table (O(seed_size),
  metadata — the piece table is the model, same contract as the
  O(1)-per-round BPE argmax), re-scores, prunes, and broadcasts the
  new scores into the next round's closure.
- Rounds are inherently sequential (scores feed the next E-step) —
  the iterative-algorithm class, driver-coordinated.

Determinism contract: Viterbi ties prefer the SHORTEST last piece
(first strictly-greater candidate wins, piece length ascending);
pruning ranks by (count desc, piece asc); single-character pieces are
never pruned (segmentability floor) and zero-count survivors score
with a floor count of 1. Identical floating-point log-probabilities on
every worker (same dict, same ``math.log``), so the distributed and
single-threaded reference implementations agree exactly.

No SQL engine expresses the EM loop: rows-only catalog entry; exact
parity vs :func:`unigram_train_reference` is pytest-pinned (the q271
discipline).
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .bpe import word_frequencies


def _seed_batches(
    batches: Iterator[pd.DataFrame], max_piece_len: int
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        acc: dict[str, int] = {}
        for w, cnt in zip(pdf["w"], pdf["cnt"]):
            w, cnt = str(w), int(cnt)
            for i in range(len(w)):
                for k in range(1, min(max_piece_len, len(w) - i) + 1):
                    piece = w[i : i + k]
                    acc[piece] = acc.get(piece, 0) + cnt
        yield pd.DataFrame(
            {"piece": list(acc.keys()), "c": list(acc.values())}
        )


def unigram_segment(
    word: str, scores: dict[str, float], max_piece_len: int
) -> list[str]:
    """Viterbi best segmentation of one word under piece log-probs.

    Shared verbatim by the distributed E-step closure, the pure-python
    reference trainer, and callers needing a plain tokenizer — one
    definition, so parity is structural. Ties prefer the shortest last
    piece (strictly-greater comparison, piece length ascending)."""
    n = len(word)
    neg = float("-inf")
    best = [neg] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for k in range(1, min(max_piece_len, i) + 1):
            piece = word[i - k : i]
            s = scores.get(piece)
            if s is None or best[i - k] == neg:
                continue
            cand = best[i - k] + s
            if cand > best[i]:
                best[i] = cand
                back[i] = k
    if best[n] == neg:  # unreachable while all chars stay in vocab
        return list(word)
    out: list[str] = []
    i = n
    while i > 0:
        k = back[i]
        out.append(word[i - k : i])
        i -= k
    out.reverse()
    return out


def _scores_from_counts(counts: dict[str, int]) -> dict[str, float]:
    """log p with a floor count of 1 for zero-count char survivors."""
    floored = {p: max(c, 1) for p, c in counts.items()}
    total = sum(floored.values())
    return {p: math.log(c / total) for p, c in floored.items()}


def _estep_batches(
    batches: Iterator[pd.DataFrame],
    scores: dict[str, float],
    max_piece_len: int,
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        acc: dict[str, int] = {}
        memo: dict[str, list[str]] = {}
        for w, cnt in zip(pdf["w"], pdf["cnt"]):
            w, cnt = str(w), int(cnt)
            pieces = memo.get(w)
            if pieces is None:
                pieces = memo[w] = unigram_segment(w, scores, max_piece_len)
            for p in pieces:
                acc[p] = acc.get(p, 0) + cnt
        yield pd.DataFrame(
            {"piece": list(acc.keys()), "c": list(acc.values())}
        )


def _prune(
    counts: dict[str, int],
    target_vocab: int,
    prune_frac: float,
) -> dict[str, int]:
    chars = {p: c for p, c in counts.items() if len(p) == 1}
    multi = {p: c for p, c in counts.items() if len(p) > 1}
    target_multi = max(0, target_vocab - len(chars))
    keep_m = max(target_multi, int(math.ceil(len(multi) * (1 - prune_frac))))
    kept = sorted(multi.items(), key=lambda kv: (-kv[1], kv[0]))[:keep_m]
    out = dict(chars)
    out.update(kept)
    return out


def unigram_train(
    df: DataFrame,
    text_col: str,
    target_vocab: int = 120,
    seed_size: int = 600,
    max_piece_len: int = 8,
    n_rounds: int = 4,
    prune_frac: float = 0.25,
) -> list[tuple[str, int, float]]:
    """Learn a unigram-LM vocabulary from the corpus. Returns the final
    piece table [(piece, count, logp)] sorted (count desc, piece asc) —
    counts from the last E-step, logp the scores they imply."""
    words = word_frequencies(df, text_col).localCheckpoint(eager=True)

    seed = (
        words.mapInPandas(
            lambda it: _seed_batches(it, max_piece_len),
            "piece string, c long",
        )
        .groupBy("piece")
        .sum("c")
        .withColumnRenamed("sum(c)", "c")
    )
    # driver pulls only the vocab-sized model table: all chars + the
    # top-seed multi-char pieces (count desc, piece asc — deterministic)
    from pyspark.sql import functions as F

    chars = seed.filter(F.length("piece") == 1).collect()
    multi = (
        seed.filter(F.length("piece") > 1)
        .orderBy(F.col("c").desc(), "piece")
        .limit(seed_size)
        .collect()
    )
    counts = {r["piece"]: int(r["c"]) for r in chars}
    counts.update({r["piece"]: int(r["c"]) for r in multi})

    for _ in range(n_rounds):
        scores = _scores_from_counts(counts)
        estep = (
            words.mapInPandas(
                lambda it, s=scores: _estep_batches(it, s, max_piece_len),
                "piece string, c long",
            )
            .groupBy("piece")
            .sum("c")
            .withColumnRenamed("sum(c)", "c")
            .collect()
        )
        used = {r["piece"]: int(r["c"]) for r in estep}
        # chars never drop (segmentability floor); unused multi do
        counts = {
            p: used.get(p, 0)
            for p in counts
            if len(p) == 1 or p in used
        }
        counts = _prune(counts, target_vocab, prune_frac)

    final = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    scores = _scores_from_counts(counts)
    return [(p, c, scores[p]) for p, c in final]


def unigram_train_reference(
    word_cnt: dict[str, int],
    target_vocab: int = 120,
    seed_size: int = 600,
    max_piece_len: int = 8,
    n_rounds: int = 4,
    prune_frac: float = 0.25,
) -> list[tuple[str, int, float]]:
    """Single-threaded reference trainer — the exact same algorithm on
    a plain dict; the distributed trainer is pytest-pinned to agree
    bit-for-bit (integer counts, identical tie rules, one shared
    ``unigram_segment``)."""
    seed: dict[str, int] = {}
    for w, cnt in word_cnt.items():
        for i in range(len(w)):
            for k in range(1, min(max_piece_len, len(w) - i) + 1):
                piece = w[i : i + k]
                seed[piece] = seed.get(piece, 0) + cnt
    counts = {p: c for p, c in seed.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in seed.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[:seed_size]
    counts.update(multi)

    for _ in range(n_rounds):
        scores = _scores_from_counts(counts)
        used: dict[str, int] = {}
        for w, cnt in word_cnt.items():
            for p in unigram_segment(w, scores, max_piece_len):
                used[p] = used.get(p, 0) + cnt
        counts = {
            p: used.get(p, 0)
            for p in counts
            if len(p) == 1 or p in used
        }
        counts = _prune(counts, target_vocab, prune_frac)

    final = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    scores = _scores_from_counts(counts)
    return [(p, c, scores[p]) for p, c in final]
