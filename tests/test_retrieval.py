"""Unit tests for llm/retrieval.py (BM25) on hand-checked tiny corpora."""

from __future__ import annotations

import math

import pytest

from dbkit_spark.llm.retrieval import bm25_topk, tokenize


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "spark spark spark join"),     # heavy on 'spark'
            (2, "join window filter table"),   # one 'join', one 'window'
            (3, "scan sort merge hash"),       # no query terms
            (4, "spark join window"),          # all three terms once
        ],
        "doc_id long, text string",
    )


def test_tokenize_splits_and_drops_empties(spark):
    df = spark.createDataFrame([(1, "A b!!c  d-")], "id long, text string")
    toks = [r.tok for r in tokenize(df, "text", "id").collect()]
    assert toks == ["a", "b", "c", "d"]


def test_bm25_matches_hand_formula(corpus):
    out = {r.doc_id: r.score for r in
           bm25_topk(corpus, "text", "doc_id", ["spark"], k=10).collect()}
    # N=4, avgdl=(4+4+4+3)/4=3.75, df(spark)=2
    idf = math.log((4 - 2 + 0.5) / (2 + 0.5) + 1)
    k1, b = 1.2, 0.75

    def s(tf, dl):
        return round(idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / 3.75)), 6)

    assert out == {1: s(3, 4), 4: s(1, 3)}


def test_bm25_prunes_docs_without_query_terms(corpus):
    out = bm25_topk(corpus, "text", "doc_id", ["spark", "join", "window"], k=10)
    ids = {r.doc_id for r in out.collect()}
    assert 3 not in ids and ids == {1, 2, 4}


def test_bm25_multi_term_beats_repetition_at_saturation(corpus):
    """tf saturates (k1): doc 4 matching all three rare-ish terms must
    outrank doc 1's three repeats of one common term."""
    top = bm25_topk(corpus, "text", "doc_id", ["spark", "join", "window"], k=1)
    assert top.collect()[0].doc_id == 4


def test_bm25_k_limits_and_orders(corpus):
    out = bm25_topk(corpus, "text", "doc_id", ["join"], k=2).collect()
    assert len(out) == 2
    assert out[0].score >= out[1].score


def test_bm25_empty_query_raises(corpus):
    with pytest.raises(ValueError):
        bm25_topk(corpus, "text", "doc_id", [])
