"""Text retrieval scoring: BM25 top-k over a document corpus.

The ranking half of the LLM-data toolbox (dedup.py removes near-copies,
similarity.py searches embeddings; this scores LEXICAL relevance —
benchmark decontamination's cousin, and the standard first-stage
retriever in RAG data pipelines).

BM25 (Okapi, Lucene idf variant):
    score(d, Q) = Σ_{t∈Q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl))
    idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)

100 TB design (SCALE.md):
- the exploded token stream is the one big intermediate; the query-term
  filter lands BEFORE its shuffle, so tf aggregation touches only rows
  for query terms — corpus-sized map work, query-sized reduce work.
- df (per query term) is a |Q|-row table and the corpus stats are one
  row — both broadcast; the only doc-sized shuffles are the |d| length
  aggregation and the per-doc tf groupBy, both keyed on doc_id.
- final ranking is TakeOrderedAndProject (top-k, never a global sort).
- scores are rounded (6dp) because a Σ over ≤|Q| doubles is
  order-sensitive; ties after rounding are broken by doc id, so the
  ranking is deterministic cross-engine (q15 canonicalization rule).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = "[^a-z]+"


def tokenize(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, tok) stream: lowercase, split on non-alpha runs, drop empties.
    Deliberately the simplest portable tokenizer — the oracle must be able
    to reproduce it with string_split_regex."""
    return docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT)).alias("tok"),
    ).filter(F.col("tok") != "")


def bm25_topk(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 score for ``query_terms``.

    Output: (id_col, score) — score rounded to 6dp, ordered by
    (score DESC, id ASC). Documents containing none of the query terms
    never enter the scoring pipeline (the tf filter prunes them).
    """
    if not query_terms:
        raise ValueError("bm25_topk requires at least one query term")
    toks = tokenize(docs, text_col, id_col)
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("__dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("__n_docs"), F.avg("__dl").alias("__avgdl")
    )
    tf = (
        toks.filter(F.col("tok").isin(list(query_terms)))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    df_ = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("__df"))

    idf = F.log(
        (F.col("__n_docs") - F.col("__df") + 0.5) / (F.col("__df") + 0.5) + 1.0
    )
    tf_norm = (F.col("__tf") * (k1 + 1)) / (
        F.col("__tf")
        + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl"))
    )
    scored = (
        tf.join(F.broadcast(df_), "tok")
        .join(dl, id_col)
        .crossJoin(F.broadcast(corpus))  # 1-row corpus stats
        .groupBy(id_col)
        .agg(F.round(F.sum(idf * tf_norm), 6).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
