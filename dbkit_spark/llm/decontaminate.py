"""Benchmark decontamination: flag training docs that overlap an eval set.

The standard pre-training hygiene pass: any corpus document sharing at
least ``min_hits`` word n-grams with a benchmark/eval document is
flagged (and typically dropped) so downstream evaluation isn't measuring
memorization. Published pipelines use 8–13-word n-grams; ``n`` is a
parameter.

Scale shape: the benchmark side is always tiny relative to the corpus
(eval sets are thousands of documents vs billions), so its distinct
n-gram set is **broadcast** — the corpus never shuffles for the probe
join; the only shuffle is the per-doc hit-count aggregation, and the
hit table that joins back onto the corpus is small (contaminated docs
only) so AQE broadcasts it too. Net: one shuffle regardless of corpus
size, no n²-anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_docs

DECONTAM_NGRAM = 8


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = DECONTAM_NGRAM,
    min_hits: int = 1,
) -> DataFrame:
    """``corpus`` + ``n_hit_ngrams`` (distinct benchmark n-grams seen in
    the doc) + ``contaminated`` (n_hit_ngrams >= min_hits). Docs shorter
    than ``n`` tokens have no n-grams and count 0 hits."""
    bench_grams = (
        shingle_docs(benchmark, text_col, id_col, n)
        .select(F.explode("shingles").alias("shingle"))
        .distinct()
    )
    corpus_grams = shingle_docs(corpus, text_col, id_col, n).select(
        "doc_id", F.explode("shingles").alias("shingle")
    )
    hits = (
        corpus_grams.join(F.broadcast(bench_grams), "shingle")
        .groupBy("doc_id")
        .agg(F.count_distinct("shingle").alias("n_hit_ngrams"))
    )
    return (
        corpus.join(hits, corpus[id_col] == hits["doc_id"], "left")
        .drop(hits["doc_id"])
        .withColumn("n_hit_ngrams", F.coalesce("n_hit_ngrams", F.lit(0)))
        .withColumn("contaminated", F.col("n_hit_ngrams") >= F.lit(min_hits))
    )
