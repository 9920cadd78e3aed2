"""Intra-document repetition scoring — the quality-filter family used by
published pre-training pipelines (duplicate-n-gram and top-token-share
rules à la C4/Gopher): heavily repetitive documents are low-quality and
get filtered before training.

Scale shape: the duplicate-token and duplicate-n-gram fractions are
**map-only** (array ops inside whole-stage codegen — no shuffle, no
Python). Only the top-token share needs an aggregation (mode of the
token multiset), done as (doc, token) count → per-doc max — two
doc-keyed shuffles of count rows, then an AQE-broadcast join back onto
the map-only metrics. Nothing touches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles_from_tokens, tokens


def repetition_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
) -> DataFrame:
    """(doc_id, n_tokens, dup_token_frac, dup_ngram_frac,
    top_token_share) per document with >= ``ngram`` tokens.

    - dup_token_frac: 1 - distinct/total tokens (word-level repetition)
    - dup_ngram_frac: 1 - distinct/total word n-grams (phrase repetition)
    - top_token_share: occurrences of the most frequent token / total
    """
    # explode(array(...)) Generate barrier: tokenize once per row even
    # though __t is referenced by several downstream expressions
    # (CollapseProject folds plain projections, not Generates)
    toked = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array(tokens(text_col))).alias("__t"),
    ).filter(F.size("__t") >= ngram)

    grams = shingles_from_tokens("__t", ngram)
    per_row = toked.select(
        "doc_id",
        F.size("__t").cast("long").alias("n_tokens"),
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct("__t")).cast("double") / F.size("__t"),
            6,
        ).alias("dup_token_frac"),
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct(grams)).cast("double") / F.size(grams),
            6,
        ).alias("dup_ngram_frac"),
    )

    tok_counts = (
        toked.select("doc_id", F.explode("__t").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    top = tok_counts.groupBy("doc_id").agg(
        F.round(F.max("c").cast("double") / F.sum("c"), 6).alias(
            "top_token_share"
        )
    )
    return per_row.join(top, "doc_id")
