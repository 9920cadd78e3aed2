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


def compression_quality(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    low: float = 0.35,
    high: float = 1.05,
) -> DataFrame:
    """zlib compression-ratio quality signal — the cheap catch-all the
    n-gram repetition scores above miss: boilerplate, template spam,
    and character-level junk all compress far below natural prose
    (ratio = deflate_len / utf8_len; Gopher-style corpus rules flag
    both tails — too compressible = repetitive, incompressible =
    already-compressed binary/base64 noise).

    Arrow-batched mapInPandas (stdlib zlib, level 6 pinned for
    determinism), map-only, shuffle-free; partition parallelism is the
    scale lever. No SQL engine exposes deflate, so catalog use is
    rows-only; the monotone laws are pytest-pinned. Output:
    (id, text_len, compressed_len, ratio, flag) with flag in
    {'repetitive', 'ok', 'incompressible'} ('empty' for zero-length).
    """
    import zlib
    from typing import Iterator

    import pandas as pd

    out_schema = (
        f"{id_col} {dict(df.dtypes)[id_col]}, text_len long, "
        "compressed_len long, ratio double, flag string"
    )
    lo, hi = float(low), float(high)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            tl, cl, ratio, flag = [], [], [], []
            for t in pdf[text_col]:
                raw = (t or "").encode("utf-8")
                n = len(raw)
                c = len(zlib.compress(raw, 6)) if n else 0
                tl.append(n)
                cl.append(c)
                if n == 0:
                    ratio.append(None)
                    flag.append("empty")
                    continue
                r = c / n
                ratio.append(round(r, 6))
                flag.append(
                    "repetitive" if r < lo
                    else ("incompressible" if r > hi else "ok")
                )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "text_len": tl,
                    "compressed_len": cl,
                    "ratio": ratio,
                    "flag": flag,
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, out_schema)
