"""Document chunking for training-data pipelines: split each document
into fixed-size overlapping token windows.

The standard pre-tokenization step before packing (llm/sampling.pack
works on whole docs; real pipelines chunk long docs first so no sequence
exceeds the model context). Chunk rule, identical on Spark and any SQL
oracle:

    n        = token count of the doc
    chunks   = k in [0, ceil(max(n - window, 0) / stride)]
    chunk k  = tokens[k*stride : k*stride + window]

Every token is covered, consecutive chunks overlap by ``window - stride``
tokens, and the last chunk ends exactly at the document tail (it is the
only one allowed to be shorter than ``window``). Map-only: tokenize →
per-row sequence → explode → slice, no shuffle anywhere — at 100 TB this
is a pure scan-side transform that scales with input bytes.

Reference: dbkit has no chunking surface (its text handling stops at
``expression/convert.rs:45-136`` ToStr); this is part of the declared
LLM-pipeline extension (SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def chunk_documents(
    docs: DataFrame,
    window: int = 32,
    stride: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokenizer=None,
) -> DataFrame:
    """Explode each document into overlapping token-window chunks.

    Returns (id_col, chunk_id, n_tok, chunk_text). Documents with zero
    tokens produce no chunks (same as SQL ``generate_series`` over an
    empty range).

    ``tokenizer``: optional ``str -> list`` callable (a real model
    tokenizer — see ``functions.text.make_tokenizer_udfs``) routed
    through an Arrow-batched pandas UDF, so chunk windows are budgeted
    in MODEL tokens. Default ``None`` keeps the zero-dependency regex
    tokenizer and the all-JVM plan (the oracle-matched form). With a
    subword tokenizer, ``chunk_text`` space-joins the pieces — a display
    form; exact detokenization is the tokenizer's own job. The chunk
    law, coverage invariants, and map-only no-shuffle plan shape are
    identical on both paths.
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    if stride > window:
        raise ValueError("stride must not exceed window (gaps would drop tokens)")
    if tokenizer is None:
        tok_col = tokens(text_col)
    else:
        from ..functions.text import make_tokenizer_udfs

        tokenize_udf, _ = make_tokenizer_udfs(tokenizer)
        tok_col = tokenize_udf(F.col(text_col))
    toks = docs.select(
        F.col(id_col), tok_col.alias("_toks")
    ).withColumn("_n", F.size("_toks"))
    n_chunks = F.ceil(
        F.greatest(F.col("_n") - window, F.lit(0)) / F.lit(stride)
    ).cast("int")
    return (
        toks.filter(F.col("_n") > 0)
        .select(
            id_col,
            "_toks",
            F.explode(F.sequence(F.lit(0), n_chunks)).alias("chunk_id"),
        )
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.slice(
                "_toks", F.col("chunk_id") * stride + 1, window
            ).alias("_chunk"),
        )
        .select(
            id_col,
            "chunk_id",
            F.size("_chunk").cast("long").alias("n_tok"),
            F.concat_ws(" ", "_chunk").alias("chunk_text"),
        )
    )


def chunk_dedup_rate(
    docs: DataFrame,
    group_col: str,
    window: int = 32,
    stride: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CHUNK-granularity redundancy audit — RAG and packing pipelines
    dedupe at chunk level, where redundancy hides that doc-level dedup
    can't see (boilerplate shared across distinct docs, overlapping
    windows of near-identical passages): per group AND for the whole
    corpus (one ROLLUP), how many chunks exist vs how many are
    distinct, and the duplication factor.

    Chunk identity = sha256 of the chunk text (the q39 exact-key
    convention). ONE chunk explode (map-only) + one rollup aggregate
    with a distinct-count; at 100 TB swap approx_count_distinct
    (documented trade). The rollup total row reports group_col NULL —
    the corpus-wide line, which also exposes CROSS-group chunk sharing
    (corpus distinct < sum of group distincts).
    """
    chunks = chunk_documents(
        docs, window=window, stride=stride, text_col=text_col, id_col=id_col
    )
    keyed = chunks.join(
        docs.select(F.col(id_col), F.col(group_col)), id_col
    ).select(
        group_col,
        F.sha2(F.col("chunk_text"), 256).alias("_key"),
    )
    return (
        keyed.rollup(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.countDistinct("_key").alias("n_distinct"),
        )
        .select(
            group_col,
            "n_chunks",
            "n_distinct",
            F.round(
                F.col("n_chunks") / F.col("n_distinct").cast("double"), 6
            ).alias("dup_factor"),
        )
    )
