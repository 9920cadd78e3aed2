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


def tfidf_topk_terms(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF.

    score = tf * ln(N / df) — raw term frequency times log inverse
    document frequency (natural log, so any SQL oracle reproduces it
    with ln()). Output: (id_col, token, tf, df, score) with score
    rounded 6dp and deterministic (score DESC, token ASC) ranking.

    Plan shape: one (id, tok) explode feeding BOTH aggregations —
    per-doc tf (grouped agg) and corpus df (token-keyed distinct agg);
    the vocabulary-sized df table joins back onto tf rows by token, the
    one-row corpus size broadcasts (same intentional scalar crossJoin as
    bm25_topk), and the final per-doc top-k is a window row_number — no
    global sort, no all-pairs anything. At 100 TB every stage is keyed
    by token or doc id; the df side is vocabulary-sized, orders of
    magnitude smaller than the corpus.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    from pyspark.sql import Window

    toks = tokenize(docs, text_col, id_col)
    tf = toks.groupBy(id_col, "tok").agg(F.count("*").alias("tf"))
    df_tbl = toks.groupBy("tok").agg(
        F.count_distinct(id_col).alias("df")
    )
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_tbl, "tok")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("tok").asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select(id_col, F.col("tok").alias("token"), "tf", "df", "score")
    )


def rrf_fuse(
    lists: list[DataFrame],
    id_col: str,
    score_col: str = "score",
    rrf_k: int = 60,
    topk: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of ranked retrieval lists — the standard
    hybrid-search combiner (lexical BM25 + semantic ANN) that needs no
    score normalization: fused(d) = sum over lists of 1/(rrf_k + rank_d),
    missing-from-a-list contributes 0.

    CONTRACT: inputs are already TOP-K lists (the output of
    ``bm25_topk`` / cosine top-k) — metadata-sized by construction —
    so the global rank windows and the final sort here run over tens
    of rows (the q238 risk-table discipline), never over a corpus.
    The corpus-scale work lives in the retrievers themselves, which
    keep their own scale paths (term-filtered BM25, bucketed ANN).

    Determinism: ranks order by (round(score,6) DESC, id ASC) so
    last-ulp float noise cannot flip a rank cross-engine; the fused
    score is a sum of exact reciprocals rounded at 9dp.
    """
    from pyspark.sql import Window

    ranked = []
    for li, df in enumerate(lists):
        w = Window.orderBy(
            F.round(F.col(score_col), 6).desc(), F.col(id_col).asc()
        )
        ranked.append(
            df.select(
                F.col(id_col),
                F.row_number().over(w).alias(f"_r{li}"),
            )
        )
    fused = ranked[0]
    for nxt in ranked[1:]:
        fused = fused.join(nxt, id_col, "full_outer")
    contrib = None
    for li in range(len(lists)):
        c = F.when(
            F.col(f"_r{li}").isNotNull(),
            F.lit(1.0) / (F.lit(rrf_k) + F.col(f"_r{li}")),
        ).otherwise(F.lit(0.0))
        contrib = c if contrib is None else contrib + c
    return (
        fused.withColumn("rrf_score", F.round(contrib, 9))
        .orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
        .limit(topk)
        .select(id_col, *[f"_r{li}" for li in range(len(lists))], "rrf_score")
        .toDF(id_col, *[f"rank_{li+1}" for li in range(len(lists))], "rrf_score")
    )


def build_postings(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    block_size: int = 128,
) -> DataFrame:
    """Positional inverted-index construction — the search-infra
    ARTIFACT (bm25_topk answers queries; this materializes the index a
    serving system loads): per (token, block) one row holding
    delta-encoded doc ids and per-doc position lists.

    Output: ``token``, ``block``, ``doc_gaps`` (array<long>: first entry
    absolute, rest deltas — the classic posting-list compression that
    turns sorted 8-byte ids into small varint-able gaps), ``positions``
    (array<array<int>>, parallel to doc_gaps, each inner list the
    token's 0-based positions within that doc, sorted), ``df`` (the
    token's TOTAL document frequency across all its blocks).

    Scale shape: posting lists are SHARDED into blocks of
    ``block_size`` docs — a stop token's postings become many bounded
    rows instead of one giant array (the segment-block layout real
    engines use; no row ever exceeds block_size entries). Plan: one
    posexplode + (token, doc) agg, one token-keyed window pair for
    block numbering and the cross-block df — two exchanges on (token)
    after the first agg's (token, doc) exchange; never a collect, the
    index IS a DataFrame (write it partitionBy(token-prefix)).
    """
    from pyspark.sql import Window

    from ..functions.text import tokens

    if block_size <= 0:
        raise ValueError("block_size must be positive")
    per_doc = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(tokens(F.col(text_col))).alias("pos", "token"),
        )
        .groupBy("token", "doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("poss"))
    )
    w_rank = Window.partitionBy("token").orderBy("doc_id")
    w_tok = Window.partitionBy("token")
    blocked = (
        per_doc.withColumn(
            "block",
            ((F.row_number().over(w_rank) - 1) / block_size).cast("long"),
        )
        .withColumn("df", F.count(F.lit(1)).over(w_tok))
    )
    entries = (
        blocked.groupBy("token", "block")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("doc_id", "poss"))
            ).alias("es"),
            F.max("df").alias("df"),
        )
    )
    ids = F.col("es.doc_id")
    gaps = F.transform(
        ids,
        lambda x, i: x
        - F.when(i == 0, F.lit(0)).otherwise(F.element_at(ids, i)),
    )
    return entries.select(
        "token",
        "block",
        gaps.alias("doc_gaps"),
        F.col("es.poss").alias("positions"),
        "df",
    )


def ranking_metrics(
    results: DataFrame,
    qrels: DataFrame,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    k: int = 10,
) -> DataFrame:
    """Ranking-quality evaluation — NDCG@k, MRR@k, Precision@k per
    query: the feedback loop the retrieval family (bm25/tfidf/rrf)
    needs to be TUNABLE, not just runnable.

    ``results``: (query, doc, rank) with rank 1-based; ``qrels``:
    (query, doc, graded relevance >= 0). Conventions pinned for
    cross-engine replay: DCG uses the graded form rel/log2(rank+1)
    (not 2^rel−1 — equivalent for binary labels, tamer for graded);
    IDCG sorts by (rel DESC, doc ASC) so ties are deterministic; MRR
    uses the first rank with rel > 0; queries with NO relevant docs
    are dropped (metrics undefined), matching trec_eval. log2 is raw
    IEEE in identical order both engines; outputs round at 6dp per the
    libm rule.

    Scale shape: one left join of the top-k results against qrels on
    (query, doc), one per-query ranked window over qrels for the ideal
    gains (both shuffles are query-keyed), one aggregate.
    """
    from pyspark.sql import Window

    if k <= 0:
        raise ValueError("k must be positive")
    q, d, r = F.col(query_col), F.col(doc_col), F.col(rank_col)
    hits = (
        results.filter(r <= k)
        .join(
            qrels.select(
                q.alias("_q"), d.alias("_d"), F.col(rel_col).alias("_rel")
            ),
            (q == F.col("_q")) & (d == F.col("_d")),
            "left",
        )
        .select(
            query_col,
            rank_col,
            F.coalesce(F.col("_rel"), F.lit(0)).cast("double").alias("_rel"),
        )
    )
    per_query = hits.groupBy(query_col).agg(
        F.round(
            F.sum(
                F.col("_rel") / F.log2(F.col(rank_col).cast("double") + 1.0)
            ),
            9,
        ).alias("_dcg"),
        F.max(
            F.when(F.col("_rel") > 0, F.lit(1.0) / F.col(rank_col))
        ).alias("_rr"),
        (
            F.sum(F.when(F.col("_rel") > 0, 1).otherwise(0))
            / F.lit(float(k))
        ).alias("_prec"),
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col(rel_col).desc(), F.col(doc_col).asc()
    )
    ideal = (
        qrels.filter(F.col(rel_col) > 0)
        .withColumn("_irank", F.row_number().over(w))
        .filter(F.col("_irank") <= k)
        .groupBy(query_col)
        .agg(
            F.round(
                F.sum(
                    F.col(rel_col).cast("double")
                    / F.log2(F.col("_irank").cast("double") + 1.0)
                ),
                9,
            ).alias("_idcg")
        )
    )
    return (
        per_query.join(ideal, query_col)  # inner: drops no-relevant queries
        .select(
            query_col,
            F.round(F.col("_dcg") / F.col("_idcg"), 6).alias("ndcg"),
            F.round(F.coalesce(F.col("_rr"), F.lit(0.0)), 6).alias("mrr"),
            F.round(F.col("_prec"), 6).alias("precision"),
        )
    )


def mmr_diversify(
    scored: DataFrame,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    vec_col: str = "embedding",
    rel_col: str = "rel",
    k: int = 5,
    lam: float = 0.7,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking — the diversification pass
    between retrieval and the context window: from each query's scored
    candidate list, greedily pick argmax λ·rel − (1−λ)·max(0, max_sim_
    to_already_selected), so near-duplicate passages stop crowding out
    the second topic. The penalty clamps at zero (the running max
    starts at 0): an anti-correlated candidate is "maximally diverse",
    it never earns a bonus for pointing away from the selection. Ties
    break on doc id; cosine over the candidate vectors.

    Scale contract (the rrf_fuse rule): candidates per query are an
    ALREADY-TOP-N list (tens to hundreds), so the per-query O(k·n)
    greedy loop runs in a grouped Arrow batch — keys parallelize, one
    query-keyed exchange, numpy inside. Inherently sequential per query
    (each pick changes the next argmax), so ROWS-ONLY like PAV/BPE.

    Output: (query, doc, mmr_rank 1..k, mmr_score 6dp).
    """
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    if k <= 0:
        raise ValueError("k must be positive")
    if not 0.0 <= lam <= 1.0:
        raise ValueError("lam must be in [0, 1]")

    fields = [f for f in scored.schema.fields if f.name in (query_col, doc_col)]
    out_schema = StructType(
        fields
        + [
            StructField("mmr_rank", IntegerType()),
            StructField("mmr_score", DoubleType()),
        ]
    )

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(doc_col).reset_index(drop=True)
        vecs = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        rel = pdf[rel_col].to_numpy(dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        unit = vecs / norms[:, None]
        n = len(pdf)
        selected: list[int] = []
        max_sim = np.zeros(n)
        out_rows = []
        for rank in range(1, min(k, n) + 1):
            score = lam * rel - (0.0 if not selected else (1 - lam) * max_sim)
            score = np.where(
                np.isin(np.arange(n), selected), -np.inf, score
            )
            best = int(np.argmax(score))  # argmax takes first -> doc-id tie order
            out_rows.append(
                {
                    query_col: pdf[query_col].iloc[best],
                    doc_col: pdf[doc_col].iloc[best],
                    "mmr_rank": rank,
                    "mmr_score": round(float(score[best]), 6),
                }
            )
            selected.append(best)
            max_sim = np.maximum(max_sim, unit @ unit[best])
        return pd.DataFrame(out_rows)

    return (
        scored.select(query_col, doc_col, vec_col, rel_col)
        .groupBy(query_col)
        .applyInPandas(pick, out_schema)
    )


def rbo_overlap(
    ranking_a: DataFrame,
    ranking_b: DataFrame,
    query_col: str = "query_id",
    item_col: str = "cand_id",
    rank_col: str = "rank",
    k: int = 10,
    p: float = 0.9,
) -> DataFrame:
    """Truncated RANK-BIASED OVERLAP between two top-k rankings per
    query (Webber, Moffat & Zobel 2010) — the ranking-similarity member
    of the retrieval-eval family (NDCG/MRR judge one ranking against
    labels; RBO compares two rankings against EACH OTHER, which is the
    question quantization/index/rerank A-B tests actually ask). Depth-d
    overlap gets geometric weight p^(d-1): agreement at the top matters
    most, exactly like user attention.

    RBO@k = (1-p) · Σ_{d=1..k} p^(d-1) · |A_1..d ∩ B_1..d| / d. The
    distributed form avoids materializing per-depth intersections: an
    item ranked r_a in A and r_b in B enters every depth
    d ≥ m = max(r_a, r_b), so its total contribution is the CONSTANT
    C[m] = Σ_{d=m..k} p^(d-1)/d — precomputed once in Python, embedded
    as 9dp decimal literals (bit-identical in any engine), and summed
    per query. One (query,item) equi-join of two top-k tables + one
    decimal agg; items present in only one ranking contribute zero
    (inner join drops them). This is the truncated prefix form (no
    residual extrapolation): a lower bound on full RBO, the standard
    reporting choice for fixed-k systems. IDENTICAL rankings score
    1 − p^k (the truncated maximum, ≈0.651 at k=10, p=0.9), not 1 —
    compare scores against that ceiling. Queries whose rankings share
    NO item emit no row (the inner join drops them): left-join the
    query universe and coalesce to 0 when absent-queries matter.

    Output: (query_col, overlap_k, rbo) — overlap_k = |A∩B| at depth k.
    """
    if not 0 < p < 1:
        raise ValueError("p must be in (0, 1)")
    if k < 1:
        raise ValueError("k must be >= 1")
    consts = []
    for m in range(1, k + 1):
        consts.append(round(sum(p ** (d - 1) / d for d in range(m, k + 1)), 9))
    carr = F.array(*[F.lit(c).cast("decimal(20,9)") for c in consts])
    a = ranking_a.select(
        F.col(query_col).alias("_q"),
        F.col(item_col).alias("_i"),
        F.col(rank_col).alias("_ra"),
    ).filter(F.col("_ra") <= k)
    b = ranking_b.select(
        F.col(query_col).alias("_q"),
        F.col(item_col).alias("_i"),
        F.col(rank_col).alias("_rb"),
    ).filter(F.col("_rb") <= k)
    joined = a.join(b, ["_q", "_i"]).select(
        "_q",
        F.element_at(
            carr, F.greatest("_ra", "_rb").cast("int")
        ).alias("_c"),
    )
    return joined.groupBy(F.col("_q").alias(query_col)).agg(
        F.count("*").cast("long").alias("overlap_k"),
        F.round(
            F.lit(1.0 - p) * F.sum("_c").cast("double"), 6
        ).alias("rbo"),
    )
