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


# Gopher's "stop words" rule list (Rae et al. 2021, Appendix A1.1):
# a document must contain at least 2 of these 8 to pass.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_filters(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """The DOCUMENT-LEVEL Gopher quality rules (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", Appendix A1.1 — the rule set
    MassiveText filtered with, reused by most open pipelines since):
    word-count bounds, mean-word-length bounds, symbol-to-word ratio
    (# and ellipsis), alphabetic-word fraction, and the >=2-of-8
    stop-word presence rule. Per the paper, the symbol rule is checked
    PER SYMBOL — the hash ratio and the ellipsis ratio must each stay
    <= ``max_symbol_ratio`` (a doc at 0.06 hash + 0.06 ellipsis
    passes); ellipses count both ASCII ``...`` and Unicode U+2026. The
    reported ``symbol_ratio`` is the binding one (the max of the two),
    so ``symbol_ratio <= max_symbol_ratio`` iff the rule passes. The
    paper's LINE-level rules (bullet-start / ellipsis-end line ratios)
    need line-preserving text and are intentionally NOT approximated
    here — run them upstream where newlines still exist.

    Map-only: every stat is array/regex math inside whole-stage codegen
    over one pass of the text — no shuffle, no UDF, embarrassingly
    parallel at any corpus size. Ratios are single IEEE divisions of
    exact integer counts (engine-portable); zero-word documents fail
    the word-count rule and report NULL ratios (try_divide).

    Output per doc: the five stats, one boolean per rule, and
    ``passes`` (AND of all rules).
    """
    t = F.col(text_col)
    toks = tokens(text_col)
    n_words = F.size(toks)
    total_len = F.aggregate(toks, F.lit(0), lambda a, x: a + F.length(x))
    mean_wlen = F.try_divide(total_len.cast("double"), n_words)
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))
    ) / F.lit(3) + (
        F.length(t) - F.length(F.replace(t, F.lit("…"), F.lit("")))
    )
    hash_ratio = F.try_divide(n_hash.cast("double"), n_words)
    ellipsis_ratio = F.try_divide(n_ellipsis.cast("double"), n_words)
    symbol_ratio = F.greatest(hash_ratio, ellipsis_ratio)
    n_alpha = F.size(F.filter(toks, lambda x: x.rlike("[a-z]")))
    alpha_frac = F.try_divide(n_alpha.cast("double"), n_words)
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    )
    r_wc = n_words.between(min_words, max_words)
    r_mwl = F.coalesce(
        mean_wlen.between(min_mean_word_len, max_mean_word_len), F.lit(False)
    )
    r_sym = F.coalesce(symbol_ratio <= max_symbol_ratio, F.lit(False))
    r_alpha = F.coalesce(alpha_frac >= min_alpha_word_frac, F.lit(False))
    r_stop = stop_hits >= min_stop_hits
    return docs.select(
        id_col,
        n_words.cast("long").alias("n_words"),
        F.round(mean_wlen, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        stop_hits.cast("long").alias("stop_hits"),
        r_wc.alias("rule_word_count"),
        r_mwl.alias("rule_mean_word_len"),
        r_sym.alias("rule_symbol_ratio"),
        r_alpha.alias("rule_alpha_words"),
        r_stop.alias("rule_stopwords"),
        (r_wc & r_mwl & r_sym & r_alpha & r_stop).alias("passes"),
    )


def zipf_fit(
    docs: DataFrame,
    group_col: str,
    text_col: str = "text",
    top_r: int = 1000,
) -> DataFrame:
    """Zipf-law fit per group — the corpus-health diagnostic (a healthy
    natural-language corpus has ln(freq) ~ intercept - s·ln(rank) with
    s ≈ 1; template/boilerplate-heavy or synthetic corpora bend the
    curve): OLS of ln(freq) on ln(rank) over the top ``top_r`` vocab
    terms of each group.

    Scale shape: the ONLY window runs over the vocab-sized frequency
    table partitioned by group (never the corpus); the fit is a
    closed-form five-sum aggregate. ``top_r`` caps the fitted head
    deterministically (rank ties broken by token ASC) — the standard
    practice, since the hapax tail is censored and bends any fit.

    Cross-engine determinism: counts exact LONGs; ln(rank)/ln(freq)
    round at 9dp (libm rule); their products re-round at 9dp before
    the DECIMAL fold; the final slope/intercept arithmetic is a fixed
    IEEE expression of the folded sums. Groups with < 2 distinct terms
    report NULL slope (fit undefined).

    Output per group: (group, n_terms, zipf_slope 6dp, intercept 6dp).
    """
    from pyspark.sql import Window

    if top_r < 2:
        raise ValueError("top_r must be >= 2")
    freq = (
        docs.select(F.col(group_col).alias("grp"), F.explode(tokens(text_col)).alias("tok"))
        .groupBy("grp", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("grp").orderBy(F.col("c").desc(), F.col("tok").asc())
    ranked = (
        freq.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_r)
        .select(
            "grp",
            F.round(F.log(F.col("rk").cast("double")), 9).alias("x"),
            F.round(F.log(F.col("c").cast("double")), 9).alias("y"),
        )
    )
    dec = lambda c: F.sum(F.round(c, 9).cast("decimal(38,12)")).cast("double")  # noqa: E731
    sums = ranked.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_terms"),
        dec(F.col("x")).alias("_sx"),
        dec(F.col("y")).alias("_sy"),
        dec(F.col("x") * F.col("y")).alias("_sxy"),
        dec(F.col("x") * F.col("x")).alias("_sxx"),
    )
    n = F.col("n_terms").cast("double")
    slope = F.try_divide(
        n * F.col("_sxy") - F.col("_sx") * F.col("_sy"),
        n * F.col("_sxx") - F.col("_sx") * F.col("_sx"),
    )
    return sums.select(
        F.col("grp").alias(group_col),
        "n_terms",
        F.round(slope, 6).alias("zipf_slope"),
        F.round((F.col("_sy") - slope * F.col("_sx")) / n, 6).alias(
            "intercept"
        ),
    )


def unigram_js_divergence(
    docs: DataFrame,
    group_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Jensen-Shannon divergence of each group's unigram distribution
    from the WHOLE corpus's — the domain-drift score a mixture pipeline
    watches (a domain whose token distribution diverges is mis-tagged,
    contaminated, or genuinely novel; JS is symmetric and bounded by
    ln 2, unlike KL).

    The trick that keeps this domain-vocab sized (never |domains| ×
    |vocab|): every out-of-domain term of KL(P_corpus ‖ M) collapses to
    ln 2 · P_out, because there M = P/2 exactly; P_out = 1 − Σ_in P is
    computed from EXACT integer sums, so no corpus-vocab scan per group
    is ever needed. The remaining sums run over (group, token) pairs
    PRESENT in the group.

    Plan: two count aggregates (corpus vocab + per-group vocab), one
    broadcast-friendly equi-join on the token key, one group-keyed
    decimal fold. ln terms 9dp (libm rule), products re-rounded 9dp
    before the fold. Output: (group, n_tokens, n_terms, js 6dp).
    """
    import math

    tok = docs.select(
        F.col(group_col).alias("grp"), F.explode(tokens(text_col)).alias("tok")
    )
    cw = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c_all"))
    tot = cw.agg(F.sum("c_all").alias("t_all"))
    cg = tok.groupBy("grp", "tok").agg(F.count(F.lit(1)).alias("c_g"))
    tg = cg.groupBy("grp").agg(F.sum("c_g").alias("t_g"))
    joined = (
        cg.join(cw, "tok")
        .join(F.broadcast(tg), "grp")
        .crossJoin(F.broadcast(tot))
    )
    pd_ = F.col("c_g") / F.col("t_g")
    p = F.col("c_all") / F.col("t_all")
    m = (pd_ + p) / F.lit(2.0)
    terms = joined.select(
        "grp",
        "c_all",
        F.round(pd_ * F.log(pd_ / m), 9).alias("_kd"),
        F.round(p * F.log(p / m), 9).alias("_kp"),
    )
    dec = lambda c: F.sum(c.cast("decimal(38,12)")).cast("double")  # noqa: E731
    agg = (
        terms.groupBy("grp")
        .agg(
            dec(F.col("_kd")).alias("_skd"),
            dec(F.col("_kp")).alias("_skp"),
            F.sum("c_all").alias("_cin"),
            F.count(F.lit(1)).alias("n_terms"),
        )
        .join(F.broadcast(tg), "grp")
        .crossJoin(F.broadcast(tot))
    )
    p_out = F.lit(1.0) - F.col("_cin") / F.col("t_all")
    js = F.lit(0.5) * F.col("_skd") + F.lit(0.5) * (
        F.col("_skp") + F.lit(math.log(2.0)) * p_out
    )
    return agg.select(
        F.col("grp").alias(group_col),
        F.col("t_g").cast("long").alias("n_tokens"),
        "n_terms",
        F.round(js, 6).alias("js"),
    )
