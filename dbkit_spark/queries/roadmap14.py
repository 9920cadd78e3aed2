"""Round-14 catalog queue (q433+): written and pre-verified this round,
NOT registered — merged into ``roadmap7.ROADMAP7`` (imported at the
bottom of ``roadmap7.py``; must not import roadmap7 back) and landed by
``roadmap7_landed`` when the rotation arithmetic allows (round 15 —
the staged-window discipline of the r8 verdict, queue capped at one
driver window).

Theme: the GENERATION-EVALUATION layer (token-F1/EM, corpus BLEU,
ROUGE-N, chrF, distinct-n diversity, pooled self-BLEU — the
model-output metrics a training-data engine needs the moment its
corpora start producing models) plus the remaining curation canon
(C4 line battery, Gopher duplicate line/paragraph rules, Heaps'-law
vocabulary growth) and eval/experimentation completions (ECE/MCE under
both binnings, MAUVE-style divergence frontier, 2x2 factorial
interaction, Kendall tau-b leaderboard stability). Same template as
the r9-r13 additions: operator + law/hand-case pytests
(tests/test_round14.py) + oracle pre-verified at sf0.001 and sf0.01
(tests/test_catalog.py::test_roadmap7_queue_preverified) at the
driver-canon contract of SURVEY.md Section 5.3 (scalar outputs only,
identical aliases both engines, unique tiebreakers).

Eval-pair derivation (shared by q433-q436/q446): the fixture has no
(candidate, reference) table, so pairs derive deterministically from
``documents`` IN BOTH ENGINES — ref = the doc's text; cand = the next
doc's text within the language (doc_id order) for doc_id % 3 = 0 (a
"wrong but related" candidate), else the doc's own first-half tokens
(a "truncated but faithful" candidate). Every derivation step is
engine-portable integer/list arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..sources import read_table

ROADMAP14: dict[str, tuple] = {}

# DuckDB twin of functions/text.tokens
_T = "list_filter(string_split_regex(lower({c}), '[^a-z0-9]+'), x -> x <> '')"

_PAIRS_SQL = f"""
  SELECT doc_id AS pair_id,
         CASE WHEN doc_id % 3 = 0 AND nxt IS NOT NULL THEN nxt
              ELSE array_to_string(list_slice(t, 1,
                     greatest(CAST(ceil(len(t) / 2.0) AS INTEGER), 1)), ' ')
         END AS cand,
         text AS ref
  FROM (SELECT doc_id, text,
               lead(text) OVER (PARTITION BY lang ORDER BY doc_id) AS nxt,
               {_T.format(c='text')} AS t
        FROM documents)
"""

_NORM_SQL = f"""
  SELECT pair_id, {_T.format(c='cand')} AS ct, {_T.format(c='rf')} AS rt
  FROM (SELECT pair_id, cand, ref AS rf FROM ({_PAIRS_SQL}))
"""


def _wgrams_sql(src: str, n: int) -> str:
    """DuckDB twin of functions/text.shingles_from_tokens over a token
    list column ``src`` (n=1 is the token list itself)."""
    if n == 1:
        return src
    return (
        f"CASE WHEN len({src}) >= {n} THEN "
        f"list_transform(generate_series(1, len({src}) - {n - 1}), "
        f"i -> array_to_string(list_slice({src}, i, i + {n - 1}), ' ')) "
        "ELSE CAST([] AS VARCHAR[]) END"
    )


def _eval_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("doc_id")
    t = tokens("text")
    half = F.array_join(
        F.slice(
            t, 1, F.greatest(F.ceil(F.size(t) / 2).cast("int"), F.lit(1))
        ),
        " ",
    )
    nxt = F.lead("text").over(w)
    return docs.select(
        F.col("doc_id").alias("pair_id"),
        F.when((F.col("doc_id") % 3 == 0) & nxt.isNotNull(), nxt)
        .otherwise(half)
        .alias("cand"),
        F.col("text").alias("ref"),
    )


# --- q433: token-level F1 + exact match (SQuAD) -----------------------------


def q433_token_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQuAD token-F1/EM (llm/texteval.token_f1) over the derived
    eval pairs — per pair the multiset overlap, single-division
    P/R/F1, and normalized exact match."""
    from ..llm.texteval import token_f1

    return token_f1(_eval_pairs(spark, sf_dir)).orderBy("pair_id")


def _q433_oracle() -> str:
    return f"""
    WITH norm AS ({_NORM_SQL}),
    base AS (
      SELECT pair_id, len(ct) AS n_cand, len(rt) AS n_ref,
             CASE WHEN array_to_string(ct, ' ') = array_to_string(rt, ' ')
                  THEN 1 ELSE 0 END AS exact_match
      FROM norm),
    cc AS (SELECT pair_id, tok, COUNT(*) AS c
           FROM (SELECT pair_id, unnest(ct) AS tok FROM norm)
           GROUP BY pair_id, tok),
    rc AS (SELECT pair_id, tok, COUNT(*) AS c
           FROM (SELECT pair_id, unnest(rt) AS tok FROM norm)
           GROUP BY pair_id, tok),
    ov AS (SELECT cc.pair_id, SUM(least(cc.c, rc.c)) AS overlap
           FROM cc JOIN rc ON cc.pair_id = rc.pair_id AND cc.tok = rc.tok
           GROUP BY cc.pair_id)
    SELECT b.pair_id,
           CAST(b.n_cand AS BIGINT) AS n_cand,
           CAST(b.n_ref AS BIGINT) AS n_ref,
           CAST(COALESCE(o.overlap, 0) AS BIGINT) AS overlap,
           round(CASE WHEN b.n_cand = 0 AND b.n_ref = 0 THEN 1.0
                      WHEN b.n_cand = 0 THEN 0.0
                      ELSE COALESCE(o.overlap, 0) / b.n_cand END, 6)
             AS precision,
           round(CASE WHEN b.n_cand = 0 AND b.n_ref = 0 THEN 1.0
                      WHEN b.n_ref = 0 THEN 0.0
                      ELSE COALESCE(o.overlap, 0) / b.n_ref END, 6)
             AS recall,
           round(CASE WHEN b.n_cand = 0 AND b.n_ref = 0 THEN 1.0
                      ELSE 2.0 * COALESCE(o.overlap, 0)
                           / (b.n_cand + b.n_ref) END, 6) AS f1,
           CAST(b.exact_match AS INTEGER) AS exact_match
    FROM base b LEFT JOIN ov o ON b.pair_id = o.pair_id
    ORDER BY b.pair_id
    """


_Q433_NOTES = (
    "TOKEN-LEVEL F1 + EXACT MATCH (llm/texteval.token_f1 — Rajpurkar "
    "et al. EMNLP 2016, the SQuAD answer metric; multiset overlap = "
    "sum of min(count_cand, count_ref) per token): every ratio is ONE "
    "IEEE division of exact LONGs — F1 via the multiset identity "
    "2*overlap/(n_cand+n_ref), no compounding; token explode -> "
    "(pair, tok) count agg per side -> inner equi-join -> pair-keyed "
    "reduce, pair-keyed end-to-end; both-empty pairs score 1 "
    "(vacuous), one-empty 0"
)

ROADMAP14["q433_token_f1"] = (q433_token_f1, _q433_oracle(), _Q433_NOTES)


# --- q434: corpus BLEU -------------------------------------------------------


def q434_bleu_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus BLEU-4 (llm/texteval.bleu_corpus) over the derived eval
    pairs — pooled clipped n-gram precisions, brevity penalty, and the
    geometric-mean BLEU, one row per order."""
    from ..llm.texteval import bleu_corpus

    return bleu_corpus(_eval_pairs(spark, sf_dir)).orderBy("n")


def _q434_oracle() -> str:
    grams_side = " UNION ALL ".join(
        f"SELECT pair_id, {n} AS n, unnest({_wgrams_sql('{col}', n)}) AS gram "
        "FROM norm"
        for n in (1, 2, 3, 4)
    )
    return f"""
    WITH norm AS ({_NORM_SQL}),
    cg AS (SELECT pair_id, n, gram, COUNT(*) AS c
           FROM ({grams_side.format(col='ct')}) GROUP BY pair_id, n, gram),
    rg AS (SELECT pair_id, n, gram, COUNT(*) AS c
           FROM ({grams_side.format(col='rt')}) GROUP BY pair_id, n, gram),
    ov AS (SELECT cg.n, SUM(least(cg.c, rg.c)) AS clipped
           FROM cg JOIN rg ON cg.pair_id = rg.pair_id AND cg.n = rg.n
                          AND cg.gram = rg.gram
           GROUP BY cg.n),
    tot AS (SELECT n.n,
                   SUM(greatest(len(ct) - n.n + 1, 0)) AS total
            FROM norm CROSS JOIN (VALUES (1), (2), (3), (4)) n(n)
            GROUP BY n.n),
    lens AS (SELECT SUM(len(ct)) AS c_len, SUM(len(rt)) AS r_len FROM norm),
    per_n AS (
      SELECT t.n, COALESCE(o.clipped, 0) AS clipped, t.total,
             CASE WHEN t.total > 0
                  THEN round(COALESCE(o.clipped, 0) / t.total, 9) END AS p_n
      FROM tot t LEFT JOIN ov o ON t.n = o.n),
    geo AS (
      SELECT min(p_n) AS pmin,
             SUM(CASE WHEN p_n > 0
                      THEN CAST(round(ln(p_n), 9) AS DECIMAL(25,9)) END)
               AS lnsum,
             COUNT(p_n) AS k
      FROM per_n)
    SELECT CAST(per_n.n AS INTEGER) AS n,
           CAST(per_n.clipped AS BIGINT) AS clipped,
           CAST(per_n.total AS BIGINT) AS total,
           round(p_n, 6) AS p_n,
           CAST(lens.c_len AS BIGINT) AS c_len,
           CAST(lens.r_len AS BIGINT) AS r_len,
           round(least(1.0, exp(1.0 - lens.r_len / lens.c_len)), 6) AS bp,
           round(CASE WHEN geo.pmin <= 0 THEN 0.0
                      ELSE least(1.0, exp(1.0 - lens.r_len / lens.c_len))
                           * exp(CAST(geo.lnsum AS DOUBLE) / geo.k) END, 6)
             AS bleu
    FROM per_n CROSS JOIN lens CROSS JOIN geo
    ORDER BY per_n.n
    """


_Q434_NOTES = (
    "CORPUS BLEU-4 (llm/texteval.bleu_corpus — Papineni et al. ACL "
    "2002): modified n-gram precision pooled over the corpus (clipped "
    "= sum min(count_cand, count_ref) per gram), brevity penalty "
    "min(1, e^(1-r/c)), geometric mean over effective orders; counts "
    "exact LONG, each p_n ONE IEEE division at 9dp, ln terms ride "
    "DECIMAL(25,9) so the 4-term sum is order-independent, exp at the "
    "6dp emit boundary (q379/q384 libm precedent); any p_n = 0 pins "
    "bleu = 0 (unsmoothed convention, documented); shared "
    "clipped_ngram_stats primitive with q435, pair-keyed exchanges + "
    "one 4-row reduce + 1-row broadcasts"
)

ROADMAP14["q434_bleu_corpus"] = (q434_bleu_corpus, _q434_oracle(), _Q434_NOTES)


# --- q435: ROUGE-N -----------------------------------------------------------


def q435_rouge_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-1/2 (llm/texteval.rouge_n) over the derived eval pairs —
    per (pair, n) clipped overlap with reference-side recall (the
    classic ROUGE reading), precision and F1."""
    from ..llm.texteval import rouge_n

    return rouge_n(_eval_pairs(spark, sf_dir)).orderBy("pair_id", "n")


def _q435_oracle() -> str:
    grams_side = " UNION ALL ".join(
        f"SELECT pair_id, {n} AS n, unnest({_wgrams_sql('{col}', n)}) AS gram "
        "FROM norm"
        for n in (1, 2)
    )
    return f"""
    WITH norm AS ({_NORM_SQL}),
    cg AS (SELECT pair_id, n, gram, COUNT(*) AS c
           FROM ({grams_side.format(col='ct')}) GROUP BY pair_id, n, gram),
    rg AS (SELECT pair_id, n, gram, COUNT(*) AS c
           FROM ({grams_side.format(col='rt')}) GROUP BY pair_id, n, gram),
    ov AS (SELECT cg.pair_id, cg.n, SUM(least(cg.c, rg.c)) AS overlap
           FROM cg JOIN rg ON cg.pair_id = rg.pair_id AND cg.n = rg.n
                          AND cg.gram = rg.gram
           GROUP BY cg.pair_id, cg.n),
    tot AS (SELECT pair_id, n.n,
                   greatest(len(ct) - n.n + 1, 0) AS cand_grams,
                   greatest(len(rt) - n.n + 1, 0) AS ref_grams
            FROM norm CROSS JOIN (VALUES (1), (2)) n(n))
    SELECT t.pair_id, CAST(t.n AS INTEGER) AS n,
           CAST(COALESCE(o.overlap, 0) AS BIGINT) AS overlap,
           CAST(t.cand_grams AS BIGINT) AS cand_grams,
           CAST(t.ref_grams AS BIGINT) AS ref_grams,
           round(CASE WHEN t.cand_grams > 0
                      THEN COALESCE(o.overlap, 0) / t.cand_grams END, 6)
             AS precision,
           round(CASE WHEN t.ref_grams > 0
                      THEN COALESCE(o.overlap, 0) / t.ref_grams END, 6)
             AS recall,
           round(CASE WHEN t.cand_grams = 0 AND t.ref_grams = 0 THEN 1.0
                      ELSE 2.0 * COALESCE(o.overlap, 0)
                           / (t.cand_grams + t.ref_grams) END, 6) AS f1
    FROM tot t LEFT JOIN ov o ON t.pair_id = o.pair_id AND t.n = o.n
    ORDER BY t.pair_id, t.n
    """


_Q435_NOTES = (
    "ROUGE-1/2 (llm/texteval.rouge_n — Lin WAS 2004, the "
    "summarization recall metric; precision/F1 alongside per modern "
    "usage): same clipped_ngram_stats primitive as q434 (counts exact "
    "LONG, single IEEE divisions, F1 = 2*ov/(cg+rg)); sides with no "
    "grams degrade to NULL ratio, both-empty pairs F1 = 1 (vacuous); "
    "pair-keyed end-to-end"
)

ROADMAP14["q435_rouge_n"] = (q435_rouge_n, _q435_oracle(), _Q435_NOTES)


# --- q436: chrF --------------------------------------------------------------


def q436_chrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """chrF (llm/texteval.chrf_score) over the derived eval pairs —
    character n-gram F2 over whitespace-stripped text, effective-order
    averaged."""
    from ..llm.texteval import chrf_score

    return chrf_score(_eval_pairs(spark, sf_dir)).orderBy("pair_id")


def _q436_oracle() -> str:
    def cgrams(src: str, n: int) -> str:
        return (
            f"CASE WHEN length({src}) >= {n} THEN "
            f"list_transform(generate_series(1, length({src}) - {n - 1}), "
            f"i -> substr({src}, i, {n})) ELSE CAST([] AS VARCHAR[]) END"
        )

    grams_side = " UNION ALL ".join(
        f"SELECT pair_id, {n} AS n, unnest({cgrams('{col}', n)}) AS gram "
        "FROM stripped"
        for n in (1, 2, 3, 4, 5, 6)
    )
    return f"""
    WITH stripped AS (
      SELECT pair_id,
             regexp_replace(lower(cand), '\\s+', '', 'g') AS cs,
             regexp_replace(lower(ref), '\\s+', '', 'g') AS rs
      FROM ({_PAIRS_SQL})),
    cg AS (SELECT pair_id, n, gram, COUNT(*) AS c
           FROM ({grams_side.format(col='cs')}) GROUP BY pair_id, n, gram),
    rg AS (SELECT pair_id, n, gram, COUNT(*) AS c
           FROM ({grams_side.format(col='rs')}) GROUP BY pair_id, n, gram),
    ov AS (SELECT cg.pair_id, cg.n, SUM(least(cg.c, rg.c)) AS ovl
           FROM cg JOIN rg ON cg.pair_id = rg.pair_id AND cg.n = rg.n
                          AND cg.gram = rg.gram
           GROUP BY cg.pair_id, cg.n),
    tot AS (SELECT pair_id, n.n,
                   greatest(length(cs) - n.n + 1, 0) AS cgr,
                   greatest(length(rs) - n.n + 1, 0) AS rgr
            FROM stripped
            CROSS JOIN (VALUES (1), (2), (3), (4), (5), (6)) n(n)),
    per_n AS (
      SELECT t.pair_id, t.n, COALESCE(o.ovl, 0) AS ovl, t.cgr, t.rgr
      FROM tot t LEFT JOIN ov o ON t.pair_id = o.pair_id AND t.n = o.n),
    per_pair AS (
      SELECT pair_id,
             SUM(CASE WHEN cgr > 0
                      THEN CAST(round(ovl / cgr, 9) AS DECIMAL(25,9)) END)
               AS psum,
             COUNT(CASE WHEN cgr > 0 THEN 1 END) AS pk,
             SUM(CASE WHEN rgr > 0
                      THEN CAST(round(ovl / rgr, 9) AS DECIMAL(25,9)) END)
               AS rsum,
             COUNT(CASE WHEN rgr > 0 THEN 1 END) AS rk,
             max(cgr) AS anyc, max(rgr) AS anyr
      FROM per_n GROUP BY pair_id)
    SELECT pair_id,
           round(CASE WHEN anyc = 0 AND anyr = 0 THEN 1.0
                      WHEN pk = 0 THEN 0.0
                      ELSE CAST(psum AS DOUBLE) / pk END, 6) AS chr_p,
           round(CASE WHEN anyc = 0 AND anyr = 0 THEN 1.0
                      WHEN rk = 0 THEN 0.0
                      ELSE CAST(rsum AS DOUBLE) / rk END, 6) AS chr_r,
           round(CASE WHEN anyc = 0 AND anyr = 0 THEN 1.0
                      WHEN anyc = 0 OR anyr = 0 OR pk = 0 OR rk = 0 THEN 0.0
                      WHEN CAST(psum AS DOUBLE) / pk = 0
                           OR CAST(rsum AS DOUBLE) / rk = 0 THEN 0.0
                      ELSE 5.0 * (CAST(psum AS DOUBLE) / pk)
                           * (CAST(rsum AS DOUBLE) / rk)
                           / (4.0 * (CAST(psum AS DOUBLE) / pk)
                              + (CAST(rsum AS DOUBLE) / rk)) END, 6) AS chrf
    FROM per_pair ORDER BY pair_id
    """


_Q436_NOTES = (
    "chrF (llm/texteval.chrf_score — Popovic WMT 2015, the "
    "tokenization-free character-n-gram F2 of WMT evals): n = 1..6 "
    "over whitespace-stripped lowercased text; per-order clipped "
    "ratios are single IEEE divisions at 9dp riding DECIMAL(25,9) "
    "sums, chrP/chrR averaged over the orders the side HAS grams for "
    "(sacrebleu effective-order handling), chrF = 5PR/(4P+R) fixed-"
    "form IEEE on identical doubles; pair-keyed char-gram explodes, "
    "nothing corpus-global"
)

ROADMAP14["q436_chrf"] = (q436_chrf, _q436_oracle(), _Q436_NOTES)
