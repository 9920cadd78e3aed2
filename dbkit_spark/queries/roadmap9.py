"""Round-9 catalog queue (q316+): written and pre-verified this round,
NOT registered — merged into ``roadmap7.ROADMAP7`` (this module is
imported at the bottom of ``roadmap7.py``; it must not import roadmap7
back) and landed by ``roadmap7_landed`` when the rotation arithmetic
allows (round 10, per the staged-50 discipline of the r8 verdict).

Fixture-noise rule for this module: deterministic INTEGER hashing
``(key * 2654435761) % m`` (Knuth multiplicative, BIGINT-safe in both
engines) instead of the md5-hex rule — same replayability, no string
machinery in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import read_table

ROADMAP9: dict[str, tuple] = {}

_MULT = 2654435761  # Knuth multiplicative constant (shared with llm/audio)


def _hash_mod(col, salt: int, m: int):
    """Portable deterministic noise: ((key + salt) * MULT) % m, all
    BIGINT — identical in Spark and DuckDB."""
    return ((col + F.lit(salt)) * F.lit(_MULT)) % F.lit(m)


def _hash_mod_sql(expr: str, salt: int, m: int) -> str:
    return f"(({expr} + {salt}) * {_MULT}) % {m}"


# --- q316: Cohen's kappa ----------------------------------------------------


def q316_cohen_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two synthetic raters over orders: rater r1 reads the true
    priority class; rater r2 agrees unless its hash draw (~30%) flips
    the label to a rotated class. cohen_kappa chance-corrects the
    agreement (operators/agreement.py)."""
    from ..operators.agreement import cohen_kappa

    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("item"),
        F.substring("o_orderpriority", 1, 1).alias("cls"),
    )
    flip = _hash_mod(F.col("item"), 17, 10) < 3
    rot = F.concat(
        ((F.col("cls").cast("int") % 5) + 1).cast("string")
    )
    labels = o.select(
        "item", F.lit("r1").alias("rater"), F.col("cls").alias("label")
    ).unionByName(
        o.select(
            "item",
            F.lit("r2").alias("rater"),
            F.when(flip, rot).otherwise(F.col("cls")).alias("label"),
        )
    )
    return cohen_kappa(labels, "item", "rater", "label", "r1", "r2")


_Q316_ORACLE = f"""
    WITH o AS (
      SELECT o_orderkey AS item, substr(o_orderpriority, 1, 1) AS cls
      FROM orders
    ),
    pairs AS (
      SELECT item, cls AS la,
        CASE WHEN {_hash_mod_sql('item', 17, 10)} < 3
             THEN CAST((CAST(cls AS INTEGER) % 5) + 1 AS VARCHAR)
             ELSE cls END AS lb
      FROM o
    ),
    tot AS (
      SELECT COUNT(*) AS n_items,
             SUM(CASE WHEN la = lb THEN 1 ELSE 0 END) AS agree
      FROM pairs
    ),
    ma AS (SELECT la, COUNT(*) AS na FROM pairs GROUP BY la),
    mb AS (SELECT lb, COUNT(*) AS nb FROM pairs GROUP BY lb),
    pe AS (
      SELECT SUM(ma.na * mb.nb) AS pe_num
      FROM ma JOIN mb ON ma.la = mb.lb
    )
    SELECT t.n_items,
           round(CAST(t.agree AS DOUBLE) / t.n_items, 9) AS po,
           round(CAST(p.pe_num AS DOUBLE)
                 / (CAST(t.n_items AS DOUBLE) * t.n_items), 9) AS pe,
           round(((CAST(t.agree AS DOUBLE) / t.n_items)
                  - (CAST(p.pe_num AS DOUBLE)
                     / (CAST(t.n_items AS DOUBLE) * t.n_items)))
                 / (1.0 - (CAST(p.pe_num AS DOUBLE)
                           / (CAST(t.n_items AS DOUBLE) * t.n_items))), 9)
             AS kappa
    FROM tot t, pe p
"""

_Q316_NOTES = (
    "COHEN'S KAPPA (operators/agreement.cohen_kappa — chance-corrected "
    "two-rater agreement, the gate every labeling pipeline runs before "
    "training on preference/moderation labels; asymmetric-marginals "
    "form per Cohen 1960): one item-equi join + ONE confusion-matrix "
    "hash agg; marginals and pe are metadata-sized scalar crossJoins "
    "that pass the structural NLJ gate. Exact integer counts, one IEEE "
    "division per term, 9dp"
)

ROADMAP9["q316_cohen_kappa"] = (q316_cohen_kappa, _Q316_ORACLE, _Q316_NOTES)


# --- q317: Fleiss' kappa ----------------------------------------------------


def q317_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3–5 synthetic raters per order (rater count varies by item so
    the unequal-n_i generalization is exercised), each rater flipping
    the true class on its own hash draw; fleiss_kappa aggregates
    per-item agreement vs chance."""
    from ..operators.agreement import fleiss_kappa

    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("item"),
        F.substring("o_orderpriority", 1, 1).alias("cls"),
    )
    n_raters = (_hash_mod(F.col("item"), 3, 3) + 3).cast("int")  # 3..5
    exploded = o.select(
        "item", "cls", F.explode(F.sequence(F.lit(1), n_raters)).alias("rater")
    )
    flip = _hash_mod(F.col("item") * 7 + F.col("rater"), 29, 10) < 2
    rot = ((F.col("cls").cast("int") % 5) + 1).cast("string")
    labels = exploded.select(
        "item",
        "rater",
        F.when(flip, rot).otherwise(F.col("cls")).alias("label"),
    )
    return fleiss_kappa(labels, "item", "label")


_Q317_ORACLE = f"""
    WITH o AS (
      SELECT o_orderkey AS item, substr(o_orderpriority, 1, 1) AS cls,
             CAST({_hash_mod_sql('o_orderkey', 3, 3)} + 3 AS INTEGER) AS nr
      FROM orders
    ),
    labels AS (
      SELECT item,
        CASE WHEN {_hash_mod_sql('(item * 7 + r.rater)', 29, 10)} < 2
             THEN CAST((CAST(cls AS INTEGER) % 5) + 1 AS VARCHAR)
             ELSE cls END AS label
      FROM o, UNNEST(generate_series(1, o.nr)) AS r(rater)
    ),
    cell AS (
      SELECT item, label, COUNT(*) AS nic FROM labels GROUP BY item, label
    ),
    item AS (
      SELECT item, SUM(nic) AS ni, SUM(nic * nic) AS sq
      FROM cell GROUP BY item HAVING SUM(nic) >= 2
    ),
    pbar AS (
      SELECT COUNT(*) AS n_items, CAST(SUM(ni) AS BIGINT) AS n_ratings,
             SUM(CAST(sq - ni AS DOUBLE) / (ni * (ni - 1))) AS p_sum
      FROM item
    ),
    marg AS (
      SELECT c.label, SUM(c.nic) AS nc
      FROM cell c JOIN item i USING (item) GROUP BY c.label
    ),
    pe AS (
      SELECT SUM((CAST(m.nc AS DOUBLE) / p.n_ratings)
                 * (CAST(m.nc AS DOUBLE) / p.n_ratings)) AS pe
      FROM marg m, pbar p
    )
    SELECT p.n_items, p.n_ratings,
           round(p.p_sum / p.n_items, 9) AS p_bar,
           round(e.pe, 9) AS p_e,
           round((p.p_sum / p.n_items - e.pe) / (1.0 - e.pe), 9) AS kappa
    FROM pbar p, pe e
"""

_Q317_NOTES = (
    "FLEISS' KAPPA (operators/agreement.fleiss_kappa — multi-rater "
    "chance-corrected agreement, generalized to unequal raters-per-item "
    "with per-item n_i; items under 2 ratings excluded): two hash aggs "
    "((item,label) then item) + metadata-sized marginals; the fixture "
    "varies rater count 3-5 per item so the generalization is pinned. "
    "Scalar crossJoins only — passes the structural NLJ gate"
)

ROADMAP9["q317_fleiss_kappa"] = (q317_fleiss_kappa, _Q317_ORACLE, _Q317_NOTES)


# --- q318: multiclass classification report ---------------------------------


def q318_classification_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier eval over customer segments: prediction = true
    segment unless the hash draw (~25%) rotates it; classification_report
    emits per-class precision/recall/F1 plus macro/micro rows."""
    from ..operators.mlmetrics import classification_report

    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), F.col("c_mktsegment").alias("label")
    )
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    rot = F.element_at(
        F.array(*[F.lit(s) for s in segs]),
        _hash_mod(F.col("k"), 91, 5).cast("int") + 1,
    )
    preds = c.select(
        "label",
        F.when(_hash_mod(F.col("k"), 57, 8) < 2, rot).otherwise(F.col("label")).alias(
            "pred"
        ),
    )
    return classification_report(preds, "label", "pred").orderBy("class")


_Q318_ORACLE = f"""
    WITH preds AS (
      SELECT c_mktsegment AS label,
        CASE WHEN {_hash_mod_sql('c_custkey', 57, 8)} < 2
             THEN (['AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD',
                    'MACHINERY'])[CAST({_hash_mod_sql('c_custkey', 91, 5)}
                                  AS INTEGER) + 1]
             ELSE c_mktsegment END AS pred
      FROM customer
    ),
    cm AS (SELECT label, pred, COUNT(*) AS n FROM preds GROUP BY label, pred),
    classes AS (
      SELECT DISTINCT label AS c FROM cm
      UNION SELECT DISTINCT pred AS c FROM cm
    ),
    per AS (
      SELECT cl.c AS class,
             CAST(COALESCE(s.support, 0) AS BIGINT) AS support,
             CAST(COALESCE(t.tp, 0) AS BIGINT) AS tp,
             CAST(COALESCE(p.predicted, 0) - COALESCE(t.tp, 0) AS BIGINT) AS fp,
             CAST(COALESCE(s.support, 0) - COALESCE(t.tp, 0) AS BIGINT) AS fn
      FROM classes cl
      LEFT JOIN (SELECT label, SUM(n) AS support FROM cm GROUP BY label) s
        ON s.label = cl.c
      LEFT JOIN (SELECT label, n AS tp FROM cm WHERE label = pred) t
        ON t.label = cl.c
      LEFT JOIN (SELECT pred, SUM(n) AS predicted FROM cm GROUP BY pred) p
        ON p.pred = cl.c
    ),
    scored AS (
      SELECT class, support, tp, fp, fn,
        CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (tp + fp)
             ELSE 0.0 END AS prec,
        CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (tp + fn)
             ELSE 0.0 END AS rec
      FROM per
    ),
    rows_per AS (
      SELECT class, support, tp, fp, fn, prec, rec,
        CASE WHEN prec + rec > 0 THEN 2.0 * prec * rec / (prec + rec)
             ELSE 0.0 END AS f1
      FROM scored
    ),
    macro AS (
      SELECT '__macro__' AS class, CAST(SUM(support) AS BIGINT) AS support,
             CAST(SUM(tp) AS BIGINT) AS tp, CAST(SUM(fp) AS BIGINT) AS fp,
             CAST(SUM(fn) AS BIGINT) AS fn,
             AVG(prec) AS prec, AVG(rec) AS rec, AVG(f1) AS f1
      FROM rows_per
    ),
    micro AS (
      SELECT '__micro__' AS class, CAST(SUM(support) AS BIGINT) AS support,
             CAST(SUM(tp) AS BIGINT) AS tp, CAST(SUM(fp) AS BIGINT) AS fp,
             CAST(SUM(fn) AS BIGINT) AS fn,
             CAST(SUM(tp) AS DOUBLE) / SUM(support) AS prec,
             CAST(SUM(tp) AS DOUBLE) / SUM(support) AS rec,
             CAST(SUM(tp) AS DOUBLE) / SUM(support) AS f1
      FROM rows_per
    ),
    unioned AS (
      SELECT * FROM rows_per UNION ALL SELECT * FROM macro
      UNION ALL SELECT * FROM micro
    )
    SELECT class, support, tp, fp, fn,
           round(prec, 9) AS precision, round(rec, 9) AS recall,
           round(f1, 9) AS f1
    FROM unioned ORDER BY class
"""

_Q318_NOTES = (
    "MULTICLASS CLASSIFICATION REPORT (operators/mlmetrics."
    "classification_report — per-class support/tp/fp/fn + precision/"
    "recall/F1 with __macro__/__micro__ summary rows, sklearn's "
    "zero-division=0 convention): ONE confusion-matrix hash agg, then "
    "metadata-sized reshaping (|classes|^2 rows). The eval report every "
    "classifier-filtered corpus (toxicity, language routing, quality "
    "gates) publishes"
)

ROADMAP9["q318_classification_report"] = (
    q318_classification_report,
    _Q318_ORACLE,
    _Q318_NOTES,
)


# --- q319: null-pattern audit -----------------------------------------------


def q319_null_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Joint-missingness profile over events with two synthetic
    nullable columns correlated with the naturally-null value column —
    the pattern counts expose that correlation where per-column null
    rates cannot."""
    from ..operators.profile import null_pattern_audit

    ev = read_table(spark, sf_dir, "events").select(
        "value",
        F.when(_hash_mod(F.col("event_id"), 5, 7) != 0, F.col("user_id")).alias(
            "maybe_user"
        ),
        F.when(F.col("value").isNotNull() | (_hash_mod(F.col("event_id"), 11, 3) == 0),
               F.col("event_type")).alias("maybe_type"),
    )
    return null_pattern_audit(ev, ["value", "maybe_user", "maybe_type"], top_n=8)


_Q319_ORACLE = f"""
    WITH ev AS (
      SELECT value,
        CASE WHEN {_hash_mod_sql('event_id', 5, 7)} != 0
             THEN user_id END AS maybe_user,
        CASE WHEN value IS NOT NULL OR {_hash_mod_sql('event_id', 11, 3)} = 0
             THEN event_type END AS maybe_type
      FROM events
    ),
    pat AS (
      SELECT (CASE WHEN value IS NULL THEN '1' ELSE '0' END)
          || (CASE WHEN maybe_user IS NULL THEN '1' ELSE '0' END)
          || (CASE WHEN maybe_type IS NULL THEN '1' ELSE '0' END) AS pattern,
          COUNT(*) AS n_rows
      FROM ev GROUP BY 1
    ),
    tot AS (SELECT SUM(n_rows) AS total FROM pat)
    SELECT pattern, n_rows,
           round(CAST(n_rows AS DOUBLE) / t.total, 9) AS fraction
    FROM pat, tot t
    ORDER BY n_rows DESC, pattern
    LIMIT 8
"""

_Q319_NOTES = (
    "NULL-PATTERN AUDIT (operators/profile.null_pattern_audit — joint "
    "missingness: rows grouped by their NULL mask across chosen "
    "columns, top-n patterns with exact fractions; distinguishes "
    "independent 5%%-per-column nulls from 5%%-of-rows-all-null, which "
    "flips imputation/filter policy): ONE hash agg on a computed mask "
    "+ scalar total; deterministic (count desc, pattern) tiebreak"
)

ROADMAP9["q319_null_patterns"] = (q319_null_patterns, _Q319_ORACLE, _Q319_NOTES)


# --- q320: Theil–Sen robust trend -------------------------------------------


def q320_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user robust value trend over event sequences: median of
    pairwise slopes on the first ≤40 events per user (bounded-series
    contract), immune to the value outliers that wreck OLS."""
    from ..operators.timeseries import theil_sen_by_key

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value"
    )
    return theil_sen_by_key(
        ev, ["user_id"], "event_id", "value", max_points=40
    ).orderBy("user_id")


_Q320_ORACLE = """
    WITH capped AS (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
      FROM events WHERE event_id IS NOT NULL AND value IS NOT NULL
    ),
    pts AS (SELECT user_id, event_id, value FROM capped WHERE rn <= 40),
    slopes AS (
      SELECT a.user_id,
             (CAST(b.value AS DOUBLE) - CAST(a.value AS DOUBLE))
             / (CAST(b.event_id AS DOUBLE) - CAST(a.event_id AS DOUBLE))
             AS slope
      FROM pts a JOIN pts b
        ON a.user_id = b.user_id AND a.event_id < b.event_id
    )
    SELECT user_id, COUNT(*) AS n_pairs,
           round(quantile_disc(slope, 0.5), 9) AS slope
    FROM slopes GROUP BY user_id ORDER BY user_id
"""

_Q320_NOTES = (
    "THEIL-SEN ROBUST TREND (operators/timeseries.theil_sen_by_key — "
    "median of pairwise slopes, ~29%% breakdown point vs OLS's zero): "
    "per-key series CAPPED at max_points (the q256/q273 bounded-series "
    "discipline, <=780 pairs/key), pair generation is a key-equi "
    "SELF-JOIN (one shuffle on key, never cross-key), median via "
    "percentile_disc so both engines pick an OBSERVED slope — exact "
    "IEEE parity, no interpolation ambiguity"
)

ROADMAP9["q320_theil_sen"] = (q320_theil_sen, _Q320_ORACLE, _Q320_NOTES)


# --- q321: PSL-keyed per-domain curation quota ------------------------------


def q321_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-site crawl quota enforcement keyed by the PSL registered
    domain (the q315 operator applied at pipeline level): synthesize
    multi-tenant URLs (github.io tenants, co.uk sites, wildcard-ck
    hosts), key by psl_registered_domain, keep the top-3 docs per
    domain by length (tiebreak doc_id) — the dedup-adjacent quota step
    every crawl pipeline runs. Heuristic keying would merge all
    github.io tenants into one quota bucket; PSL keying is the fix."""
    from pyspark.sql import Window

    from ..functions.psl import psl_registered_domain

    docs = read_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    host = (
        F.when(d % 4 == 0, F.concat(F.lit("t"), (d % 13).cast("string"), F.lit(".github.io")))
        .when(d % 4 == 1, F.concat(F.lit("site"), (d % 5).cast("string"), F.lit(".co.uk")))
        .when(d % 4 == 2, F.concat(F.lit("h"), (d % 3).cast("string"), F.lit(".foo.ck")))
        .otherwise(F.concat(F.lit("www.ex"), (d % 7).cast("string"), F.lit(".com")))
    )
    base = docs.select(
        "doc_id", F.concat(F.lit("https://"), host, F.lit("/")).alias("url"), "n_chars"
    )
    keyed = psl_registered_domain(base, "url", out_col="domain")
    w = Window.partitionBy("domain").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        keyed.filter(F.col("domain").isNotNull())
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("domain", "rank", "doc_id", "n_chars")
        .orderBy("domain", "rank")
    )


def _q321_oracle() -> str:
    from ..functions.psl import oracle_rules_values

    return f"""
    WITH raw_rules(rule) AS (VALUES {oracle_rules_values()}),
    r AS (
      SELECT CASE WHEN rule LIKE '!%' THEN substr(rule, 2) ELSE rule END AS key,
             len(string_split(CASE WHEN rule LIKE '!%' THEN substr(rule, 2)
                              ELSE rule END, '.')) AS k,
             rule LIKE '!%' AS exc, rule LIKE '*.%' AS wild
      FROM raw_rules
    ),
    synth AS (
      SELECT doc_id, n_chars,
        CASE doc_id % 4
          WHEN 0 THEN 't' || CAST(doc_id % 13 AS VARCHAR) || '.github.io'
          WHEN 1 THEN 'site' || CAST(doc_id % 5 AS VARCHAR) || '.co.uk'
          WHEN 2 THEN 'h' || CAST(doc_id % 3 AS VARCHAR) || '.foo.ck'
          ELSE 'www.ex' || CAST(doc_id % 7 AS VARCHAR) || '.com'
        END AS host
      FROM documents
    ),
    lab AS (
      SELECT doc_id, n_chars, host, string_split(host, '.') AS labels,
             len(string_split(host, '.')) AS n
      FROM synth
    ),
    cand AS (
      SELECT l.doc_id, d.k,
             array_to_string(l.labels[l.n - d.k + 1 : l.n], '.') AS exact_k,
             CASE WHEN d.k >= 2 THEN
               '*.' || array_to_string(l.labels[l.n - d.k + 2 : l.n], '.')
             END AS wild_k
      FROM lab l CROSS JOIN (SELECT unnest(generate_series(1, 3)) AS k) d
      WHERE d.k <= l.n
    ),
    m AS (
      SELECT c.doc_id, r.k, r.exc
      FROM cand c JOIN r
        ON (NOT r.wild AND r.key = c.exact_k)
        OR (r.wild AND r.key = c.wild_k)
    ),
    agg AS (
      SELECT doc_id,
             MAX(CASE WHEN exc THEN k - 1 END) AS eps,
             MAX(CASE WHEN NOT exc THEN k END) AS nps
      FROM m GROUP BY doc_id
    ),
    dom AS (
      SELECT l.doc_id, l.n_chars,
        CASE WHEN l.n > COALESCE(a.eps, a.nps, 1)
             THEN array_to_string(
                    l.labels[l.n - COALESCE(a.eps, a.nps, 1) : l.n], '.')
        END AS domain
      FROM lab l LEFT JOIN agg a USING (doc_id)
    ),
    ranked AS (
      SELECT domain, doc_id, n_chars,
             row_number() OVER (PARTITION BY domain
                                ORDER BY n_chars DESC, doc_id) AS rank
      FROM dom WHERE domain IS NOT NULL
    )
    SELECT domain, rank, doc_id, n_chars
    FROM ranked WHERE rank <= 3 ORDER BY domain, rank
"""


_Q321_NOTES = (
    "PSL-KEYED DOMAIN QUOTA (functions/psl.psl_registered_domain "
    "composed into the curation pipeline: per-registered-domain top-k "
    "by quality with deterministic tiebreak — the crawl quota step "
    "that mis-buckets multi-tenant suffixes under the heuristic; "
    "github.io tenants and wildcard-ck hosts each get their OWN "
    "quota): broadcast PSL joins + one window over domain — one "
    "shuffle total. Oracle rebuilds the rules CTE from the same "
    "constants (q315 discipline)"
)

ROADMAP9["q321_domain_quota"] = (q321_domain_quota, _q321_oracle(), _Q321_NOTES)


# --- q322: real image resize ------------------------------------------------


def q322_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → box-downsample(×2) → lossless PPM re-encode → decode
    AGAIN → channel means: the full resize pipeline end-to-end over
    real pixels (llm/multimodal.resize_image_payloads, retiring the
    byte-truncation stand-in). Odd source widths exercise the crop
    contract. The oracle regenerates the PPM pixel formula and replays
    the floored block means in SQL — any bug in either decode pass,
    the block sum, or the re-encode hash-fails."""
    import pandas as pd

    from pyspark.sql import types as T

    from ..llm.multimodal import (
        encode_ppm,
        image_pixel_stats,
        resize_image_payloads,
    )

    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 10 == 0
    ).select("doc_id")

    def gen(batches):
        for pdf in batches:
            ids = [int(i) for i in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [
                        bytearray(
                            encode_ppm(
                                11 + (i % 3) * 2, 10 + (i % 2) * 2, seed=i
                            )
                        )
                        for i in ids
                    ],
                }
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    payloads = docs.mapInPandas(gen, schema)
    resized = resize_image_payloads(payloads, factor=2)
    stats = image_pixel_stats(resized.select("doc_id", "payload"))
    return stats.select(
        "doc_id", "width", "height", "mean_r", "mean_g", "mean_b"
    ).orderBy("doc_id")


_Q322_ORACLE = """
    WITH ids AS (
      SELECT doc_id,
             (11 + (doc_id % 3) * 2) // 2 AS ow,
             (10 + (doc_id % 2) * 2) // 2 AS oh
      FROM documents WHERE doc_id % 10 = 0
    ),
    opix AS (
      SELECT i.doc_id, i.ow, i.oh, ox.v AS ox, oy.v AS oy
      FROM ids i,
           UNNEST(generate_series(0, i.ow - 1)) AS ox(v),
           UNNEST(generate_series(0, i.oh - 1)) AS oy(v)
    ),
    blocks AS (
      SELECT p.doc_id, p.ow, p.oh, p.ox, p.oy,
        SUM((p.doc_id + 31 * (2 * p.ox + dx.v) + 17 * (2 * p.oy + dy.v))
            % 256) AS s0,
        SUM(((p.doc_id + 31 * (2 * p.ox + dx.v) + 17 * (2 * p.oy + dy.v))
             % 256 * 7) % 256) AS s1,
        SUM(((p.doc_id + 31 * (2 * p.ox + dx.v) + 17 * (2 * p.oy + dy.v))
             % 256 * 13) % 256) AS s2
      FROM opix p,
           UNNEST(generate_series(0, 1)) AS dx(v),
           UNNEST(generate_series(0, 1)) AS dy(v)
      GROUP BY p.doc_id, p.ow, p.oh, p.ox, p.oy
    ),
    resized AS (
      SELECT doc_id, ow, oh, s0 // 4 AS r, s1 // 4 AS g, s2 // 4 AS b
      FROM blocks
    )
    SELECT doc_id,
           CAST(ow AS INTEGER) AS width,
           CAST(oh AS INTEGER) AS height,
           CAST(SUM(r) AS DOUBLE) / (ow * oh) AS mean_r,
           CAST(SUM(g) AS DOUBLE) / (ow * oh) AS mean_g,
           CAST(SUM(b) AS DOUBLE) / (ow * oh) AS mean_b
    FROM resized
    GROUP BY doc_id, ow, oh
    ORDER BY doc_id
"""

_Q322_NOTES = (
    "REAL IMAGE RESIZE (llm/multimodal.resize_image + "
    "resize_image_payloads — integer-factor box downsample on REAL "
    "decoded pixels with floor-of-exact-block-sum arithmetic, lossless "
    "PPM re-encode; retires the _fake_resize byte-truncation stand-in "
    "now that all four containers decode): the anchor runs decode -> "
    "resize -> re-encode -> SECOND decode -> channel means, and the "
    "fixture-differential oracle replays the pixel formula + floored "
    "block means in SQL (q206 discipline). Odd widths pin the crop "
    "rule. Map-only Arrow pipeline, shuffle-free"
)

ROADMAP9["q322_image_resize"] = (q322_image_resize, _Q322_ORACLE, _Q322_NOTES)


# --- q323: audio resample ---------------------------------------------------


def q323_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode (any fmt arm) → ×4 block-mean decimate → PCM-16 re-encode
    → decode AGAIN → exact stats (llm/audio.resample_payloads): the
    audio twin of q322, with the three-arm fixture guaranteeing the
    PCM16/float32/float64 decode paths all feed the same resample."""
    from ..llm.audio import audio_stats, resample_payloads, with_wav_payload

    docs = read_table(spark, sf_dir, "documents")
    payloads = with_wav_payload(docs, "doc_id", every=10)
    resampled = resample_payloads(payloads, factor=4)
    return (
        audio_stats(resampled.select("doc_id", "payload"))
        .select(
            "doc_id", "sample_rate", "n_frames", "peak_abs",
            "mean_square", "zero_crossings",
        )
        .orderBy("doc_id")
    )


_Q323_ORACLE = """
    WITH ids AS (
      SELECT doc_id, 800 + (doc_id % 7) * 160 AS n
      FROM documents WHERE doc_id % 10 = 0
    ),
    samples AS (
      SELECT doc_id, n, i,
             (doc_id * 7349 + i * (i + 13) * 2654435761) % 65536 - 32768 AS s
      FROM ids, UNNEST(generate_series(0, n - 1)) AS t(i)
    ),
    blocks AS (
      SELECT doc_id, n, i // 4 AS bi,
             CAST(floor(CAST(SUM(s) AS DOUBLE) / 4) AS BIGINT) AS d
      FROM samples GROUP BY doc_id, n, i // 4
    ),
    flagged AS (
      SELECT doc_id, n, bi, d,
             CASE WHEN (d >= 0) <>
                  (lag(d) OVER (PARTITION BY doc_id ORDER BY bi) >= 0)
                  THEN 1 ELSE 0 END AS flip
      FROM blocks
    )
    SELECT doc_id,
           2000 AS sample_rate,
           CAST(MAX(n) / 4 AS BIGINT) AS n_frames,
           CAST(MAX(ABS(d)) AS BIGINT) AS peak_abs,
           CAST(SUM(d * d) AS DOUBLE) / (MAX(n) / 4) AS mean_square,
           CAST(SUM(flip) AS BIGINT) AS zero_crossings
    FROM flagged
    GROUP BY doc_id
    ORDER BY doc_id
"""

_Q323_NOTES = (
    "REAL AUDIO RESAMPLE (llm/audio.resample_wav + resample_payloads — "
    "integer-factor decimation with a box anti-alias filter: "
    "floor(block_sum/factor) on exact integer samples, PCM-16 "
    "re-encode at rate//factor): anchor = decode -> decimate -> "
    "re-encode -> second decode -> exact stats; the three-arm fixture "
    "(PCM16/float32/float64) proves every decode path feeds the same "
    "resample; the oracle regenerates the waveform and replays the "
    "block means + stats in SQL. Map-only Arrow, shuffle-free"
)

ROADMAP9["q323_audio_resample"] = (q323_audio_resample, _Q323_ORACLE, _Q323_NOTES)


# --- q324: distributed BPE encode -------------------------------------------


def q324_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a small merge table on the corpus (q271's distributed
    trainer), then ENCODE the whole corpus with it — per-doc token
    fertility stats (llm/bpe.bpe_encode). The throughput half of the
    tokenizer; training is once-per-vocab, encoding is every-run.
    ROWS-ONLY: the merge loop has no SQL twin; exact encode parity vs
    the pure-python segmenter is pytest-pinned (test_round9)."""
    from ..llm.bpe import bpe_encode, bpe_train

    docs = read_table(spark, sf_dir, "documents")
    merges, _state = bpe_train(docs.filter(F.col("doc_id") % 3 == 0), "text", n_merges=20)
    return (
        bpe_encode(docs, "doc_id", "text", merges)
        .orderBy("doc_id")
    )


_Q324_NOTES = (
    "DISTRIBUTED BPE ENCODE (llm/bpe.bpe_encode — the serving half of "
    "the q271 trainer: learned merge table ships in the Arrow closure, "
    "encoding is mapInPandas, map-only, shuffle-free, with a per-batch "
    "word memo that exploits Zipf's law to turn the merge loop into a "
    "dict hit for frequent words; same word-normalization rule as "
    "training so the token universes agree): per-doc n_words/n_tokens/"
    "unique/compression — the fertility stats packing and cost "
    "estimation consume. rows-only (merge recursion has no SQL twin); "
    "encode==bpe_segment parity pytest-pinned"
)

ROADMAP9["q324_bpe_encode"] = (q324_bpe_encode, None, _Q324_NOTES)


# --- q325: XML source round-trip ---------------------------------------------


def q325_xml_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML corpus ingestion end-to-end (sources.read_xml — Spark 4's
    built-in xml format, no external jar): write the documents table as
    XML (the writer escapes markup-significant text), read it back with
    an EXPLICIT schema per the §1.5 rule, and aggregate per (lang,
    source). The oracle runs the same aggregate on the parquet table
    directly — any loss/corruption in either XML pass (escaping,
    schema coercion, nulls) breaks the hash."""
    import os
    import tempfile

    from pyspark.sql import types as T

    from ..sources import read_xml

    docs = read_table(spark, sf_dir, "documents")
    d = tempfile.mkdtemp(prefix="q325_xml_")
    path = os.path.join(d, "docs")
    docs.write.format("xml").option("rootTag", "corpus").option(
        "rowTag", "doc"
    ).save(path)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    back = read_xml(spark, path, row_tag="doc", schema=schema)
    return (
        back.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(F.length("text")).alias("total_text_len"),
        )
        .orderBy("lang", "source")
    )


_Q325_ORACLE = """
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(length(text)) AS BIGINT) AS total_text_len
    FROM documents
    GROUP BY lang, source
    ORDER BY lang, source
"""

_Q325_NOTES = (
    "XML SOURCE ROUND-TRIP (sources.read_xml — Spark 4 built-in xml "
    "format, rowTag rows, explicit schema per the never-inferSchema "
    "rule; the feed/dump formats — RSS, wiki exports, PubMed — text "
    "ingestion still meets): write-then-read the documents table "
    "through XML and aggregate; the oracle aggregates the parquet "
    "directly, so any escaping/coercion loss in either XML pass "
    "hash-fails. Avro probed NOT bundled (external module) — "
    "documented boundary, not a stub"
)

ROADMAP9["q325_xml_source"] = (q325_xml_source, _Q325_ORACLE, _Q325_NOTES)
