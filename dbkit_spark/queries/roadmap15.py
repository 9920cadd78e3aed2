"""Round-15 queue additions (q461+): the rank-trend / reliability
completions of the k-system comparison family (Kendall's W, Page's L,
Jonckheere-Terpstra, one-way ICC) and the edit-distance /
generation-eval closers. NOT registered — merged into
``roadmap7.ROADMAP7`` (imported at the bottom of ``roadmap7.py``; must
not import roadmap7 back) and landed by ``roadmap7_landed`` at the
round-16 landing.

Fixture reuse: the k-system entries ride the q457-q460 four-system
truncation eval frame (``roadmap14._multi_sys_scores`` — one row per
doc pair with f1 under four truncation denominators, behind the lazy
lineage barrier) so the family reads one shared derivation; the
Jonckheere entry uses independent ordered groups from ``orders``
(priority classes), the between-subjects counterpart the within-item
tests cannot cover.

Reference scope note: the reference declares relational operators only
(`/root/reference/README.md:9-15`); this family is Tier-C north-star
surface (BASELINE.json "statistical comparison / eval operators").
Public sources per operator are cited in the operator docstrings
(operators/mlmetrics.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import read_table
from .roadmap14 import (
    _DENS,
    _LONG_SQL,
    _multi_sql,
    _multi_sys_scores,
    _wh_p_sql,
)

ROADMAP15: dict[str, tuple] = {}


def _long_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared (pair, system, f1) long frame of the k-system
    family — the q457 union fan-out over the checkpointed wide
    derivation."""
    wide = _multi_sys_scores(spark, sf_dir)
    long_ = None
    for den in _DENS:
        part = wide.select(
            F.col("pair_id"),
            F.lit(f"d{den}").alias("sys"),
            F.col(f"f1_d{den}").alias("f1"),
        )
        long_ = part if long_ is None else long_.unionByName(part)
    return long_


# --- q466 Kendall's W --------------------------------------------------------


def q466_kendalls_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's coefficient of concordance
    (operators/mlmetrics.kendalls_w) with the eval PAIRS as judges and
    the four truncation systems as ranked objects — the effect-size
    companion to q457's Friedman omnibus on the same frame."""
    from ..operators.mlmetrics import kendalls_w

    long_ = _long_frame(spark, sf_dir)
    return kendalls_w(long_, "pair_id", "sys", "f1").orderBy("object")


def _q466_oracle() -> str:
    return f"""
    WITH {_multi_sql()},
    long_ AS ({_LONG_SQL}),
    ranked AS (
      SELECT i, t, (2 * rnk + cnt - 1) / 2.0 AS r, cnt AS tsz
      FROM (SELECT i, t, v,
                   rank() OVER (PARTITION BY i ORDER BY v) AS rnk,
                   COUNT(*) OVER (PARTITION BY i, v) AS cnt
            FROM long_)),
    ties AS (
      SELECT CAST(SUM(tsz * tsz - 1) AS BIGINT) AS tt,
             CAST(COUNT(DISTINCT i) AS BIGINT) AS k
      FROM ranked),
    per_o AS (
      SELECT t, SUM(CAST(round(r, 9) AS DECIMAL(25,9))) AS rsum
      FROM ranked GROUP BY t),
    scal AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM per_o),
    agg AS (
      SELECT CAST(SUM(CAST(round(
               (CAST(rsum AS DOUBLE) - k * (nn + 1) / 2.0)
               * (CAST(rsum AS DOUBLE) - k * (nn + 1) / 2.0), 9)
               AS DECIMAL(25,9))) AS DOUBLE) AS s,
             MAX(nn) AS nn, MAX(k) AS k, MAX(tt) AS tt
      FROM per_o CROSS JOIN scal CROSS JOIN ties),
    stat AS (
      SELECT k, nn,
             CASE WHEN k >= 1 AND nn >= 2
                       AND (CAST(k AS DOUBLE) * k
                            * (CAST(nn AS DOUBLE) * nn * nn - nn)
                            - k * tt) > 0
                  THEN 12.0 * s
                       / (CAST(k AS DOUBLE) * k
                          * (CAST(nn AS DOUBLE) * nn * nn - nn)
                          - k * tt) END AS w_raw
      FROM agg),
    stat2 AS (
      SELECT k, nn, w_raw,
             CAST(k AS DOUBLE) * (nn - 1) * w_raw AS chi2_raw
      FROM stat)
    SELECT per_o.t AS object,
           round(CAST(per_o.rsum AS DOUBLE), 6) AS rank_sum,
           round(CAST(per_o.rsum AS DOUBLE) / stat2.k, 6) AS mean_rank,
           stat2.k AS n_judges,
           stat2.nn AS n_objects,
           round(w_raw, 6) AS w,
           round(chi2_raw, 6) AS chi2,
           CASE WHEN chi2_raw IS NOT NULL
                THEN {_wh_p_sql('chi2_raw', '(stat2.nn - 1)')} END
             AS p_value,
           CAST(0 AS BIGINT) AS n_incomplete
    FROM per_o CROSS JOIN stat2
    ORDER BY object
    """


_Q466_NOTES = (
    "KENDALL'S W (operators/mlmetrics.kendalls_w — Kendall & "
    "Babington Smith 1939, tie correction per Siegel & Castellan "
    "1988: the concordance EFFECT SIZE next to q457's Friedman "
    "omnibus — k judges x n objects, W in [0,1]): judge-keyed rank "
    "windows over n-row partitions, half-integer average ranks on "
    "DECIMAL(25,9), tie term as an exact LONG row-sum (t^2-1 per "
    "row), one object reduce + 1-row recombination; chi2 = k(n-1)W "
    "at n-1 dof via the q451 Wilson-Hilferty tail; complete judges "
    "only (listwise, counted); NULL rows filtered before ranking "
    "(the ADVICE r14 friedman rule)"
)

ROADMAP15["q466_kendalls_w"] = (q466_kendalls_w, _q466_oracle(), _Q466_NOTES)


# --- q467 Page's trend test --------------------------------------------------

# increasing-trend order: larger truncation denominator = shorter
# candidate = lower f1, so the hypothesized ascending-f1 order is
# d6 < d4 < d3 < d2
_PAGE_ORDER = ["d6", "d4", "d3", "d2"]


def q467_page_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's L test (operators/mlmetrics.page_trend_test) for the
    a-priori ordered alternative 'less truncation ranks higher' over
    the four-system frame — the trend-powered refinement of q457."""
    from ..operators.mlmetrics import page_trend_test

    long_ = _long_frame(spark, sf_dir)
    return page_trend_test(long_, "pair_id", "sys", "f1", _PAGE_ORDER)


def _q467_oracle() -> str:
    from ..operators.mlmetrics import normal_p_two_sided_sql

    k = len(_PAGE_ORDER)
    w_case = "CASE t " + " ".join(
        f"WHEN '{t}' THEN {j + 1}" for j, t in enumerate(_PAGE_ORDER)
    ) + " END"
    return f"""
    WITH {_multi_sql()},
    long0 AS ({_LONG_SQL}),
    long_ AS (SELECT i, t, v, {w_case} AS w FROM long0
              WHERE {w_case} IS NOT NULL),
    ranked AS (
      SELECT i, w, (2 * rnk + cnt - 1) / 2.0 AS r
      FROM (SELECT i, w, v,
                   rank() OVER (PARTITION BY i ORDER BY v) AS rnk,
                   COUNT(*) OVER (PARTITION BY i, v) AS cnt
            FROM long_)),
    agg AS (
      SELECT SUM(CAST(round(w * r, 9) AS DECIMAL(25,9))) AS l,
             CAST(COUNT(DISTINCT i) AS BIGINT) AS n
      FROM ranked),
    stat AS (
      SELECT n, CAST(l AS DOUBLE) AS l_raw,
             n * {k}.0 * {k + 1} * {k + 1} / 4.0 AS mean_raw,
             n * {k}.0 * {k} * {k + 1} * {k + 1} * {k - 1} / 144.0
               AS var_raw
      FROM agg),
    stat2 AS (
      SELECT n, l_raw, mean_raw,
             CASE WHEN n >= 1 AND var_raw > 0
                  THEN (l_raw - mean_raw) / sqrt(var_raw) END AS z_raw
      FROM stat)
    SELECT n AS n_items,
           CAST({k} AS BIGINT) AS k_treatments,
           round(l_raw, 6) AS l_stat,
           round(mean_raw, 6) AS mean_l,
           round(z_raw, 6) AS z,
           round(CASE WHEN z_raw >= 0
                      THEN {normal_p_two_sided_sql('z_raw')} / 2
                      ELSE 1 - {normal_p_two_sided_sql('z_raw')} / 2
                 END, 9) AS p_one_sided,
           CAST(0 AS BIGINT) AS n_incomplete
    FROM stat2
    """


_Q467_NOTES = (
    "PAGE'S L TREND TEST (operators/mlmetrics.page_trend_test — Page "
    "JASA 1963: the ordered-alternative refinement of Friedman — "
    "when systems carry an a-priori order (increasing truncation "
    "severity), L = sum j*R_j detects the monotone trend the omnibus "
    "wastes power on): the q457 rank discipline (half-integer "
    "average ranks on DECIMAL(25,9), item-keyed windows), position "
    "weights via a map-side array_position (no join), classic "
    "no-tie null moments (documented), one-sided upper p via the "
    "q407 closed-form tail; complete items only over the ordered "
    "treatment set"
)

ROADMAP15["q467_page_trend"] = (q467_page_trend, _q467_oracle(), _Q467_NOTES)


# --- q468 Jonckheere-Terpstra ------------------------------------------------

_JT_ORDER = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def q468_jonckheere(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra ordered-groups trend test
    (operators/mlmetrics.jonckheere_terpstra) of order totals across
    the five priority classes — the between-subjects counterpart of
    q467 (independent groups, no shared items)."""
    from ..operators.mlmetrics import jonckheere_terpstra

    orders = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_totalprice").cast("double").alias("val"),
    )
    return jonckheere_terpstra(orders, "grp", "val", _JT_ORDER)


def _q468_oracle() -> str:
    from ..operators.mlmetrics import normal_p_two_sided_sql

    og_case = "CASE o_orderpriority " + " ".join(
        f"WHEN '{g}' THEN {j + 1}" for j, g in enumerate(_JT_ORDER)
    ) + " END"
    return f"""
    WITH base AS (
      SELECT {og_case} AS og, CAST(o_totalprice AS DOUBLE) AS v
      FROM orders
      WHERE {og_case} IS NOT NULL AND o_totalprice IS NOT NULL),
    counts AS (
      SELECT og, v, CAST(COUNT(*) AS BIGINT) AS c
      FROM base GROUP BY og, v),
    vals AS (SELECT DISTINCT v FROM counts),
    grps AS (SELECT DISTINCT og FROM counts),
    grid AS (SELECT og, v FROM vals CROSS JOIN grps),
    filled AS (
      SELECT grid.og, grid.v, COALESCE(counts.c, 0) AS c
      FROM grid LEFT JOIN counts
        ON grid.og = counts.og AND grid.v = counts.v),
    cums AS (
      SELECT og, v,
             SUM(c) OVER (PARTITION BY og ORDER BY v
                          ROWS UNBOUNDED PRECEDING) - c AS below,
             c AS cs
      FROM filled),
    twoj AS (
      SELECT CAST(SUM(2 * t.c * s.below + s.cs * t.c) AS BIGINT) AS tj
      FROM cums s JOIN counts t ON s.v = t.v AND s.og < t.og),
    perg AS (SELECT og, CAST(COUNT(*) AS BIGINT) AS ng
             FROM base GROUP BY og),
    gstats AS (
      SELECT CAST(SUM(ng) AS BIGINT) AS N,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(ng * ng) AS BIGINT) AS n2,
             CAST(SUM(ng * (ng - 1) * (2 * ng + 5)) AS BIGINT) AS g25,
             CAST(SUM(ng * (ng - 1) * (ng - 2)) AS BIGINT) AS g3,
             CAST(SUM(ng * (ng - 1)) AS BIGINT) AS g2
      FROM perg),
    pv AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS tv
           FROM base GROUP BY v),
    vstats AS (
      SELECT CAST(SUM(tv * (tv - 1) * (2 * tv + 5)) AS BIGINT) AS t25,
             CAST(SUM(tv * (tv - 1) * (tv - 2)) AS BIGINT) AS t3,
             CAST(SUM(tv * (tv - 1)) AS BIGINT) AS t2
      FROM pv),
    stat AS (
      SELECT N, k,
             CAST(tj AS DOUBLE) / 2.0 AS jt,
             (CAST(N AS DOUBLE) * N - n2) / 4.0 AS mean_raw,
             (CAST(N AS DOUBLE) * (N - 1) * (2 * N + 5) - g25 - t25)
               / 72.0
             + CAST(g3 AS DOUBLE) * t3
               / (36.0 * N * (CAST(N AS DOUBLE) - 1) * (N - 2))
             + CAST(g2 AS DOUBLE) * t2
               / (8.0 * N * (CAST(N AS DOUBLE) - 1)) AS var_raw
      FROM twoj CROSS JOIN gstats CROSS JOIN vstats),
    stat2 AS (
      SELECT N, k, jt, mean_raw, var_raw,
             CASE WHEN k >= 2 AND N >= 3 AND var_raw > 0
                  THEN (jt - mean_raw) / sqrt(var_raw) END AS z_raw
      FROM stat)
    SELECT N AS n_total, k AS k_groups,
           round(jt, 6) AS jt_stat,
           round(mean_raw, 6) AS mean_jt,
           round(var_raw, 6) AS var_jt,
           round(z_raw, 6) AS z,
           CASE WHEN z_raw IS NOT NULL
                THEN {normal_p_two_sided_sql('z_raw')} END
             AS p_two_sided
    FROM stat2
    """


_Q468_NOTES = (
    "JONCKHEERE-TERPSTRA (operators/mlmetrics.jonckheere_terpstra — "
    "Jonckheere Biometrika 1954 / Terpstra 1952, tie-corrected null "
    "variance per Hollander & Wolfe 1999 §6.2: ordered-trend test "
    "across INDEPENDENT groups, the between-subjects counterpart of "
    "Page's L): NO pairwise value join — per-(group,value) counts, "
    "group-partitioned cumulative windows over the merged value "
    "grid, and an EQUI-join on the value key with the group order as "
    "a post-join filter (never a theta key); 2J is an exact LONG; "
    "tie-corrected variance from three closed-form count aggregates"
)

ROADMAP15["q468_jonckheere"] = (q468_jonckheere, _q468_oracle(), _Q468_NOTES)


# --- q469 one-way ICC --------------------------------------------------------


def q469_icc_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way random-effects ICC (operators/mlmetrics.icc_oneway)
    treating the four systems' f1 scores as interchangeable ratings of
    each pair — the variance-decomposition reliability readout next to
    q459's Cronbach alpha on the same frame."""
    from ..operators.mlmetrics import icc_oneway

    long_ = _long_frame(spark, sf_dir)
    return icc_oneway(long_, "pair_id", "f1")


def _q469_oracle() -> str:
    return f"""
    WITH {_multi_sql()},
    long_ AS ({_LONG_SQL}),
    per_item AS (
      SELECT i, CAST(COUNT(*) AS BIGINT) AS ni,
             SUM(CAST(round(v, 9) AS DECIMAL(25,9))) AS si,
             SUM(CAST(round(v * v, 9) AS DECIMAL(25,9))) AS qi
      FROM long_ WHERE v IS NOT NULL GROUP BY i),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(ni) AS BIGINT) AS ntot,
             SUM(si) AS s,
             CAST(SUM(qi) AS DOUBLE) AS q,
             CAST(SUM(CAST(round(
               CAST(si AS DOUBLE) * CAST(si AS DOUBLE) / ni, 9)
               AS DECIMAL(25,9))) AS DOUBLE) AS sb,
             CAST(SUM(ni * ni) AS BIGINT) AS n2
      FROM per_item),
    stat AS (
      SELECT n, ntot,
             sb - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / ntot AS ssb,
             q - sb AS ssw,
             n >= 2 AND ntot > n AS ok,
             (CAST(ntot AS DOUBLE) - CAST(n2 AS DOUBLE) / ntot)
               / (n - 1) AS k0_raw
      FROM agg),
    ms AS (
      SELECT n, ntot,
             CASE WHEN ok THEN ssb / (n - 1) END AS msb,
             CASE WHEN ok THEN ssw / (ntot - n) END AS msw,
             CASE WHEN ok THEN k0_raw END AS k0
      FROM stat)
    SELECT n AS n_items, ntot AS n_total,
           round(k0, 6) AS k0,
           round(msb, 6) AS msb,
           round(msw, 6) AS msw,
           round(CASE WHEN msw > 0 THEN msb / msw END, 6) AS f_stat,
           round(CASE WHEN msw > 0 AND (msb + (k0 - 1) * msw) <> 0
                      THEN (msb - msw) / (msb + (k0 - 1) * msw) END, 6)
             AS icc1,
           round(CASE WHEN msb <> 0 AND msw > 0
                      THEN (msb - msw) / msb END, 6) AS icc1k
    FROM ms
    """


_Q469_NOTES = (
    "ONE-WAY RANDOM ICC (operators/mlmetrics.icc_oneway — Shrout & "
    "Fleiss 1979 Case 1 with the unbalanced-design k0 estimator: "
    "ICC(1) single-rating and ICC(1,k) mean-rating reliability, the "
    "variance-decomposition companion to Cronbach q459): ONE "
    "item-keyed aggregate (decimal moment sums, S_i^2/n_i terms as "
    "9dp IEEE divisions back onto decimal) + ONE 1-row reduce; F "
    "reported without a tail p (F distribution out of closed-form "
    "scope, documented)"
)

ROADMAP15["q469_icc_oneway"] = (
    q469_icc_oneway,
    _q469_oracle(),
    _Q469_NOTES,
)
