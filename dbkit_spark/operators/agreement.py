"""Inter-annotator agreement — Cohen's κ (two raters) and Fleiss' κ
(any raters).

Labeling pipelines (RLHF preference data, eval rubric grading, content
moderation) gate datasets on agreement before training on them; these
are the two standard chance-corrected statistics. Reference scope: the
reference engine has no statistics surface (its README roadmap stops at
relational operators, ``README.md:32-38``); this extends the engine's
eval-metrics family (``operators/mlmetrics.py``) the same way.

Scale shape: both reduce to ONE hash aggregation over (item, label)
pairs plus metadata-sized label-marginal aggregates joined back — no
window functions, no per-item loops. Every statistic is an exact-integer
count ratio with one IEEE division per term, so a SQL oracle replays
them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cohen_kappa(
    labels: DataFrame,
    item_col: str,
    rater_col: str,
    label_col: str,
    rater_a: str,
    rater_b: str,
) -> DataFrame:
    """κ between two named raters over items BOTH labeled.

    po = observed agreement rate; pe = Σ_c pA(c)·pB(c) over each rater's
    own label marginals (the asymmetric-marginals form, per Cohen 1960).
    Output: one row (n_items, po, pe, kappa). Plan: one self-equi-join
    of the two raters' label sets on item (shuffle by item), then a
    single global aggregate; marginals come from the same joined frame
    so the pair-universe is consistent."""
    a = labels.filter(F.col(rater_col) == rater_a).select(
        F.col(item_col).alias("_item"), F.col(label_col).alias("_la")
    )
    b = labels.filter(F.col(rater_col) == rater_b).select(
        F.col(item_col).alias("_item"), F.col(label_col).alias("_lb")
    )
    pairs = a.join(b, "_item")
    per_label = pairs.groupBy("_la", "_lb").agg(F.count("*").alias("_n"))
    # metadata-sized from here on (|labels|² rows at most)
    tot = per_label.agg(
        F.sum("_n").alias("n_items"),
        F.sum(F.when(F.col("_la") == F.col("_lb"), F.col("_n")).otherwise(0)).alias(
            "_agree"
        ),
    )
    ma = per_label.groupBy("_la").agg(F.sum("_n").alias("_na"))
    mb = per_label.groupBy("_lb").agg(F.sum("_n").alias("_nb"))
    pe_num = (
        ma.join(mb, ma["_la"] == mb["_lb"])
        .agg(F.sum(F.col("_na") * F.col("_nb")).alias("_pe_num"))
    )
    return (
        tot.crossJoin(pe_num)  # 1 row × 1 row
        .select(
            "n_items",
            (F.col("_agree").cast("double") / F.col("n_items")).alias("po"),
            (
                F.col("_pe_num").cast("double")
                / (F.col("n_items").cast("double") * F.col("n_items"))
            ).alias("pe"),
        )
        .select(
            "n_items",
            F.round("po", 9).alias("po"),
            F.round("pe", 9).alias("pe"),
            F.round((F.col("po") - F.col("pe")) / (1.0 - F.col("pe")), 9).alias(
                "kappa"
            ),
        )
    )


def fleiss_kappa(
    labels: DataFrame,
    item_col: str,
    label_col: str,
    min_raters: int = 2,
) -> DataFrame:
    """Fleiss' κ over long-format (item, rater, label) rows, generalized
    to unequal raters-per-item (Fleiss 1971 with per-item n_i): items
    with fewer than ``min_raters`` ratings are excluded (P_i is
    undefined at n_i < 2).

    P_i = (Σ_c n_ic² − n_i) / (n_i·(n_i−1)); P̄ = mean over items;
    p_c = Σ_i n_ic / Σ_i n_i; P_e = Σ_c p_c². Two hash aggregations
    ((item,label) then item) plus a metadata-sized label marginal."""
    cell = labels.groupBy(
        F.col(item_col).alias("_item"), F.col(label_col).alias("_lab")
    ).agg(F.count("*").alias("_nic"))
    item = cell.groupBy("_item").agg(
        F.sum("_nic").alias("_ni"),
        F.sum(F.col("_nic") * F.col("_nic")).alias("_sq"),
    ).filter(F.col("_ni") >= min_raters)
    pbar = item.agg(
        F.count("*").alias("n_items"),
        F.sum("_ni").alias("_n_ratings"),
        F.sum(
            (F.col("_sq") - F.col("_ni")).cast("double")
            / (F.col("_ni") * (F.col("_ni") - 1))
        ).alias("_p_sum"),
    )
    # label marginals over the SAME retained items
    marg = (
        cell.join(item.select("_item"), "_item")
        .groupBy("_lab")
        .agg(F.sum("_nic").alias("_nc"))
    )
    pe = marg.crossJoin(pbar.select("_n_ratings")).agg(
        F.sum(
            (F.col("_nc").cast("double") / F.col("_n_ratings"))
            * (F.col("_nc").cast("double") / F.col("_n_ratings"))
        ).alias("_pe")
    )
    return (
        pbar.crossJoin(pe)  # 1 row × 1 row
        .select(
            "n_items",
            F.col("_n_ratings").alias("n_ratings"),
            F.round(F.col("_p_sum") / F.col("n_items"), 9).alias("p_bar"),
            F.round("_pe", 9).alias("p_e"),
            F.round(
                (F.col("_p_sum") / F.col("n_items") - F.col("_pe"))
                / (1.0 - F.col("_pe")),
                9,
            ).alias("kappa"),
        )
    )


def krippendorff_alpha(
    labels: DataFrame,
    unit_col: str,
    rater_col: str,
    label_col: str,
) -> DataFrame:
    """Krippendorff's alpha, nominal metric (Krippendorff 1970/2004) —
    the agreement statistic that HANDLES MISSING LABELS, which real
    annotation tables always have (raters are assigned overlapping
    subsets; Cohen needs exactly two complete raters, Fleiss a constant
    rater count per unit). Nominal alpha closes over per-unit label
    counts:

        D_o = (1/n)     * sum_u (m_u^2 - sum_c n_uc^2) / (m_u - 1)
        D_e = (n^2 - sum_c n_c^2) / (n * (n - 1))
        alpha = 1 - D_o / D_e

    with m_u the unit's PAIRABLE value count (units with m_u < 2 are
    excluded everywhere — a lone label has nothing to agree with) and
    n = sum m_u. No category-pair matrix is materialized: the nominal
    coincidence sum collapses to per-unit and global label marginals.

    Plans: one (unit,label) count aggregate, one unit-keyed reduce, one
    global label-marginal aggregate — all map-side combined; the final
    recombination broadcasts two 1-row frames. Determinism: counts are
    exact LONGs; each per-unit term is one IEEE division rounded at 9dp
    riding a DECIMAL sum; D_e is integer arithmetic with one division.

    Output one row: (n_units, n_values, n_categories, d_o, d_e, alpha);
    degenerate inputs (no pairable unit, or D_e = 0 when every value is
    one category) report NULL alpha.
    """
    from .aggregate import stable_sum

    base = labels.filter(
        F.col(unit_col).isNotNull()
        & F.col(rater_col).isNotNull()
        & F.col(label_col).isNotNull()
    ).select(
        F.col(unit_col).alias("_u"),
        F.col(rater_col).alias("_r"),
        F.col(label_col).alias("_c"),
    )
    # one value per (unit, rater): deterministic min-label collapse if
    # the input carries duplicates (documented; clean inputs unaffected)
    vals = base.groupBy("_u", "_r").agg(F.min("_c").alias("_c"))
    nuc = vals.groupBy("_u", "_c").agg(F.count(F.lit(1)).alias("nuc"))
    per_unit = nuc.groupBy("_u").agg(
        F.sum("nuc").alias("m"),
        F.sum(F.col("nuc") * F.col("nuc")).alias("s2"),
    ).filter(F.col("m") >= 2)
    # within-unit disagreeing-pair rate term, 9dp per unit, decimal sum
    do_num = per_unit.select(
        F.round(
            (F.col("m") * F.col("m") - F.col("s2")).cast("double")
            / (F.col("m") - F.lit(1)).cast("double"),
            9,
        ).alias("t"),
        "m",
    ).agg(
        stable_sum("t", 9).alias("sum_t"),
        F.sum("m").cast("long").alias("n_values"),
        F.count(F.lit(1)).alias("n_units"),
    )
    pairable = nuc.join(per_unit.select("_u"), "_u")
    marg = pairable.groupBy("_c").agg(F.sum("nuc").alias("nc"))
    de_parts = marg.agg(
        F.sum(F.col("nc") * F.col("nc")).alias("snc2"),
        F.count(F.lit(1)).alias("n_categories"),
    )
    joined = do_num.crossJoin(F.broadcast(de_parts))
    n = F.col("n_values").cast("double")
    d_o = F.try_divide(F.col("sum_t"), n)
    d_e = F.try_divide(
        n * n - F.col("snc2").cast("double"), n * (n - F.lit(1.0))
    )
    return joined.select(
        "n_units",
        "n_values",
        F.col("n_categories").cast("long").alias("n_categories"),
        F.round(d_o, 6).alias("d_o"),
        F.round(d_e, 6).alias("d_e"),
        F.round(
            F.lit(1.0) - F.try_divide(d_o, d_e), 6
        ).alias("alpha"),
    )


def cronbach_alpha(
    df: DataFrame,
    item_cols: list[str],
) -> DataFrame:
    """Cronbach's alpha internal-consistency coefficient (Cronbach,
    Psychometrika 1951 — do k scores measure ONE underlying construct?
    The reliability audit for a metric battery: k quality signals that
    should proxy "document quality" but correlate at α = 0.3 are not a
    scale, they are k different opinions):
    α = k/(k−1) · (1 − Σ var_i / var_total) with var_i the per-item
    variance and var_total the variance of the row SUM; sample (n−1)
    denominators.

    ONE no-grouping aggregate: per item a decimal sum + sum of 9dp
    squares, plus the same two moments of the row sum (the row sum of
    9dp-rounded items is an exact decimal) — fixed-form IEEE
    recombination on identical doubles, 6dp. Rows with ANY NULL item
    are dropped (listwise, the classical treatment — documented).

    Output: ONE row — (n, k_items, sum_item_var, total_var, alpha);
    n < 2 or zero total variance degrades alpha to NULL.
    """
    if len(item_cols) < 2:
        raise ValueError("need at least 2 item columns")
    k = len(item_cols)
    dec = "decimal(25,9)"
    dec2 = "decimal(38,18)"
    rows = df
    for c in item_cols:
        rows = rows.filter(F.col(c).isNotNull())
    v9 = [F.round(F.col(c).cast("double"), 9) for c in item_cols]
    total = F.round(sum(v9), 9)
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for i, v in enumerate(v9):
        aggs.append(F.sum(v.cast(dec)).alias(f"_s{i}"))
        aggs.append(
            F.sum(F.round(v * v, 9).cast(dec2)).alias(f"_q{i}")
        )
    aggs.append(F.sum(total.cast(dec)).alias("_st"))
    aggs.append(F.sum(F.round(total * total, 9).cast(dec2)).alias("_qt"))
    agg = rows.agg(*aggs)
    n = F.col("_n")

    def var(s: str, q: str):
        return F.when(
            n >= 2,
            (
                F.col(q).cast("double")
                - F.col(s).cast("double") * F.col(s).cast("double") / n
            )
            / (n - 1),
        )

    sum_iv = sum(var(f"_s{i}", f"_q{i}") for i in range(k))
    tot_v = var("_st", "_qt")
    alpha = F.when(
        tot_v > 0,
        F.lit(k / (k - 1.0)) * (1 - sum_iv / tot_v),
    )
    return agg.select(
        n.alias("n"),
        F.lit(k).cast("long").alias("k_items"),
        F.round(sum_iv, 6).alias("sum_item_var"),
        F.round(tot_v, 6).alias("total_var"),
        F.round(alpha, 6).alias("alpha"),
    )


def bland_altman(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Bland–Altman method-comparison statistics (Bland & Altman,
    Lancet 1986 — THE agreement readout for two CONTINUOUS measures of
    the same quantity: correlation says two scorers move together,
    Bland-Altman says whether one can REPLACE the other): per-pair
    difference d = x − y; bias = mean(d), sd(d) with (n−1), and the
    95% limits of agreement bias ± 1.959964·sd — the band within which
    the two methods disagree for 95% of items.

    ONE no-grouping aggregate (decimal sums of 9dp diffs + squares),
    fixed-form IEEE recombination, the q421 z literal. Output: ONE
    row — (n, bias, sd_diff, loa_lo, loa_hi); n < 2 degrades the
    sd-derived fields to NULL.
    """
    dec = "decimal(25,9)"
    dec2 = "decimal(38,18)"
    d = F.round(F.col(x_col).cast("double") - F.col(y_col).cast("double"), 9)
    rows = df.filter(d.isNotNull())
    agg = rows.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(d.cast(dec)).alias("_s"),
        F.sum(F.round(d * d, 9).cast(dec2)).alias("_q"),
    )
    n = F.col("_n")
    bias = F.col("_s").cast("double") / n
    sd = F.when(
        n >= 2,
        F.sqrt(
            (
                F.col("_q").cast("double")
                - F.col("_s").cast("double") * F.col("_s").cast("double") / n
            )
            / (n - 1)
        ),
    )
    z = 1.959964
    return agg.select(
        n.alias("n"),
        F.round(bias, 6).alias("bias"),
        F.round(sd, 6).alias("sd_diff"),
        F.round(bias - F.lit(z) * sd, 6).alias("loa_lo"),
        F.round(bias + F.lit(z) * sd, 6).alias("loa_hi"),
    )
