"""Feature-engineering operators for tabular training data.

The curation pipeline's last mile before a model: turn raw categorical
and text columns into leak-free numeric features, at corpus scale. The
three classics here share one design rule — each is ONE hash
aggregation over the grouping key plus a map-side transform of the
original rows (broadcast-joined, never a per-row shuffle), and every
sum rides 9dp decimals so the reduction is order-independent and a
DuckDB oracle replays it digit-for-digit.

- ``target_encode``: leave-one-out smoothed target-mean encoding —
  the per-row form that CANNOT leak the row's own label (the naive
  per-category mean memorizes singletons; LOO subtracts self).
- ``feature_hash``: the hashing trick — unbounded token vocabularies
  into a fixed dimensionality with signed collisions (Weinberger et
  al. 2009), on the engine-wide portable md5 rule.
- ``woe_iv``: weight-of-evidence + information value per category —
  the monotone-risk encoding and its feature-strength summary.

Reference trace: none — dbkit stops at ToStr (`expression/convert.rs`);
this is north-star training-data surface (BASELINE.json family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(38,9)"


def target_encode(
    df: DataFrame,
    cat_col: str,
    label_col: str,
    m: float = 10.0,
) -> DataFrame:
    """Append ``te`` — the leave-one-out smoothed target encoding:

        te_i = (sum_cat(y) - y_i + m * prior) / (n_cat - 1 + m)

    prior = global mean(y). One (cat) hash agg + one 1-row global agg,
    both broadcast back; the encoding itself is a map-side expression.
    Decimal label sums; te is raw IEEE double of identical inputs."""
    yd = F.round(F.col(label_col).cast("double"), 9)
    per_cat = (
        df.select(F.col(cat_col), yd.cast(_DEC).alias("y"))
        .groupBy(cat_col)
        .agg(F.count("*").alias("n_cat"), F.sum("y").alias("sy_cat"))
    )
    glob = df.select(yd.cast(_DEC).alias("y")).agg(
        F.count("*").alias("n_all"), F.sum("y").alias("sy_all")
    )
    prior = F.col("sy_all").cast("double") / F.col("n_all")
    return (
        df.join(F.broadcast(per_cat), cat_col)
        .crossJoin(F.broadcast(glob))
        .withColumn(
            "te",
            (
                F.col("sy_cat").cast("double")
                - F.col(label_col).cast("double")
                + F.lit(float(m)) * prior
            )
            / (F.col("n_cat") - 1 + F.lit(float(m))),
        )
        .drop("n_cat", "sy_cat", "n_all", "sy_all")
    )


def feature_hash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    dim: int = 64,
    salt: str = "fh",
) -> DataFrame:
    """Hashing-trick text features: whitespace-lowered tokens map to
    ``dim`` buckets via the portable md5 rule, each contributing a
    ±1 sign (second hash bit) for unbiased collisions. Output is the
    SPARSE form ``(id, dim_idx, val)`` — the 100 TB-honest shape (a
    dense array column is one ``array_agg`` away when d is small).

    Map-side split+explode, one (id, dim) hash agg — no joins."""
    tok = F.explode(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    ).alias("tok")
    toks = df.select(F.col(id_col), tok).filter(F.col("tok") != "")
    h = F.md5(F.concat(F.col("tok"), F.lit(":" + salt)))
    bucket = F.conv(F.substring(h, 1, 6), 16, 10).cast("long") % F.lit(dim)
    sign = F.when(
        F.conv(F.substring(h, 7, 1), 16, 10).cast("long") % 2 == 0, 1
    ).otherwise(-1)
    return (
        toks.select(
            F.col(id_col),
            bucket.cast("int").alias("dim_idx"),
            sign.alias("s"),
        )
        .groupBy(id_col, "dim_idx")
        .agg(F.sum("s").cast("long").alias("val"))
        .filter(F.col("val") != 0)
    )


def woe_iv(
    df: DataFrame,
    cat_col: str,
    label_col: str,
    smooth: float = 0.5,
) -> DataFrame:
    """Weight of evidence + information value per category of a binary
    label:

        woe_c = ln( ((pos_c + s) / (P + 2s)) / ((neg_c + s) / (N + 2s)) )
        iv_c  = (pos_c/P - neg_c/N) * woe_c

    ``smooth`` (Laplace s) keeps empty cells finite. One (cat) hash agg
    with conditional counts; P/N derive from the SAME aggregate rows
    (broadcast 1-row total — no second scan). woe/iv are raw IEEE
    doubles of exact integer counts; Σ iv_c is the feature's IV."""
    lab = F.col(label_col).cast("boolean")
    per = (
        df.select(F.col(cat_col), lab.alias("y"))
        .filter(F.col("y").isNotNull())
        .groupBy(cat_col)
        .agg(
            F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("n_pos"),
            F.sum(F.when(F.col("y"), 0).otherwise(1)).alias("n_neg"),
        )
    )
    tot = per.agg(
        F.sum("n_pos").alias("p_all"), F.sum("n_neg").alias("n_all")
    )
    s = float(smooth)
    pr = (F.col("n_pos") + s) / (F.col("p_all") + 2 * s)
    nr = (F.col("n_neg") + s) / (F.col("n_all") + 2 * s)
    return per.crossJoin(F.broadcast(tot)).select(
        cat_col,
        "n_pos",
        "n_neg",
        F.log(pr / nr).alias("woe"),
        (
            (
                F.col("n_pos").cast("double") / F.col("p_all")
                - F.col("n_neg").cast("double") / F.col("n_all")
            )
            * F.log(pr / nr)
        ).alias("iv_term"),
    )


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Per-group quantile normalization: replace each value with the
    GLOBAL value at the same within-group quantile position, so every
    group ends up with (a subsample of) the identical distribution —
    the cross-instrument/cross-domain harmonization step (microarray
    heritage) that z-scoring can't deliver when shapes differ, not
    just moments.

    Mechanics: within-group rank r (ties broken by id — one
    deterministic order both engines replay), quantile position
    p = (r − 0.5)/n_g, target = the global sorted value at index
    ⌈p·N⌉ (1-based; an OBSERVED value, no interpolation). The global
    index comes from ``stable_row_number`` (range exchange + local
    offsets — NO SinglePartition window, the retired failure class)
    and the mapping is an equi-join on the integer index —
    corpus-sized but keyed, no NLJ, no collect.

    Output: (id, group, value, normalized)."""
    wg = Window.partitionBy(group_col).orderBy(value_col, id_col)
    ranked = df.select(
        F.col(id_col),
        F.col(group_col),
        F.col(value_col).cast("double").alias("_v"),
        F.row_number().over(wg).alias("_r"),
        F.count("*")
        .over(Window.partitionBy(group_col))
        .alias("_ng"),
    )
    from .rownumber import stable_row_number

    global_sorted = stable_row_number(
        df.select(
            F.col(id_col), F.col(value_col).cast("double").alias("_v")
        ),
        ["_v", id_col],
        out_col="_idx",
    ).select(F.col("_v").alias("_gv"), F.col("_idx"))
    n_all = df.count()
    target_idx = F.least(
        F.lit(int(n_all)),
        F.ceil(
            (F.col("_r") - 0.5) / F.col("_ng") * F.lit(int(n_all))
        ).cast("long"),
    )
    return (
        ranked.withColumn("_idx", target_idx)
        .join(global_sorted, "_idx")
        .select(
            F.col(id_col),
            F.col(group_col),
            F.col("_v").alias(value_col),
            F.col("_gv").alias("normalized"),
        )
    )
