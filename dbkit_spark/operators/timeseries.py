"""Time-series gap-fill and dimension-history operators.

Two read-side patterns every timeseries/warehouse engine exposes that the
reference's domain (dbkit targets OLAP over event streams; SURVEY §2.11)
implies but its pre-alpha operator set does not yet reach:

- ``gapfill_locf``: the ``time_bucket_gapfill`` + last-observation-carried-
  forward pattern — bucket events to a fixed resolution, densify each
  group's time axis to a complete spine, and fill the holes with the most
  recent observed value. Complements ``operators/rollup_hierarchy.py``
  (the write-side continuous aggregate).
- ``scd2_history``: slowly-changing-dimension type-2 builder — collapse a
  change feed into versioned validity intervals (``valid_from`` /
  ``valid_to`` / ``version`` / ``is_current``) per key.

100 TB design (see SCALE.md):

- gapfill aggregates raw data ONCE down to (keys × buckets) — everything
  after the first shuffle operates on bucket counts, which are smaller
  than raw by the events-per-bucket factor. The spine is generated from
  per-key min/max (a tiny agg), exploded as an integer ``sequence`` —
  never a cross join against a global calendar table.
- the LOCF window partitions by the series keys — parallelism is the
  number of series, which is the natural sharding of any timeseries
  workload; no global single-reducer window anywhere.
- scd2 is two windows over the same (key × ts) partitioning; Catalyst
  collapses them into one shuffle + one sort.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .rollup_hierarchy import _duration_seconds


def gapfill_locf(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    aggs: dict[str, Column],
    bucket: str = "1 hour",
    locf_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Bucket ``df`` to ``bucket`` resolution per ``keys``, densify each
    key's time axis between its own min and max bucket, and LOCF-fill
    the ``locf_cols`` (default: all agg columns).

    Output: keys..., ``bucket_ts`` (timestamp, epoch-aligned like
    ``F.window``), ``n_events`` (0 for gap rows), ``is_gap`` (boolean),
    and one ``<name>_locf`` per filled column.

    Gap rows before a key's first observation cannot be back-filled by
    definition; each key's spine starts at its own first bucket, so every
    gap row has a predecessor and ``_locf`` columns are never NULL.
    """
    sec = _duration_seconds(bucket)
    keys = list(keys)
    locf_cols = list(locf_cols) if locf_cols is not None else list(aggs)

    be = (F.floor(F.unix_timestamp(F.col(ts_col)) / sec) * sec).cast("long")
    bucketed = (
        df.withColumn("__be", be)
        .groupBy(*keys, "__be")
        .agg(F.count(F.lit(1)).alias("n_events"),
             *[c.alias(n) for n, c in aggs.items()])
    )

    # Per-key spine: integer epoch sequence (exact, cheap) exploded from a
    # two-row-per-key bound agg — output size is buckets, not raw rows.
    spine = (
        bucketed.groupBy(*keys)
        .agg(F.min("__be").alias("__mn"), F.max("__be").alias("__mx"))
        .select(
            *keys,
            F.explode(
                F.sequence(F.col("__mn"), F.col("__mx"), F.lit(sec))
            ).alias("__be"),
        )
    )

    joined = spine.join(bucketed, [*keys, "__be"], "left")
    w = (
        Window.partitionBy(*keys)
        .orderBy("__be")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = joined.withColumn("is_gap", F.col("n_events").isNull()).withColumn(
        "n_events", F.coalesce("n_events", F.lit(0))
    )
    for name in locf_cols:
        out = out.withColumn(
            f"{name}_locf", F.last(name, ignorenulls=True).over(w)
        )
    return out.select(
        *keys,
        F.timestamp_seconds(F.col("__be")).alias("bucket_ts"),
        "n_events",
        "is_gap",
        *[f"{n}_locf" for n in locf_cols],
    )


def scd2_history(
    df: DataFrame,
    key: str | Sequence[str],
    state_cols: Sequence[str],
    ts_col: str,
    tiebreak: str | Sequence[str] = (),
) -> DataFrame:
    """Slowly-changing-dimension type 2: collapse a per-key change feed to
    versioned validity intervals.

    Consecutive rows (ordered by ``ts_col`` then ``tiebreak``) whose
    ``state_cols`` are unchanged collapse into one interval; each change
    opens a new version. Output: key..., state_cols..., ``valid_from``,
    ``valid_to`` (NULL for the open/current version), ``version`` (1-based
    per key), ``is_current``.

    Ties on ``ts_col`` without a ``tiebreak`` would make the survivor
    partition-order-dependent (the asof_join lesson, ADVICE r1) — pass a
    unique column when the feed can carry same-timestamp rows.

    Null-safe: state transitions use ``eqNullSafe`` so NULL→'x' and
    'x'→NULL both count as changes and NULL→NULL does not.
    """
    keys = [key] if isinstance(key, str) else list(key)
    ties = [tiebreak] if isinstance(tiebreak, str) else list(tiebreak)
    state_cols = list(state_cols)

    order = [F.col(ts_col).asc(), *[F.col(t).asc() for t in ties]]
    w = Window.partitionBy(*keys).orderBy(*order)

    state = F.struct(*[F.col(c) for c in state_cols])
    prev = F.lag(state).over(w)
    changed = prev.isNull() | ~state.eqNullSafe(prev)

    changes = (
        df.select(*keys, *state_cols, ts_col, *ties)
        .withColumn("__chg", changed)
        .filter(F.col("__chg"))
        .drop("__chg")
    )

    # Same partitioning + ordering as the first window: one shuffle total.
    w2 = Window.partitionBy(*keys).orderBy(*order)
    out = (
        changes.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w2))
        .withColumn("version", F.row_number().over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
    return out.select(
        *keys, *state_cols, "valid_from", "valid_to", "version", "is_current"
    )


def ewma(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    value_col: str,
    alpha: float,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Exponentially-weighted moving average per key:
    ``y_t = α·x_t + (1−α)·y_{t−1}`` (adjust=False recursion).

    The recursion is inherently sequential WITHIN a key, so this is the
    declared Arrow/pandas boundary (SURVEY §2.10): grouped-map
    ``applyInPandas``, one group = one series, parallelism = number of
    series — the same sharding every stateful timeseries op here uses
    (gapfill LOCF, scd2). No SQL oracle exists (the recursion is not
    window-expressible without unstable pow() rescaling); parity against
    a pure-Python reference is pytest-asserted instead, and the catalog
    entry is rows-only by design.

    ``tiebreak`` orders same-timestamp rows (the scd2/asof determinism
    rule).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    keys = list(keys)
    sort_cols = [ts_col, *tiebreak]
    out_fields = [*keys, ts_col, value_col]

    def _fn(pdf):
        pdf = pdf.sort_values(sort_cols)
        pdf["ewma"] = pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        return pdf[[*out_fields, "ewma"]]

    schema_cols = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in out_fields
    )
    return df.groupBy(*keys).applyInPandas(_fn, f"{schema_cols}, ewma double")

def enrich_with_scd2(
    events: DataFrame,
    dim: DataFrame,
    key: str | Sequence[str],
    ts_col: str = "ts",
    state_prefix: str = "",
) -> DataFrame:
    """POINT-IN-TIME enrichment against an SCD2 dimension
    (``scd2_history`` output): each event left-joins the dim version
    valid at its event time — ``valid_from <= ts AND (valid_to IS NULL
    OR ts < valid_to)``. An event exactly at a change timestamp gets
    the NEW version (its interval starts there); events before the
    key's first version enrich as NULLs.

    Output = events columns + the dim's state columns (optionally
    ``state_prefix``-renamed) + ``version``. Name collisions between
    event columns and (prefixed) state columns raise up front rather
    than producing ambiguous references mid-plan.

    Plan shape: equi-join on the key with the interval predicate as a
    join residual — a hash join (broadcast for typical dim sizes),
    never a nested loop; per (key, event) at most ONE version matches
    (SCD2 intervals partition time), so the join never fans out.
    The events side may be a STREAMING DataFrame unchanged — this is
    the stream-static enrichment shape (§2.9), and availableNow replay
    equals the batch join (pinned in tests)."""
    keys = [key] if isinstance(key, str) else list(key)
    reserved = {*keys, "valid_from", "valid_to", "version", "is_current"}
    state_cols = [c for c in dim.columns if c not in reserved]
    out_names = {state_prefix + c for c in state_cols}
    clash = out_names & set(events.columns)
    if clash:
        raise ValueError(
            f"state columns {sorted(clash)} collide with event columns; "
            "pass state_prefix to rename them"
        )
    d = dim.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        *[F.col(c).alias(state_prefix + c) for c in state_cols],
        "valid_from",
        "valid_to",
        "version",
    )
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"__k_{k}"))
    ts = F.col(ts_col)
    cond = (
        cond
        & (F.col("valid_from") <= ts)
        & (F.col("valid_to").isNull() | (ts < F.col("valid_to")))
    )
    return events.join(d, cond, "left").drop(
        *[f"__k_{k}" for k in keys], "valid_from", "valid_to"
    )


def interpolate_linear(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str | None = None,
    out_col: str = "filled_value",
) -> DataFrame:
    """Linear interpolation of NULL ``value_col`` entries between the
    nearest non-null neighbors within each key — the sensor-dropout /
    sparse-metric repair that LOCF (``gapfill_locf``) only
    staircase-approximates.

    filled = prev + (next - prev) * (t - t_prev) / (t_next - t_prev)
    for interior gaps; leading gaps backfill from the next value,
    trailing gaps carry the previous forward (nearest-neighbor at the
    boundaries). Non-null rows pass through unchanged.

    Plan: two conditional running-value window passes over the SAME
    (key, ts) sort — last non-null (value, time) before, first after —
    then a map-side arithmetic fill. One hash-partitioned per-key sort,
    the sessionization cost class; no joins, no grid explosion. Time
    fractions use exact integer microseconds so the only float ops are
    the final two multiplies (6dp-rounded, oracle-portable).
    """
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    base = Window.partitionBy(key_col).orderBy(*order)
    w_prev = base.rowsBetween(Window.unboundedPreceding, -1)
    w_next = base.rowsBetween(1, Window.unboundedFollowing)
    us = F.unix_micros(F.col(ts_col))
    nn = F.col(value_col).isNotNull()
    prev_v = F.last(F.when(nn, F.col(value_col)), ignorenulls=True).over(w_prev)
    prev_t = F.last(F.when(nn, us), ignorenulls=True).over(w_prev)
    next_v = F.first(F.when(nn, F.col(value_col)), ignorenulls=True).over(w_next)
    next_t = F.first(F.when(nn, us), ignorenulls=True).over(w_next)
    staged = df.select(
        F.col("*"),
        prev_v.alias("_pv"),
        prev_t.alias("_pt"),
        next_v.alias("_nv"),
        next_t.alias("_nt"),
    )
    interior = (
        F.col("_pv").isNotNull()
        & F.col("_nv").isNotNull()
        & (F.col("_nt") != F.col("_pt"))
    )
    linear = F.col("_pv") + (F.col("_nv") - F.col("_pv")) * (
        (us - F.col("_pt")) / (F.col("_nt") - F.col("_pt"))
    )
    filled = (
        F.when(nn, F.col(value_col))
        .when(interior, F.round(linear, 6))
        .when(F.col("_pv").isNotNull(), F.col("_pv"))
        .otherwise(F.col("_nv"))
    )
    return staged.withColumn(out_col, filled).drop("_pv", "_pt", "_nv", "_nt")


def acf_by_key(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    lags: tuple[int, ...] = (1, 2, 3),
) -> DataFrame:
    """Per-key lag-k autocorrelation — the seasonality/persistence
    readout next to the interpolation/SCD2 operators here: for each
    key and each requested lag, r_k = Σ z_t·z_{t-k} / Σ z_t² with
    z = x − mean_key(x).

    Scale: ONE per-key window sort shared by every lag (the lag
    columns ride the same (key, order) frame), one map-side product
    expansion (array-of-structs explode — rows × |lags|, no join), one
    hash agg. Means come from decimal-stabilized sums; products are
    9dp-rounded decimals so the reduction is order-independent and a
    DuckDB oracle replays it digit-for-digit. Output:
    (key, lag, n_pairs, acf) at 6dp.
    """
    dec = "decimal(38,9)"
    xd = F.round(F.col(value_col).cast("double"), 9)
    stats = (
        df.select(F.col(key_col), xd.cast(dec).alias("x"))
        .groupBy(key_col)
        .agg(F.count("*").alias("n"), F.sum("x").alias("sx"))
        .select(
            key_col,
            (F.col("sx").cast("double") / F.col("n")).alias("mu"),
        )
    )
    zdf = df.join(F.broadcast(stats), key_col).select(
        F.col(key_col),
        F.col(order_col),
        (xd - F.col("mu")).alias("z"),
    )
    w = Window.partitionBy(key_col).orderBy(order_col)
    # materialize the lag columns first (window exprs can't live inside
    # a generator) — every lag shares the ONE (key, order) sort
    lagged = zdf
    for k in lags:
        lagged = lagged.withColumn(f"_z{k}", F.lag("z", k).over(w))
    # lag 0 is the DENOMINATOR (Σ z²) riding the same explode+agg as
    # the numerators — one corpus pass, not two
    terms = F.array(
        F.struct(
            F.lit(0).alias("lag"),
            F.round(F.col("z") * F.col("z"), 9).cast(dec).alias("prod"),
        ),
        *[
            F.struct(
                F.lit(k).alias("lag"),
                F.round(F.col("z") * F.col(f"_z{k}"), 9)
                .cast(dec)
                .alias("prod"),
            )
            for k in lags
        ],
    )
    exploded = (
        lagged.select(F.col(key_col), F.explode(terms).alias("t"))
        .select(key_col, "t.lag", "t.prod")
        .filter(F.col("prod").isNotNull())
    )
    # ONE per-key conditional aggregation carries every lag's moments
    # AND the denominator — a single exchange, and the corpus window
    # pipeline executes exactly once (a per-(key,lag) agg + self-join
    # would re-run the whole sort subtree for the lag-0 branch)
    per_key = exploded.groupBy(key_col).agg(
        F.sum(F.when(F.col("lag") == 0, F.col("prod"))).alias("_szz"),
        *[
            F.sum(
                F.when(F.col("lag") == k, F.col("prod"))
            ).alias(f"_num_{k}")
            for k in lags
        ],
        *[
            F.sum(
                F.when(F.col("lag") == k, 1).otherwise(0)
            ).alias(f"_np_{k}")
            for k in lags
        ],
    )
    out_terms = F.array(
        *[
            F.struct(
                F.lit(k).alias("lag"),
                F.col(f"_np_{k}").alias("n_pairs"),
                (
                    F.round(
                        F.col(f"_num_{k}").cast("double")
                        / F.col("_szz").cast("double"),
                        6,
                    )
                    + F.lit(0.0)
                ).alias("acf"),
            )
            for k in lags
        ]
    )
    return per_key.select(
        F.col(key_col), F.explode(out_terms).alias("o")
    ).select(key_col, "o.lag", "o.n_pairs", "o.acf")


def seasonal_naive_backtest(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    season: int = 7,
) -> DataFrame:
    """Backtest of the SEASONAL-NAIVE forecast (ŷ_t = y_{t−season}) —
    the baseline every real forecasting model must beat, and the
    honest first deliverable of a forecasting surface: per key,
    evaluate the naive forecast on every row that has a season-lagged
    ancestor and report (n_eval, mae, rmse, bias).

    One per-key window lag (shares the family's single (key, order)
    sort), decimal error sums (order-independent), raw-IEEE outputs
    where sums stay sub-2^53. Output: one row per key."""
    dec = "decimal(38,9)"
    w = Window.partitionBy(key_col).orderBy(order_col)
    yd = F.col(value_col).cast("double")
    errs = (
        df.withColumn("_f", F.lag(yd, season).over(w))
        .filter(F.col("_f").isNotNull())
        .select(
            F.col(key_col),
            F.round(yd - F.col("_f"), 9).alias("_e"),
        )
    )
    agg = errs.groupBy(key_col).agg(
        F.count("*").alias("n_eval"),
        F.sum(F.round(F.abs(F.col("_e")), 9).cast(dec)).alias("sae"),
        F.sum(
            F.round(F.col("_e") * F.col("_e"), 9).cast(dec)
        ).alias("sse"),
        F.sum(F.col("_e").cast(dec)).alias("se"),
    )
    n = F.col("n_eval").cast("double")
    return agg.select(
        key_col,
        "n_eval",
        (F.col("sae").cast("double") / n).alias("mae"),
        F.sqrt(F.col("sse").cast("double") / n).alias("rmse"),
        (F.col("se").cast("double") / n).alias("bias"),
    )


def theil_sen_by_key(
    df: DataFrame,
    key_cols: list[str],
    x_col: str,
    y_col: str,
    max_points: int = 40,
) -> DataFrame:
    """Per-key Theil–Sen trend: the MEDIAN of all pairwise slopes
    (y_j−y_i)/(x_j−x_i), x_i < x_j — the robust trend estimator whose
    breakdown point (~29%) shrugs off the outliers that wreck OLS
    slopes on telemetry.

    Scale contract: pairwise slopes are quadratic in series length, so
    each key's series is CAPPED at ``max_points`` (first points in
    x-order, deterministic; ≤ max_points·(max_points−1)/2 pairs per
    key — the q256/q273 bounded-series discipline). The pair generator
    is a key-equi SELF-JOIN (shuffle on key only, never all-pairs
    across keys); the median uses percentile_disc so both engines pick
    an OBSERVED slope (no interpolation ambiguity). Ties in x are
    dropped (undefined slope).
    """
    w = Window.partitionBy(*key_cols).orderBy(x_col)
    capped = (
        df.select(*key_cols, x_col, y_col)
        .filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_points)
    )
    a = capped.select(
        *key_cols,
        F.col(x_col).alias("_xi"),
        F.col(y_col).alias("_yi"),
    )
    b = capped.select(
        *key_cols,
        F.col(x_col).alias("_xj"),
        F.col(y_col).alias("_yj"),
    )
    pairs = a.join(b, key_cols).filter(F.col("_xi") < F.col("_xj"))
    slopes = pairs.select(
        *key_cols,
        (
            (F.col("_yj").cast("double") - F.col("_yi").cast("double"))
            / (F.col("_xj").cast("double") - F.col("_xi").cast("double"))
        ).alias("_slope"),
    )
    return slopes.groupBy(*key_cols).agg(
        F.count("*").alias("n_pairs"),
        F.round(F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY _slope)"), 9).alias(
            "slope"
        ),
    )


def holt_smooth(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    value_col: str,
    alpha: float = 0.3,
    beta: float = 0.2,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Per-key HOLT LINEAR (double-exponential) smoothing — the
    trend-aware upgrade of :func:`ewma` (Holt 1957; the level-only EWMA
    lags a trending series by a constant offset, Holt tracks it):

    ``l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1})``,
    ``b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}``,
    initialized ``l_1 = y_1, b_1 = 0`` (the data-free init — a series
    of length 1 forecasts flat). Output per row: level, trend, and the
    one-step-ahead forecast ``l + b`` the anomaly family compares
    against.

    Same execution contract as ``ewma``: the recursion is sequential
    WITHIN a key, so it runs as grouped-map ``applyInPandas`` (keys
    parallelize, one key shuffle, per-key history fits a task — the
    CUSUM contract). The recurrence is written as plain ordered float
    arithmetic so a recursive-CTE oracle replays it bit-for-bit (the
    q118 EWMA precedent); outputs 6dp-rounded at the catalog boundary.

    ``tiebreak`` orders same-timestamp rows (the scd2/asof rule).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if not 0.0 <= beta <= 1.0:
        raise ValueError(f"beta must be in [0, 1], got {beta}")
    keys = list(keys)
    sort_cols = [ts_col, *tiebreak]
    out_fields = [*keys, ts_col, value_col]

    def _fn(pdf):
        pdf = pdf.sort_values(sort_cols)
        ys = pdf[value_col].astype(float).tolist()
        levels: list[float] = []
        trends: list[float] = []
        l_prev = 0.0
        b_prev = 0.0
        for i, y in enumerate(ys):
            if i == 0:
                l_cur, b_cur = y, 0.0
            else:
                l_cur = alpha * y + (1.0 - alpha) * (l_prev + b_prev)
                b_cur = beta * (l_cur - l_prev) + (1.0 - beta) * b_prev
            levels.append(l_cur)
            trends.append(b_cur)
            l_prev, b_prev = l_cur, b_cur
        out = pdf[out_fields].copy()
        out["level"] = levels
        out["trend"] = trends
        out["forecast"] = [lv + tr for lv, tr in zip(levels, trends)]
        return out

    schema_cols = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in out_fields
    )
    return df.groupBy(*keys).applyInPandas(
        _fn, f"{schema_cols}, level double, trend double, forecast double"
    )
