"""Unit tests for operators/histogram.py on hand-checked values."""

from __future__ import annotations

import pytest

from dbkit_spark.operators.histogram import equi_width_histogram


@pytest.fixture(scope="module")
def vals(spark):
    # bins of width 10 over [0, 100): -5 under, 105 over, None excluded
    return spark.createDataFrame(
        [(float(v),) for v in (-5, 0, 9.999, 10, 55, 99.999, 100, 105)]
        + [(None,)],
        "v double",
    )


def test_histogram_bin_assignment(vals):
    out = {r.bin: r.n for r in
           equi_width_histogram(vals, "v", 0.0, 100.0, 10).collect()}
    assert out == {-1: 1, 0: 2, 1: 1, 5: 1, 9: 1, 10: 2}


def test_histogram_edges(vals):
    rows = {r.bin: (r.bin_lo, r.bin_hi) for r in
            equi_width_histogram(vals, "v", 0.0, 100.0, 10).collect()}
    assert rows[0] == (0.0, 10.0)
    assert rows[9] == (90.0, 100.0)


def test_histogram_excludes_nulls(vals):
    out = equi_width_histogram(vals, "v", 0.0, 100.0, 10)
    assert sum(r.n for r in out.collect()) == 8  # 9 rows minus the NULL


def test_histogram_grouped(spark):
    df = spark.createDataFrame(
        [("a", 5.0), ("a", 6.0), ("b", 5.0)], "k string, v double"
    )
    out = {(r.k, r.bin): r.n for r in
           equi_width_histogram(df, "v", 0.0, 10.0, 2, keys=["k"]).collect()}
    assert out == {("a", 1): 2, ("b", 1): 1}


def test_histogram_validates_args(vals):
    with pytest.raises(ValueError):
        equi_width_histogram(vals, "v", 0.0, 100.0, 0)
    with pytest.raises(ValueError):
        equi_width_histogram(vals, "v", 10.0, 10.0, 5)


def test_quantile_bin_sampled_default(spark):
    """The DEFAULT quantile_bin path: no single-partition window in the
    plan, bins are monotone in value, populations are near-equal, and
    the assignment agrees with exact ntile on ~all rows (boundary rows
    may differ by one bin — that's the documented approxQuantile trade)."""
    from dbkit_spark.operators.histogram import quantile_bin
    from dbkit_spark.sources import read_table

    ev = read_table(spark, "/root/testdata/sf0.01", "events")
    k = 8
    sampled = quantile_bin(ev, "value", k)
    plan = sampled._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "SinglePartition" not in final, final
    assert "Window" not in final, final

    rows = sampled.select("event_id", "value", "bin").collect()
    n = len(rows)
    # bins span 1..k, monotone in value
    by_bin = {}
    for r in rows:
        by_bin.setdefault(r.bin, []).append(r.value)
    assert set(by_bin) == set(range(1, k + 1))
    for b in range(1, k):
        assert max(by_bin[b]) <= min(by_bin[b + 1])
    # near-equal populations (rel_err=0.001 → well under 5% drift)
    for b, vs in by_bin.items():
        assert abs(len(vs) - n / k) < 0.05 * n, (b, len(vs), n)

    # agreement with the exact ntile baseline
    exact = {
        r.event_id: r.bin
        for r in quantile_bin(
            ev, "value", k, exact=True, tiebreak_col="event_id"
        )
        .select("event_id", "bin")
        .collect()
    }
    agree = sum(1 for r in rows if exact[r.event_id] == r.bin)
    assert agree / n > 0.95, agree / n


def test_quantile_bin_validates_args(spark):
    from dbkit_spark.operators.histogram import quantile_bin

    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError):
        quantile_bin(df, "v", 0)


def test_quantile_bin_grouped(spark):
    """Per-group binning laws: boundaries are each group's own (a group
    with shifted values still spreads over all k bins), populations are
    near-equal within each group, bins monotone in value within a
    group, and the plan has no window and broadcasts the boundary
    table."""
    from dbkit_spark.operators.histogram import quantile_bin_grouped
    from dbkit_spark.sources import read_table

    ev = read_table(spark, "/root/testdata/sf0.01", "events")
    # two synthetic groups with disjoint ranges: global boundaries would
    # put all of group 'lo' in bin 1 and all of 'hi' in bin k
    df = ev.selectExpr(
        "CASE WHEN event_id % 2 = 0 THEN 'lo' ELSE 'hi' END AS g",
        "CASE WHEN event_id % 2 = 0 THEN value ELSE value + 10000 END AS v",
    )
    k = 4
    out = quantile_bin_grouped(df, "v", k, ["g"])
    plan = out._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert "Window" not in plan and "SinglePartition" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan

    rows = out.collect()
    by_g: dict[str, list] = {}
    for r in rows:
        by_g.setdefault(r.g, []).append(r)
    assert set(by_g) == {"lo", "hi"}
    for g, rs in by_g.items():
        n = len(rs)
        by_bin: dict[int, list] = {}
        for r in rs:
            by_bin.setdefault(r.bin, []).append(r.v)
        assert set(by_bin) == set(range(1, k + 1)), (g, set(by_bin))
        for b in range(1, k):
            assert max(by_bin[b]) <= min(by_bin[b + 1])
        for b, vs in by_bin.items():
            assert abs(len(vs) - n / k) < 0.1 * n, (g, b, len(vs), n)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="keys"):
        quantile_bin_grouped(df, "v", 4, [])
