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
