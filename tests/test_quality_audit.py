"""Unit tests for operators/quality_audit.py with INJECTED violations —
the catalog query (q108) runs on clean fixture data, so it only proves
the zero-violation path; detection itself is proven here."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbkit_spark.operators.quality_audit import (
    audit,
    foreign_key,
    in_range,
    not_null,
    unique,
)


@pytest.fixture(scope="module")
def dirty(spark):
    parent = spark.createDataFrame([(1, "a"), (2, "b")], "pk long, name string")
    child = spark.createDataFrame(
        # two orphans (pk 9), one null name, dup key 5, value 99.0 o.o.r.
        [(5, 1, "x", 1.0), (5, 2, None, 2.0), (6, 9, "y", 99.0), (7, 9, "z", None)],
        "id long, fk long, name string, v double",
    )
    return {"parent": parent, "child": child}


def _row(df, constraint):
    return df.filter(df.constraint == constraint).collect()[0]


def test_not_null_counts_nulls(dirty):
    out = audit(dirty, [not_null("child", "name")])
    r = _row(out, "not_null:child.name")
    assert (r.n_checked, r.n_violations, r.ok) == (4, 1, False)


def test_unique_counts_duplicate_groups(dirty):
    out = audit(dirty, [unique("child", "id")])
    r = _row(out, "unique:child.id")
    # 3 distinct key groups checked; 1 group (id=5) duplicated
    assert (r.n_checked, r.n_violations, r.ok) == (3, 1, False)


def test_foreign_key_counts_orphans(dirty):
    out = audit(dirty, [foreign_key("child", "fk", "parent", "pk")])
    r = _row(out, "foreign_key:child.fk->parent.pk")
    assert (r.n_checked, r.n_violations, r.ok) == (4, 2, False)


def test_in_range_ignores_nulls(dirty):
    out = audit(dirty, [in_range("child", "v", 0.0, 10.0)])
    r = _row(out, "in_range:child.v[0.0,10.0]")
    # NULL v is not a range violation (declare not_null separately)
    assert (r.n_checked, r.n_violations, r.ok) == (3, 1, False)


def test_audit_unions_all_checks(dirty):
    out = audit(
        dirty,
        [
            not_null("child", "name"),
            unique("child", "id"),
            foreign_key("child", "fk", "parent", "pk"),
            in_range("child", "v", 0.0, 10.0),
        ],
    )
    assert out.count() == 4
    assert out.filter(out.ok).count() == 0


def test_audit_clean_table_all_ok(dirty):
    out = audit(dirty, [not_null("parent", "name"), unique("parent", "pk")])
    assert out.filter(~out.ok).count() == 0


def test_audit_empty_checks_raises(dirty):
    with pytest.raises(ValueError):
        audit(dirty, [])


def test_observe_metrics_rides_the_action(spark):
    """Observation metrics must equal a direct aggregation of the same
    expressions, and must be produced by the SAME action that consumed
    the frame (no extra job: we only call one action)."""
    from dbkit_spark.operators.quality_audit import observe_metrics
    from dbkit_spark.sources import read_table

    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    observed, obs = observe_metrics(
        ev,
        "batch_metrics",
        {
            "n_rows": F.count(F.lit(1)),
            "n_null_value": F.count(F.when(F.col("value").isNull(), 1)),
            "max_user": F.max("user_id"),
        },
    )
    observed.write.format("noop").mode("overwrite").save()  # the one action
    got = obs.get
    expected = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("value").isNull(), 1)).alias("n_null_value"),
        F.max("user_id").alias("max_user"),
    ).collect()[0]
    assert got["n_rows"] == expected["n_rows"] > 0
    assert got["n_null_value"] == expected["n_null_value"]
    assert got["max_user"] == expected["max_user"]
