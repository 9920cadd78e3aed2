"""Differential test: every catalog query with an oracle must match DuckDB
bit-exactly at sf0.001 (the driver runs the same at sf0.01)."""

from __future__ import annotations

import pytest

from dbkit_spark.catalog import load_all
from tests.oracle_utils import check_dtype_parity, compare_query

CATALOG = load_all()
WITH_ORACLE = sorted(name for name, spec in CATALOG.items() if spec.oracle)
ROWS_ONLY = sorted(name for name, spec in CATALOG.items() if not spec.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(spark, sf_dir, name):
    spec = CATALOG[name]
    compare_query(spark, name, spec.fn, spec.oracle, sf_dir)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_dtype_parity(spark, sf_dir, name):
    """Pandas-dtype emulation of the driver's hash: catches int-vs-float
    and decimal-vs-double drift that tuple compares coerce away."""
    spec = CATALOG[name]
    check_dtype_parity(spark, name, spec.fn, spec.oracle, sf_dir)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    spec = CATALOG[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
