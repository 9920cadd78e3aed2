"""Scalar function surface (SURVEY.md §2.8) + engine-specific text/vector
helpers. Everything here is built from ``pyspark.sql.functions`` (JVM-side,
codegen'd) — no Python UDFs in the hot path."""

from . import text, vectors  # noqa: F401
