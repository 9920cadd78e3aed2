"""dbkit-spark: a PySpark-native analytics engine with the query and
data-processing capabilities of the reference columnar engine
(mtanski/dbkit), re-expressed Spark-first (see SURVEY.md).

Public surface:
- ``session``: tuned SparkSession factory
- ``schema``: explicit schemas + eager validation (reference §1.5 discipline)
- ``sources``/``operators``/``functions``/``streaming``/``llm``: SURVEY §2 surface
- ``catalog``: declared-query corpus with DuckDB oracles
"""

from . import errors, schema, session  # noqa: F401

__version__ = "0.1.0"
