"""Declared-query corpus (BASELINE.md query set; ≥1 query per SURVEY.md §2
operator row). Modules register into ``dbkit_spark.catalog.CATALOG``."""
