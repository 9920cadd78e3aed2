"""The engine-wide portable md5→integer rule, in one place.

Every deterministic draw in this repo (samples, salts, coins, boundary
sampling) reduces to "first N hex digits of md5(key:salt) as an
integer", paired with a DuckDB twin that must replay it digit-for-digit.
The construction had been re-inlined per site with per-site variations
(6 vs 8 digits, modulo vs threshold), where one wrong substring width is
a silent oracle mismatch — this module is the dec/dec_sql pattern
(operators/aggregate.py) applied to hashing: one Spark builder + one SQL
fragment builder, guaranteed to agree.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def u32_md5(key: Column, salt: str) -> Column:
    """First 8 md5 hex digits of ``key ':' salt`` as a BIGINT in
    [0, 2^32) — the uniform-integer draw behind weighted sampling,
    digest salting, permutation coins, and boundary sampling."""
    return F.conv(
        F.substring(
            F.md5(F.concat(key.cast("string"), F.lit(":" + salt))), 1, 8
        ),
        16,
        10,
    ).cast("long")


def u32_md5_sql(key_sql: str, salt: str) -> str:
    """DuckDB twin of :func:`u32_md5` — replays the draw exactly
    (CAST('0x' || hex AS BIGINT) parses the same 8 hex digits)."""
    return (
        f"CAST(('0x' || substr(md5(CAST({key_sql} AS VARCHAR) || ':{salt}'), "
        f"1, 8)) AS BIGINT)"
    )
