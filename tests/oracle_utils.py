"""Local oracle-differential harness emulating the driver's t2 compare:
row count + schema + order-insensitive value compare, with *bit-exact*
float equality (stricter than any plausible driver normalization — if we
pass here, we pass there)."""

from __future__ import annotations

import datetime
import math
from decimal import Decimal
from typing import Any

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def run_oracle(sql: str, sf_dir: str) -> tuple[list[str], list[tuple]]:
    con = duckdb_connect(sf_dir)
    try:
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        return cols, rows
    finally:
        con.close()


def canon_value(v: Any) -> Any:
    if v is None:
        return ("0none",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))  # repr is bit-faithful for doubles
    # Decimal is deliberately NOT coerced to float: the driver's pandas
    # hash sees Spark decimal as object-Decimal vs DuckDB DOUBLE as
    # float64 and fails. Keeping the tag distinct makes that drift fail
    # locally too (root cause of the round-1 q73 red row).
    if isinstance(v, Decimal):
        return ("d", str(v))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, datetime.datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("t", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("a", tuple(canon_value(x) for x in v))
    if isinstance(v, (bytes, bytearray)):
        return ("y", bytes(v).hex())
    return ("s", str(v))


def canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name (driver behavior), canonicalize values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_value(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def _pandas_kind(k: str) -> str:
    """Collapse pandas dtype kinds into the families the driver's hash
    actually distinguishes (int64 vs float64 diverge; int32 vs int64
    do not after canonicalization)."""
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "M":
        return "ts"
    if k == "b":
        return "bool"
    return "obj"


def check_dtype_parity(spark, name: str, fn, oracle: str, sf_dir: str) -> None:
    """Driver emulation: both result sets are materialized as pandas frames
    (exactly what the driver hashes) and per-column dtype *families* must
    match. This is what catches DuckDB HUGEINT→float64 vs Spark int64
    (round-1 q75) and decimal-vs-double (q73) drift that tuple-level
    compares coerce away."""
    sdf = fn(spark, sf_dir)
    s_pdf = sdf.toPandas()
    con = duckdb_connect(sf_dir)
    try:
        o_pdf = con.execute(oracle).df()
    finally:
        con.close()
    s_kinds = {c: _pandas_kind(s_pdf[c].dtype.kind) for c in s_pdf.columns}
    o_kinds = {c: _pandas_kind(o_pdf[c].dtype.kind) for c in o_pdf.columns}
    assert set(s_kinds) == set(o_kinds), (
        f"{name}: column mismatch spark={sorted(s_kinds)} oracle={sorted(o_kinds)}"
    )
    mismatched = {
        c: (s_kinds[c], o_kinds[c])
        for c in s_kinds
        if s_kinds[c] != o_kinds[c]
        # int-with-NULLs becomes float64 on either side; the driver sees
        # the same coercion on both frames only when both have nulls, so
        # only forgive int/float when the float side actually holds NaN.
        and not (
            {s_kinds[c], o_kinds[c]} == {"int", "float"}
            and (
                (s_kinds[c] == "float" and s_pdf[c].isna().any())
                or (o_kinds[c] == "float" and o_pdf[c].isna().any())
            )
        )
    }
    assert not mismatched, f"{name}: pandas dtype drift {mismatched}"


def compare_query(spark, name: str, fn, oracle: str, sf_dir: str) -> None:
    sdf = fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    o_cols, o_rows = run_oracle(oracle, sf_dir)

    assert sorted(s_cols) == sorted(o_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), (
        f"{name}: row count spark={len(s_rows)} oracle={len(o_rows)}"
    )
    cs, co = canon_rows(s_cols, s_rows), canon_rows(o_cols, o_rows)
    if cs != co:
        diffs = [(a, b) for a, b in zip(cs, co) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")
