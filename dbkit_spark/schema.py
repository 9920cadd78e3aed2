"""Explicit-schema discipline (SURVEY.md §1.5).

The reference engine's schemas are fixed, explicit, and checked at
construction: duplicate names are errors (``schema.rs:47-49``), type
mismatches on access are errors (``block.rs:94-96``), and nullability is
per-attribute (``schema.rs:14-18``). This module provides:

- the explicit ``StructType`` for every fixture table (never ``inferSchema``),
- eager validation helpers raising the reference error taxonomy,
- a string → Spark type parser mirroring ``types.rs:154-170`` including the
  reference's nine primitive types (``types.rs:19-29``) with the documented
  unsigned-integer widening policy (SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .errors import AttributeDuplicate, AttributeMissing, AttributeType, UnknownType

# --- reference type-name parser (types.rs:154-170) -------------------------
# UINT32 widens to LongType, UINT64 to DecimalType(20,0) per SURVEY.md §1.2.
_TYPE_NAMES: dict[str, T.DataType] = {
    "UINT32": T.LongType(),
    "UINT64": T.DecimalType(20, 0),
    "INT32": T.IntegerType(),
    "INT64": T.LongType(),
    "FLOAT32": T.FloatType(),
    "FLOAT64": T.DoubleType(),
    "BOOLEAN": T.BooleanType(),
    "TEXT": T.StringType(),
    "BLOB": T.BinaryType(),
}


def parse_type(name: str) -> T.DataType:
    """Parse a reference type name (``types.rs:154-170``) or a Spark DDL
    type string into a Spark DataType. Raises UnknownType."""
    key = name.strip().upper()
    if key in _TYPE_NAMES:
        return _TYPE_NAMES[key]
    try:
        return T._parse_datatype_string(name)
    except Exception:
        raise UnknownType(name) from None


def attribute(name: str, dtype: str | T.DataType, nullable: bool = True) -> T.StructField:
    """Build a StructField the way the reference builds an Attribute
    (``schema.rs:14-18``: name, nullable, dtype)."""
    if isinstance(dtype, str):
        dtype = parse_type(dtype)
    return T.StructField(name, dtype, nullable)


def make_schema(fields: list[T.StructField]) -> T.StructType:
    """Construct a schema with the reference's duplicate-name rejection
    (``schema.rs:43-53``)."""
    seen: set[str] = set()
    for f in fields:
        if f.name in seen:
            raise AttributeDuplicate(f.name)
        seen.add(f.name)
    return T.StructType(fields)


def require_columns(df: DataFrame, *names: str) -> None:
    """Eagerly check column existence (reference ``schema.rs:96-104`` →
    ``AttributeMissing``)."""
    cols = set(df.columns)
    for n in names:
        if n not in cols:
            raise AttributeMissing(n, sorted(cols))


def require_type(df: DataFrame, name: str, expected: T.DataType) -> None:
    """Eagerly check a column's type (reference ``block.rs:94-96`` →
    ``AttributeType``)."""
    require_columns(df, name)
    actual = df.schema[name].dataType
    if actual != expected:
        raise AttributeType(name, expected.simpleString(), actual.simpleString())


def validate_against(df: DataFrame, expected: T.StructType) -> None:
    """Validate a DataFrame against an expected schema: every expected
    column present with the expected type (order-insensitive)."""
    for field in expected.fields:
        require_type(df, field.name, field.dataType)


# --- fixture-table schemas (TESTDATA.md tables, verified against parquet) --

REGION = make_schema([
    attribute("r_regionkey", T.IntegerType()),
    attribute("r_name", T.StringType()),
])

NATION = make_schema([
    attribute("n_nationkey", T.IntegerType()),
    attribute("n_name", T.StringType()),
    attribute("n_regionkey", T.IntegerType()),
])

CUSTOMER = make_schema([
    attribute("c_custkey", T.LongType()),
    attribute("c_name", T.StringType()),
    attribute("c_nationkey", T.IntegerType()),
    attribute("c_acctbal", T.DoubleType()),
    attribute("c_mktsegment", T.StringType()),
])

SUPPLIER = make_schema([
    attribute("s_suppkey", T.LongType()),
    attribute("s_name", T.StringType()),
    attribute("s_nationkey", T.IntegerType()),
    attribute("s_acctbal", T.DoubleType()),
])

PART = make_schema([
    attribute("p_partkey", T.LongType()),
    attribute("p_name", T.StringType()),
    attribute("p_brand", T.StringType()),
    attribute("p_type", T.StringType()),
    attribute("p_size", T.IntegerType()),
    attribute("p_retailprice", T.DoubleType()),
])

ORDERS = make_schema([
    attribute("o_orderkey", T.LongType()),
    attribute("o_custkey", T.LongType()),
    attribute("o_orderstatus", T.StringType()),
    attribute("o_totalprice", T.DoubleType()),
    attribute("o_orderdate", T.TimestampType()),
    attribute("o_orderpriority", T.StringType()),
])

LINEITEM = make_schema([
    attribute("l_orderkey", T.LongType()),
    attribute("l_partkey", T.LongType()),
    attribute("l_suppkey", T.LongType()),
    attribute("l_linenumber", T.IntegerType()),
    attribute("l_quantity", T.DoubleType()),
    attribute("l_extendedprice", T.DoubleType()),
    attribute("l_discount", T.DoubleType()),
    attribute("l_tax", T.DoubleType()),
    attribute("l_returnflag", T.StringType()),
    attribute("l_linestatus", T.StringType()),
    attribute("l_shipdate", T.TimestampType()),
])

EVENTS = make_schema([
    attribute("event_id", T.LongType()),
    attribute("ts", T.TimestampType()),
    attribute("user_id", T.LongType()),
    attribute("event_type", T.StringType()),
    attribute("value", T.DoubleType()),
    attribute("props", T.StringType()),
])

DOCUMENTS = make_schema([
    attribute("doc_id", T.LongType()),
    attribute("text", T.StringType()),
    attribute("lang", T.StringType()),
    attribute("source", T.StringType()),
    attribute("n_chars", T.LongType()),
])

EMBEDDINGS = make_schema([
    attribute("vec_id", T.LongType()),
    attribute("embedding", T.ArrayType(T.FloatType())),
    attribute("label", T.IntegerType()),
])

TABLE_SCHEMAS: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}
