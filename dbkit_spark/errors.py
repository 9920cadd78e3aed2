"""Error taxonomy mirroring the reference engine's error surface.

The reference (dbkit-engine) defines a closed error enum ``DBError``
(reference ``src/error.rs:9-33``): ``AttributeMissing``, ``AttributeType``,
``AttributeDuplicate``, ``AttributeNullability``, ``RowOutOfBounds``,
``UnknownType``, ``ExpressionNotConst``, ``MemoryLimit``, ``Unknown``.

We surface the same taxonomy as Python exceptions raised eagerly at API
boundaries (schema validation, projection binding, ingest), before handing
the plan to Catalyst — matching the reference's bind-time checking
(``schema.rs:43-53``, ``block.rs:235-251``).
"""

from __future__ import annotations


class DBKitError(Exception):
    """Base class for all engine errors (reference ``error.rs:9``)."""


class AttributeMissing(DBKitError):
    """Referenced column does not exist (reference ``error.rs:14``)."""

    def __init__(self, name: str, available: list[str] | None = None):
        self.name = name
        self.available = available or []
        hint = f"; available: {self.available}" if self.available else ""
        super().__init__(f"attribute missing: {name!r}{hint}")


class AttributeType(DBKitError):
    """Column exists but has the wrong type (reference ``error.rs:20``)."""

    def __init__(self, name: str, expected: str, actual: str):
        self.name = name
        super().__init__(
            f"attribute type mismatch for {name!r}: expected {expected}, got {actual}"
        )


class AttributeDuplicate(DBKitError):
    """Duplicate column name in a schema or projection output
    (reference ``error.rs:22``, checked at ``schema.rs:47-49`` and
    ``projector.rs:83-90``)."""

    def __init__(self, name: str):
        self.name = name
        super().__init__(f"duplicate attribute: {name!r}")


class AttributeNullability(DBKitError):
    """Null written to (or found in) a non-nullable column
    (reference ``error.rs:17``, check at ``block.rs:235-237``)."""

    def __init__(self, name: str):
        self.name = name
        super().__init__(f"null value in non-nullable attribute: {name!r}")


class RowOutOfBounds(DBKitError):
    """Row index outside the valid range (reference ``error.rs:24``,
    checks at ``block.rs:139-141``, ``table.rs:91-93``)."""

    def __init__(self, row: int, rows: int):
        super().__init__(f"row {row} out of bounds (rows={rows})")


class UnknownType(DBKitError):
    """Unparseable / unsupported type name (reference ``error.rs:28``,
    parser at ``types.rs:154-170``)."""

    def __init__(self, name: str):
        super().__init__(f"unknown type: {name!r}")


class ExpressionNotConst(DBKitError):
    """Constant evaluation requested of a non-constant expression
    (reference ``error.rs:26``, hooks at ``expression/mod.rs:30-38``)."""


class MemoryLimit(DBKitError):
    """Memory limit exceeded (reference ``error.rs:32``; in Spark this is
    surfaced by executor OOM — we raise it only from driver-side guards)."""
