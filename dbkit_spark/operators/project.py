"""Projection (SURVEY.md §2.2) — parity with the reference's Tier-A
``Project`` operator and projection spec.

Reference surface re-expressed:
- ``project_by_position(usize)`` (``projector.rs:53-55``)
- ``project_by_name(name)`` (``projector.rs:58-60``)
- ``project_all_attributes()`` (``projector.rs:48-50``)
- builder ``add / add_as / add_prefixed / done`` (``projector.rs:94-126``)
- bind-time duplicate-output rejection (``projector.rs:83-90``)

Catalyst performs the zero-copy column aliasing the reference does by hand
(``block.rs:130-158``); a ``select`` never materializes anything.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..errors import AttributeDuplicate, AttributeMissing, RowOutOfBounds


class Projector:
    """Declarative projection spec; ``apply(df)`` binds it against the
    input schema (the reference binds at ``projector.rs:72-92``)."""

    def __init__(self) -> None:
        # each item: ("pos", i, alias) | ("name", n, alias) | ("all", None, prefix)
        self._items: list[tuple[str, object, str | None]] = []

    def add_position(self, pos: int, alias: str | None = None) -> "Projector":
        self._items.append(("pos", pos, alias))
        return self

    def add_name(self, name: str, alias: str | None = None) -> "Projector":
        self._items.append(("name", name, alias))
        return self

    def add_all(self, prefix: str | None = None) -> "Projector":
        self._items.append(("all", None, prefix))
        return self

    def apply(self, df: DataFrame) -> DataFrame:
        cols: list[Column] = []
        out_names: list[str] = []
        in_cols = df.columns
        for kind, ref, alias in self._items:
            if kind == "pos":
                assert isinstance(ref, int)
                if ref < 0 or ref >= len(in_cols):
                    raise RowOutOfBounds(ref, len(in_cols))
                name = in_cols[ref]
                out = alias or name
                cols.append(F.col(name).alias(out))
                out_names.append(out)
            elif kind == "name":
                assert isinstance(ref, str)
                if ref not in in_cols:
                    raise AttributeMissing(ref, in_cols)
                out = alias or ref
                cols.append(F.col(ref).alias(out))
                out_names.append(out)
            else:  # all, optionally prefixed (projector.rs:119-123)
                prefix = alias or ""
                for name in in_cols:
                    out = prefix + name
                    cols.append(F.col(name).alias(out))
                    out_names.append(out)
        seen: set[str] = set()
        for n in out_names:
            if n in seen:
                raise AttributeDuplicate(n)
            seen.add(n)
        return df.select(*cols)


def project(df: DataFrame, *names: str) -> DataFrame:
    """Project by name with eager missing-column check."""
    p = Projector()
    for n in names:
        p.add_name(n)
    return p.apply(df)


def project_positions(df: DataFrame, *positions: int) -> DataFrame:
    p = Projector()
    for i in positions:
        p.add_position(i)
    return p.apply(df)


def rename(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Rename columns (reference ``add_as``, ``projector.rs:103-109``)."""
    for old in mapping:
        if old not in df.columns:
            raise AttributeMissing(old, df.columns)
    targets = [mapping.get(c, c) for c in df.columns]
    seen: set[str] = set()
    for n in targets:
        if n in seen:
            raise AttributeDuplicate(n)
        seen.add(n)
    return df.withColumnsRenamed(mapping)


def prefix_all(df: DataFrame, prefix: str) -> DataFrame:
    """Prefix every column (reference ``add_prefixed``,
    ``projector.rs:113-123``) — the multi-source disambiguation tool."""
    return Projector().add_all(prefix).apply(df)
