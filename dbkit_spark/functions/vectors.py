"""Vector math over ``array<float>`` embedding columns (SURVEY.md §2.11).

Built-in higher-order functions only (``aggregate``/``zip_with`` run in the
JVM): at 100 TB these stay inside codegen with zero Python crossings. All
folds are left-to-right over the array — deterministic order, so results
are reproducible; cross-engine comparisons still round (last-bit FP
differences between engines' fold implementations).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            ca,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL-safe on zero vectors (returns NULL)."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na == 0) | (nb == 0), F.lit(None).cast("double")).otherwise(
        d / (na * nb)
    )


def l2_normalize(a: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    n = norm(ca)
    return F.when(n == 0, ca).otherwise(
        F.transform(ca, lambda x: (x.cast("double") / n).cast("float"))
    )


def l2_sq(a: Column | str, b: Column | str) -> Column:
    """Squared Euclidean distance — the metric PQ's ADC tables
    approximate (Jégou-Douze-Schmid use L2; keep the exact baseline on
    the same metric when measuring PQ recall)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(
            ca,
            cb,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
