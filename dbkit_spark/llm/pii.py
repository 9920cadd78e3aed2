"""PII detection / redaction over text columns — the scrub step every
public-corpus pipeline runs before training (emails, phone numbers,
IP addresses are the canonical regex-detectable classes; C4 and most
open pipelines ship exactly such regex scrubbers).

Reference scope note: the reference engine (scan/project roadmap,
``operation/mod.rs``) has no text-cleaning surface; this is north-star
LLM-pipeline functionality like the rest of ``dbkit_spark.llm``.

Engine-portability: patterns are written in the common subset of Java
regex (Spark) and RE2 (DuckDB) — no backreferences, no lookaround, no
\\b word boundaries (RE2 supports \\b but its interaction with
multibyte text differs; explicit character classes are used instead).
Counting uses ``regexp_count`` / ``len(regexp_extract_all)``, redaction
uses sequential ``regexp_replace`` with fixed tags — both sides replay
digit-for-digit, which the catalog oracle (q406) pins at three fixture
scales.

Scale shape: pure MAP-ONLY string expressions inside whole-stage
codegen — no shuffle, no UDF, no Python; lifts unchanged onto a
readStream (the q398 pattern, exercised by the streaming twin q414).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Order matters for redaction: emails are replaced before phones so the
# digits inside an already-redacted tag cannot re-match.
PII_PATTERNS: dict[str, str] = {
    # local@domain.tld — conservative: requires a dot in the domain
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(\.[A-Za-z0-9-]+)+",
    # dotted-quad with 1-3 digit octets, not embedded in longer digit runs
    "ipv4": r"([0-9]{1,3}\.){3}[0-9]{1,3}",
    # international (+CC then 7-14 digits, optional separators) or
    # NANP-style 3-3-4 with - . or space separators
    "phone": (
        r"(\+[0-9]{1,3}[-. ]?[0-9]{2,4}[-. ]?[0-9]{3,4}[-. ]?[0-9]{2,4}"
        r"|[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4})"
    ),
}

_REDACT_ORDER = ("email", "ipv4", "phone")


def pii_scrub(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document PII counts + redacted text: each match class is
    counted on the ORIGINAL text, then redaction applies the classes in
    a fixed order (email → ipv4 → phone) replacing every match with a
    ``<CLASS>`` tag. ``redacted_chars`` = original length − redacted
    length (negative when tags are longer than the matched spans — the
    count columns, not the char delta, are the detection signal).

    Output: (id, n_email, n_phone, n_ipv4, pii_total, redacted_text,
    redacted_chars).
    """
    t = F.col(text_col)
    counts = {
        name: F.regexp_count(t, F.lit(pat)).cast("long")
        for name, pat in PII_PATTERNS.items()
    }
    red = t
    for name in _REDACT_ORDER:
        red = F.regexp_replace(
            red, PII_PATTERNS[name], f"<{name.upper()}>"
        )
    total = counts["email"] + counts["phone"] + counts["ipv4"]
    return docs.select(
        id_col,
        counts["email"].alias("n_email"),
        counts["phone"].alias("n_phone"),
        counts["ipv4"].alias("n_ipv4"),
        total.alias("pii_total"),
        red.alias("redacted_text"),
        (F.length(t) - F.length(red)).cast("long").alias("redacted_chars"),
    )


def pii_summary(
    docs: DataFrame,
    group_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group PII prevalence rollup of :func:`pii_scrub` — the
    corpus-health number a curation review reads (docs-with-PII rate
    and match counts per class, per source/domain). ONE map-combined
    aggregate over the map-only scrub columns."""
    scrubbed = docs.select(F.col(group_col).alias("grp"), text_col, id_col)
    s = pii_scrub(scrubbed, text_col, "grp")
    return (
        s.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("pii_total") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_docs_with_pii"),
            F.sum("n_email").cast("long").alias("n_email"),
            F.sum("n_phone").cast("long").alias("n_phone"),
            F.sum("n_ipv4").cast("long").alias("n_ipv4"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_docs",
            "n_docs_with_pii",
            F.round(
                F.col("n_docs_with_pii") / F.col("n_docs").cast("double"), 6
            ).alias("pii_doc_rate"),
            "n_email",
            "n_phone",
            "n_ipv4",
        )
    )
