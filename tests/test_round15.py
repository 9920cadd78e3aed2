"""Round-15 regression tests: the four ADVICE r14 NULL/separator edge
fixes (friedman NULL-row rank shift, kendall_tau_b NULL scores,
wilcoxon all-tied zero reporting, literal split separators), plus
law/hand-case tests for the round-15 queue operators."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# --- ADVICE r14 fix: friedman NULL-value rows must not shift ranks -----------


def test_friedman_null_row_does_not_shift_ranks(spark):
    from dbkit_spark.operators.mlmetrics import friedman_test

    # item 0 has k=3 complete non-NULL values PLUS a stray NULL row for
    # system a (passes the non-NULL completeness filter); before the
    # fix the NULL sorted FIRST in the rank window and shifted every
    # rank in that item. Result must be identical to the frame without
    # the NULL row.
    clean = [(i, s, v + i) for i in range(6)
             for s, v in (("a", 1.0), ("b", 2.0), ("c", 3.0))]
    with_null = clean + [(0, "a", None)]
    df_clean = spark.createDataFrame(
        clean, "item long, sys string, v double")
    df_null = spark.createDataFrame(
        with_null, "item long, sys string, v double")
    out_c = {r["treatment"]: r
             for r in friedman_test(df_clean, "item", "sys", "v").collect()}
    out_n = {r["treatment"]: r
             for r in friedman_test(df_null, "item", "sys", "v").collect()}
    for t in ("a", "b", "c"):
        assert out_n[t]["rank_sum"] == out_c[t]["rank_sum"]
        assert out_n[t]["n_items"] == out_c[t]["n_items"]
        assert out_n[t]["chi2_f"] == out_c[t]["chi2_f"]


# --- ADVICE r14 fix: kendall_tau_b drops NULL-scored items listwise ----------


def test_kendall_null_scores_dropped_listwise(spark):
    from dbkit_spark.operators.preference import kendall_tau_b

    base = [("a", 1.0, 10.0), ("b", 2.0, 20.0), ("c", 3.0, 30.0),
            ("d", 4.0, 40.0)]
    items = spark.createDataFrame(
        base + [("e", 5.0, None), ("f", None, 60.0)],
        "item string, x double, y double",
    )
    r = kendall_tau_b(items, "x", "y").collect()[0]
    # the two NULL-scored items vanish before pairing: n_items=4,
    # n_pairs=C(4,2)=6, perfect concordance tau=1 (before the fix,
    # n_pairs counted the NULL pairs and tau_b was biased below 1)
    assert r["n_items"] == 4 and r["n_pairs"] == 6
    assert r["concordant"] == 6 and r["tau_b"] == 1.0


# --- ADVICE r14 fix: wilcoxon all-tied reports 0 pairs, not NULL -------------


def test_wilcoxon_all_tied_reports_zero_pairs(spark):
    from dbkit_spark.operators.mlmetrics import wilcoxon_signed_rank

    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 2.0), (3.0, 3.0)], "x double, y double")
    r = wilcoxon_signed_rank(df, "x", "y").collect()[0]
    assert r["n_pairs"] == 0 and r["n_zero"] == 3
    assert r["w_plus"] == 0.0 and r["w_minus"] == 0.0
    assert r["z"] is None and r["p_two_sided"] is None


# --- ADVICE r14 fix: split separators are literal strings --------------------


def test_c4_line_filters_literal_separator(spark):
    from dbkit_spark.llm.quality import c4_line_filters

    # '||' is a regex that matches the empty string — before the
    # re.escape fix it exploded the text into single characters.
    docs = spark.createDataFrame(
        [("d1", "This is a perfectly fine sentence one.||"
                "This is a perfectly fine sentence two.||"
                "This is a perfectly fine sentence three.")],
        "doc_id string, text string",
    )
    r = c4_line_filters(docs, line_sep="||").collect()[0]
    assert r["n_lines"] == 3 and r["n_kept"] == 3


def test_dup_segment_fractions_literal_separator(spark):
    from dbkit_spark.llm.quality import dup_segment_fractions

    # '.' as separator must split on the DOT, not on every character
    docs = spark.createDataFrame(
        [("d1", "alpha.beta.alpha.gamma")], "doc_id string, text string")
    r = dup_segment_fractions(
        docs, line_sep=".", para_sep=".").collect()[0]
    assert r["n_lines"] == 4
    # 'alpha' appears twice -> 2 of 4 segments duplicated
    assert r["dup_line_frac"] == 0.5
