"""Catalog contract tests: coverage-rotation ordering and doc parity.

The driver's correctness sweep verifies a fixed-size window (50 entries
in rounds 1 and 2) of ``load_all()`` in iteration order. These tests pin
the two properties the round-3 rotation change relies on:

1. Every query the driver has never verified green sorts ahead of every
   query it has (so the window always spends its slots on unverified
   coverage first).
2. The ordering is a deterministic function of the committed
   CORRECTNESS_r*.json files (same commit => same order everywhere).

Doc parity: COVERAGE.md is auto-generated (tools/gen_coverage.py); its
query count and row set must match the live catalog so the round-2
snapshot drift (123 documented vs 126 registered) cannot recur.
"""

from __future__ import annotations

import re
from pathlib import Path

from dbkit_spark.catalog import _driver_green_rounds, load_all, qnum

REPO = Path(__file__).resolve().parent.parent


def test_rotation_never_green_first():
    order = list(load_all())
    green = _driver_green_rounds()
    ranks = {name: i for i, name in enumerate(order)}
    never = [n for n in order if green.get(n, 0) == 0]
    ever = [n for n in order if green.get(n, 0) > 0]
    if never and ever:
        assert max(ranks[n] for n in never) < min(ranks[n] for n in ever)
    # Within a verification class, q-number order (deterministic tiebreak).
    by_round: dict[int, list[str]] = {}
    for n in order:
        by_round.setdefault(green.get(n, 0), []).append(n)
    for names in by_round.values():
        assert names == sorted(names, key=qnum)


def test_rotation_is_deterministic():
    assert list(load_all()) == list(load_all())


def test_green_rounds_parse_committed_files():
    green = _driver_green_rounds()
    # Round 2 verified q01 and q50; round 1 failed q57 (never green since).
    if (REPO / "CORRECTNESS_r02.json").exists():
        assert green.get("q01_pricing_summary", 0) >= 2
        assert green.get("q50_cube", 0) >= 2
        assert green.get("q57_map_funcs", 0) == 0 or green["q57_map_funcs"] >= 3


def test_coverage_md_matches_catalog():
    catalog = load_all()
    text = (REPO / "COVERAGE.md").read_text()
    m = re.search(r"^(\d+) queries;", text, re.M)
    assert m, "COVERAGE.md missing query count header"
    assert int(m.group(1)) == len(catalog)
    documented = set(re.findall(r"^\| (q\d+\w+) \|", text, re.M))
    assert documented == set(catalog)


def test_readme_count_matches_catalog():
    catalog = load_all()
    text = (REPO / "README.md").read_text()
    m = re.search(r"`queries\(\)` \((\d+) declared queries\)", text)
    assert m, "README missing declared-query count"
    assert int(m.group(1)) == len(catalog)


def test_roadmap7_queue_preverified(spark):
    """Whatever remains QUEUED (round-11 additions q363+ after the
    round-11 landing of q341–q362) must ALREADY pass the driver's
    compare at the driver's scale — landing is then a pure registration
    move. load_all() runs first so the landed entries are moved out of
    the queue dict before the sweep."""
    from oracle_utils import check_dtype_parity, compare_query

    from dbkit_spark.catalog import load_all
    assert len(load_all()) == 374  # 362 + the 12 landed q363–q374
    from dbkit_spark.queries.roadmap7 import ROADMAP7

    # Round-12 additions (q375+); the queue is capped at one driver
    # window. An empty queue (between addition batches) is legal.
    assert len(ROADMAP7) <= 50
    assert all(qnum(n)[0] >= 375 for n in ROADMAP7)
    # BOTH driver scales: the round-7 q245 near-miss (6dp edge rounding
    # diverged at sf0.001 only) showed sf0.01-only pre-verification is
    # not enough.
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        for name, (fn, oracle, notes) in ROADMAP7.items():
            assert notes
            if oracle is None:
                assert fn(spark, sf).count() > 0, name
            else:
                compare_query(spark, name, fn, oracle, sf)
                check_dtype_parity(spark, name, fn, oracle, sf)


GUARD_ROUND = 12  # the driver round whose rotation window this guard pins

# The 38 least-recently-verified greens that top up the r12 window after
# the q363–q374 landing: the remaining r3 cohort (13 queries, last
# driver-green CORRECTNESS_r03 — includes q118, whose r11 EWMA oracle
# conversion earns its first driver hash-green here) plus the entire r4
# cohort (25 queries). Computed by load_all() rotation order at landing
# time and pinned literally so a registration or artifact change that
# shifts the window fails HERE, not in the driver sweep. The other
# oracle-converted stragglers (q38/q72/q79 last-green r7, q267 r9,
# q310 r10) do NOT fit — the r3+r4 cohorts fill all 38 slots — and
# rotate in at r13.
R12_REFRESH = {
    "q111_histogram", "q112_jaccard_prefix_filter", "q113_tpch_q21_waiting",
    "q114_hof_array_surface", "q116_robust_stats", "q117_tpch_q2_min_cost",
    "q118_ewma", "q119_three_valued_logic", "q120_date_dim_activity",
    "q121_union_by_name", "q122_percent_of_total", "q124_mode_deterministic",
    "q125_funnel", "q54_multiset_ops", "q55_pandas_udf_scalar",
    "q56_grouped_agg_udaf", "q58_join_full_outer", "q59_join_right_outer",
    "q60_like_predicates", "q61_sort_nulls_ordering", "q62_from_json_typed",
    "q63_stream_static_join", "q64_salted_join_skew", "q73_rollup_hierarchy",
    "q95_sessionize", "q97_trailing_window_1h", "q101_gapfill_locf",
    "q102_scd2_user_state", "q107_stream_incremental_upsert",
    "q115_stream_session_replay", "q123_first_seen_cumulative",
    "q126_retention_cohorts", "q127_ann_index_query",
    "q128_stream_stream_left_outer", "q129_asof_tolerance",
    "q130_image_formats", "q131_tpch_q6_forecast", "q132_tpch_q10_returned",
}


def _latest_artifact_round() -> int:
    rounds = [0]
    for path in REPO.glob("CORRECTNESS_r*.json"):
        m = re.search(r"r(\d+)", path.name)
        if m:
            rounds.append(int(m.group(1)))
    return max(rounds)


def test_r12_window_is_exactly_the_landed_batch(spark):
    """VERDICT r11 item 1 guard, artifact-aware: with driver artifacts
    through r11 present (a clean 48+2/50, so no failure re-enters), the
    50-slot r12 rotation window must be exactly the 12 newly landed
    never-driver-checked queries q363–q374 plus the 38
    least-recently-verified greens — the remaining r3 cohort + the whole
    r4 cohort, pinned literally in R12_REFRESH. If a future registration
    or CORRECTNESS file breaks this arithmetic, fail HERE.

    Artifact-aware (the round-8 lesson: a window guard goes red the
    moment the driver deposits the round's CORRECTNESS file): once an
    artifact at/after GUARD_ROUND exists, the window has legitimately
    rotated past this guard's arithmetic — the guard is spent, and the
    live invariant it protected is re-checked in its artifact-independent
    form (test_rotation_never_green_first)."""
    window = list(load_all())[:50]
    if _latest_artifact_round() >= GUARD_ROUND:
        # Spent guard: the r12 (or later) sweep already landed. The
        # durable invariant — rotation always spends slots on the
        # least-evidenced queries first — is pinned artifact-
        # independently by test_rotation_never_green_first; just ensure
        # the window is full-size and deterministic here.
        assert len(window) == 50
        return
    landed = {n for n in window if 363 <= qnum(n)[0] <= 374}
    assert len(landed) == 12, sorted(landed)
    expected = landed | R12_REFRESH
    assert set(window) == expected and len(window) == 50, sorted(
        set(window) ^ expected
    )


def test_no_nested_output_columns_anywhere(spark):
    """Driver-canon structural gate (VERDICT r9 items 1 & 5): no
    registered or queued query may emit an Array/Map/Struct column.

    The driver's canonicalizer pandas-sorts and hashes every output
    column; a nested value is unhashable and fails the whole query (the
    q289 r09 failure — the ONLY nested-output query in a full schema
    scan of all 341). The repo convention (catalog.py:5-9) is to
    serialize collections to strings (sorted concat or to_json) at the
    catalog boundary while operators keep real arrays for API users.
    This gate pins the class shut. Cost note: the check itself reads
    only schemas, but BUILDING fn(spark, sf) is not free for every
    entry — a handful of queries execute work at construction time
    (q353's streaming replay, q354's KMeans fits, q345/q348 fixture
    writes, eager-checkpoint component pipelines), so this is one of
    the suite's slower tests; that cost is the price of a
    catalog-wide guarantee and is paid at the smallest fixture."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from dbkit_spark.queries.roadmap7 import ROADMAP7

    sf = "/root/testdata/sf0.001"
    everything = {name: spec.fn for name, spec in load_all().items()}
    everything.update({name: fn for name, (fn, _o, _n) in ROADMAP7.items()})
    offenders = []
    for name, fn in sorted(everything.items()):
        for field in fn(spark, sf).schema.fields:
            if isinstance(field.dataType, (ArrayType, MapType, StructType)):
                offenders.append(f"{name}.{field.name}: {field.dataType.simpleString()}")
    assert not offenders, offenders
