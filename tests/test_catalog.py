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
    """Whatever remains QUEUED (round-15 additions q461+ after the
    round-15 landing of q433–q460) must ALREADY pass the driver's
    compare at the driver's scale — landing is then a pure registration
    move. load_all() runs first so the landed entries are moved out of
    the queue dict before the sweep."""
    from oracle_utils import check_dtype_parity, compare_query

    from dbkit_spark.catalog import load_all
    assert len(load_all()) == 460  # 432 + the 28 landed q433–q460
    from dbkit_spark.queries.roadmap7 import ROADMAP7

    # Round-15 additions (q461+); the queue is capped at one driver
    # window. An empty queue (between addition batches) is legal.
    assert len(ROADMAP7) <= 50
    assert all(qnum(n)[0] >= 461 for n in ROADMAP7)
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


GUARD_ROUND = 15  # the driver round whose rotation window this guard pins

# The 22 least-recently-verified greens that top up the r15 window after
# the q433–q460 landing: q168–q189, the r5 cohort minus its last eleven
# (all last driver-green CORRECTNESS_r05; q190–q200 spill to r16).
# Computed by load_all() rotation order at landing time and pinned
# literally so a registration or artifact change that shifts the window
# fails HERE, not in the driver sweep. The oracle-converted stragglers
# (q38/q72/q79 last-green r7, q204/q212 r8, q267 r9, q310 r10) still do
# NOT fit — the r5 cohort is older and fills all 22 slots — they reach
# the window at r16 behind q190–q200 (the ordering re-stated in
# queries/roadmap7_landed.py per VERDICT r14 item 3).
R15_REFRESH = {
    "q168_tpch_q15_top_supplier", "q169_tpch_q16_supplier_cnt",
    "q170_grouped_regression", "q171_winsorized_stats",
    "q172_document_chunking", "q173_tfidf_topk_terms",
    "q174_domain_quota_sample", "q175_table_reconciliation",
    "q176_hll_sketch_rollup", "q177_pagerank",
    "q178_sql_recursive_cte", "q179_variant_extraction",
    "q180_bitwise_surface", "q181_dynamic_session_gap",
    "q182_url_parsing", "q183_time_weighted_avg",
    "q184_quantile_binning", "q185_binary_encodings",
    "q186_containment_pairs", "q187_stream_join_then_window",
    "q188_array_set_ops", "q189_last_touch_attribution",
}


def _latest_artifact_round() -> int:
    rounds = [0]
    for path in REPO.glob("CORRECTNESS_r*.json"):
        m = re.search(r"r(\d+)", path.name)
        if m:
            rounds.append(int(m.group(1)))
    return max(rounds)


def test_r15_window_is_exactly_the_landed_batch(spark):
    """Round-14 pre-computation guard, artifact-aware: with driver
    artifacts through r14 present (49 hash-green + q65 rows-only-by-
    design, fifth consecutive zero-failure sweep, so no failure
    re-enters), the 50-slot r15 rotation window must be exactly the 28
    newly landed never-driver-checked queries q433–q460 plus the 22
    least-recently-verified greens — q168–q189, pinned literally in
    R15_REFRESH. If a future registration or CORRECTNESS file breaks
    this arithmetic, fail HERE.

    Artifact-aware (the round-8 lesson: a window guard goes red the
    moment the driver deposits the round's CORRECTNESS file): once an
    artifact at/after GUARD_ROUND exists, the window has legitimately
    rotated past this guard's arithmetic — the guard is spent, and the
    live invariant it protected is re-checked in its artifact-independent
    form (test_rotation_never_green_first)."""
    window = list(load_all())[:50]
    if _latest_artifact_round() >= GUARD_ROUND:
        # Spent guard: the r15 (or later) sweep already landed. The
        # durable invariant — rotation always spends slots on the
        # least-evidenced queries first — is pinned artifact-
        # independently by test_rotation_never_green_first; just ensure
        # the window is full-size and deterministic here.
        assert len(window) == 50
        return
    landed = {n for n in window if 433 <= qnum(n)[0] <= 460}
    assert len(landed) == 28, sorted(landed)
    expected = landed | R15_REFRESH
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
