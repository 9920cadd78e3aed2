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
    """Whatever remains QUEUED (round-14 additions q433+ after the
    round-14 landing of q401–q432) must ALREADY pass the driver's
    compare at the driver's scale — landing is then a pure registration
    move. load_all() runs first so the landed entries are moved out of
    the queue dict before the sweep."""
    from oracle_utils import check_dtype_parity, compare_query

    from dbkit_spark.catalog import load_all
    assert len(load_all()) == 432  # 400 + the 32 landed q401–q432
    from dbkit_spark.queries.roadmap7 import ROADMAP7

    # Round-14 additions (q433+); the queue is capped at one driver
    # window. An empty queue (between addition batches) is legal.
    assert len(ROADMAP7) <= 50
    assert all(qnum(n)[0] >= 433 for n in ROADMAP7)
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


GUARD_ROUND = 14  # the driver round whose rotation window this guard pins

# The 18 least-recently-verified greens that top up the r14 window after
# the q401–q432 landing: q157_iqr_outliers (the one r4-cohort query the
# 24-slot r13 refresh could not fit, last driver-green CORRECTNESS_r04)
# plus 17 of the 35-query r5 cohort (q65–q71, q158–q167, last
# driver-green CORRECTNESS_r05; q168–q185 spill to r15). Computed by
# load_all() rotation order at landing time and pinned literally so a
# registration or artifact change that shifts the window fails HERE,
# not in the driver sweep. The oracle-converted stragglers (q38/q72/q79
# last-green r7, q204/q212 r8, q267 r9, q310 r10) still do NOT fit —
# the r5 cohort is older and fills the remaining 17 slots — they reach
# the window at ~r15–r16 behind q168–q185.
R14_REFRESH = {
    "q157_iqr_outliers", "q65_ann_ivf", "q66_stream_stream_join",
    "q67_rolling_fingerprint", "q68_bpe_token_count",
    "q69_set_split_fused", "q70_argminmax", "q71_python_udtf",
    "q158_reachability_fixpoint", "q159_ann_multi_table_lsh",
    "q160_uint64_fidelity", "q161_ann_multi_index_query",
    "q162_embedding_dedup_survivors", "q163_bloom_filter_join",
    "q164_tpch_q7_volume_shipping", "q165_tpch_q8_market_share",
    "q166_tpch_q9_product_profit", "q167_tpch_q11_important_stock",
}


def _latest_artifact_round() -> int:
    rounds = [0]
    for path in REPO.glob("CORRECTNESS_r*.json"):
        m = re.search(r"r(\d+)", path.name)
        if m:
            rounds.append(int(m.group(1)))
    return max(rounds)


def test_r14_window_is_exactly_the_landed_batch(spark):
    """Round-13 pre-computation guard, artifact-aware: with driver
    artifacts through r13 present (a clean 50/50, fourth consecutive
    zero-failure sweep, so no failure re-enters), the 50-slot r14
    rotation window must be exactly the 32 newly landed
    never-driver-checked queries q401–q432 plus the 18
    least-recently-verified greens — q157 + the oldest 17 of the r5
    cohort, pinned literally in R14_REFRESH. If a future registration
    or CORRECTNESS file breaks this arithmetic, fail HERE.

    Artifact-aware (the round-8 lesson: a window guard goes red the
    moment the driver deposits the round's CORRECTNESS file): once an
    artifact at/after GUARD_ROUND exists, the window has legitimately
    rotated past this guard's arithmetic — the guard is spent, and the
    live invariant it protected is re-checked in its artifact-independent
    form (test_rotation_never_green_first)."""
    window = list(load_all())[:50]
    if _latest_artifact_round() >= GUARD_ROUND:
        # Spent guard: the r14 (or later) sweep already landed. The
        # durable invariant — rotation always spends slots on the
        # least-evidenced queries first — is pinned artifact-
        # independently by test_rotation_never_green_first; just ensure
        # the window is full-size and deterministic here.
        assert len(window) == 50
        return
    landed = {n for n in window if 401 <= qnum(n)[0] <= 432}
    assert len(landed) == 32, sorted(landed)
    expected = landed | R14_REFRESH
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
