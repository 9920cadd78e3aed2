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
    """Whatever remains QUEUED (q242–q253 after the round-8 staged
    landing of q201–q241) must ALREADY pass the driver's compare at the
    driver's scale — landing is then a pure registration move. load_all()
    runs first so the landed entries are moved out of the queue dict
    before the sweep."""
    from oracle_utils import check_dtype_parity, compare_query

    from dbkit_spark.catalog import load_all
    assert len(load_all()) == 241  # 200 + the 41 landed q201–q241
    from dbkit_spark.queries.roadmap7 import ROADMAP7

    # q242–q253 still queued for round 9, plus round-8 additions (q254+)
    assert len(ROADMAP7) >= 12
    assert all(qnum(n)[0] >= 242 for n in ROADMAP7)
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


def test_r08_window_covers_landed_plus_stale(spark):
    """VERDICT r7 item 6 guard: the 50-slot r08 rotation window must be
    exactly the 41 newly landed q201–q241 (never driver-checked) plus the
    nine remaining r01-evidence queries q42–q50 — the whole point of the
    staged landing. If a future registration or CORRECTNESS file breaks
    this arithmetic, fail HERE instead of silently stranding q42–q50
    for another round."""
    window = list(load_all())[:50]
    landed = {n for n in window if 201 <= qnum(n)[0] <= 241}
    stale = {n for n in window if 42 <= qnum(n)[0] <= 50}
    assert len(landed) == 41, sorted(landed)
    assert len(stale) == 9, sorted(stale)
