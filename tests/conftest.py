from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from dbkit_spark.session import build_session  # noqa: E402

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="dbkit-spark-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF0001


# --- quick/full test tiers (VERDICT r14 item 5; r15 item 2) ------------------
#
# The full suite crossed 50 min at r14 and timed out the driver's plain
# `pytest tests/` run at r15 (38% done, zero failures, 1.3-3.6x host
# contention). The whole-catalog differential sweeps are the ROUND-CLOSE
# gate, not an every-run gate: they carry the `full` marker and
# pytest.ini's `addopts = -m "not full"` keeps them out of the default
# collection — run them explicitly with `pytest tests/ -m full`.
#
# The default collection is everything else: the operator law/hand-case
# tier, the per-operator plan gates (test_plans minus its two
# catalog-wide sweeps), and the bounded oracle sample
# (test_oracle_sample.py — same compare/parity code as the full sweep,
# deterministic 60-ish query slice including all 13 bench queries).
_FULL_TIER_MODULES = {
    "test_oracle",  # 443 oracle compares + 443 dtype parities + 17 rows-only
    "test_catalog",  # queue pre-verification sweep + rotation guards
}
# catalog-wide structural sweeps inside otherwise-default modules: these
# plan every registered/queued query (driver-side planning of 475
# pipelines — minutes of pure planning), which is round-close work
_FULL_TIER_TESTS = {
    "test_catalog_wide_no_accidental_nlj",
    "test_queue_wide_no_accidental_nlj",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        base_name = item.name.split("[", 1)[0]
        if mod in _FULL_TIER_MODULES or base_name in _FULL_TIER_TESTS:
            item.add_marker(pytest.mark.full)
        else:
            item.add_marker(pytest.mark.quick)
