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


# --- quick/full test tiers (VERDICT r14 item 5) ------------------------------
#
# The full suite crossed 50 min at r14; mid-round iteration needs a
# fast law/hand-case tier. Tiering is by MODULE: the modules below are
# the whole-catalog differential sweeps (every registered query vs its
# DuckDB oracle, every registered query's physical plan) — they are the
# round-close gate, not an iteration loop. Everything else (operator
# law/hand-case tests, edge cases, streaming semantics, scale-path plan
# shapes) is the quick tier. Run `pytest -m quick` while iterating;
# the frozen-tree round-close run stays the full unmarked invocation.
_FULL_TIER_MODULES = {
    "test_oracle",  # 443 oracle compares + 443 dtype parities + 17 rows-only
    "test_catalog",  # queue pre-verification sweep + rotation guards
    "test_plans",  # catalog-wide + queue-wide structural plan gates
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in _FULL_TIER_MODULES:
            item.add_marker(pytest.mark.full)
        else:
            item.add_marker(pytest.mark.quick)
