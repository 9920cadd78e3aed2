"""Simulate the driver's per-round correctness sweep locally.

Runs a window of the coverage-rotation order (default: first 50, exactly
what the driver will check next round) through the same compare the test
suite uses — row count + schema + order-insensitive bit-exact values +
pandas-dtype parity — at the driver's scale factor (default sf0.01).

Usage: python tools/driver_sim.py [N] [sf_dir]
       python tools/driver_sim.py q164_tpch_q7_volume_shipping,q165_... [sf_dir]
"""

from __future__ import annotations

import sys
import time
import traceback
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

from dbkit_spark.catalog import load_all  # noqa: E402
from dbkit_spark.session import build_session  # noqa: E402
from oracle_utils import check_dtype_parity, compare_query  # noqa: E402


def main() -> None:
    arg = sys.argv[1] if len(sys.argv) > 1 else "50"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    catalog = load_all()
    if arg.isdigit():
        window = list(catalog)[: int(arg)]
    else:
        window = [q.strip() for q in arg.split(",") if q.strip()]
        unknown = [q for q in window if q not in catalog]
        if unknown:
            sys.exit(f"unknown queries: {unknown}")
    n = len(window)
    spark = build_session(app_name="driver-sim")
    failed: list[str] = []
    for i, name in enumerate(window):
        spec = catalog[name]
        t0 = time.time()
        try:
            if spec.oracle is None:
                rows = spec.fn(spark, sf_dir).count()
                print(f"[{i+1}/{n}] {name}: rows-only ok ({rows} rows, "
                      f"{time.time()-t0:.1f}s)", flush=True)
            else:
                compare_query(spark, name, spec.fn, spec.oracle, sf_dir)
                check_dtype_parity(spark, name, spec.fn, spec.oracle, sf_dir)
                print(f"[{i+1}/{n}] {name}: OK ({time.time()-t0:.1f}s)",
                      flush=True)
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"[{i+1}/{n}] {name}: FAIL {e}", flush=True)
            traceback.print_exc()
    print(f"\n{n - len(failed)}/{n} passed; failed: {failed}", flush=True)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
