#!/usr/bin/env python
"""Bench harness (BASELINE.md): runs the headline query set at
$SPARK_GRAFT_SF_DIR (default sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line.

Each query is materialized with the noop sink (full execution, no sink
cost, no count()-induced column pruning shortcut). Per-query time is the
median of RUNS executions after a session warmup; the per-query MIN is
also emitted (``queries_min`` / ``value_min``) — the min is the
least-noise estimator of the code's actual cost on a contended VM.

Self-defence against machine noise (BASELINE.md round-11 protocol, after
the BENCH_r10 incident where the recording VM ran every byte-identical
plan ~2.9x slower than 17 known runs of the same commit): the JSON also
carries a ``calibration`` block — a fixed, Spark-free, purely CPU-bound
probe (LCG-scramble + sort of a constant 2M-element uint64 array, 32
reps, ~1.0 s nominal on the BASELINE.md reference machine, deterministic
checksum 2785854242) timed immediately BEFORE and AFTER the query loop.
A healthy machine reports pre/post near 1.0; a loaded or down-clocked VM
inflates the probe by the same factor it inflates the queries, so the
reader can divide the slowdown out: ``value / mean(pre, post)`` is the
machine-normalized total. The probe has no knobs and no data dependence;
its checksum is asserted so a wrong result can never masquerade as a
timing.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
warnings.filterwarnings("ignore")

from dbkit_spark.catalog import load_all  # noqa: E402
from dbkit_spark.session import build_session  # noqa: E402

# One per BASELINE.md anchor (B1-B7) + the non-native join rewrites.
HEADLINE = [
    "q01_pricing_summary",      # B1 scan+filter+agg+sort
    "q07_join_3way_revenue",    # B2 3-way join + agg
    "q22_topk_per_customer",    # B3 window top-k
    "q05_set_ops",              # B4 set ops
    "q34_tumbling_window",      # B5 event-time windows
    "q40_dedup_minhash",        # B6 near-dup dedup
    "q43_cosine_topk",          # B7 similarity search
    "q12_asof_click_view",      # as-of join rewrite
    "q13_range_join_tiers",     # interval join rewrite
    "q112_jaccard_prefix_filter",  # heavy set-similarity pipeline (round-4 addition)
    "q87_dedup_clusters",       # iterative connected-components pipeline (round-5 addition)
    "q209_duplicated_spans",    # suffix-array-style span dedup (round-8 addition, landed with q201-q241)
    "q280_running_revenue",     # distributed Blelloch prefix scan (round-9 addition: the primitive the cumulative/Wasserstein family rides)
]

RUNS = 5  # raised from 3 in round 11 (VERDICT r10 item 2)

# pinned per rep count; see module docstring. The 4-rep variant is the
# per-query mini-probe (OPTIMIZATION_r16 / VERDICT r15 item 8): ~0.125 s
# nominal, timed immediately before each query's rep block so a noise
# burst that arrives mid-run is attributable to the specific queries it
# hit instead of smearing over the whole run.
_CALIBRATION_CHECKSUMS = {32: 2785854242, 4: 1257033333}


def calibration_probe(reps: int = 32) -> float:
    """Fixed CPU-bound workload, ~1.0 s nominal at 32 reps (BASELINE.md
    round-11; ``reps=4`` is the ~0.125 s per-query variant).

    Deterministic: LCG-scrambles a constant 2M-element uint64 array and
    sorts it ``reps`` times, folding a strided sum into a checksum that
    is asserted against the pinned constant. numpy-only,
    single-threaded, no allocation-size or data dependence on anything
    in the repo — the measured time varies ONLY with the machine (CPU
    clock, contention, thermal state), which is exactly what it is for.
    """
    import numpy as np

    x = np.arange(2_000_000, dtype=np.uint64)
    x = x * np.uint64(6364136223846793005) + np.uint64(1442695040888963407)
    acc = 0
    t0 = time.perf_counter()
    for _ in range(reps):
        y = np.sort(x)
        acc ^= int(y[::97].sum()) & 0xFFFFFFFF
        x = x * np.uint64(2862933555777941757) + np.uint64(3037000493)
    elapsed = time.perf_counter() - t0
    assert acc == _CALIBRATION_CHECKSUMS[reps], f"calibration checksum {acc}"
    return round(elapsed, 3)


def _loadavg1() -> float | None:
    """1-minute /proc/loadavg reading (None off-Linux) — free context for
    the per-query probe: a high load with no local processes is exactly
    the noisy-neighbor signature the r15 window suffered."""
    try:
        with open("/proc/loadavg") as fh:
            return float(fh.read().split()[0])
    except (OSError, ValueError, IndexError):
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    spark = build_session(app_name="dbkit-bench")
    catalog = load_all()

    # warmup: touch every table once so JVM/codegen/file listing are hot
    from dbkit_spark.sources import read_table

    for t in ["lineitem", "orders", "customer", "nation", "events", "documents", "embeddings"]:
        read_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()

    calibration_probe()  # warm numpy/sort code paths before the timed probe
    cal_pre = calibration_probe()

    per_query: dict[str, float] = {}
    per_query_min: dict[str, float] = {}
    per_query_reps: dict[str, list[float]] = {}
    per_query_cal: dict[str, float] = {}
    per_query_load: dict[str, float | None] = {}
    for name in HEADLINE:
        fn = catalog[name].fn
        # one untimed warmup: the first execution of a fresh plan pays
        # whole-stage-codegen JIT (measured 3-7x the steady-state run for
        # the multi-stage pipelines — BASELINE.md q40 investigation);
        # the metric of interest is steady-state throughput, matching how
        # the DuckDB comparison numbers were taken (medians, warm)
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        # per-query noise context (VERDICT r15 item 8, additions-only):
        # a ~0.125 s CPU probe + loadavg snapshot taken right before the
        # rep block attribute a mid-run contention burst to the queries
        # it actually hit (r15's window read pre 1.27 / post 3.64 with
        # nothing in between)
        per_query_load[name] = _loadavg1()
        per_query_cal[name] = calibration_probe(reps=4)
        times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            # queries with persist barriers (q40's band_keys, q87's
            # edges, q73) create a fresh lineage per call; drop each
            # rep's cache so accumulated blocks can't perturb later
            # reps or later queries
            spark.catalog.clearCache()
        per_query[name] = round(statistics.median(times), 3)
        per_query_min[name] = round(min(times), 3)
        per_query_reps[name] = [round(t, 3) for t in times]

    cal_post = calibration_probe()

    total = round(sum(per_query.values()), 3)
    total_min = round(sum(per_query_min.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "runs": RUNS,
                "value_min": total_min,
                "queries_min": per_query_min,
                "calibration": {
                    "pre": cal_pre,
                    "post": cal_post,
                    "nominal": 1.0,
                    "workload": "sort2M-uint64-x32",
                },
                # additions-only per-query noise context (VERDICT r15
                # item 8): mini-probe seconds (~0.125 nominal) +
                # 1-min loadavg taken immediately before each query's
                # rep block, and the raw rep times behind each median
                "queries_cal": per_query_cal,
                "queries_cal_nominal": 0.125,
                "queries_loadavg": per_query_load,
                "queries_reps": per_query_reps,
            }
        )
    )


if __name__ == "__main__":
    main()
