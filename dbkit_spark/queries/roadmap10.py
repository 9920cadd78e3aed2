"""Round-10 catalog queue (q342+): written and pre-verified this round,
NOT registered — merged into ``roadmap7.ROADMAP7`` (imported at the
bottom of ``roadmap7.py``; must not import roadmap7 back) and landed by
``roadmap7_landed`` when the rotation arithmetic allows (round 11: q341
leads, these follow — the staged-window discipline of the r8 verdict,
queue capped at one driver window).

Every entry follows the r9 additions template: operator + randomized
brute-force or hand-case pytest (tests/test_round10.py) + oracle
pre-verified at sf0.001 and sf0.01
(tests/test_catalog.py::test_roadmap7_queue_preverified), and the
driver-canon contract of SURVEY.md §5.3 (scalar outputs only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import read_table

ROADMAP10: dict[str, tuple] = {}


# --- q342: t-digest quantile sketch ------------------------------------------


def q342_tdigest_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type t-digest (delta=100) over event values, read out
    at the four probes a latency/length-budget dashboard actually asks
    for. Rows-only by design: the estimates are approximations (the
    HLL/q20 precedent); pytest pins rank-error <= 0.02 on randomized
    data plus bit-determinism under repartitioning."""
    from ..operators.sketch import tdigest_build, tdigest_quantiles

    ev = read_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    digest = tdigest_build(ev, "value", ["event_type"], delta=100)
    return (
        tdigest_quantiles(digest, ["event_type"], [0.1, 0.5, 0.9, 0.99])
        .select(
            "event_type",
            "p",
            F.round("est", 6).alias("est"),
            F.col("n").cast("long").alias("n"),
        )
        .orderBy("event_type", "p")
    )


_Q342_NOTES = (
    "T-DIGEST MERGEABLE QUANTILE SKETCH (operators/sketch.tdigest_build "
    "/ tdigest_quantiles — the quantile member of the sketch family "
    "next to Count-Min/HLL/KMV/Misra-Gries, Dunning & Ertl 2019): "
    "k1-scale-function centroids (fine at the tails, where p99 budgets "
    "live), two-level build — (group, md5-data-salt) partials at 4x "
    "resolution, then a per-group merge of metadata-sized centroid "
    "rows; the shuffle never carries data rows. DETERMINISTIC under "
    "any partitioning (salt is data-derived, builds consume sorted "
    "streams). Rows-only: estimates are approximations; pytest pins "
    "rank error, mergeability, weight conservation, centroid bound"
)

ROADMAP10["q342_tdigest_quantiles"] = (q342_tdigest_quantiles, None, _Q342_NOTES)


# --- q343: density clustering on the LSH graph --------------------------------


def q343_density_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN-style density clustering over the q40 minhash pair graph
    (llm/cluster.density_clusters): cores need >= 2 near-dup neighbors,
    clusters are core-core components, single-edge borders attach to
    their smallest core cluster, bridge-only nodes are noise."""
    from ..llm.cluster import density_clusters
    from ..llm.dedup import minhash_near_dup_pairs

    docs = read_table(spark, sf_dir, "documents")
    pairs = minhash_near_dup_pairs(docs, threshold=0.5)
    return (
        density_clusters(pairs, min_pts=2)
        .select(F.col("id").alias("doc_id"), "cluster_id", "role")
        .orderBy("doc_id")
    )


def _q343_oracle() -> str:
    from .llm import _MINHASH_CTES

    return f"""
    WITH RECURSIVE {_MINHASH_CTES},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM mh_pairs
      UNION
      SELECT doc_b, doc_a FROM mh_pairs
    ),
    deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY 1),
    cores AS (SELECT src AS c FROM deg WHERE d >= 2),
    ce AS (
      SELECT e.src, e.dst FROM edges e
      JOIN cores c1 ON e.src = c1.c
      JOIN cores c2 ON e.dst = c2.c
    ),
    reach(id, r) AS (
      SELECT c, c FROM cores
      UNION
      SELECT ce.dst, reach.r FROM reach JOIN ce ON ce.src = reach.id
    ),
    core_labels AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id),
    border AS (
      SELECT e.src AS id, MIN(cl.cluster_id) AS cluster_id
      FROM edges e JOIN core_labels cl ON e.dst = cl.id
      WHERE e.src NOT IN (SELECT c FROM cores)
      GROUP BY e.src
    )
    SELECT id AS doc_id, cluster_id, 'core' AS role FROM core_labels
    UNION ALL
    SELECT id AS doc_id, cluster_id, 'border' AS role FROM border
    ORDER BY doc_id
    """


_Q343_NOTES = (
    "DENSITY-REACHABILITY CLUSTERING on the LSH pair graph "
    "(llm/cluster.density_clusters — the DBSCAN upgrade of q87's plain "
    "transitive closure: plain closure welds unrelated near-dup cliques "
    "through accidental single-edge bridges; requiring >= min_pts "
    "neighbors for core status breaks exactly those bridges): degree "
    "agg -> core filter -> min-label components on the CORE subgraph "
    "only -> one join+min-agg border attachment; noise absent. The "
    "oracle replays pairs, degrees, the core-core recursive closure, "
    "and border min-labels order-independently"
)

ROADMAP10["q343_density_clusters"] = (
    q343_density_clusters,
    _q343_oracle(),
    _Q343_NOTES,
)


# --- q344: identity stitching across id changes -------------------------------


def q344_identity_stitch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-id identity stitching (operators/identity.stitch_identities
    — the identity-resolution twin of q232/q287 record linkage): events
    carry a device key (the props JSON field); two different user_ids
    appearing consecutively on one device within 10 minutes are the
    same identity (the login-transition heuristic); links close
    transitively; canonical identity = component min id."""
    from ..operators.identity import stitch_identities

    ev = read_table(spark, sf_dir, "events").select(
        "event_id",
        "ts",
        "user_id",
        F.get_json_object("props", "$.k").cast("long").alias("device"),
    )
    return (
        stitch_identities(
            ev, "user_id", "device", "ts", "event_id", max_gap_s=600
        )
        .select(F.col("id").alias("user_id"), "identity_id")
        .orderBy("user_id")
    )


_Q344_ORACLE = """
    WITH RECURSIVE ev AS (
      SELECT user_id, event_id, ts,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS dev
      FROM events
    ),
    seq AS (
      SELECT user_id, ts,
             lag(user_id) OVER w AS prev_id,
             lag(ts) OVER w AS prev_ts
      FROM ev WINDOW w AS (PARTITION BY dev ORDER BY ts, event_id)
    ),
    links AS (
      SELECT DISTINCT LEAST(user_id, prev_id) AS a,
                      GREATEST(user_id, prev_id) AS b
      FROM seq
      WHERE prev_id IS NOT NULL AND prev_id <> user_id
        AND epoch(ts) - epoch(prev_ts) <= 600
    ),
    edges AS (
      SELECT a AS src, b AS dst FROM links
      UNION
      SELECT b, a FROM links
    ),
    ids AS (SELECT DISTINCT user_id AS id FROM ev),
    reach(id, r) AS (
      SELECT id, id FROM ids
      UNION
      SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
    )
    SELECT id AS user_id, MIN(r) AS identity_id
    FROM reach GROUP BY id ORDER BY user_id
"""

_Q344_NOTES = (
    "IDENTITY STITCHING ACROSS ID CHANGES (operators/identity."
    "stitch_identities — the identity-resolution twin of q232/q287: "
    "those link noisy RECORDS, this links IDS across time; without it "
    "sessionization/attribution/LTV fragment at every anonymous->login "
    "transition): one device-keyed window finds handoffs (different "
    "consecutive ids on a device within the gap, event_id tiebreak), "
    "the link table is tiny next to events, min-label components close "
    "the links transitively, singletons map to themselves. Oracle "
    "replays handoffs via the same window and the closure via "
    "recursive-CTE reachability, order-independently"
)

ROADMAP10["q344_identity_stitch"] = (
    q344_identity_stitch,
    _Q344_ORACLE,
    _Q344_NOTES,
)
