"""Property-based algebraic invariants (SURVEY.md §5.2 item 3): random
data through operator pairs, asserting the relational-algebra laws the
engine relies on. Hypothesis drives the data; every law is checked by
exact multiset equality of collected rows.

Laws covered:
  - filter fusion:        σ_p1(σ_p2(R)) == σ_(p1 ∧ p2)(R)
  - projection composition: π_b(π_a(R)) == π_b(R) for b ⊆ a
  - union-all cardinality: |R ⊎ S| == |R| + |S|
  - distinct idempotence:  δ(δ(R)) == δ(R)
  - bag partition law:     |R ∩all S| + |R \\all S| == |R|
  - top-k == sort-then-head (with a total order)
  - as-of join backward semantics vs a per-row reference computation
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dbkit_spark.operators.joins import asof_join
from dbkit_spark.operators.setops import except_all, intersect_all

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,  # CI determinism: same examples every run
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-5, max_value=5),
        st.integers(min_value=0, max_value=3),
    ),
    min_size=0,
    max_size=25,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "a long, b long") if rows else (
        spark.createDataFrame([], "a long, b long")
    )


def _bag(df):
    return Counter(tuple(r) for r in df.collect())


@given(rows=rows_strategy)
@SETTINGS
def test_filter_fusion(spark, rows):
    df = _df(spark, rows)
    p1, p2 = F.col("a") > 0, F.col("b") < 2
    assert _bag(df.filter(p1).filter(p2)) == _bag(df.filter(p1 & p2))


@given(rows=rows_strategy)
@SETTINGS
def test_projection_composition(spark, rows):
    df = _df(spark, rows).withColumn("c", F.col("a") + F.col("b"))
    assert _bag(df.select("a", "c").select("c")) == _bag(df.select("c"))


@given(rows=rows_strategy, rows2=rows_strategy)
@SETTINGS
def test_union_all_cardinality(spark, rows, rows2):
    r, s = _df(spark, rows), _df(spark, rows2)
    assert r.unionAll(s).count() == r.count() + s.count()
    assert _bag(r.unionAll(s)) == _bag(r) + _bag(s)


@given(rows=rows_strategy)
@SETTINGS
def test_distinct_idempotent(spark, rows):
    df = _df(spark, rows)
    once = _bag(df.distinct())
    assert _bag(df.distinct().distinct()) == once
    assert all(v == 1 for v in once.values())


@given(rows=rows_strategy, rows2=rows_strategy)
@SETTINGS
def test_bag_partition_law(spark, rows, rows2):
    r, s = _df(spark, rows), _df(spark, rows2)
    inter = intersect_all(r, s).count()
    exc = except_all(r, s).count()
    assert inter + exc == r.count()


@given(rows=rows_strategy)
@SETTINGS
def test_topk_equals_sorted_head(spark, rows):
    df = _df(spark, rows)
    k = 5
    got = [tuple(r) for r in df.orderBy("a", "b").limit(k).collect()]
    want = sorted(tuple(r) for r in rows)[:k]
    assert got == want


asof_strategy = st.tuples(
    st.lists(st.integers(min_value=0, max_value=100), min_size=1, max_size=15),
    st.lists(st.integers(min_value=0, max_value=100), min_size=0, max_size=15),
)


@given(times=asof_strategy)
@SETTINGS
def test_asof_backward_reference(spark, times):
    """as-of(backward) == per-left-row max right time <= left time."""
    ltimes, rtimes = times
    left = spark.createDataFrame(
        [(1, F.lit(None), t) for t in ltimes], "k long, pad string, sec long"
    ).select("k", F.timestamp_seconds("sec").alias("t"))
    right = spark.createDataFrame(
        [(1, t, float(t)) for t in rtimes], "k long, sec long, v double"
    ).select("k", F.timestamp_seconds("sec").alias("t"), "v")
    out = asof_join(left, right, on_key="k", on_time="t")
    got = {r.t.timestamp(): r.v for r in out.collect()}
    for lt in set(ltimes):
        cands = [rt for rt in rtimes if rt <= lt]
        want = float(max(cands)) if cands else None
        assert got.get(float(lt)) == want


@given(rows=rows_strategy, rows2=rows_strategy)
@SETTINGS
def test_join_laws(spark, rows, rows2):
    """left ⊇ inner; semi == distinct inner keys; anti = left-keys − semi."""
    r = _df(spark, rows).withColumnRenamed("b", "v")
    s = _df(spark, rows2).groupBy("a").count()  # key-unique right side
    inner = r.join(s, "a")
    left = r.join(s, "a", "left")
    semi = r.join(s, "a", "left_semi")
    anti = r.join(s, "a", "left_anti")
    assert left.count() == r.count()  # key-unique right never duplicates
    assert inner.count() <= left.count()
    assert semi.count() + anti.count() == r.count()
    semi_keys = {x.a for x in semi.select("a").distinct().collect()}
    inner_keys = {x.a for x in inner.select("a").distinct().collect()}
    assert semi_keys == inner_keys


@given(rows=rows_strategy)
@SETTINGS
def test_broadcast_equals_plain(spark, rows):
    """F.broadcast is a hint, never a semantics change."""
    r = _df(spark, rows)
    s = _df(spark, rows).groupBy("a").count()
    plain = _bag(r.join(s, "a"))
    hinted = _bag(r.join(F.broadcast(s), "a"))
    assert plain == hinted


def test_connected_components_partition_invariant(spark):
    """Cluster labels must be a pure function of the edge SET — invariant
    to partitioning and input row order (the 1000-executor determinism
    property)."""
    import random

    from dbkit_spark.llm.cluster import connected_components

    rng = random.Random(7)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
    edges = [(a, b) for a, b in edges if a != b]
    base = spark.createDataFrame(edges, "doc_a long, doc_b long")
    ref = {r.id: r.cluster_id for r in connected_components(base).collect()}

    shuffled = spark.createDataFrame(
        list(reversed(edges)), "doc_a long, doc_b long"
    ).repartition(13)
    got = {r.id: r.cluster_id for r in connected_components(shuffled).collect()}
    assert got == ref

    # every label is the true min of its component (fixpoint property)
    comp = {}
    for i, c in ref.items():
        comp.setdefault(c, set()).add(i)
    for c, members in comp.items():
        assert c == min(members | {c})


texts_strategy = st.lists(
    st.text(
        alphabet=st.sampled_from("abc xyz 019 "),
        min_size=0,
        max_size=200,
    ),
    min_size=1,
    max_size=8,
)


@given(texts=texts_strategy)
@SETTINGS
def test_chunking_reconstructs_token_stream(spark, texts):
    """For ANY document, concatenating each chunk's first `stride` tokens
    (whole last chunk) reconstructs the exact token stream — no token
    lost or duplicated by the windowing (coverage law of chunk_documents)."""
    from dbkit_spark.functions.text import tokens
    from dbkit_spark.llm.chunking import chunk_documents

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    W, S = 6, 4
    chunks = chunk_documents(docs, window=W, stride=S).collect()
    toks = {
        r.doc_id: r.t
        for r in docs.select("doc_id", tokens("text").alias("t")).collect()
    }
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, t in toks.items():
        rows = sorted(by_doc.get(doc_id, []), key=lambda r: r.chunk_id)
        if not t:
            assert not rows
            continue
        rebuilt: list[str] = []
        for r in rows[:-1]:
            rebuilt.extend(r.chunk_text.split(" ")[:S])
        rebuilt.extend(rows[-1].chunk_text.split(" "))
        assert rebuilt == t, (doc_id, rebuilt, t)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=99),
            st.integers(min_value=0, max_value=3),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda r: r[0],
    ),
    victim=st.integers(min_value=0, max_value=39),
)
@SETTINGS
def test_reconcile_detects_any_single_perturbation(spark, rows, victim):
    """For ANY table and ANY single-row value perturbation, reconcile
    reports exactly the damaged bucket (completeness of the checksum:
    a change never cancels out, because counts match but the md5
    fingerprint sum moves)."""
    from dbkit_spark.operators.reconcile import (
        bucket_summary,
        reconcile_buckets,
        row_fingerprint,
    )

    vid = rows[victim % len(rows)][0]
    left_df = spark.createDataFrame(rows, "id long, v long")
    right_df = spark.createDataFrame(
        [(i, v + 1 if i == vid else v) for i, v in rows], "id long, v long"
    )
    fp = row_fingerprint([F.col("id"), F.col("v")])
    n_b = 8
    bad = reconcile_buckets(
        bucket_summary(left_df, F.col("id"), fp, n_b),
        bucket_summary(right_df, F.col("id"), fp, n_b),
    ).collect()
    assert len(bad) == 1
    assert bad[0].bucket == vid % n_b
    assert bad[0].counts_match and not bad[0].sums_match


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=999),
            st.integers(min_value=0, max_value=2),
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda r: r[0],
    )
)
@SETTINGS
def test_quota_sample_is_layout_invariant(spark, rows):
    """quota_sample's kept set must be identical for ANY partition layout
    of the same rows — the reproducibility contract seeded sample()
    lacks."""
    from dbkit_spark.llm.sampling import quota_sample

    schema = "doc_id long, grp long"
    a = spark.createDataFrame(rows, schema).repartition(1)
    b = spark.createDataFrame(list(reversed(rows)), schema).repartition(7)
    keep = lambda df: {
        (r.grp, r.doc_id)
        for r in quota_sample(df, "grp", "doc_id", quota=2).collect()
    }
    assert keep(a) == keep(b)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),    # group
            st.integers(min_value=0, max_value=9),    # value (ties likely)
        ),
        min_size=1,
        max_size=30,
    )
)
@SETTINGS
def test_topk_with_ties_laws(spark, rows):
    """WITH TIES laws for any data: the rank() cut is a superset of the
    row_number cut; every kept value >= every dropped value per group;
    all rows tying the k-th value are kept together."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(i, g, v) for i, (g, v) in enumerate(rows)], "id long, g long, v long"
    )
    k = 2
    wt = Window.partitionBy("g").orderBy(F.col("v").desc())
    wr = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("id"))
    ties = {(r.g, r.id) for r in df.withColumn("rk", F.rank().over(wt))
            .filter(F.col("rk") <= k).collect()}
    rn = {(r.g, r.id) for r in df.withColumn("rk", F.row_number().over(wr))
          .filter(F.col("rk") <= k).collect()}
    assert rn <= ties
    vals = {(r.g, r.id): r.v for r in df.collect()}
    by_group: dict[int, list] = {}
    for (g, i), v in vals.items():
        by_group.setdefault(g, []).append((i, v))
    for g, members in by_group.items():
        kept = {i for (gg, i) in ties if gg == g}
        kept_vals = [v for i, v in members if i in kept]
        dropped_vals = [v for i, v in members if i not in kept]
        if kept_vals and dropped_vals:
            assert min(kept_vals) > max(dropped_vals)  # ties never split


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.floats(min_value=-100, max_value=100,
                      allow_nan=False, allow_infinity=False),
        ),
        min_size=1,
        max_size=30,
    )
)
@SETTINGS
def test_minmax_normalize_bounds(spark, rows):
    """Min-max scaling lands in [0,1] for any input; each non-degenerate
    group's min maps to 0 and max to 1; constant groups pin to 0.5."""
    df = spark.createDataFrame(rows, "g long, v double")
    bounds = df.groupBy(F.col("g").alias("bg")).agg(
        F.min("v").alias("lo"), F.max("v").alias("hi")
    )
    scaled_col = F.when(F.col("hi") == F.col("lo"), F.lit(0.5)).otherwise(
        (F.col("v") - F.col("lo")) / (F.col("hi") - F.col("lo"))
    )
    out = df.join(F.broadcast(bounds), df["g"] == F.col("bg")).select(
        "g", "v", scaled_col.alias("s"), "lo", "hi"
    ).collect()
    for r in out:
        assert -1e-12 <= r.s <= 1 + 1e-12
        if r.hi != r.lo:
            if r.v == r.lo:
                assert r.s == 0.0
            if r.v == r.hi:
                assert r.s == 1.0
        else:
            assert r.s == 0.5


@given(
    batches=st.lists(
        st.lists(
            st.sampled_from([f"k{i}" for i in range(12)]),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=5,
    ),
    capacity=st.integers(min_value=1, max_value=8),
)
@SETTINGS
def test_mg_kernel_laws(batches, capacity):
    """Misra–Gries kernel laws under arbitrary batch splits (pure-Python
    kernel, no Spark needed): summary never exceeds capacity; for EVERY
    key est <= true <= est + err; every key with true count > err is
    present; and the total error never exceeds n/capacity... the bound
    the streaming operator's docstring promises."""
    from collections import Counter

    from dbkit_spark.streaming.heavy_hitters import mg_merge_trim

    summary: dict[str, int] = {}
    err = 0
    true: Counter = Counter()
    n = 0
    for batch in batches:
        true.update(batch)
        n += len(batch)
        summary, sub = mg_merge_trim(summary, Counter(batch), capacity)
        err += sub
        assert len(summary) <= capacity
    for k, c in true.items():
        est = summary.get(k, 0)
        assert est <= c <= est + err, (k, est, c, err)
    for k, c in true.items():
        if c > err:
            assert k in summary, (k, c, err)
    if n:
        assert err <= n / capacity, (err, n, capacity)


@given(
    vals=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=60,
    ),
    k=st.integers(min_value=1, max_value=6),
)
@SETTINGS
def test_quantile_bin_laws(spark, vals, k):
    """Sampled quantile binning laws on arbitrary floats: output covers
    every non-null input row exactly once, bins fall in 1..k, and bin
    assignment is monotone in value (a higher value never gets a lower
    bin)."""
    from dbkit_spark.operators.histogram import quantile_bin

    df = spark.createDataFrame([(i, float(v)) for i, v in enumerate(vals)],
                               "id long, v double")
    out = quantile_bin(df, "v", k).collect()
    assert len(out) == len(vals)
    assert all(1 <= r.bin <= k for r in out)
    by_val = sorted(out, key=lambda r: (r.v, r.id))
    bins = [r.bin for r in by_val]
    assert bins == sorted(bins), bins


@given(
    dims=st.tuples(
        st.integers(min_value=1, max_value=9),
        st.integers(min_value=1, max_value=9),
    ),
    seed=st.integers(min_value=0, max_value=10_000),
)
@SETTINGS
def test_png_roundtrip_random(dims, seed):
    """PNG encode→decode is the identity on pixels for arbitrary
    dimensions and seeds (pure-Python, no Spark)."""
    from dbkit_spark.llm.multimodal import decode_png_pixels, encode_png

    w, h = dims
    W, H, C, px = decode_png_pixels(encode_png(w, h, seed % 256))
    want = bytes(
        b
        for y in range(h)
        for x in range(w)
        for v in [(seed % 256 + 31 * x + 17 * y) % 256]
        for b in (v, (v * 7) % 256, (v * 13) % 256)
    )
    assert (W, H, C) == (w, h, 3) and px == want


@given(
    changes=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),   # key
            st.integers(min_value=0, max_value=30),  # ts
            st.sampled_from(["a", "b", "c"]),        # state
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda t: (t[0], t[1]),
    ),
    probes=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),
            st.integers(min_value=0, max_value=35),
        ),
        min_size=1,
        max_size=10,
    ),
)
@SETTINGS
def test_scd2_enrich_laws(spark, changes, probes):
    """SCD2 point-in-time laws on random change feeds: every probe event
    gets exactly the state of the LATEST change at-or-before its ts for
    its key (NULL if none), and enrichment never fans out or drops
    rows."""
    from dbkit_spark.operators.timeseries import enrich_with_scd2, scd2_history

    feed = spark.createDataFrame(
        [(k, s, t, i) for i, (k, t, s) in enumerate(changes)],
        "k long, s string, ts long, cid long",
    )
    dim = scd2_history(feed, "k", ["s"], "ts", tiebreak="cid")
    events = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(probes)],
        "k long, ts long, eid long",
    )
    out = enrich_with_scd2(events, dim, "k", "ts").collect()
    assert len(out) == len(probes)

    # reference: per-key latest change at-or-before each probe ts
    def ref(k, ts):
        cands = [
            (t, i, s)
            for i, (ck, t, s) in enumerate(changes)
            if ck == k and t <= ts
        ]
        return max(cands)[2] if cands else None

    for r in out:
        assert r.s == ref(r.k, r.ts), (r.k, r.ts, r.s, ref(r.k, r.ts))


# --- prefix scan law: two-phase scan == single-reducer window ---------------
prefix_rows = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=50),   # order key (dups allowed)
        st.integers(min_value=0, max_value=10**6),  # unique-ified below
        st.one_of(st.none(), st.integers(min_value=-999, max_value=999)),
    ),
    min_size=0,
    max_size=40,
)


@given(prefix_rows)
@SETTINGS
def test_prefix_agg_equals_global_window(spark, rows):
    """For every agg and frame, prefix_agg over a total order equals the
    naive single-reducer window — including NULL values, duplicate
    order keys (tiebroken), and tiny/empty inputs."""
    from pyspark.sql import Window

    from dbkit_spark.operators.prefix import prefix_agg

    data = [
        (k, i, None if v is None else float(v))
        for i, (k, _junk, v) in enumerate(rows)
    ]
    if not data:
        return
    df = spark.createDataFrame(data, "k int, tie int, v double")
    for agg, fn in (("sum", F.sum), ("max", F.max), ("count", F.count)):
        for inclusive in (True, False):
            upper = 0 if inclusive else -1
            w = Window.orderBy("k", "tie").rowsBetween(
                Window.unboundedPreceding, upper
            )
            ref_col = fn("v").over(w)
            if agg == "count":
                ref_col = F.coalesce(ref_col, F.lit(0)).cast("long")
            ref = {
                r["tie"]: r["x"] for r in df.withColumn("x", ref_col).collect()
            }
            got = {
                r["tie"]: r["x"]
                for r in prefix_agg(
                    df, ["k", "tie"], "v", agg=agg,
                    inclusive=inclusive, out_col="x", n_buckets=4,
                ).collect()
            }
            if agg == "sum":
                # double addition is order-sensitive across regrouping:
                # compare with an ulp-scale tolerance (decimal inputs get
                # exactness; the law here is the FRAME, not float assoc)
                assert set(got) == set(ref)
                for t in got:
                    a, b = got[t], ref[t]
                    assert (a is None) == (b is None)
                    if a is not None:
                        assert abs(a - b) <= 1e-9 * max(1.0, abs(b))
            else:
                assert got == ref, (agg, inclusive)
