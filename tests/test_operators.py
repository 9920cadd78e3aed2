"""Operator unit tests in the reference's style (SURVEY.md §5.1): build
tiny data → run operator → assert exact cell-level output and exact error
variants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbkit_spark import errors
from dbkit_spark.operators.joins import asof_join, range_join
from dbkit_spark.operators.project import Projector, prefix_all, project, rename
from dbkit_spark.operators.setops import dedup_keep_first, union_all
from dbkit_spark.operators.window import per_group_topk, require_partitioned
from dbkit_spark.schema import attribute, make_schema
from dbkit_spark.sources import scan_view, table_appender


@pytest.fixture(scope="module")
def tiny(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id long, s string, v double"
    )


# --- projection (mirrors reference test reorder_columns, project.rs:77-120)
def test_project_reorder_rename(tiny):
    out = Projector().add_name("s", "new_one").add_name("id").apply(tiny)
    assert out.columns == ["new_one", "id"]
    assert [tuple(r) for r in out.orderBy("id").collect()] == [("a", 1), ("b", 2), ("c", 3)]


def test_project_by_position(tiny):
    out = Projector().add_position(2).add_position(0, "key").apply(tiny)
    assert out.columns == ["v", "key"]


def test_project_missing_raises(tiny):
    with pytest.raises(errors.AttributeMissing):
        project(tiny, "nope")


def test_project_duplicate_raises(tiny):
    with pytest.raises(errors.AttributeDuplicate):
        Projector().add_name("s", "x").add_name("id", "x").apply(tiny)


def test_project_position_oob(tiny):
    with pytest.raises(errors.RowOutOfBounds):
        Projector().add_position(9).apply(tiny)


def test_rename_and_prefix(tiny):
    assert rename(tiny, {"id": "key"}).columns == ["key", "s", "v"]
    assert prefix_all(tiny, "t_").columns == ["t_id", "t_s", "t_v"]
    with pytest.raises(errors.AttributeDuplicate):
        rename(tiny, {"id": "s"})


# --- scan_view (reference ScanView row-range, scan_view.rs:12-21) ----------
def test_scan_view_range(tiny):
    ordered = tiny.orderBy("id")
    out = scan_view(ordered, offset=1, limit=1)
    assert [r.id for r in out.collect()] == [2]
    with pytest.raises(errors.RowOutOfBounds):
        scan_view(tiny, offset=-1)


# --- appender (reference table.rs tests: appender_rows / varlen_columns) ---
def test_appender_nullable_roundtrip(spark):
    sch = make_schema([attribute("one", T.LongType(), nullable=True)])
    df = table_appender(sch).add_row().set(None).add_row().set(15).done(spark)
    vals = [r.one for r in df.collect()]
    assert sorted(vals, key=lambda x: (x is None, x)) in ([15, None], [None, 15]) or set(
        vals
    ) == {None, 15}


def test_appender_varlen_and_binary(spark):
    sch = make_schema(
        [attribute("blob", T.BinaryType()), attribute("text", T.StringType())]
    )
    df = (
        table_appender(sch)
        .add_row().set(b"\x01\x02").set("hello")
        .add_row().set(b"").set("")
        .done(spark)
    )
    rows = sorted([(bytes(r.blob), r.text) for r in df.collect()])
    assert rows == [(b"", ""), (b"\x01\x02", "hello")]


def test_appender_type_error_latches(spark):
    sch = make_schema([attribute("n", T.LongType())])
    app = table_appender(sch).add_row().set("not an int").add_row().set(2)
    with pytest.raises(errors.AttributeType):
        app.done(spark)


# --- set ops ---------------------------------------------------------------
def test_union_schema_mismatch(tiny, spark):
    other = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(errors.AttributeMissing):
        union_all(tiny, other)


def test_dedup_keep_first_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-02", "late"), (1, "2024-01-01", "early"), (2, "2024-01-05", "only")],
        "k long, d string, tag string",
    )
    out = dedup_keep_first(df, ["k"], [F.col("d").asc()])
    assert {(r.k, r.tag) for r in out.collect()} == {(1, "early"), (2, "only")}


# --- window guard ----------------------------------------------------------
def test_window_requires_partition():
    with pytest.raises(ValueError):
        require_partitioned([])


def test_per_group_topk_exact(spark):
    df = spark.createDataFrame(
        [("g", i, float(i * 10)) for i in range(5)] + [("h", 9, 1.0)],
        "grp string, id long, v double",
    )
    out = per_group_topk(df, ["grp"], [F.col("v").desc(), F.col("id")], k=2)
    got = {(r.grp, r.id, r.rn) for r in out.collect()}
    assert got == {("g", 4, 1), ("g", 3, 2), ("h", 9, 1)}


# --- as-of join semantics --------------------------------------------------
def test_asof_backward_exact(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 12:00:00"), (2, "2024-01-01 09:00:00")],
        "k long, t string",
    ).select("k", F.col("t").cast("timestamp").alias("t"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:30:00", 100.0), (1, "2024-01-01 11:00:00", 200.0)],
        "k long, t string, val double",
    ).select("k", F.col("t").cast("timestamp").alias("t"), "val")
    out = asof_join(left, right, on_key="k", on_time="t")
    got = {(r.k, r.t.isoformat(), r.val) for r in out.collect()}
    assert got == {
        (1, "2024-01-01T10:00:00", 100.0),   # matched 09:30
        (1, "2024-01-01T12:00:00", 200.0),   # matched 11:00
        (2, "2024-01-01T09:00:00", None),    # no right row for key 2
    }


def test_asof_equal_ts_inclusive(spark):
    left = spark.createDataFrame([(1, "2024-01-01 10:00:00")], "k long, t string").select(
        "k", F.col("t").cast("timestamp").alias("t")
    )
    right = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 7.0)], "k long, t string, val double"
    ).select("k", F.col("t").cast("timestamp").alias("t"), "val")
    out = asof_join(left, right, on_key="k", on_time="t")
    assert [r.val for r in out.collect()] == [7.0]


def test_asof_tie_deterministic_and_row_atomic(spark):
    """Two right rows share key+timestamp: the survivor must be (a) the same
    across repartitionings (greatest payload tuple wins) and (b) one
    coherent ROW — per-column carry-forward must not mix val from one tied
    row with tag from another when payloads contain nulls."""
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00")], "k long, t string"
    ).select("k", F.col("t").cast("timestamp").alias("t"))
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 09:00:00", None, "a"),
            (1, "2024-01-01 09:00:00", 5.0, None),
        ],
        "k long, t string, val double, tag string",
    ).select("k", F.col("t").cast("timestamp").alias("t"), "val", "tag")
    for nparts in (1, 7):
        out = asof_join(
            left, right.repartition(nparts), on_key="k", on_time="t"
        )
        rows = out.collect()
        assert len(rows) == 1
        # greatest payload tuple: (5.0, None) > (None, 'a') with
        # nulls-first ascending ordering => last row in frame wins whole
        assert (rows[0].val, rows[0].tag) == (5.0, None)


# --- range join produces no duplicate/missing matches ----------------------
def test_range_join_exact(spark):
    left = spark.createDataFrame([(1, 5.0), (2, 12.0), (3, 27.0)], "id long, x double")
    right = spark.createDataFrame(
        [(0.0, 10.0, "lo"), (10.0, 20.0, "mid"), (25.0, 60.0, "hi"), (4.0, 30.0, "wide")],
        "lo double, hi double, tier string",
    )
    out = range_join(left, right, "x", "lo", "hi", bin_size=7.0)
    got = {(r.id, r.tier) for r in out.collect()}
    assert got == {
        (1, "lo"), (1, "wide"),
        (2, "mid"), (2, "wide"),
        (3, "hi"), (3, "wide"),
    }


def test_sort_within_partitions_no_shuffle(spark, sf_dir):
    """sortWithinPartitions: every partition internally sorted, and the
    sort adds no Exchange beyond the explicit repartition (the sorted-
    parquet-write pattern)."""
    from dbkit_spark.operators.sort import sort_within_partitions
    from dbkit_spark.sources import read_table

    # split=False: the assertion pins that sortWithinPartitions itself
    # adds no Exchange beyond the explicit repartition; the reader's
    # adaptive scan-split (OPTIMIZATION_r15) would add its own.
    orders = read_table(spark, sf_dir, "orders", split=False).repartition(
        4, "o_custkey"
    )
    swp = sort_within_partitions(orders.select("o_custkey", "o_totalprice"), "o_totalprice")
    parts = swp.rdd.glom().collect()
    assert sum(len(p) for p in parts) == orders.count()
    for p in parts:
        vals = [r.o_totalprice for r in p]
        assert vals == sorted(vals)
    plan = swp._jdf.queryExecution().executedPlan().toString()
    final_plan = plan.split("== Initial Plan ==")[0]  # AQE prints both
    assert final_plan.count("Exchange") == 1  # only the repartition's


def test_sessionize_gap_semantics_and_single_shuffle(spark):
    import re

    from pyspark.sql import functions as F

    from dbkit_spark.operators.window import sessionize

    rows = [
        # user 1: two sessions split by a 2h gap (threshold 1h)
        (1, 100, "2024-01-01 00:00:00"),
        (1, 101, "2024-01-01 00:30:00"),
        (1, 102, "2024-01-01 02:31:00"),
        # user 2: one session, boundary gap EXACTLY the threshold stays
        (2, 200, "2024-01-01 00:00:00"),
        (2, 201, "2024-01-01 01:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts_s string").select(
        "user_id", "event_id", F.col("ts_s").cast("timestamp").alias("ts")
    )
    out = sessionize(df, "user_id", "ts", 3600, "event_id")
    got = {r.event_id: r.session_num for r in out.collect()}
    assert got == {100: 1, 101: 1, 102: 2, 200: 1, 201: 1}

    # the two stacked windows must share one exchange
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert len(re.findall(r"Exchange", final)) == 1


def test_grouped_zscore_zero_variance_and_values(spark):
    from dbkit_spark.operators.grouped import grouped_zscore

    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 3.0), (3, "b", 5.0), (4, "b", 5.0)],
        "id long, g string, v double",
    )
    got = {r.id: r.z for r in grouped_zscore(df, ["g"], "v").collect()}
    assert got[1] == -1.0 and got[2] == 1.0  # mean 2, std_pop 1
    assert got[3] == 0.0 and got[4] == 0.0   # zero variance -> 0


def test_asof_join_forward_with_tolerance(spark):
    """Forward as-of: earliest right row at/after the left time, nulled
    when beyond the tolerance window."""
    from dbkit_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "a"), (1, "2024-01-01 12:00:00", "b")],
        "k long, ts string, tag string",
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) AS ts", "tag")
    right = spark.createDataFrame(
        [(1, "2024-01-01 10:30:00", 1.0), (1, "2024-01-01 15:00:00", 2.0)],
        "k long, ts string, val double",
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) AS ts", "val")
    out = {
        r.tag: r.val
        for r in asof_join(
            left, right, on_key="k", on_time="ts",
            direction="forward", tolerance="1 hour",
        ).collect()
    }
    # a: 10:30 is 30min ahead -> joins; b: next right is 15:00, 3h ahead -> nulled
    assert out == {"a": 1.0, "b": None}


# --- iterate_until_fixpoint -------------------------------------------------
def test_fixpoint_default_set_equality_convergence(spark):
    """The measure-free mode detects the fixpoint via exact multiset
    equality of consecutive states: an idempotent-after-3-rounds step
    (saturating increment capped at 3) converges without any user
    measure."""
    from dbkit_spark.operators.iterate import iterate_until_fixpoint

    initial = spark.createDataFrame([(1, 0), (2, 1)], "id long, v long")
    def step(df):
        return df.select("id", F.least(F.col("v") + 1, F.lit(3)).alias("v"))
    out = iterate_until_fixpoint(initial, step, max_iter=10)
    assert {(r.id, r.v) for r in out.collect()} == {(1, 3), (2, 3)}


def test_fixpoint_monotone_measure_convergence(spark):
    """count() as the monotone measure: a grow-only closure step stops
    exactly when no new rows appear."""
    from dbkit_spark.operators.iterate import iterate_until_fixpoint

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)], "src long, dst long"
    )
    initial = spark.createDataFrame([(1,)], "node long")
    def step(reach):
        nxt = reach.join(edges, reach["node"] == edges["src"]).select(
            F.col("dst").alias("node")
        )
        return reach.unionByName(nxt).distinct()
    out = iterate_until_fixpoint(
        initial, step, measure=lambda df: df.count(), max_iter=10
    )
    assert {r.node for r in out.collect()} == {1, 2, 3, 4, 5, 6}


def test_fixpoint_max_iter_raises(spark):
    """A never-stabilizing step must raise, not silently return a
    non-fixpoint."""
    import pytest

    from dbkit_spark.operators.iterate import iterate_until_fixpoint

    initial = spark.createDataFrame([(0,)], "v long")
    def step(df):
        return df.select((F.col("v") + 1).alias("v"))
    with pytest.raises(RuntimeError, match="did not converge in 3"):
        iterate_until_fixpoint(initial, step, max_iter=3)


def test_fixpoint_durable_checkpoint_dir(spark, tmp_path):
    """checkpoint_dir switches rounds to durable checkpoint(): the
    directory receives RDD state and the result is unchanged."""
    import os

    from dbkit_spark.operators.iterate import iterate_until_fixpoint

    d = str(tmp_path / "fixpoint_ckpt")
    initial = spark.createDataFrame([(1, 0)], "id long, v long")
    def step(df):
        return df.select("id", F.least(F.col("v") + 1, F.lit(2)).alias("v"))
    out = iterate_until_fixpoint(initial, step, max_iter=10, checkpoint_dir=d)
    assert [(r.id, r.v) for r in out.collect()] == [(1, 2)]
    assert os.path.isdir(d) and any(os.scandir(d))


def test_sql_recursion_equals_fixpoint_operator(spark):
    """q178's depth-bounded native WITH RECURSIVE must compute exactly
    the iterate_until_fixpoint closure on the SAME (functional-only)
    graph — proof the depth guard (20) strictly covers the closure
    diameter, i.e. the bounded recursion IS the fixpoint."""
    from dbkit_spark.catalog import load_all
    from dbkit_spark.operators.iterate import iterate_until_fixpoint
    from dbkit_spark.sources import read_table

    cat = load_all()
    sf = "/root/testdata/sf0.001"
    sql_side = {
        (r.start, r.node)
        for r in cat["q178_sql_recursive_cte"].fn(spark, sf).collect()
    }

    ev = read_table(spark, sf, "events")
    edges = ev.select(
        F.col("user_id").alias("src"),
        ((F.col("user_id") * 7 + 3) % 150).alias("dst"),
    ).distinct().persist()
    seeds = (
        edges.filter(F.col("src") < 5)
        .select(F.col("src").alias("start"), F.col("dst").alias("node"))
        .distinct()
        .withColumn("frontier", F.lit(True))
    )

    def step(state):
        frontier = state.filter(F.col("frontier")).select("start", "node")
        nxt = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select("start", F.col("dst").alias("node"))
            .distinct()
            .join(state.select("start", "node"), ["start", "node"], "left_anti")
            .withColumn("frontier", F.lit(True))
        )
        return state.withColumn("frontier", F.lit(False)).unionByName(nxt)

    fix = iterate_until_fixpoint(
        seeds, step, measure=lambda df: df.count(), max_iter=40
    )
    op_side = {(r.start, r.node) for r in fix.select("start", "node").collect()}
    edges.unpersist()
    assert sql_side == op_side and len(sql_side) > 0


def test_skew_profile_diagnoses_hot_keys(spark):
    """skew_profile on a deliberately skewed key: the hot key leads with
    the right share, skew_factor = max/mean exactly, top-k is cut by
    TakeOrderedAndProject (no full sort), and the uniform case reads
    ~1.0."""
    from dbkit_spark.operators.profile import skew_profile

    # 1000 rows of key 'hot', 10 each of 50 cold keys -> 1500 rows, 51 keys
    rows = [("hot",)] * 1000 + [(f"k{i}",) for i in range(50) for _ in range(10)]
    df = spark.createDataFrame(rows, "k string").repartition(8)
    out = skew_profile(df, ["k"], top=3).collect()
    assert out[0].k == "hot" and out[0].n == 1000
    assert out[0].n_rows == 1500 and out[0].n_keys == 51
    assert out[0].share == round(1000 / 1500, 6)
    assert out[0].skew_factor == round(1000 / (1500 / 51), 6)  # = 34.0
    assert [r.n for r in out] == sorted([r.n for r in out], reverse=True)

    plan = (
        skew_profile(df, ["k"], top=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert "TakeOrderedAndProject" in plan

    import pytest as _pytest

    with _pytest.raises(ValueError, match="key_cols"):
        skew_profile(df, [], top=3)
