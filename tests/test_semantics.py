"""Hand-computed semantic fixtures for the round-5 analytics operators.

The oracle differentials prove Spark == DuckDB on fixture data; these
tests pin the SEMANTICS themselves on constructed inputs where the
correct answer is computed by hand — so an error made identically on
both engines (a shared misreading of the spec) cannot hide.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def _ts(minute: int, second: int = 0) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 10, minute, second)


def test_last_touch_attribution_semantics(spark):
    """Purchase credits the most recent click <= 1 h before it; clicks
    after the purchase or older than the window never get credit."""
    rows = [
        # user 1: click at 10:00, purchase at 10:30 -> attributed
        (1, 100, "click", _ts(0)),
        (1, 101, "purchase", _ts(30)),
        # user 2: click at 10:05, ANOTHER click at 10:20, purchase 10:25
        # -> credits the 10:20 click (most recent), not the first
        (2, 200, "click", _ts(5)),
        (2, 201, "click", _ts(20)),
        (2, 202, "purchase", _ts(25)),
        # user 3: click 70 min before purchase -> outside window, NULL
        (3, 300, "click", datetime.datetime(2024, 1, 1, 9, 0)),
        (3, 301, "purchase", datetime.datetime(2024, 1, 1, 10, 10)),
        # user 4: click AFTER the purchase -> never credited
        (4, 400, "purchase", _ts(10)),
        (4, 401, "click", _ts(20)),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts timestamp"
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    carried = df.select(
        "user_id", "event_id", "event_type", "ts",
        F.last(click_id, ignorenulls=True).over(w).alias("last_click_id"),
        F.last(click_ts, ignorenulls=True).over(w).alias("last_click_ts"),
    )
    in_window = F.col("last_click_ts").isNotNull() & (
        F.col("ts") - F.col("last_click_ts") <= F.expr("INTERVAL 1 HOUR")
    )
    got = {
        r.event_id: r.attributed_click
        for r in carried.filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            F.when(in_window, F.col("last_click_id")).alias("attributed_click"),
        )
        .collect()
    }
    assert got == {101: 100, 202: 201, 301: None, 400: None}


def test_weighted_median_semantics(spark):
    """Lower weighted median: smallest value whose cumulative weight
    reaches half the total. Hand cases: weights concentrated high ->
    median is the heavy value; concentrated low -> the light one."""
    from pyspark.sql import Window

    rows = [
        ("hi", 1.0, 1), ("hi", 2.0, 1), ("hi", 3.0, 3),  # tw=5, cross at 3
        ("lo", 1.0, 3), ("lo", 2.0, 1), ("lo", 3.0, 1),  # tw=5, cross at 1
        ("ev", 1.0, 1), ("ev", 2.0, 1),                   # tw=2, cross at 1
    ]
    df = spark.createDataFrame(rows, "g string, v double, wt long")
    cum = df.select(
        "g", "v", "wt",
        F.sum("wt").over(
            Window.partitionBy("g").orderBy("v", "wt")
            .rowsBetween(Window.unboundedPreceding, 0)
        ).alias("cw"),
        F.sum("wt").over(Window.partitionBy("g")).alias("tw"),
    )
    got = {
        r.g: r.wm
        for r in cum.filter(F.col("cw") * 2 >= F.col("tw"))
        .groupBy("g").agg(F.min("v").alias("wm")).collect()
    }
    assert got == {"hi": 3.0, "lo": 1.0, "ev": 1.0}


def test_interval_union_semantics(spark):
    """Overlapping intervals merge, touching intervals merge (strict >
    opens an island), disjoint stay separate; coverage never
    double-counts overlap."""
    from pyspark.sql import Window

    # key 1: [0,10] [5,15] overlap -> one island covering 15
    #        [20,25] disjoint      -> second island covering 5
    # key 2: [0,10] [10,20] touch  -> ONE island covering 20
    rows = [
        (1, 0, 10), (1, 5, 15), (1, 20, 25),
        (2, 0, 10), (2, 10, 20),
    ]
    iv = spark.createDataFrame(rows, "k long, s long, e long")
    prev_max = F.max("e").over(
        Window.partitionBy("k").orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "ni", F.when(prev_max.isNull() | (F.col("s") > prev_max), 1).otherwise(0)
    )
    islands = flagged.withColumn(
        "isl",
        F.sum("ni").over(
            Window.partitionBy("k").orderBy("s", "e")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    merged = islands.groupBy("k", "isl").agg(
        (F.max("e") - F.min("s")).alias("cov")
    )
    got = {
        r.k: (r.n, r.total)
        for r in merged.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("cov").alias("total"))
        .collect()
    }
    assert got == {1: (2, 20), 2: (1, 20)}


def test_twap_semantics(spark):
    """Value 10 held for 3 s then value 20 held for 1 s -> TWAP 12.5;
    the final observation (no following event) contributes no weight."""
    rows = [
        (1, _ts(0, 0), 10.0),
        (1, _ts(0, 3), 20.0),
        (1, _ts(0, 4), 99.0),  # last: excluded (no holding duration)
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    from pyspark.sql import Window

    w = Window.partitionBy("k").orderBy("ts")
    seq = df.select(
        "k", "v",
        F.unix_micros("ts").alias("t"),
        F.lead(F.unix_micros("ts")).over(w).alias("nt"),
    ).filter(F.col("nt").isNotNull())
    got = (
        seq.withColumn("dur", F.col("nt") - F.col("t"))
        .groupBy("k")
        .agg(
            (
                F.sum((F.col("v") * F.col("dur")).cast("decimal(30,6)"))
                .cast("double") / F.sum("dur").cast("double")
            ).alias("twap")
        )
        .collect()[0]
        .twap
    )
    assert abs(got - 12.5) < 1e-9


def test_pagerank_uniform_on_cycle(spark):
    """On a pure directed cycle every node has in-degree == out-degree
    == 1, so uniform rank 1/N is the exact fixpoint — each iteration
    must reproduce it bit-for-bit (mass conservation of the operator)."""
    from dbkit_spark.operators.iterate import iterate_fixed

    n = 6
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src long, dst long"
    ).persist()
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    edges_deg = edges.join(deg, "src")
    nodes = edges.select(F.col("src").alias("node")).distinct()
    init = nodes.withColumn("rank", F.lit(1.0) / F.lit(float(n)))
    base = F.lit(0.15) / F.lit(float(n))

    def step(ranks):
        contribs = (
            ranks.join(edges_deg, ranks["node"] == edges_deg["src"])
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("deg")).cast("decimal(25,18)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("cs"))
        )
        return nodes.join(contribs, "node", "left").select(
            "node",
            (base + F.lit(0.85) * F.coalesce("cs", F.lit(0).cast("decimal(25,18)")).cast("double")).alias("rank"),
        )

    out = {r.node: r.rank for r in iterate_fixed(init, step, 5).collect()}
    edges.unpersist()
    for node, rank in out.items():
        assert abs(rank - 1.0 / n) < 1e-12, (node, rank)


def test_balanced_downsample_keeps_minority_intact(spark):
    """The minority class is never subsampled — it IS the target count;
    every other class lands exactly at that count."""
    from pyspark.sql import Window

    rows = [(i, "big") for i in range(20)] + [(100 + i, "small") for i in range(3)]
    df = spark.createDataFrame(rows, "event_id long, event_type string")
    floor_n = df.groupBy("event_type").count().agg(
        F.min("count").alias("floor_n")
    )
    rk = F.row_number().over(
        Window.partitionBy("event_type").orderBy(
            F.md5(F.concat(F.col("event_id").cast("string"), F.lit(":balance"))),
            F.col("event_id"),
        )
    )
    kept = (
        df.withColumn("rk", rk)
        .crossJoin(F.broadcast(floor_n))
        .filter(F.col("rk") <= F.col("floor_n"))
    )
    got = {r.event_type: r.n for r in kept.groupBy("event_type")
           .agg(F.count("*").alias("n")).collect()}
    assert got == {"big": 3, "small": 3}
    small_ids = {r.event_id for r in kept.filter(F.col("event_type") == "small")
                 .collect()}
    assert small_ids == {100, 101, 102}  # minority rows ALL kept


def test_entropy_hhi_extremes(spark):
    """Uniform 2-way split -> entropy ln(2), HHI 0.5; monolingual ->
    entropy 0, HHI 1 — the analytic extremes of the q191 metrics."""
    import math

    rows = [("u", "en"), ("u", "de"), ("m", "en"), ("m", "en")]
    docs = spark.createDataFrame(rows, "source string, lang string")
    counts = docs.groupBy("source", "lang").agg(F.count("*").alias("n"))
    tot = counts.groupBy("source").agg(F.sum("n").alias("tot"))
    p = F.col("n").cast("double") / F.col("tot")
    got = {
        r.source: (r.entropy, r.hhi)
        for r in counts.join(tot, "source")
        .groupBy("source")
        .agg(
            F.round(F.sum(-p * F.log(p)), 9).alias("entropy"),
            F.round(F.sum(p * p), 9).alias("hhi"),
        )
        .collect()
    }
    assert abs(got["u"][0] - math.log(2)) < 1e-9 and got["u"][1] == 0.5
    assert got["m"] == (-0.0, 1.0) or got["m"] == (0.0, 1.0)


def test_vocab_overlap_identical_sources(spark):
    """Two sources with identical vocabularies score Jaccard 1.0; a
    disjoint third source pairs with neither above threshold."""
    from dbkit_spark.llm.retrieval import tokenize

    rows = [
        ("a", "alpha beta gamma"),
        ("b", "gamma alpha beta beta"),   # same vocab, different tf/order
        ("c", "delta epsilon zeta"),      # disjoint
    ]
    docs = spark.createDataFrame(rows, "source string, text string")
    vocab = tokenize(docs, "text", "source").distinct()
    sizes = vocab.groupBy("source").agg(F.count("*").alias("n"))
    a = vocab.select(F.col("source").alias("sa"), "tok")
    b = vocab.select(F.col("source").alias("sb"), "tok")
    ov = (
        a.join(b, "tok").filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb").agg(F.count("*").alias("inter"))
    )
    sized = (
        ov.join(sizes.select(F.col("source").alias("sa"), F.col("n").alias("na")), "sa")
        .join(sizes.select(F.col("source").alias("sb"), F.col("n").alias("nb")), "sb")
    )
    jac = F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter"))
    got = {(r.sa, r.sb): r.j for r in sized.select("sa", "sb", jac.alias("j")).collect()}
    assert got == {("a", "b"): 1.0}  # c never pairs (zero intersection)


def test_k_anonymity_counts_cells_below_k(spark):
    """Constructed cells: one of size 2 (below k=5, its 2 rows at risk),
    one of size 6 (safe) — the audit reports exactly that."""
    rows = [("en", "s1")] * 2 + [("en", "s2")] * 6
    docs = spark.createDataFrame(rows, "lang string, source string")
    cells = docs.groupBy("lang", "source").agg(F.count("*").alias("n"))
    got = cells.agg(
        F.count("*").alias("n_cells"),
        F.count(F.when(F.col("n") < 5, 1)).alias("below"),
        F.coalesce(F.sum(F.when(F.col("n") < 5, F.col("n"))), F.lit(0)).alias("risk"),
        F.min("n").alias("min_cell"),
    ).collect()[0]
    assert (got.n_cells, got.below, got.risk, got.min_cell) == (2, 1, 2, 2)
