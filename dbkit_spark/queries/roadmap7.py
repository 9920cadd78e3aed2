"""Round-7 catalog queue — WRITTEN AND PRE-VERIFIED in round 6, but NOT
registered: the round-5 verdict froze the catalog at 200 until the
driver's r06 sweep re-greens the stale q01–q41/q72–q82 window (new
queries jump to the front of the never-checked-first rotation and would
displace those slots again).

To land in round 7: move each ``ROADMAP7`` entry to a ``@register``
call (the dict already holds the exact name/oracle/notes triple) in a
module imported by ``catalog.load_all`` — after confirming the r07
window still leads with the remaining stale q42–q50.

``tests/test_catalog.py::test_roadmap7_queue_preverified`` runs every
entry through the same row/schema/hash/dtype compare the driver uses,
so these are green before they ever reach the rotation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import read_table
from .extended5 import _bucket_sql_t

# md5-rule shard expression shared by the oracles below (the engine-wide
# portable hash construction: first 6 hex digits of md5(key || salt)).
def _shard_sql(key_sql: str, salt: str, n: int) -> str:
    return (
        f"CAST(list_sum(list_transform(generate_series(1, 6), i -> "
        f"CAST((strpos('0123456789abcdef', substr(md5(concat({key_sql}, "
        f"'{salt}')), i, 1)) - 1) AS BIGINT) "
        f"* CAST(power(16, 6 - i) AS BIGINT))) AS BIGINT) % {n}"
    )


def q201_ann_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from ..llm.similarity import (
        ann_incremental_pairs,
        load_hyperplane_index_multi,
        save_hyperplane_index_multi,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 100)
    batch = emb.filter(F.col("vec_id") < 100)
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    path = os.path.join(tempfile.gettempdir(), f"dbkit_ann_inc_{sf_tag}")
    # write-once, mtime-stamped (the q144 fixture discipline): the index
    # content is a deterministic function of the corpus, so a fresh
    # marker makes the rewrite a no-op; fixture_once's O_EXCL lock
    # serializes the two-parallel-sessions rewrite race (ADVICE r10)
    from ._fixtures import fixture_once, source_stamp

    fixture_once(
        path,
        source_stamp(sf_dir, "embeddings"),
        lambda: save_hyperplane_index_multi(corpus, path, n_tables=2),
    )
    tables = load_hyperplane_index_multi(spark, path, n_tables=2)
    return ann_incremental_pairs(batch, tables, threshold=0.2)


_Q201_ORACLE = f"""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    bucketed AS (
      SELECT vec_id, v, {_bucket_sql_t(0)} AS b0, {_bucket_sql_t(1)} AS b1
      FROM e
    ),
    cross_pairs AS (
      SELECT q.vec_id AS id_a, c.vec_id AS id_b,
             round(list_cosine_similarity(q.v, c.v), 6) AS cos_sim
      FROM bucketed q JOIN bucketed c
        ON (q.b0 = c.b0 OR q.b1 = c.b1)
      WHERE q.vec_id < 100 AND c.vec_id >= 100
    ),
    in_batch AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
      FROM bucketed a JOIN bucketed b
        ON (a.b0 = b.b0 OR a.b1 = b.b1) AND a.vec_id < b.vec_id
      WHERE a.vec_id < 100 AND b.vec_id < 100
    )
    SELECT DISTINCT id_a, id_b, cos_sim
    FROM (SELECT * FROM cross_pairs UNION ALL SELECT * FROM in_batch)
    WHERE cos_sim >= 0.2
"""

_Q201_NOTES = (
    "INCREMENTAL embedding dedup (llm/similarity.ann_incremental_pairs "
    "— the embedding twin of q78's append-batch lexical dedup): the new "
    "batch is hashed once for all tables and probed against the "
    "PERSISTED multi-table LSH index (q161's save/load round-trip); the "
    "corpus side is pure parquet scans of the precomputed bucket column "
    "— never re-hashed, never corpus x corpus (no-re-hash plan gate in "
    "tests/test_llm.py), so daily-ingest work scales with the batch. "
    "The oracle rebuilds both tables from the md5 rule and unions "
    "batch-vs-corpus with in-batch candidates before the cosine verify"
)


def q202_heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.heavy_hitters import heavy_hitters_batch

    ev = read_table(spark, sf_dir, "events")
    return heavy_hitters_batch(ev, "user_id", capacity=16, n_shards=4).orderBy(
        "shard", "key"
    )


_Q202_ORACLE = f"""
    WITH sharded AS (
      SELECT {_shard_sql("CAST(user_id AS VARCHAR)", ":hh", 4)} AS shard,
             CAST(user_id AS VARCHAR) AS key
      FROM events
    ),
    counts AS (
      SELECT shard, key, COUNT(*) AS cnt FROM sharded GROUP BY shard, key
    ),
    ranked AS (
      SELECT shard, key, cnt,
             ROW_NUMBER() OVER (PARTITION BY shard
                                ORDER BY cnt DESC, key) AS rn,
             CAST(SUM(cnt) OVER (PARTITION BY shard) AS BIGINT) AS n_shard
      FROM counts
    ),
    subs AS (
      SELECT shard, COALESCE(MAX(CASE WHEN rn = 17 THEN cnt END), 0) AS sub
      FROM ranked GROUP BY shard
    )
    SELECT r.shard, r.key, CAST(r.cnt - s.sub AS BIGINT) AS est,
           CAST(s.sub AS BIGINT) AS err, r.n_shard
    FROM ranked r JOIN subs s ON r.shard = s.shard
    WHERE r.cnt - s.sub > 0
    ORDER BY r.shard, r.key
"""

_Q202_NOTES = (
    "approximate HEAVY HITTERS, batch twin of the bounded-state stream "
    "(streaming/heavy_hitters — sharded mergeable Misra-Gries: state "
    "O(n_shards x capacity) forever, est <= true <= est + err, "
    "err <= n_shard/capacity): the order-independent merge-then-trim "
    "kernel makes the one-batch summary fully SQL-expressible — the "
    "oracle reproduces shard assignment by the engine-wide md5 rule, "
    "subtracts the (capacity+1)-th largest count per shard, and keeps "
    "the positive remainders. Single-batch streaming replay is "
    "bit-identical (pinned in tests/test_streaming_extended.py); "
    "multi-batch replays agree within err"
)


def q203_token_packing_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.sampling import pack_by_token_budget

    docs = read_table(spark, sf_dir, "documents")
    return pack_by_token_budget(docs, "doc_id", "n_chars", budget=20000)


_Q203_ORACLE = f"""
    WITH sharded AS (
      SELECT {_shard_sql("CAST(doc_id AS VARCHAR)", ":pack", 64)} AS shard,
             doc_id, n_chars
      FROM documents
    )
    SELECT shard, doc_id, n_chars,
           CAST(floor((SUM(n_chars) OVER (PARTITION BY shard ORDER BY doc_id)
                       - n_chars) / 20000.0) AS BIGINT) AS batch_id
    FROM sharded
"""

_Q203_NOTES = (
    "token packing under the OPERATOR DEFAULT (auto md5 hash shard — "
    "the round-6 scale-default fix: the accidental call form used to "
    "be a corpus-wide single-reducer cumsum): the cumsum window "
    "partitions on the deterministic shard, no SinglePartition "
    "anywhere (plan-gated in tests/test_llm.py); q77 remains the "
    "explicit shard_by=None exactness baseline and q84 the "
    "semantic-shard form. The oracle reproduces the shard digit-for-"
    "digit from the md5 rule"
)


def q204_quantile_bin_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.histogram import quantile_bin

    ev = read_table(spark, sf_dir, "events")
    # rel_err=0 drives the SAME sampled-path plan (GK summary pass ->
    # boundaries broadcast as a literal comparison chain; no sort, no
    # window) but makes the boundaries exact-rank selections, which the
    # oracle reproduces via ceil(p*n) rank arithmetic (r12 rows-only ->
    # oracle conversion; the rank rule was probed at n=3/5/7/8/100/101).
    # The operator DEFAULT (rel_err=0.001) stays the 100 TB path and
    # keeps its >=95% agreement law in tests/test_histogram.py.
    binned = quantile_bin(ev, "value", 8, rel_err=0.0)
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.min("value").cast("double").alias("lo"),
            F.max("value").cast("double").alias("hi"),
        )
        .orderBy("bin")
    )


_Q204_ORACLE = """
    WITH base AS (SELECT value FROM events WHERE value IS NOT NULL),
    tot AS (SELECT COUNT(*) AS n FROM base),
    ranked AS (
      SELECT value, ROW_NUMBER() OVER (ORDER BY value) AS rk FROM base
    ),
    bnds AS (
      SELECT list(r.value ORDER BY g.i) AS bs
      FROM ranked r, tot t, generate_series(1, 7) g(i)
      WHERE r.rk = CAST(ceil(g.i * t.n / 8.0) AS BIGINT)
    ),
    binned AS (
      SELECT value,
             CAST(1 + len(list_filter(bs, x -> value > x)) AS INTEGER)
               AS bin
      FROM base CROSS JOIN bnds
    )
    SELECT bin, COUNT(*) AS n,
           CAST(MIN(value) AS DOUBLE) AS lo,
           CAST(MAX(value) AS DOUBLE) AS hi
    FROM binned GROUP BY bin ORDER BY bin
"""

_Q204_NOTES = (
    "quantile binning through the operator's SAMPLED plan shape "
    "(approxQuantile boundaries broadcast as a literal comparison "
    "chain + map-side assignment, no global sort or single-partition "
    "window — plan-gated in tests/test_histogram.py) pinned at "
    "rel_err=0, where the GK summary returns exact ceil(p*n)-rank "
    "selections that the oracle replays with ROW_NUMBER rank "
    "arithmetic (r12 conversion; rank rule empirically pinned). q184 "
    "keeps the exact-ntile baseline; the default-rel_err >=95% "
    "sampled-vs-exact agreement law stays pytest-pinned"
)


def q205_chunk_custom_tokenizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.chunking import chunk_documents

    docs = read_table(spark, sf_dir, "documents")

    def blocks4(s):
        return [s[i : i + 4] for i in range(0, len(s), 4)]

    return chunk_documents(
        docs, window=6, stride=4, tokenizer=blocks4
    ).orderBy("doc_id", "chunk_id")


_Q205_ORACLE = """
    WITH toks AS (
      SELECT doc_id,
             list_transform(generate_series(1, len(text), 4),
                            i -> substr(text, i, 4)) AS t
      FROM documents
    ),
    base AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0)
    SELECT b.doc_id,
           u.k AS chunk_id,
           len(b.t[u.k*4+1 : u.k*4+6]) AS n_tok,
           array_to_string(b.t[u.k*4+1 : u.k*4+6], ' ') AS chunk_text
    FROM base b,
         UNNEST(generate_series(0,
           CAST(ceil(greatest(b.n - 6, 0) / 4.0) AS BIGINT))) AS u(k)
    ORDER BY doc_id, chunk_id
"""

_Q205_NOTES = (
    "chunking through the PLUGGABLE TOKENIZER boundary (functions/"
    "text.make_tokenizer_udfs routing a custom str->list callable "
    "through an Arrow-batched pandas UDF — the same boundary a real "
    "tiktoken/sentencepiece tokenizer rides): the fixture tokenizer "
    "(4-char blocks) is deliberately SQL-expressible so the DuckDB "
    "oracle validates the UDF crossing itself byte-for-byte, q172's "
    "chunk rule unchanged. The dependency-gated model_tokenizer path "
    "is pytest-covered; regex-default chunking stays all-JVM (q172)"
)


def q206_image_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.multimodal import image_pixel_stats, with_multiformat_image_payload

    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return image_pixel_stats(with_multiformat_image_payload(docs)).orderBy(
        "doc_id"
    )


_Q206_ORACLE = """
    WITH ids AS (
      SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h,
             doc_id % 251 AS seed, doc_id % 4 AS fmt
      FROM documents WHERE doc_id < 200
    ),
    px AS (
      SELECT i.doc_id, i.w, i.h,
             ((i.seed + 31 * x.x + 17 * y.y) % 256) AS v
      FROM ids i,
           UNNEST(generate_series(0, i.w - 1)) AS x(x),
           UNNEST(generate_series(0, i.h - 1)) AS y(y)
    ),
    means AS (
      SELECT doc_id,
             CAST(SUM(v) AS DOUBLE) / (w * h) AS m_v,
             CAST(SUM((v * 7) % 256) AS DOUBLE) / (w * h) AS m_7v,
             CAST(SUM((v * 13) % 256) AS DOUBLE) / (w * h) AS m_13v
      FROM px GROUP BY doc_id, w, h
    )
    SELECT i.doc_id,
           CASE i.fmt WHEN 0 THEN 'bmp' WHEN 1 THEN 'ppm'
                      WHEN 2 THEN 'png' ELSE 'jpeg' END AS img_format,
           CAST(i.w AS INTEGER) AS width,
           CAST(i.h AS INTEGER) AS height,
           CAST(CASE WHEN i.fmt = 3 THEN NULL ELSE 3 END AS INTEGER)
             AS channels,
           CASE i.fmt WHEN 0 THEN m.m_13v WHEN 3 THEN NULL ELSE m.m_v END
             AS mean_r,
           CASE WHEN i.fmt = 3 THEN NULL ELSE m.m_7v END AS mean_g,
           CASE i.fmt WHEN 0 THEN m.m_v WHEN 3 THEN NULL ELSE m.m_13v END
             AS mean_b,
           i.fmt <> 3 AS decoded
    FROM ids i JOIN means m ON i.doc_id = m.doc_id
    ORDER BY i.doc_id
"""

_Q206_NOTES = (
    "FULL-PIXEL image decode through the multimodal boundary (llm/"
    "multimodal.image_pixel_stats over mapInPandas): BMP/PPM/PNG "
    "payloads decode to real pixels with pure stdlib (PNG = zlib "
    "inflate + all-five-filter unfilter, CRC-verified; BMP = bottom-up "
    "BGR→RGB; PPM = P6) and emit exact per-channel means; the JPEG "
    "rows here are HEADER-ONLY payloads, so they exercise the "
    "decoded=false degradation path (real baseline-JPEG decode is "
    "q228's job via llm/jpeg.py). The oracle NEVER touches the bytes: "
    "it recomputes the means analytically from the deterministic pixel "
    "formula (integer sums divided once, so the IEEE result matches "
    "bit-for-bit), independently validating encoder AND decoder; "
    "BMP's channel swap shows up as swapped mean_r/mean_b"
)


def q207_heavy_hitters_stream_replay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..streaming.heavy_hitters import heavy_hitters_stream
    from ..streaming.runner import read_events_stream, run_available_now

    stream = read_events_stream(spark, sf_dir)
    return run_available_now(
        heavy_hitters_stream(stream, "user_id", capacity=16, n_shards=4),
        output_mode="update",
    ).orderBy("shard", "key")


_Q207_NOTES = (
    "STREAMING heavy hitters replay (streaming/heavy_hitters."
    "heavy_hitters_stream over applyInPandasWithState, availableNow "
    "file replay — the q37 determinism discipline): the events fixture "
    "is one file, so the replay is one micro-batch, and the "
    "order-independent merge-then-trim kernel makes the streaming "
    "summary BIT-IDENTICAL to q202's batch twin — hence a full SQL "
    "oracle for a stateful streaming operator (same oracle as q202). "
    "Multi-batch replays stay within the est/err bound "
    "(tests/test_streaming_extended.py); state is O(n_shards x "
    "capacity) regardless of stream length"
)


def q208_chunk_then_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.chunking import chunk_documents
    from ..llm.sampling import pack_by_token_budget

    docs = read_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, window=32, stride=24).select(
        (F.col("doc_id") * 1000 + F.col("chunk_id")).alias("chunk_key"),
        "n_tok",
    )
    return pack_by_token_budget(
        chunks, "chunk_key", "n_tok", budget=512, n_shards=16
    )


_Q208_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS t
      FROM documents
    ),
    base AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
    chunks AS (
      SELECT b.doc_id * 1000 + u.k AS chunk_key,
             len(b.t[u.k*24+1 : u.k*24+32]) AS n_tok
      FROM base b,
           UNNEST(generate_series(0,
             CAST(ceil(greatest(b.n - 32, 0) / 24.0) AS BIGINT))) AS u(k)
    ),
    sharded AS (
      SELECT {_shard_sql("CAST(chunk_key AS VARCHAR)", ":pack", 16)} AS shard,
             chunk_key, n_tok
      FROM chunks
    )
    SELECT shard, chunk_key, n_tok,
           CAST(floor((SUM(n_tok) OVER (PARTITION BY shard ORDER BY chunk_key)
                       - n_tok) / 512.0) AS BIGINT) AS batch_id
    FROM sharded
"""

_Q208_NOTES = (
    "the COMPOSED pre-training pipeline: chunk long docs into "
    "32-token/24-stride windows (q172's map-only rule), then pack the "
    "chunks into 512-token training batches under the auto-shard "
    "default (q203's distributed cumsum) — the chunk→pack composition "
    "every sequence-packing pipeline runs, here as two operators whose "
    "fusion stays one scan + one keyed window (no intermediate "
    "materialization). The oracle composes the two SQL rules verbatim; "
    "chunk_key = doc_id*1000 + chunk_id keeps the packing order "
    "deterministic and portable"
)


_SPANS_CTES = """
    toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS t
      FROM documents
    ),
    base AS (SELECT doc_id, t, len(t) AS m FROM toks WHERE len(t) >= 10),
    grams AS (
      SELECT b.doc_id, u.k AS start,
             array_to_string(b.t[u.k+1 : u.k+10], ' ') AS gram
      FROM base b, UNNEST(generate_series(0, b.m - 10)) AS u(k)
    ),
    dup AS (
      SELECT doc_id, start, start + 10 AS e
      FROM (SELECT doc_id, start,
                   COUNT(*) OVER (PARTITION BY gram) AS cnt FROM grams)
      WHERE cnt >= 2
    ),
    flagged AS (
      SELECT doc_id, start, e,
             CASE WHEN start > COALESCE(MAX(e) OVER (
                    PARTITION BY doc_id ORDER BY start
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS ni
      FROM dup
    ),
    islands AS (
      SELECT doc_id, start, e,
             SUM(ni) OVER (PARTITION BY doc_id ORDER BY start) AS island
      FROM flagged
    ),
    spans AS (
      SELECT doc_id, CAST(MIN(start) AS BIGINT) AS span_start,
             CAST(MAX(e) AS BIGINT) AS span_end
      FROM islands GROUP BY doc_id, island
    )
"""


def q209_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.dedup import duplicated_spans

    # split=True: tokenize + positioned-gram hashing are map-side CPU
    # before the gram-count exchange (A/B at sf0.1: ~1.5 s -> ~1.1 s)
    docs = read_table(spark, sf_dir, "documents", split=True)
    return duplicated_spans(docs, n=10).select(
        "doc_id",
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_end").cast("long").alias("span_end"),
    ).orderBy("doc_id", "span_start")


_Q209_ORACLE = f"""
    WITH {_SPANS_CTES}
    SELECT doc_id, span_start, span_end FROM spans
    ORDER BY doc_id, span_start
"""

_Q209_NOTES = (
    "DUPLICATED-SPAN detection (llm/dedup.duplicated_spans — the "
    "distributed re-expression of suffix-array training-data dedup, "
    "Lee et al.: maximal token spans whose every 10-gram window occurs "
    ">= 2 times corpus-wide, same-doc repeats included): positioned "
    "n-gram windows are a map-side transform+explode, the corpus-wide "
    "count is ONE exchange on the gram (q112's COUNT-window "
    "discipline), and overlapping hits merge to maximal spans via the "
    "q195 running-max island rule — nothing quadratic, nothing "
    "single-partition. Fixpoint + exact-offset semantics pinned in "
    "tests/test_llm.py"
)


def q210_span_scrubbed_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.dedup import remove_duplicated_spans

    # split=True: same gram front end as q209
    docs = read_table(spark, sf_dir, "documents", split=True)
    return remove_duplicated_spans(docs, n=10).orderBy("doc_id")


_Q210_ORACLE = f"""
    WITH {_SPANS_CTES},
    per_doc AS (
      SELECT doc_id,
             array_agg(struct_pack(span_start := span_start,
                                   span_end := span_end)) AS sp
      FROM spans GROUP BY doc_id
    ),
    alltoks AS (SELECT doc_id, t, len(t) AS m FROM toks)
    SELECT a.doc_id,
           COALESCE(array_to_string(
             list_transform(
               list_filter(
                 CASE WHEN a.m = 0 THEN [] ELSE generate_series(0, a.m - 1) END,
                 i -> len(list_filter(COALESCE(p.sp, []),
                          s -> s.span_start <= i AND i < s.span_end)) = 0),
               i -> a.t[i + 1]),
             ' '), '') AS clean_text,
           CAST(a.m AS BIGINT) AS n_tokens,
           CAST(a.m - len(list_filter(
                 CASE WHEN a.m = 0 THEN [] ELSE generate_series(0, a.m - 1) END,
                 i -> len(list_filter(COALESCE(p.sp, []),
                          s -> s.span_start <= i AND i < s.span_end)) = 0))
                AS BIGINT) AS n_removed
    FROM alltoks a LEFT JOIN per_doc p USING (doc_id)
    ORDER BY a.doc_id
"""

_Q210_NOTES = (
    "span-SCRUBBED corpus (llm/dedup.remove_duplicated_spans): every "
    "duplicated span cut from every occurrence — the deterministic "
    "boilerplate-scrub mode (keep-one-copy is whole-doc cluster "
    "logic, dedup_survivors' job). The cut is a JVM higher-order "
    "index-filter over the token array against the doc's few merged "
    "spans (doc-keyed join-back, no Python, no extra shuffle); "
    "re-running on the output finds zero spans (fixpoint pytest)"
)


def q211_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.dedup import minhash_near_dup_pairs
    from ..llm.sampling import leakage_safe_split

    docs = read_table(spark, sf_dir, "documents")
    pairs = minhash_near_dup_pairs(docs, threshold=0.5)
    return leakage_safe_split(
        docs, pairs, {"train": 0.8, "val": 0.1, "test": 0.1}
    ).select("doc_id", "cluster_id", "split").orderBy("doc_id")


def _q211_oracle() -> str:
    from .llm import _REACH_CTES

    return f"""
    WITH RECURSIVE {_REACH_CTES},
    clusters AS (
      SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id
    ),
    bucketed AS (
      SELECT doc_id, cluster_id,
             CAST(list_sum(list_transform(generate_series(1, 6), i ->
               CAST((strpos('0123456789abcdef', substr(md5(concat(
                 CAST(cluster_id AS VARCHAR), ':split')), i, 1)) - 1)
                 AS BIGINT)
               * CAST(power(16, 6 - i) AS BIGINT))) AS BIGINT) % 10000 AS b
      FROM clusters
    )
    SELECT doc_id, cluster_id,
           CASE WHEN b < 8000 THEN 'train'
                WHEN b < 9000 THEN 'val'
                ELSE 'test' END AS split
    FROM bucketed
    ORDER BY doc_id
"""


def q213_reconcile_row_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.reconcile import (
        bucket_summary,
        reconcile_buckets,
        reconcile_rows,
        row_fingerprint,
    )

    ev = read_table(spark, sf_dir, "events")
    fp_cols = [F.col("event_id"), F.col("user_id"), F.col("event_type")]
    replica = ev.filter(F.col("event_id") % 1009 != 0).withColumn(
        "event_type",
        F.when(F.col("event_id") % 997 == 0, F.lit("TAMPERED")).otherwise(
            F.col("event_type")
        ),
    )
    left = bucket_summary(ev, F.col("event_id"), row_fingerprint(fp_cols), 256)
    right = bucket_summary(
        replica, F.col("event_id"), row_fingerprint(fp_cols), 256
    )
    damaged = reconcile_buckets(left, right)
    return reconcile_rows(
        ev, replica, F.col("event_id"), row_fingerprint(fp_cols), damaged, 256
    ).orderBy("bucket", "key")


def _q213_oracle() -> str:
    from .extended6 import _RECON_FP_SQL

    canon = (
        "md5(concat_ws('|', COALESCE(CAST(event_id AS VARCHAR), '␀'), "
        "COALESCE(CAST(user_id AS VARCHAR), '␀'), "
        "COALESCE(event_type, '␀')))"
    )
    rcanon = (
        "md5(concat_ws('|', COALESCE(CAST(event_id AS VARCHAR), '␀'), "
        "COALESCE(CAST(user_id AS VARCHAR), '␀'), "
        "COALESCE(CASE WHEN event_id % 997 = 0 THEN 'TAMPERED' "
        "ELSE event_type END, '␀')))"
    )
    return f"""
    WITH lfp AS (
      SELECT event_id % 256 AS bucket, event_id AS key, {_RECON_FP_SQL} AS fp
      FROM (SELECT event_id, {canon} AS h FROM events)
    ),
    rfp AS (
      SELECT event_id % 256 AS bucket, event_id AS key, {_RECON_FP_SQL} AS fp
      FROM (SELECT event_id, {rcanon} AS h FROM events
            WHERE event_id % 1009 <> 0)
    ),
    lsum AS (
      SELECT bucket, COUNT(*) AS cnt,
             SUM(CAST(fp AS DECIMAL(38,0))) AS checksum
      FROM lfp GROUP BY bucket
    ),
    rsum AS (
      SELECT bucket, COUNT(*) AS cnt,
             SUM(CAST(fp AS DECIMAL(38,0))) AS checksum
      FROM rfp GROUP BY bucket
    ),
    damaged AS (
      SELECT COALESCE(l.bucket, r.bucket) AS bucket
      FROM lsum l FULL OUTER JOIN rsum r ON l.bucket = r.bucket
      WHERE COALESCE(l.cnt, 0) <> COALESCE(r.cnt, 0)
         OR COALESCE(l.checksum, CAST(0 AS DECIMAL(38,0)))
            <> COALESCE(r.checksum, CAST(0 AS DECIMAL(38,0)))
    )
    SELECT COALESCE(l.bucket, r.bucket) AS bucket,
           COALESCE(l.key, r.key) AS key,
           CASE WHEN r.fp IS NULL THEN 'missing_right'
                WHEN l.fp IS NULL THEN 'missing_left'
                ELSE 'changed' END AS status
    FROM (SELECT * FROM lfp WHERE bucket IN (SELECT bucket FROM damaged)) l
    FULL OUTER JOIN
         (SELECT * FROM rfp WHERE bucket IN (SELECT bucket FROM damaged)) r
      ON l.bucket = r.bucket AND l.key = r.key
    WHERE r.fp IS NULL OR l.fp IS NULL OR l.fp <> r.fp
    ORDER BY bucket, key
"""


_Q213_NOTES = (
    "STAGE-2 row-level reconciliation (operators/reconcile."
    "reconcile_rows — completing q175's anti-entropy story: stage 1 "
    "localizes damage to K of 256 buckets by (count, DECIMAL checksum); "
    "stage 2 row-diffs ONLY those buckets via a broadcast semi-join "
    "filter that rides the scan, then a keyed full-outer within the "
    "damaged slice — at 100 TB the expensive row join touches "
    "~K/n_buckets of the table instead of all of it). Emits "
    "(bucket, key, missing_left/missing_right/changed); the oracle "
    "reproduces BOTH stages from the portable md5 fingerprint rule"
)


def q212_quantile_bin_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.histogram import quantile_bin_grouped

    ev = read_table(spark, sf_dir, "events")
    # accuracy >> any fixture group size pins percentile_approx's GK
    # rank error below one row, so each group's boundaries are exact
    # ceil(p*n_g)-rank selections the oracle replays per group (r12
    # rows-only -> oracle conversion, same rank rule as q204). The
    # operator default (accuracy=10_000) remains the 100 TB path.
    binned = quantile_bin_grouped(
        ev, "value", 4, ["event_type"], accuracy=100_000_000
    )
    return (
        binned.groupBy("event_type", "bin")
        .agg(
            F.count("*").alias("n"),
            F.min("value").cast("double").alias("lo"),
            F.max("value").cast("double").alias("hi"),
        )
        .orderBy("event_type", "bin")
    )


_Q212_ORACLE = """
    WITH base AS (
      SELECT event_type, value FROM events WHERE value IS NOT NULL
    ),
    ranked AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value)
               AS rk,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM base
    ),
    bnds AS (
      SELECT event_type, list(r.value ORDER BY g.i) AS bs
      FROM ranked r, generate_series(1, 3) g(i)
      WHERE r.rk = CAST(ceil(g.i * r.n / 4.0) AS BIGINT)
      GROUP BY event_type
    ),
    binned AS (
      SELECT b.event_type, b.value,
             CAST(1 + len(list_filter(bs, x -> b.value > x)) AS INTEGER)
               AS bin
      FROM base b JOIN bnds USING (event_type)
    )
    SELECT event_type, bin, COUNT(*) AS n,
           CAST(MIN(value) AS DOUBLE) AS lo,
           CAST(MAX(value) AS DOUBLE) AS hi
    FROM binned GROUP BY event_type, bin ORDER BY event_type, bin
"""

_Q212_NOTES = (
    "PER-GROUP equi-depth binning (operators/histogram."
    "quantile_bin_grouped — per-event-type boundaries from "
    "percentile_approx as a real map-side-combined AGGREGATE, "
    "group-count-sized boundary table broadcast back, map-side "
    "higher-order bin assignment; no window over the fact table, no "
    "driver collect, no single partition), pinned at accuracy >> "
    "fixture group sizes so the GK boundaries are exact ceil(p*n_g) "
    "rank selections replayed by the oracle's partitioned ROW_NUMBER "
    "(r12 conversion; rank rule shared with q204). Per-group bin laws "
    "(own boundaries per group, near-equal populations, monotone bins, "
    "broadcast plan) stay pinned in tests/test_histogram.py"
)


_Q211_NOTES = (
    "LEAKAGE-SAFE train/val/test split (llm/sampling.leakage_safe_split "
    "— the eval-contamination control every training pipeline needs): "
    "the md5 hash split keys on the doc's DEDUP CLUSTER id (same "
    "connected components as q87), so near-duplicate docs can never "
    "straddle the train/test fence — structurally, not statistically. "
    "A pytest demonstrates the naive doc_id split leaking clusters on "
    "the same fixture. Cost over split_assign: the CC fixpoint, "
    "O(edges)/round"
)


def q216_scd2_point_in_time_enrich(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.timeseries import enrich_with_scd2, scd2_history

    ev = read_table(spark, sf_dir, "events")
    dim = scd2_history(ev, "user_id", ["event_type"], "ts", tiebreak="event_id")
    return enrich_with_scd2(
        ev.select("event_id", "user_id", "ts"),
        dim,
        "user_id",
        "ts",
        state_prefix="state_",
    ).select("event_id", "user_id", "state_event_type", "version").orderBy(
        "event_id"
    )


_Q216_ORACLE = """
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ), changes AS (
      SELECT user_id, event_type, ts, event_id
      FROM ordered
      WHERE prev IS NULL OR event_type <> prev
    ), dim AS (
      SELECT user_id, event_type,
             ts AS valid_from,
             lead(ts) OVER w AS valid_to,
             row_number() OVER w AS version
      FROM changes
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT e.event_id, e.user_id,
           d.event_type AS state_event_type,
           CAST(d.version AS BIGINT) AS version
    FROM events e LEFT JOIN dim d
      ON e.user_id = d.user_id
     AND d.valid_from <= e.ts
     AND (d.valid_to IS NULL OR e.ts < d.valid_to)
    ORDER BY e.event_id
"""

_Q216_NOTES = (
    "SCD2 POINT-IN-TIME enrichment (operators/timeseries."
    "enrich_with_scd2 over the q102 scd2_history dim): each event "
    "left-joins the dimension version valid AT its event time "
    "(valid_from <= ts < valid_to; boundary events take the NEW "
    "version; SCD2 intervals partition time so the join never fans "
    "out — row count preserved). Equi-join on the key with the "
    "interval as a residual — hash join, never NLJ; the events side "
    "runs unchanged as a STREAM (stream-static enrichment, parity "
    "pinned in tests/test_timeseries.py)"
)


def q215_streaming_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..schema import TABLE_SCHEMAS
    from ..streaming.ingest_dedup import run_dedup_ingest

    stream = (
        spark.readStream.schema(TABLE_SCHEMAS["documents"])
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .select("doc_id", "text")
    )
    state = tempfile.mkdtemp(prefix="dbkit_ingest_")
    corpus = run_dedup_ingest(stream, state, threshold=0.5)
    return corpus.select("doc_id").orderBy("doc_id")


def _q215_oracle() -> str:
    from .llm import _REACH_CTES

    return f"""
    WITH RECURSIVE {_REACH_CTES}
    SELECT doc_id FROM documents
    WHERE doc_id IN (SELECT id FROM reach GROUP BY id HAVING MIN(r) = id)
    ORDER BY doc_id
"""


_Q215_NOTES = (
    "STREAMING DEDUP INGEST end-to-end (streaming/ingest_dedup."
    "run_dedup_ingest — the production corpus-building loop: each "
    "micro-batch is admitted only where it near-dups nothing already "
    "admitted; first-arrival wins across batches, min-id within one; "
    "state = append-only docs/shingles/bands parquet tables, work per "
    "batch ∝ batch via the persisted band index). The documents "
    "fixture replays as ONE micro-batch, where the admitted set "
    "provably equals batch dedup_survivors — hence the q88-style "
    "recursive-reachability oracle; multi-batch first-arrival parity, "
    "index integrity, and content-idempotence are pinned in "
    "tests/test_streaming_extended.py"
)


def q214_join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import skew_profile

    li = read_table(spark, sf_dir, "lineitem")
    return skew_profile(li, ["l_suppkey"], top=20)


_Q214_ORACLE = """
    WITH counts AS (
      SELECT l_suppkey, COUNT(*) AS n FROM lineitem GROUP BY l_suppkey
    ),
    summary AS (
      SELECT COUNT(*) AS n_keys, CAST(SUM(n) AS BIGINT) AS n_rows,
             MAX(n) AS max_n
      FROM counts
    )
    SELECT c.l_suppkey, c.n,
           round(CAST(c.n AS DOUBLE) / s.n_rows, 6) AS share,
           round(CAST(s.max_n AS DOUBLE)
                 / (CAST(s.n_rows AS DOUBLE) / s.n_keys), 6) AS skew_factor,
           s.n_keys, s.n_rows
    FROM counts c, summary s
    ORDER BY c.n DESC, c.l_suppkey ASC
    LIMIT 20
"""

_Q214_NOTES = (
    "JOIN-KEY SKEW PROFILE (operators/profile.skew_profile — the "
    "diagnosis that tells a pipeline when the q64 salted join is "
    "needed and what salt factor to use): top-k heaviest keys with "
    "share and skew_factor = max/mean key count, from ONE count "
    "aggregation + a broadcast 1-row summary + a TakeOrderedAndProject "
    "cut (plan-gated: no full sort, no collect). At 100 TB this costs "
    "one shuffle of (key, count) partials — the same partial-combine "
    "any groupBy pays"
)


def q217_containment_relative_cap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..llm.dedup import containment_pairs

    docs = read_table(spark, sf_dir, "documents")
    pairs = containment_pairs(
        docs, threshold=0.5, max_df=10, max_df_frac=0.05
    )
    return pairs.select(
        "contained",
        "container",
        F.round("containment", 6).alias("containment"),
    ).orderBy("contained", "container")


_Q217_ORACLE = """
    WITH toksq AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS t
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(t)-2),
               i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS shingles
      FROM toksq WHERE len(t) >= 3
    ),
    cap AS (
      SELECT GREATEST(10, CAST(ceil(0.05 * COUNT(*)) AS BIGINT)) AS c
      FROM sh
    ),
    inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    capped AS (
      SELECT doc_id, shingle FROM (
        SELECT doc_id, shingle,
               COUNT(*) OVER (PARTITION BY shingle) AS df
        FROM inv
      ) WHERE df <= (SELECT c FROM cap)
    ),
    ov AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS ov
      FROM capped a JOIN capped b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY doc_a, doc_b
    ),
    sz AS (SELECT doc_id, len(shingles) AS n FROM sh),
    both_dirs AS (
      SELECT o.doc_a AS contained, o.doc_b AS container,
             CAST(o.ov AS DOUBLE) / sa.n AS containment
      FROM ov o JOIN sz sa ON sa.doc_id = o.doc_a
      UNION ALL
      SELECT o.doc_b AS contained, o.doc_a AS container,
             CAST(o.ov AS DOUBLE) / sb.n AS containment
      FROM ov o JOIN sz sb ON sb.doc_id = o.doc_b
    )
    SELECT contained, container, ROUND(containment, 6) AS containment
    FROM both_dirs WHERE containment >= 0.5
    ORDER BY contained, container
"""

_Q217_NOTES = (
    "containment dedup under the CORPUS-RELATIVE df cap (llm/dedup."
    "containment_pairs max_df_frac, the round-6 fix for the verdict's "
    "observation that a fixed absolute stop-shingle cap tuned at "
    "fixture scale is too aggressive at 10^10 docs): effective cap = "
    "max(absolute, ceil(frac x n_docs)) for one metadata-sized count, "
    "so the stop-shingle semantics stay proportional as the corpus "
    "grows — the oracle computes the identical cap from its own "
    "COUNT(*) scalar subquery, making the query scale-covariant "
    "(different caps at sf0.01 vs sf0.1, same rule)"
)


# name -> (fn, oracle_sql_or_None, notes) — exactly the @register triple.
ROADMAP7 = {
    "q201_ann_incremental_dedup": (q201_ann_incremental_dedup, _Q201_ORACLE, _Q201_NOTES),
    "q202_heavy_hitters_mg": (q202_heavy_hitters_mg, _Q202_ORACLE, _Q202_NOTES),
    "q203_token_packing_auto": (q203_token_packing_auto, _Q203_ORACLE, _Q203_NOTES),
    "q204_quantile_bin_sampled": (q204_quantile_bin_sampled, _Q204_ORACLE, _Q204_NOTES),
    "q205_chunk_custom_tokenizer": (q205_chunk_custom_tokenizer, _Q205_ORACLE, _Q205_NOTES),
    "q206_image_pixel_stats": (q206_image_pixel_stats, _Q206_ORACLE, _Q206_NOTES),
    "q207_heavy_hitters_stream_replay": (
        q207_heavy_hitters_stream_replay,
        _Q202_ORACLE,
        _Q207_NOTES,
    ),
    "q208_chunk_then_pack": (q208_chunk_then_pack, _Q208_ORACLE, _Q208_NOTES),
    "q209_duplicated_spans": (q209_duplicated_spans, _Q209_ORACLE, _Q209_NOTES),
    "q210_span_scrubbed_corpus": (
        q210_span_scrubbed_corpus,
        _Q210_ORACLE,
        _Q210_NOTES,
    ),
    "q211_leakage_safe_split": (
        q211_leakage_safe_split,
        _q211_oracle(),
        _Q211_NOTES,
    ),
    "q212_quantile_bin_grouped": (
        q212_quantile_bin_grouped,
        _Q212_ORACLE,
        _Q212_NOTES,
    ),
    "q213_reconcile_row_diff": (
        q213_reconcile_row_diff,
        _q213_oracle(),
        _Q213_NOTES,
    ),
    "q214_join_key_skew_profile": (
        q214_join_key_skew_profile,
        _Q214_ORACLE,
        _Q214_NOTES,
    ),
    "q215_streaming_dedup_ingest": (
        q215_streaming_dedup_ingest,
        _q215_oracle(),
        _Q215_NOTES,
    ),
    "q216_scd2_point_in_time_enrich": (
        q216_scd2_point_in_time_enrich,
        _Q216_ORACLE,
        _Q216_NOTES,
    ),
    "q217_containment_relative_cap": (
        q217_containment_relative_cap,
        _Q217_ORACLE,
        _Q217_NOTES,
    ),
}


# --- round-7 additions (written during the continued freeze) -----------------


def q218_grouped_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mlmetrics import auc_by_group

    ev = read_table(spark, sf_dir, "events")
    base = ev.select(
        (F.col("user_id") % 8).alias("cohort"),
        F.when(F.col("event_type").isin("purchase", "signup"), 1)
        .otherwise(0)
        .alias("label"),
        F.col("value"),
    )
    return auc_by_group(base, ["cohort"], "label", "value").orderBy("cohort")


_Q218_ORACLE = """
    WITH base AS (
      SELECT user_id % 8 AS cohort,
             CASE WHEN event_type IN ('purchase', 'signup') THEN 1 ELSE 0 END AS y,
             value
      FROM events WHERE value IS NOT NULL
    ),
    ranked AS (
      SELECT cohort, y,
             RANK() OVER (PARTITION BY cohort ORDER BY value)
               + (COUNT(*) OVER (PARTITION BY cohort, value) - 1) / 2.0 AS ar
      FROM base
    ),
    agg AS (
      SELECT cohort,
             CAST(SUM(CASE WHEN y = 1 THEN CAST(ar AS DECIMAL(25,1)) END)
                  AS DOUBLE) AS rpos,
             CAST(COUNT(CASE WHEN y = 1 THEN 1 END) AS BIGINT) AS n_pos,
             CAST(COUNT(CASE WHEN y = 0 THEN 1 END) AS BIGINT) AS n_neg
      FROM ranked GROUP BY cohort
    )
    SELECT cohort, n_pos, n_neg,
           (rpos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg) AS auc
    FROM agg WHERE n_pos > 0 AND n_neg > 0
    ORDER BY cohort
"""

_Q218_NOTES = (
    "exact grouped ROC-AUC (operators/mlmetrics.auc_by_group — "
    "distributed model evaluation as a data job): Mann-Whitney rank-sum "
    "identity with the textbook average-rank tie correction, computed "
    "in ONE window (rank + tie count share a single sort via a RANGE "
    "CURRENT ROW frame) and the grouped agg reuses its partitioning — "
    "ONE exchange total, plan-gated. Average ranks "
    "are multiples of 0.5 carried as DECIMAL(25,1), so the rank-sum is "
    "order-independent and the final AUC is one IEEE division of exact "
    "operands — engine-exact WITHOUT rounding. The sort-free 100 TB "
    "path (auc_by_group_binned, histogram concordance) is pinned to "
    "this exact result within 1/n_bins by tests/test_round7.py"
)


def q219_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import canonical_edges, triangle_stats

    ev = read_table(spark, sf_dir, "events")
    pairs = ev.select(
        (F.col("user_id") % 997).alias("src"),
        (F.col("event_id") % 997).alias("dst"),
    )
    return triangle_stats(canonical_edges(pairs, "src", "dst"))


_Q219_ORACLE = """
    WITH base AS (
      SELECT DISTINCT LEAST(user_id % 997, event_id % 997) AS a,
                      GREATEST(user_id % 997, event_id % 997) AS b
      FROM events
      WHERE user_id % 997 <> event_id % 997
    ),
    deg AS (
      SELECT node, COUNT(*) AS deg FROM (
        SELECT a AS node FROM base UNION ALL SELECT b AS node FROM base
      ) GROUP BY node
    ),
    tri AS (
      SELECT COUNT(*) AS c
      FROM base e1
      JOIN base e2 ON e2.a = e1.b
      JOIN base e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM base) AS n_edges,
           (SELECT CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) FROM deg)
             AS n_wedges,
           (SELECT CAST(c AS BIGINT) FROM tri) AS n_triangles,
           round(3.0 * (SELECT c FROM tri)
                 / (SELECT SUM(deg * (deg - 1) // 2) FROM deg), 6)
             AS clustering
"""

_Q219_NOTES = (
    "TRIANGLE CENSUS + global clustering coefficient (operators/graph."
    "triangle_stats — the join-shaped graph kernel complementing the "
    "iterate family's PageRank/CC): edges are DEGREE-ORIENTED (lower "
    "(deg,id) -> higher), an acyclic orientation that counts each "
    "triangle exactly once at its apex and bounds the wedge self-join "
    "to O(m^1.5) — the node-iterator++ bound — where id-ordering alone "
    "blows up on hub nodes. Wedges are an exact-BIGINT degree-table "
    "reduction; the three 1-row stats meet in broadcast cross joins "
    "(no driver collect). The oracle counts the same triangles by the "
    "naive canonical 3-way self-join — orientation invariance is the "
    "cross-check, plus a K4/K5 closed-form pytest"
)


def q220_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cardinality import join_size_estimate

    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    est = join_size_estimate(orders, li, "o_orderkey", "l_orderkey", hex_zeros=1)
    exact = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .agg(F.count("*").cast("long").alias("exact_pairs"))
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "sampled_pairs",
        "est_pairs",
        "exact_pairs",
        F.round(
            (F.col("est_pairs") - F.col("exact_pairs")) / F.col("exact_pairs"), 4
        ).alias("rel_err"),
    )


_Q220_ORACLE = """
    WITH ls AS (
      SELECT o_orderkey AS k FROM orders
      WHERE substr(md5(concat(CAST(o_orderkey AS VARCHAR), ':jcard')), 1, 1)
            = '0'
    ),
    rs AS (
      SELECT l_orderkey AS k FROM lineitem
      WHERE substr(md5(concat(CAST(l_orderkey AS VARCHAR), ':jcard')), 1, 1)
            = '0'
    ),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS sampled_pairs
          FROM ls JOIN rs USING (k)),
    x AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_pairs
          FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey)
    SELECT sampled_pairs,
           CAST(sampled_pairs * 16 AS BIGINT) AS est_pairs,
           exact_pairs,
           round((sampled_pairs * 16 - exact_pairs) / exact_pairs, 4) AS rel_err
    FROM s CROSS JOIN x
"""

_Q220_NOTES = (
    "sketch-based JOIN-SIZE ESTIMATION (operators/cardinality."
    "join_size_estimate — the optimizer primitive that answers 'how "
    "big is this join' before paying for it): KEY-HASH Bernoulli(1/16) "
    "sampling by the engine-wide md5 rule keeps a key's FULL "
    "contribution or none — unbiased for sum_k l(k)*o(k), unlike "
    "row-sampling whose p^2 pair survival has huge variance on heavy "
    "keys. Cost: two map-side filters + a sample-sized join; the "
    "16x-scaled count is the estimate. The full join here exists only "
    "to expose rel_err for the oracle — at 100 TB it is exactly the "
    "thing the estimate avoids; accuracy is additionally pinned by a "
    "pytest tolerance band"
)


def q221_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.sampling import temperature_sample

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        temperature_sample(docs, "source", "doc_id", alpha=0.5, total_frac=0.5)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


_Q221_ORACLE = """
    WITH counts AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
    w AS (
      SELECT source, n,
             CAST(round(sqrt(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS w
      FROM counts
    ),
    tot AS (
      SELECT CAST(SUM(w) AS BIGINT) AS big_w,
             CAST(floor(SUM(n) * 0.5) AS BIGINT) AS t_total
      FROM w
    ),
    takes AS (
      SELECT source, (tot.t_total * w.w) // tot.big_w AS take
      FROM w CROSS JOIN tot
    ),
    ranked AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(concat(CAST(doc_id AS VARCHAR), ':temp')), doc_id
             ) AS rn
      FROM documents
    )
    SELECT r.doc_id, r.source
    FROM ranked r JOIN takes t ON r.source = t.source
    WHERE r.rn <= t.take
    ORDER BY r.doc_id
"""

_Q221_NOTES = (
    "TEMPERATURE-scaled domain mixing (llm/sampling.temperature_sample "
    "— the n^alpha multilingual/multi-source LM mixing recipe, "
    "alpha=0.5: rare domains upweighted relative to corpus share, one "
    "dial instead of q91's explicit target shares): take counts are "
    "pure INTEGER arithmetic — w_d = round(sqrt(n_d)*1e6) BIGINT "
    "(sqrt is IEEE-correctly-rounded, hence engine-identical; pow is "
    "not, so cross-engine exactness is pinned to alpha=0.5), "
    "t_d = (T*w_d) DIV sum(w) — and winners are md5-rank selected per "
    "domain (the q174 quota rule). One metadata-sized count agg + "
    "broadcast takes + one window shuffle; membership is engine-exact, "
    "reproducible under repartitioning and appends"
)


def q222_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    cells = docs.groupBy(
        "lang",
        F.floor(F.col("n_chars") / F.lit(500.0)).cast("long").alias("size_bucket"),
    ).agg(
        F.countDistinct("source").alias("diversity"),
        F.count("*").alias("n"),
    )
    return cells.agg(
        F.count("*").cast("long").alias("n_cells"),
        F.sum(F.when(F.col("diversity") < 3, 1).otherwise(0))
        .cast("long")
        .alias("cells_below_l"),
        F.coalesce(F.sum(F.when(F.col("diversity") < 3, F.col("n"))), F.lit(0))
        .cast("long")
        .alias("rows_at_risk"),
        F.min("diversity").cast("long").alias("min_diversity"),
    )


_Q222_ORACLE = """
    WITH cells AS (
      SELECT lang, CAST(floor(n_chars / 500.0) AS BIGINT) AS size_bucket,
             COUNT(DISTINCT source) AS diversity, COUNT(*) AS n
      FROM documents GROUP BY lang, size_bucket
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(COUNT(CASE WHEN diversity < 3 THEN 1 END) AS BIGINT)
             AS cells_below_l,
           CAST(COALESCE(SUM(CASE WHEN diversity < 3 THEN n END), 0) AS BIGINT)
             AS rows_at_risk,
           CAST(MIN(diversity) AS BIGINT) AS min_diversity
    FROM cells
"""

_Q222_NOTES = (
    "L-DIVERSITY audit — q197 k-anonymity's companion (k-anonymity "
    "bounds cell SIZE; a large cell whose members all share one "
    "sensitive value still leaks it — l-diversity requires >= l "
    "DISTINCT sensitive values per quasi-identifier cell): distinct "
    "sources per (lang, size-bucket) cell, reduced to the O(cells) "
    "summary (cells below l=3, rows at risk, the dataset's actual l). "
    "COUNT DISTINCT inside a grouped agg = Spark's two-phase "
    "partial-distinct expansion, map-side combinable; floor() is "
    "explicit on both engines (the q197 DuckDB-rounds-Spark-truncates "
    "cast trap)"
)


def q223_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.drift import psi_report, quantile_edges_exact

    ev = read_table(spark, sf_dir, "events")
    ref = ev.filter(
        F.col("event_type").isin("view", "click") & F.col("value").isNotNull()
    ).select("event_id", "value")
    cur = ev.filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select("event_id", "value")
    edges = quantile_edges_exact(ref, "value", 10, "event_id")
    return psi_report(ref, cur, "value", k=10, edges=edges).orderBy("bucket")


_Q223_ORACLE = """
    WITH ref AS (
      SELECT event_id, value FROM events
      WHERE event_type IN ('view', 'click') AND value IS NOT NULL
    ),
    cur AS (
      SELECT event_id, value FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL
    ),
    nref AS (SELECT COUNT(*) AS n FROM ref),
    ranked AS (
      SELECT value, ROW_NUMBER() OVER (ORDER BY value, event_id) AS rn FROM ref
    ),
    edges AS (
      SELECT value AS edge FROM ranked
      WHERE rn IN (SELECT (i * n + 9) // 10
                   FROM generate_series(1, 9) t(i) CROSS JOIN nref)
    ),
    rb AS (
      SELECT r.event_id,
             COUNT(CASE WHEN e.edge < r.value THEN 1 END) AS bucket
      FROM ref r CROSS JOIN edges e GROUP BY r.event_id
    ),
    cb AS (
      SELECT c.event_id,
             COUNT(CASE WHEN e.edge < c.value THEN 1 END) AS bucket
      FROM cur c CROSS JOIN edges e GROUP BY c.event_id
    ),
    rc AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_ref FROM rb GROUP BY bucket),
    cc AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_cur FROM cb GROUP BY bucket),
    j AS (
      SELECT COALESCE(rc.bucket, cc.bucket) AS bucket,
             COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur
      FROM rc FULL OUTER JOIN cc ON rc.bucket = cc.bucket
    ),
    tot AS (SELECT SUM(n_ref) AS tr, SUM(n_cur) AS tc FROM j),
    p AS (
      SELECT bucket, n_ref, n_cur,
             GREATEST(n_ref / tr, 0.000001) AS pr,
             GREATEST(n_cur / tc, 0.000001) AS pc
      FROM j CROSS JOIN tot
    ),
    pb AS (
      SELECT CAST(bucket AS INTEGER) AS bucket, n_ref, n_cur,
             round(pr, 6) AS p_ref, round(pc, 6) AS p_cur,
             round((pr - pc) * ln(pr / pc), 6) AS contrib
      FROM p
    )
    SELECT bucket, n_ref, n_cur, p_ref, p_cur, contrib,
           (SELECT round(SUM(contrib), 6) FROM pb) AS psi
    FROM pb ORDER BY bucket
"""

_Q223_NOTES = (
    "PSI DISTRIBUTION-DRIFT monitor (operators/drift.psi_report — the "
    "'did this week's crawl shift?' gate: reference period bucketed "
    "into equal-mass quantile bins, current period's mass measured "
    "against them, reduced to sum((p-q)*ln(p/q)) with the standard "
    "<0.1/0.25 bands): the k-1 edges are metadata-sized, so bucketing "
    "is a MAP-ONLY literal bisection chain (q79 sampled-boundaries "
    "discipline — no join, codegen'd) + one k-row agg per side. "
    "psi_report's DEFAULT edge grid is approxQuantile (bounded-memory "
    "GK, no global sort — the q184->q204 default-routing rule); this "
    "query passes exact rank-selected edges so the DuckDB oracle "
    "reproduces the grid digit-for-digit. Here ref=view/click spend vs "
    "cur=purchase spend — a real shift, PSI lands well above the 0.25 "
    "alarm band"
)


def q224_returns_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.aggregate import dec

    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    rets = (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_custkey")
        .agg(
            F.sum(
                dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
            ).alias("ret_dec")
        )
    )
    withnat = (
        rets.join(cust, rets["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .select("c_custkey", "n_name", "ret_dec")
    )
    w = Window.partitionBy("n_name")
    out = withnat.select(
        "c_custkey",
        "n_name",
        F.col("ret_dec").cast("double").alias("return_total"),
        (
            F.sum("ret_dec").over(w).cast("double") / F.count("*").over(w)
        ).alias("nation_avg"),
    )
    return out.filter(
        F.col("return_total") > F.lit(1.2) * F.col("nation_avg")
    ).orderBy("c_custkey")


_Q224_ORACLE = """
    WITH rets AS (
      SELECT o.o_custkey AS custkey,
             SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                      AS DECIMAL(25,4))) AS ret_dec
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_returnflag = 'R'
      GROUP BY o.o_custkey
    ),
    withnat AS (
      SELECT c.c_custkey, n.n_name, r.ret_dec
      FROM rets r
      JOIN customer c ON r.custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
    ),
    winavg AS (
      SELECT c_custkey, n_name, CAST(ret_dec AS DOUBLE) AS return_total,
             CAST(SUM(ret_dec) OVER (PARTITION BY n_name) AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY n_name) AS nation_avg
      FROM withnat
    )
    SELECT c_custkey, n_name, return_total, nation_avg
    FROM winavg WHERE return_total > 1.2 * nation_avg
    ORDER BY c_custkey
"""

_Q224_NOTES = (
    "TPC-DS Q1 SHAPE (customers whose return total exceeds 1.2x their "
    "nation's average — the correlated-subquery-against-group-average "
    "pattern, decorrelated into a window average so the returns "
    "aggregate is computed ONCE): returned lineitems -> per-customer "
    "decimal-exact sum -> broadcast nation join -> per-nation window "
    "avg (exact decimal window sum / count, one IEEE division — "
    "engine-identical without rounding) -> threshold filter. "
    "Complements the 22 covered TPC-H shapes with the TPC-DS "
    "flagship's plan shape; per-nation window partitions are "
    "customer-sized, shuffled once on n_name"
)


ROADMAP7.update(
    {
        "q218_grouped_auc": (q218_grouped_auc, _Q218_ORACLE, _Q218_NOTES),
        "q219_triangle_count": (q219_triangle_count, _Q219_ORACLE, _Q219_NOTES),
        "q220_join_size_estimate": (
            q220_join_size_estimate,
            _Q220_ORACLE,
            _Q220_NOTES,
        ),
        "q221_temperature_mix": (q221_temperature_mix, _Q221_ORACLE, _Q221_NOTES),
        "q222_l_diversity": (q222_l_diversity, _Q222_ORACLE, _Q222_NOTES),
        "q223_psi_drift": (q223_psi_drift, _Q223_ORACLE, _Q223_NOTES),
        "q224_returns_above_nation_avg": (
            q224_returns_above_nation_avg,
            _Q224_ORACLE,
            _Q224_NOTES,
        ),
    }
)


def q225_copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.assoc import association_rules

    li = read_table(spark, sf_dir, "lineitem")
    rules = association_rules(
        li, "l_orderkey", "l_partkey", min_pair_count=2, max_basket_size=20
    )
    return rules.orderBy(
        F.col("lift").desc(), F.col("item_a").asc(), F.col("item_b").asc()
    ).limit(50)


_Q225_ORACLE = """
    WITH bi AS (
      SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
    ),
    kept AS (
      SELECT b, i FROM bi
      WHERE b IN (SELECT b FROM bi GROUP BY b HAVING COUNT(*) <= 20)
    ),
    nb AS (SELECT CAST(COUNT(DISTINCT b) AS BIGINT) AS n FROM kept),
    ic AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS ni FROM kept GROUP BY i),
    pairs AS (
      SELECT a.i AS item_a, c.i AS item_b, CAST(COUNT(*) AS BIGINT) AS pair_cnt
      FROM kept a JOIN kept c ON a.b = c.b AND a.i < c.i
      GROUP BY a.i, c.i HAVING COUNT(*) >= 2
    )
    SELECT p.item_a, p.item_b, p.pair_cnt,
           ia.ni AS n_a, ib.ni AS n_b,
           p.pair_cnt / nb.n AS support,
           p.pair_cnt / ia.ni AS confidence_a_b,
           p.pair_cnt / ib.ni AS confidence_b_a,
           (p.pair_cnt * nb.n) / (ia.ni * ib.ni) AS lift
    FROM pairs p
    JOIN ic ia ON p.item_a = ia.i
    JOIN ic ib ON p.item_b = ib.i
    CROSS JOIN nb
    ORDER BY lift DESC, item_a, item_b
    LIMIT 50
"""

_Q225_NOTES = (
    "MARKET-BASKET association rules at the 2-itemset level (operators/"
    "assoc.association_rules — co-purchased parts per order, the "
    "join-shaped half of recommendation): support / confidence(both "
    "directions) / lift over item pairs, each a single IEEE division "
    "of exact integer counts (engine-exact, no rounding). The "
    "quadratic danger is per-basket C(s,2) fanout — baskets over "
    "max_basket_size=20 distinct items are dropped BEFORE pairing "
    "(the containment_pairs df-cap discipline: bot carts out, counts "
    "conservative never inflated). One distinct pass persisted to feed "
    "basket counts, item counts and the pair self-join; top-50 by "
    "(lift, pair) is fully tie-broken"
)


def q226_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.spatial import radius_join_pairs

    cust = read_table(spark, sf_dir, "customer")
    pts = cust.select(
        F.col("c_custkey").alias("id"),
        ((F.col("c_custkey") * 37) % 1000).alias("x"),
        ((F.col("c_custkey") * 91) % 1000).alias("y"),
    )
    return radius_join_pairs(pts, "id", "x", "y", radius=15.0).orderBy(
        "id_a", "id_b"
    )


_Q226_ORACLE = """
    WITH pts AS (
      SELECT c_custkey AS id,
             (c_custkey * 37) % 1000 AS x,
             (c_custkey * 91) % 1000 AS y
      FROM customer
    ),
    cells AS (
      SELECT id, x, y,
             CAST(floor(x / 15.0) AS BIGINT) AS cx,
             CAST(floor(y / 15.0) AS BIGINT) AS cy
      FROM pts
    ),
    probe AS (
      SELECT c.id, c.x, c.y, c.cx + dx.i AS cx, c.cy + dy.i AS cy
      FROM cells c
      CROSS JOIN generate_series(-1, 1) dx(i)
      CROSS JOIN generate_series(-1, 1) dy(i)
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST((a.x - b.x) * (a.x - b.x)
                + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS dist_sq
    FROM probe a
    JOIN cells b ON a.cx = b.cx AND a.cy = b.cy AND a.id < b.id
    WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 225
    ORDER BY id_a, id_b
"""

_Q226_NOTES = (
    "GRID-BUCKETED spatial radius self-join (operators/spatial."
    "radius_join_pairs — all point pairs within r without a cross "
    "join, the PostGIS-bucketing/Sedona-grid plan shape): cell size "
    ">= r means a match can only live in the 3x3 neighborhood, so ONE "
    "side replicates x9 and the join is a plain equi-join on cell id "
    "with an exact distance filter behind it. Coordinates here are "
    "integers synthesized from c_custkey, so dist_sq stays in exact "
    "BIGINT arithmetic end-to-end — no trig, no epsilon, engine-exact. "
    "Dense-area skew is an AQE skew-join case, not a plan rewrite"
)


def q227_calibration_brier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mlmetrics import calibration_report

    ev = read_table(spark, sf_dir, "events")
    scored = ev.filter(F.col("value").isNotNull()).select(
        F.when(F.col("event_type").isin("purchase", "signup"), 1)
        .otherwise(0)
        .alias("label"),
        # pseudo-probability through a logistic link; rounded to 9dp so
        # the libm exp's last-ulp spread collapses to one shared double
        F.round(
            F.lit(1.0)
            / (F.lit(1.0) + F.exp(-(F.col("value") - F.lit(50.0)) / F.lit(20.0))),
            9,
        ).alias("prob"),
    )
    return calibration_report(scored, "label", "prob", n_bins=10).orderBy("bin")


_Q227_ORACLE = """
    WITH scored AS (
      SELECT CASE WHEN event_type IN ('purchase', 'signup') THEN 1 ELSE 0 END
               AS y,
             round(1.0 / (1.0 + exp(-(value - 50.0) / 20.0)), 9) AS p
      FROM events WHERE value IS NOT NULL
    ),
    binned AS (
      SELECT LEAST(9, CAST(floor(p * 10) AS INTEGER)) AS bin, y,
             CAST(round(p, 9) AS DECIMAL(25,9)) AS p9,
             CAST(round((p - y) * (p - y), 9) AS DECIMAL(25,9)) AS se
      FROM scored
    ),
    per_bin AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(p9) AS DOUBLE) / COUNT(*) AS mean_prob,
             CAST(SUM(y) AS DOUBLE) / COUNT(*) AS frac_pos,
             SUM(se) AS se_sum
      FROM binned GROUP BY bin
    ),
    tot AS (
      SELECT CAST(SUM(se_sum) AS DOUBLE) / SUM(n) AS br FROM per_bin
    )
    SELECT bin, n, round(mean_prob, 6) AS mean_prob,
           round(frac_pos, 6) AS frac_pos,
           round(frac_pos - mean_prob, 6) AS gap,
           round(br, 6) AS brier
    FROM per_bin CROSS JOIN tot
    ORDER BY bin
"""

_Q227_NOTES = (
    "CALIBRATION reliability bins + BRIER score (operators/mlmetrics."
    "calibration_report — the post-training audit pairing q218's "
    "discrimination AUC with calibration): per probability-decile "
    "(n, mean_prob, frac_pos, gap) plus the overall Brier repeated per "
    "row. Probabilities go through a libm logistic, so the engine "
    "contract rounds them to 9dp FIRST (the q27/wkey rule), then every "
    "sum rides DECIMAL(25,9) — order-independent at any parallelism — "
    "and every ratio is one IEEE division of exact operands. One "
    "map-side bucket + one n_bins-row agg + a broadcast 1-row total"
)


ROADMAP7.update(
    {
        "q225_copurchase_lift": (q225_copurchase_lift, _Q225_ORACLE, _Q225_NOTES),
        "q226_radius_join": (q226_radius_join, _Q226_ORACLE, _Q226_NOTES),
        "q227_calibration_brier": (
            q227_calibration_brier,
            _Q227_ORACLE,
            _Q227_NOTES,
        ),
    }
)


def q228_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.multimodal import image_pixel_stats, with_real_jpeg_payload

    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    stats = image_pixel_stats(with_real_jpeg_payload(docs))
    return stats.select(
        "doc_id", "img_format", "width", "height", "channels", "decoded"
    ).orderBy("doc_id")


_Q228_ORACLE = """
    SELECT doc_id,
           'jpeg' AS img_format,
           CAST(16 + doc_id % 17 AS INTEGER) AS width,
           CAST(16 + doc_id % 13 AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS channels,
           TRUE AS decoded
    FROM documents WHERE doc_id < 150
    ORDER BY doc_id
"""

_Q228_NOTES = (
    "REAL baseline-JPEG pixel decode through the multimodal boundary "
    "(llm/jpeg.py — pure numpy Huffman + dequant + IDCT + YCbCr, "
    "Annex-K tables, restart-marker aware; no codec library), closing "
    "the last honest codec stub: with_real_jpeg_payload synthesizes "
    "deterministic multi-MCU gradient JPEGs and image_pixel_stats "
    "Huffman-decodes every one (decoded=true with true dims/channels, "
    "which is what the oracle pins — JPEG is lossy, so channel MEANS "
    "have no exact SQL twin; pixel fidelity is pinned by the "
    "round-trip tolerance pytests in tests/test_round7.py, and "
    "unsupported variants/header-only streams still degrade to "
    "decoded=false, preserved by q206). Arrow-batched map-only plan; "
    "partition parallelism is the decode scale lever"
)


ROADMAP7.update(
    {
        "q228_jpeg_decode": (q228_jpeg_decode, _Q228_ORACLE, _Q228_NOTES),
    }
)


def q229_windowed_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.drift import (
        bucket_by_edges,
        quantile_edges_exact,
        windowed_psi,
    )

    ev = read_table(spark, sf_dir, "events")
    vals = ev.filter(F.col("value").isNotNull()).select(
        "event_id", "ts", "value"
    )
    edges = quantile_edges_exact(vals, "value", 8, "event_id")
    # corpus-wide reference proportions — metadata-sized (8 counts)
    rows = (
        vals.select(bucket_by_edges(F.col("value"), edges).alias("b"))
        .groupBy("b")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    counts = {r["b"]: r["c"] for r in rows}
    n = sum(counts.values())
    ref_probs = [counts.get(i, 0) / n for i in range(8)]
    return windowed_psi(
        ev, "ts", "value", edges, ref_probs, window="10 minutes"
    ).orderBy("window_start")


def _q229_oracle() -> str:
    """k=8 windowed-PSI oracle: edges and reference proportions are
    recomputed in SQL exactly as the Spark side derives them (rank-
    selected edges; corpus bucket counts / n — the same IEEE division
    the driver-side Python performs), then per-window conditional
    counts fold into the identical PSI chain."""
    epoch = "TIMESTAMP '1970-01-01 00:00:00'"
    win = f"{epoch} + to_seconds(CAST(floor(epoch(ts) / 600) * 600 AS BIGINT))"
    cs = ",\n         ".join(
        f"CAST(COUNT(CASE WHEN b = {i} THEN 1 END) AS BIGINT) AS c{i}"
        for i in range(8)
    )
    prs = ",\n         ".join(
        f"CAST(COUNT(CASE WHEN b = {i} THEN 1 END) AS DOUBLE)"
        f" / COUNT(*) AS pr{i}"
        for i in range(8)
    )
    terms = " + ".join(
        f"(GREATEST(pr{i}, 0.000001) - GREATEST(c{i} / n, 0.000001))"
        f" * ln(GREATEST(pr{i}, 0.000001) / GREATEST(c{i} / n, 0.000001))"
        for i in range(8)
    )
    return f"""
    WITH vals AS (
      SELECT event_id, ts, value FROM events WHERE value IS NOT NULL
    ),
    nref AS (SELECT COUNT(*) AS n FROM vals),
    ranked AS (
      SELECT value, ROW_NUMBER() OVER (ORDER BY value, event_id) AS rn
      FROM vals
    ),
    edges AS (
      SELECT value AS edge FROM ranked
      WHERE rn IN (SELECT (i * n + 7) // 8
                   FROM generate_series(1, 7) t(i) CROSS JOIN nref)
    ),
    bucketed AS (
      SELECT v.event_id, v.ts, v.value,
             COUNT(CASE WHEN e.edge < v.value THEN 1 END) AS b
      FROM vals v CROSS JOIN edges e
      GROUP BY v.event_id, v.ts, v.value
    ),
    refp AS (
      SELECT {prs}
      FROM bucketed
    ),
    win AS (
      SELECT {win} AS window_start,
             CAST(COUNT(*) AS BIGINT) AS n,
         {cs}
      FROM bucketed GROUP BY window_start
    )
    SELECT w.window_start,
           w.window_start + to_seconds(600) AS window_end,
           w.n, {", ".join(f"w.c{i}" for i in range(8))},
           round({terms}, 6) AS psi
    FROM win w CROSS JOIN refp
    ORDER BY w.window_start
    """


_Q229_NOTES = (
    "WINDOWED PSI drift monitor (operators/drift.windowed_psi — the "
    "continuous form of q223: which 10-minute window of the feed "
    "drifted from the corpus-wide reference distribution): bucket id "
    "is a map-side literal-bisection, per-window bucket counts are k=8 "
    "conditional sums inside ONE groupBy(window(ts)) aggregation, and "
    "PSI folds over the count columns as a stateless post-agg "
    "projection with the reference proportions inlined as literals — "
    "deliberately a SINGLE stateful agg so the identical plan replays "
    "as a structured stream (batch==stream parity pinned in "
    "tests/test_round7.py the q37 way). The oracle recomputes edges, "
    "reference proportions, and the PSI chain in SQL; determinism "
    "reduces to the q27 ln rule (6dp)"
)


ROADMAP7.update(
    {
        "q229_windowed_psi": (q229_windowed_psi, _q229_oracle(), _Q229_NOTES),
    }
)


def q230_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import canonical_edges, label_propagation

    ev = read_table(spark, sf_dir, "events")
    pairs = ev.select(
        (F.col("user_id") % 97).alias("src"),
        (F.col("event_id") % 89).alias("dst"),
    )
    edges = canonical_edges(pairs, "src", "dst")
    return label_propagation(edges, n_rounds=5).orderBy("node")


def _q230_oracle(n_rounds: int = 5) -> str:
    """Unrolled-CTE LPA oracle (the q177 PageRank discipline): one CTE
    per round, every rule written token-identically to the Spark side —
    most-frequent neighbor label, ties to the smallest label — so the
    5-round assignment matches bit-for-bit."""
    head = """
    WITH base AS (
      SELECT DISTINCT LEAST(user_id % 97, event_id % 89) AS a,
                      GREATEST(user_id % 97, event_id % 89) AS b
      FROM events
      WHERE user_id % 97 <> event_id % 89
    ),
    und AS (
      SELECT a AS src, b AS dst FROM base
      UNION ALL
      SELECT b AS src, a AS dst FROM base
    ),
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM und)"""
    rounds = []
    for i in range(1, n_rounds + 1):
        rounds.append(f""",
    l{i} AS (
      SELECT node, label FROM (
        SELECT u.src AS node, l.label,
               ROW_NUMBER() OVER (PARTITION BY u.src
                                  ORDER BY COUNT(*) DESC, l.label ASC) AS rk
        FROM und u JOIN l{i - 1} l ON u.dst = l.node
        GROUP BY u.src, l.label
      ) WHERE rk = 1
    )""")
    return (
        head
        + "".join(rounds)
        + f"\n    SELECT node, label FROM l{n_rounds} ORDER BY node\n    "
    )


_Q230_NOTES = (
    "LABEL-PROPAGATION community detection (operators/graph."
    "label_propagation — the clustering complement to the iterate "
    "family's CC/PageRank): synchronous LPA with the DETERMINISTIC "
    "rule 'most frequent neighbor label, ties to the smallest', run "
    "for a fixed 5 rounds on iterate_fixed (bounded rounds ARE the "
    "spec — raw LPA is order-dependent and oscillation-prone; the "
    "fixed rule makes the result a pure function of the graph). Per "
    "round one labels-by-edges shuffle + one (node,label) count + one "
    "node-keyed rank, lineage truncated per round. The oracle unrolls "
    "the five rounds as CTEs written token-identically (q177 "
    "discipline) and matches bit-for-bit"
)


ROADMAP7.update(
    {
        "q230_label_propagation": (
            q230_label_propagation,
            _q230_oracle(),
            _Q230_NOTES,
        ),
    }
)


def _ensure_range_files(spark: SparkSession, sf_dir: str) -> str:
    """Write-once-per-(session, sf_dir) range-file fixture for q231:
    events re-written as 16 range-partitioned files on event_id so each
    file carries a tight footer min/max — the layout a time/id-ordered
    ingest produces naturally. Same mtime-stamped guard as q145's
    fixture (a regenerated testdata invalidates the cache)."""
    import os
    import tempfile

    from ._fixtures import fixture_once, source_stamp

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    path = os.path.join(tempfile.gettempdir(), f"dbkit_range_events_{tag}")
    return fixture_once(
        path,
        source_stamp(sf_dir, "events"),
        lambda: (
            read_table(spark, sf_dir, "events")
            .repartitionByRange(16, F.col("event_id"))
            .write.mode("overwrite")
            .parquet(path)
        ),
    )


def q231_file_stats_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregate import stable_sum
    from ..sources.fileindex import (
        build_file_stats_index,
        list_parquet_files,
        prune_files,
        read_pruned,
    )

    path = _ensure_range_files(spark, sf_dir)
    index = build_file_stats_index(spark, path, ["event_id", "value"])
    index = index.localCheckpoint(eager=True)  # harvested once, probed twice
    mx = read_table(spark, sf_dir, "events").agg(
        F.max("event_id").alias("m")
    ).collect()[0]["m"]
    lo, hi = (mx * 25) // 100, (mx * 35) // 100
    pruned = read_pruned(spark, index, "event_id", float(lo), float(hi))
    n_total = len(list_parquet_files(path))
    n_scanned = len(prune_files(index, "event_id", float(lo), float(hi)))
    return pruned.agg(
        F.count("*").cast("long").alias("n"),
        F.min("event_id").cast("long").alias("min_id"),
        F.max("event_id").cast("long").alias("max_id"),
        stable_sum("value").alias("total_value"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    ).select(
        "*",
        F.lit(n_scanned < n_total).alias("files_were_pruned"),
    )


_Q231_ORACLE = """
    WITH bounds AS (
      SELECT (MAX(event_id) * 25) // 100 AS lo,
             (MAX(event_id) * 35) // 100 AS hi
      FROM events
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(event_id) AS BIGINT) AS min_id,
           CAST(MAX(event_id) AS BIGINT) AS max_id,
           CAST(SUM(CAST(value AS DECIMAL(25,2))) AS DOUBLE) AS total_value,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           TRUE AS files_were_pruned
    FROM events CROSS JOIN bounds
    WHERE event_id >= lo AND event_id <= hi
"""

_Q231_NOTES = (
    "PARQUET FOOTER-STATS data skipping (sources/fileindex — the "
    "Iceberg/Delta manifest primitive rebuilt for raw parquet "
    "directories): a DISTRIBUTED map-only harvest reads ONLY footers "
    "(never data pages) into an O(files x columns) min/max/null index, "
    "and a range predicate becomes a pruned file list before the scan "
    "— at 100 TB this is the difference between opening a million "
    "files and opening the dozens whose range intersects. Files with "
    "unknown stats are conservatively kept (pruning only ever skips "
    "provably-empty files), the residual predicate still applies, and "
    "the oracle is the plain full-table filter — layout changes "
    "results never. files_were_pruned asserts the index actually "
    "skipped files on the 16-file range layout; the scale-covariant "
    "bounds derive from MAX(event_id) by integer arithmetic"
)


ROADMAP7.update(
    {
        "q231_file_stats_pruning": (
            q231_file_stats_pruning,
            _Q231_ORACLE,
            _Q231_NOTES,
        ),
    }
)


def q232_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.entity import blocked_link

    sup = read_table(spark, sf_dir, "supplier")
    # deterministic noise: most rows get ONE substituted digit (dist 1,
    # linkable); every 5th row loses three characters (dist 3, must be
    # rejected at max_dist=2)
    light = F.concat(
        F.expr("substring(s_name, 1, CAST(9 + s_suppkey % 3 AS INT))"),
        F.lit("X"),
        F.expr("substring(s_name, CAST(11 + s_suppkey % 3 AS INT))"),
    )
    heavy = F.concat(
        F.expr("substring(s_name, 1, 9)"), F.expr("substring(s_name, 13)")
    )
    dirty = sup.select(
        F.col("s_suppkey").alias("dirty_id"),
        F.when(F.col("s_suppkey") % 5 == 0, heavy).otherwise(light).alias(
            "dirty_name"
        ),
    )
    blocks = [
        (F.substring(F.col("s_name"), -4, 4), F.substring(F.col("dirty_name"), -4, 4)),
        (F.substring(F.col("s_name"), 10, 3), F.substring(F.col("dirty_name"), 10, 3)),
    ]
    return blocked_link(
        sup, dirty, "s_suppkey", "dirty_id", "s_name", "dirty_name",
        blocks, max_dist=2,
    ).orderBy("s_suppkey", "dirty_id")


_Q232_ORACLE = """
    WITH dirty AS (
      SELECT s_suppkey AS dirty_id,
             CASE WHEN s_suppkey % 5 = 0
                  THEN substr(s_name, 1, 9) || substr(s_name, 13)
                  ELSE substr(s_name, 1, CAST(9 + s_suppkey % 3 AS INTEGER))
                       || 'X'
                       || substr(s_name, CAST(11 + s_suppkey % 3 AS INTEGER))
             END AS dirty_name
      FROM supplier
    ),
    cands AS (
      SELECT l.s_suppkey, r.dirty_id, l.s_name, r.dirty_name
      FROM supplier l
      JOIN dirty r ON right(l.s_name, 4) = right(r.dirty_name, 4)
      UNION
      SELECT l.s_suppkey, r.dirty_id, l.s_name, r.dirty_name
      FROM supplier l
      JOIN dirty r ON substr(l.s_name, 10, 3) = substr(r.dirty_name, 10, 3)
    )
    SELECT s_suppkey, dirty_id,
           CAST(levenshtein(s_name, dirty_name) AS INTEGER) AS dist
    FROM cands
    WHERE levenshtein(s_name, dirty_name) <= 2
    ORDER BY s_suppkey, dirty_id
"""

_Q232_NOTES = (
    "CROSS-TABLE ENTITY RESOLUTION (llm/entity.blocked_link — record "
    "linkage: the dedup family finds near-dups WITHIN a corpus; this "
    "links noisy records ACROSS two tables): BLOCK-then-VERIFY with "
    "MULTI-PASS blocking — a pair is a candidate if ANY blocking key "
    "agrees (the multi-table-LSH recall dial), candidates dedup before "
    "the O(len^2) Levenshtein verify so the expensive step runs once "
    "per pair, and every pass is a plain equi-join (never L x R). The "
    "fixture injects deterministic noise: one substituted digit links "
    "at dist 1; every 5th record loses three characters and is "
    "correctly rejected at max_dist=2 — precision AND recall are both "
    "visible in the differential"
)


def q233_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", (F.col("user_id") % 4).alias("cohort")
    ).agg(F.count("*").alias("o"))
    rm = cells.groupBy("event_type").agg(F.sum("o").alias("rm"))
    cm = cells.groupBy("cohort").agg(F.sum("o").alias("cm"))
    tot = cells.agg(
        F.sum("o").alias("nn"),
        F.countDistinct("event_type").alias("r"),
        F.countDistinct("cohort").alias("c"),
    )
    j = (
        cells.join(F.broadcast(rm), "event_type")
        .join(F.broadcast(cm), "cohort")
        .crossJoin(F.broadcast(tot))
    )
    e = (F.col("rm") * F.col("cm")) / F.col("nn")
    # per-cell terms are 3 IEEE ops on exact integers (engine-identical);
    # rounding to 9dp + decimal carry makes the cell SUM order-free
    term = F.round((F.col("o") - e) * (F.col("o") - e) / e, 9).cast(
        "decimal(25,9)"
    )
    return j.agg(
        F.round(F.sum(term).cast("double"), 6).alias("chi2"),
        ((F.max("r") - 1) * (F.max("c") - 1)).cast("long").alias("dof"),
        F.max("nn").cast("long").alias("n"),
    )


_Q233_ORACLE = """
    WITH cells AS (
      SELECT event_type, user_id % 4 AS cohort, COUNT(*) AS o
      FROM events GROUP BY event_type, cohort
    ),
    rm AS (SELECT event_type, SUM(o) AS rm FROM cells GROUP BY event_type),
    cm AS (SELECT cohort, SUM(o) AS cm FROM cells GROUP BY cohort),
    tot AS (
      SELECT SUM(o) AS nn,
             COUNT(DISTINCT event_type) AS r,
             COUNT(DISTINCT cohort) AS c
      FROM cells
    )
    SELECT round(CAST(SUM(CAST(round(
             (cells.o - (rm.rm * cm.cm) / tot.nn)
             * (cells.o - (rm.rm * cm.cm) / tot.nn)
             / ((rm.rm * cm.cm) / tot.nn), 9) AS DECIMAL(25,9)))
             AS DOUBLE), 6) AS chi2,
           CAST((MAX(tot.r) - 1) * (MAX(tot.c) - 1) AS BIGINT) AS dof,
           CAST(MAX(tot.nn) AS BIGINT) AS n
    FROM cells
    JOIN rm ON cells.event_type = rm.event_type
    JOIN cm ON cells.cohort = cm.cohort
    CROSS JOIN tot
"""

_Q233_NOTES = (
    "CHI-SQUARE INDEPENDENCE TEST over a contingency table (is "
    "event_type independent of user cohort? — the categorical "
    "counterpart to q170's OLS and q218's AUC in the statistical "
    "surface): observed cell counts vs rm*cm/N expected margins, "
    "chi2 = sum((o-e)^2/e) with (r-1)(c-1) degrees of freedom. The "
    "contingency table is one grouped count (map-side combinable); "
    "margins and totals are metadata-sized broadcasts; each cell term "
    "is three IEEE ops on exact integers (engine-identical) and the "
    "cell sum rides a 9dp decimal so the reduction is order-free at "
    "any parallelism — chi2 emitted at 6dp (q27 rule)"
)


ROADMAP7.update(
    {
        "q232_entity_resolution": (
            q232_entity_resolution,
            _Q232_ORACLE,
            _Q232_NOTES,
        ),
        "q233_chi_square": (q233_chi_square, _Q233_ORACLE, _Q233_NOTES),
    }
)


def q234_fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import fd_discovery

    ev = read_table(spark, sf_dir, "events")
    return fd_discovery(
        ev, ["event_id", "user_id", "event_type"], exact=True
    ).orderBy("determinant", "dependent")


def _q234_oracle() -> str:
    cols = ["event_id", "user_id", "event_type"]
    parts = []
    for a in cols:
        for b in cols:
            if a == b:
                continue
            parts.append(f"""
    SELECT '{a}' AS determinant, '{b}' AS dependent,
           CAST(COUNT(DISTINCT {a}) AS BIGINT) AS n_det,
           CAST(COUNT(DISTINCT ({a}, {b})) AS BIGINT) AS n_pair,
           CAST(COUNT(DISTINCT ({a}, {b})) - COUNT(DISTINCT {a}) AS BIGINT)
             AS violations,
           COUNT(DISTINCT ({a}, {b})) = COUNT(DISTINCT {a}) AS holds
    FROM events""")
    for c in cols:
        parts.append(f"""
    SELECT '{c}' AS determinant, '*' AS dependent,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_det,
           CAST(COUNT(*) AS BIGINT) AS n_pair,
           CAST(COUNT(*) - COUNT(DISTINCT {c}) AS BIGINT) AS violations,
           COUNT(DISTINCT {c}) = COUNT(*) AS holds
    FROM events""")
    return (
        "\n    UNION ALL\n".join(parts)
        + "\n    ORDER BY determinant, dependent\n    "
    )


_Q234_NOTES = (
    "FUNCTIONAL-DEPENDENCY + candidate-key discovery (operators/"
    "profile.fd_discovery — the metadata-profiling step behind schema "
    "inference and join-key validation): A->B holds iff "
    "countDistinct(A,B) == countDistinct(A); key status iff "
    "countDistinct(A) == n. EVERY distinct count for every column and "
    "ordered pair is an expression of ONE aggregation over ONE scan — "
    "n columns never means n jobs — and exact=False swaps in HLL++ "
    "for the non-expanded screening pass at 100 TB (approximate FDs "
    "screen, exact verifies survivors — pinned agreeing on the "
    "fixture by pytest). On events the differential shows event_id "
    "is a key (and so determines everything) while user_id -> "
    "event_type fails with its violation count"
)


ROADMAP7.update(
    {
        "q234_fd_discovery": (q234_fd_discovery, _q234_oracle(), _Q234_NOTES),
    }
)


def q235_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-20, -1)
    )
    # decimal-carried rolling sums: mean and variance derive from exact
    # per-frame sums, so the only FP ops are two divisions + one sqrt
    # (both IEEE-exact on identical operands)
    s1 = F.sum(F.col("value").cast("decimal(25,2)")).over(w).cast("double")
    s2 = (
        F.sum(
            (F.col("value") * F.col("value")).cast("decimal(25,4)")
        ).over(w).cast("double")
    )
    cnt = F.count("value").over(w)
    mean = s1 / cnt
    var = (s2 - s1 * s1 / cnt) / (cnt - 1)
    z = (F.col("value") - mean) / F.sqrt(var)
    out = (
        ev.withColumn("_n_prev", cnt)
        .withColumn("_z", z)
        .filter((F.col("_n_prev") >= 10) & (F.abs(F.col("_z")) > F.lit(3.0)))
    )
    return out.select(
        "event_id",
        "user_id",
        "value",
        F.round("_z", 6).alias("zscore"),
        F.col("_n_prev").cast("long").alias("n_prev"),
    ).orderBy("event_id")


_Q235_ORACLE = """
    WITH base AS (
      SELECT event_id, user_id, ts, value FROM events WHERE value IS NOT NULL
    ),
    rolled AS (
      SELECT event_id, user_id, value,
             CAST(SUM(CAST(value AS DECIMAL(25,2))) OVER w AS DOUBLE) AS s1,
             CAST(SUM(CAST(value * value AS DECIMAL(25,4))) OVER w AS DOUBLE)
               AS s2,
             COUNT(value) OVER w AS cnt
      FROM base
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, value,
           round((value - s1 / cnt)
                 / sqrt((s2 - s1 * s1 / cnt) / (cnt - 1)), 6) AS zscore,
           CAST(cnt AS BIGINT) AS n_prev
    FROM rolled
    WHERE cnt >= 10
      AND abs((value - s1 / cnt)
              / sqrt((s2 - s1 * s1 / cnt) / (cnt - 1))) > 3.0
    ORDER BY event_id
"""

_Q235_NOTES = (
    "PER-KEY ROLLING ANOMALY detection (each event scored against its "
    "own user's trailing-20 window: z = (x - mean)/std over ROWS "
    "BETWEEN 20 PRECEDING AND 1 PRECEDING — the leave-current-out "
    "frame, so an outlier can't mask itself; flagged at |z|>3 with a "
    "10-observation warm-up): ONE window shuffle on user_id computes "
    "both rolling moments from decimal-carried exact frame sums, so "
    "the only floating ops are divisions and sqrt on engine-identical "
    "operands (zscore at 6dp for the boundary). The streaming-era "
    "cousin of q157's batch IQR outliers and q200's per-key "
    "volatility; at 100 TB the state is one frame per user — Spark's "
    "bounded ROWS frame, no unbounded history"
)


ROADMAP7.update(
    {
        "q235_rolling_anomaly": (
            q235_rolling_anomaly,
            _Q235_ORACLE,
            _Q235_NOTES,
        ),
    }
)


def q236_storage_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..sources.fileindex import build_storage_profile

    prof = build_storage_profile(
        spark, os.path.join(sf_dir, "events.parquet")
    )
    agg = prof.groupBy("column").agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum("compressed_bytes").cast("long").alias("compressed"),
        F.sum("uncompressed_bytes").cast("long").alias("uncompressed"),
        F.round(
            F.sum("compressed_bytes") / F.sum("uncompressed_bytes"), 6
        ).alias("ratio"),
    )
    return agg.orderBy("column")


_Q236_NOTES = (
    "PER-COLUMN STORAGE PROFILE from parquet footers (sources/"
    "fileindex.build_storage_profile — 'which column dominates my "
    "100 TB and how well does it compress', answered without reading "
    "one data page): the same distributed footer harvest as q231's "
    "stats index, emitting compressed/uncompressed bytes + value "
    "counts per column chunk. Rows-only BY HARNESS DESIGN: the oracle "
    "harness exposes tables, not file paths, and byte accounting has "
    "no tabular twin — instead tests/test_round7.py cross-validates "
    "the pyarrow harvest BYTE-EXACT against DuckDB's independent "
    "parquet_metadata() reader over the same files (two engines, one "
    "footer), which is a stronger check than a recomputed-SQL oracle"
)


ROADMAP7.update(
    {
        "q236_storage_profile": (q236_storage_profile, None, _Q236_NOTES),
    }
)


def q237_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mlmetrics import bootstrap_mean_ci

    ev = read_table(spark, sf_dir, "events")
    return bootstrap_mean_ci(
        ev, "value", "event_id", n_replicates=50, alpha=0.05
    )


def _q237_oracle() -> str:
    from ..operators.mlmetrics import _poisson1_thresholds

    th = _poisson1_thresholds()
    hex6 = (
        "CAST(list_sum(list_transform(generate_series(1, 6), i -> "
        "CAST((strpos('0123456789abcdef', substr(md5(concat("
        "CAST(event_id AS VARCHAR), ':', CAST(rep AS VARCHAR), ':boot'"
        ")), i, 1)) - 1) AS BIGINT) "
        "* CAST(power(16, 6 - i) AS BIGINT))) AS BIGINT)"
    )
    ladder = f"CAST({len(th)} AS BIGINT)"
    for k in reversed(range(len(th))):
        ladder = f"CASE WHEN u < {th[k]!r} THEN {k} ELSE {ladder} END"
    return f"""
    WITH base AS (
      SELECT event_id, value FROM events WHERE value IS NOT NULL
    ),
    rep AS (
      SELECT b.event_id, b.value, r.rep,
             ({hex6} + 0.5) / 16777216.0 AS u
      FROM base b CROSS JOIN generate_series(1, 50) r(rep)
    ),
    weighted AS (
      SELECT rep, CAST({ladder} AS BIGINT) AS w,
             CAST(value AS DECIMAL(25,2)) AS v
      FROM rep
    ),
    means AS (
      SELECT rep, CAST(SUM(v * w) AS DOUBLE) / SUM(w) AS m
      FROM weighted GROUP BY rep
    ),
    ranked AS (
      SELECT m, ROW_NUMBER() OVER (ORDER BY m, rep) AS rk FROM means
    ),
    ci AS (
      SELECT MAX(CASE WHEN rk = 2 THEN m END) AS ci_lo,
             MAX(CASE WHEN rk = 49 THEN m END) AS ci_hi
      FROM ranked
    ),
    point AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(25,2))) AS DOUBLE) / COUNT(*)
               AS point_mean
      FROM base
    )
    SELECT n, point_mean, ci_lo, ci_hi, CAST(50 AS BIGINT) AS n_replicates
    FROM point CROSS JOIN ci
"""


_Q237_NOTES = (
    "DISTRIBUTED BOOTSTRAP confidence interval (operators/mlmetrics."
    "bootstrap_mean_ci — percentile CI for the mean via the POISSON "
    "bootstrap, the single-pass resampling scheme that needs no global "
    "coordination: each row draws a Poisson(1) weight per replicate "
    "from an inverse-CDF ladder over the engine-wide md5 uniform, so "
    "both engines draw the SAME 50 resamples). Replicate means ride "
    "decimal-exact weighted sums (division is the only FP op), the CI "
    "is a rank-select over the 50-row metadata-sized mean set, and the "
    "x50 fan-out is a map-side explode of the projected value column — "
    "shuffle carries 50 groups. The CDF thresholds are Python-evaluated "
    "literals embedded in both plans (repr round-trips), so the weight "
    "draw is bit-identical"
)


ROADMAP7.update(
    {
        "q237_bootstrap_ci": (q237_bootstrap_ci, _q237_oracle(), _Q237_NOTES),
    }
)


def q238_retention_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.survival import kaplan_meier

    ev = read_table(spark, sf_dir, "events")
    spans = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("first_purchase"),
    )
    subj = spans.select(
        F.floor(
            (
                F.unix_timestamp(
                    F.coalesce("first_purchase", "last_ts")
                )
                - F.unix_timestamp("first_ts")
            )
            / F.lit(3600)
        ).alias("duration_h"),
        F.col("first_purchase").isNotNull().cast("int").alias("converted"),
    )
    return kaplan_meier(subj, "duration_h", "converted").orderBy("duration")


_Q238_ORACLE = """
    WITH spans AS (
      SELECT user_id, MIN(ts) AS first_ts, MAX(ts) AS last_ts,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END)
               AS first_purchase
      FROM events GROUP BY user_id
    ),
    subj AS (
      SELECT CAST(floor((floor(epoch(COALESCE(first_purchase, last_ts)))
                         - floor(epoch(first_ts))) / 3600) AS BIGINT) AS t,
             CASE WHEN first_purchase IS NOT NULL THEN 1 ELSE 0 END AS e
      FROM spans
    ),
    per_t AS (
      SELECT t, CAST(SUM(e) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS leave_cnt
      FROM subj GROUP BY t
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM subj),
    risk AS (
      SELECT t, d,
             n - COALESCE(SUM(leave_cnt) OVER (ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_at_risk
      FROM per_t CROSS JOIN tot
    ),
    curve AS (
      SELECT t, d, n_at_risk,
             1.0 - CAST(d AS DOUBLE) / n_at_risk AS f,
             MAX(CASE WHEN 1.0 - CAST(d AS DOUBLE) / n_at_risk <= 0
                      THEN 1 ELSE 0 END)
               OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS dead,
             SUM(CASE WHEN 1.0 - CAST(d AS DOUBLE) / n_at_risk > 0
                      THEN ln(1.0 - CAST(d AS DOUBLE) / n_at_risk) END)
               OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS lnsum
      FROM risk
    )
    SELECT t AS duration, d, CAST(n_at_risk AS BIGINT) AS n_at_risk,
           CASE WHEN dead = 1 THEN 0.0 ELSE round(exp(lnsum), 6) END
             AS survival
    FROM curve WHERE d > 0
    ORDER BY duration
"""

_Q238_NOTES = (
    "KAPLAN-MEIER TIME-TO-CONVERSION CURVE (operators/survival."
    "kaplan_meier — conversion funnels ARE survival analysis, with the "
    "honest right-censoring treatment: a user who never purchased has "
    "a conversion time EXCEEDING their observed span, and dropping "
    "them biases the curve optimistic): per-user hours from first "
    "activity to first purchase (censored at last activity when none), "
    "then the product-limit estimator "
    "S(t) = prod(1 - d/n) over the distinct-duration RISK TABLE — the "
    "cumulative windows run on O(distinct durations) rows, metadata-"
    "sized next to the subject table, never on subjects. Exact-integer "
    "d/n per step; the running product rides exp(sum ln) rounded 6dp "
    "(q27 rule) with an explicit depleted-risk-set zero flag because "
    "Spark's log(0) is NULL where DuckDB's is -inf"
)


ROADMAP7.update(
    {
        "q238_retention_survival": (
            q238_retention_survival,
            _Q238_ORACLE,
            _Q238_NOTES,
        ),
    }
)


def q239_item_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.assoc import item_similarity_topk

    li = read_table(spark, sf_dir, "lineitem")
    return item_similarity_topk(
        li, "l_orderkey", "l_partkey", k=5, min_pair_count=2,
        max_basket_size=20,
    ).orderBy("item", F.col("sim").desc(), "neighbor")


_Q239_ORACLE = """
    WITH bi AS (
      SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
    ),
    kept AS (
      SELECT b, i FROM bi
      WHERE b IN (SELECT b FROM bi GROUP BY b HAVING COUNT(*) <= 20)
    ),
    ic AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS ni FROM kept GROUP BY i),
    pairs AS (
      SELECT a.i AS item_a, c.i AS item_b, CAST(COUNT(*) AS BIGINT) AS pair_cnt
      FROM kept a JOIN kept c ON a.b = c.b AND a.i < c.i
      GROUP BY a.i, c.i HAVING COUNT(*) >= 2
    ),
    both_dir AS (
      SELECT p.item_a AS item, p.item_b AS neighbor, p.pair_cnt,
             ia.ni AS n_self, ib.ni AS n_other
      FROM pairs p JOIN ic ia ON p.item_a = ia.i JOIN ic ib ON p.item_b = ib.i
      UNION ALL
      SELECT p.item_b AS item, p.item_a AS neighbor, p.pair_cnt,
             ib.ni AS n_self, ia.ni AS n_other
      FROM pairs p JOIN ic ia ON p.item_a = ia.i JOIN ic ib ON p.item_b = ib.i
    ),
    ranked AS (
      SELECT item, neighbor, pair_cnt,
             pair_cnt / sqrt(n_self * n_other) AS sim,
             ROW_NUMBER() OVER (PARTITION BY item
                                ORDER BY pair_cnt / sqrt(n_self * n_other)
                                         DESC, neighbor) AS rk
      FROM both_dir
    )
    SELECT item, neighbor, pair_cnt, sim FROM ranked WHERE rk <= 5
    ORDER BY item, sim DESC, neighbor
"""

_Q239_NOTES = (
    "ITEM-ITEM RECOMMENDER precompute (operators/assoc."
    "item_similarity_topk — 'customers who bought a also bought b': "
    "cosine over binary basket incidence, pair_cnt/sqrt(n_a*n_b), "
    "top-5 neighbors per item): builds on the fanout-capped pair "
    "table; both directions materialize from ONE pass via array-"
    "explode (no union re-execution), item frequencies come from the "
    "SAME capped population as the pair counts (mixing capped pairs "
    "with uncapped frequencies would skew giant-basket items), and "
    "per-item top-k is one window shuffle. sim is one IEEE "
    "sqrt+division of exact integers — engine-exact unrounded"
)


def q240_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(F.split(F.col("text"), " ").alias("t"))
    uni = toks.select(F.explode("t").alias("w")).groupBy("w").agg(
        F.count("*").cast("long").alias("cw")
    )
    bigrams = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(t) - 2), i -> "
                "struct(t[i] AS w1, t[i + 1] AS w2))"
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    big = bigrams.groupBy("w1", "w2").agg(
        F.count("*").cast("long").alias("cab")
    )
    tot = uni.agg(F.sum("cw").alias("nu")).crossJoin(
        big.agg(F.sum("cab").alias("nb"))
    )
    j = (
        big.join(uni.select(F.col("w").alias("w1"), F.col("cw").alias("ca")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("cw").alias("cb")), "w2")
        .crossJoin(F.broadcast(tot))
        .filter(F.col("cab") >= 5)
    )
    pmi = F.round(
        F.log(
            (F.col("cab") * F.col("nu") * F.col("nu"))
            / (F.col("nb") * F.col("ca") * F.col("cb"))
        ),
        6,
    )
    return (
        j.select("w1", "w2", "cab", "ca", "cb", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(25)
    )


_Q240_ORACLE = """
    WITH toks AS (
      SELECT string_split(text, ' ') AS t FROM documents
    ),
    uni AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS cw
      FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
    ),
    big AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cab
      FROM (
        SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                 i -> struct_pack(w1 := t[i], w2 := t[i + 1])),
               recursive := true)
        FROM toks
      ) GROUP BY w1, w2
    ),
    tot AS (
      SELECT (SELECT SUM(cw) FROM uni) AS nu,
             (SELECT SUM(cab) FROM big) AS nb
    )
    SELECT b.w1, b.w2, b.cab, ua.cw AS ca, ub.cw AS cb,
           round(ln((b.cab * tot.nu * tot.nu)
                    / (tot.nb * ua.cw * ub.cw)), 6) AS pmi
    FROM big b
    JOIN uni ua ON b.w1 = ua.w
    JOIN uni ub ON b.w2 = ub.w
    CROSS JOIN tot
    WHERE b.cab >= 5
    ORDER BY pmi DESC, w1, w2
    LIMIT 25
"""

_Q240_NOTES = (
    "PMI COLLOCATION mining (which word pairs co-occur adjacently far "
    "beyond chance — the classic phrase-detection signal feeding "
    "tokenizer-vocabulary and boilerplate analysis): bigram counts "
    "from a map-side transform over the token array (no self-join), "
    "unigram margins joined back, pmi = ln(c_ab*N_u^2 / (N_b*c_a*c_b)) "
    "over exact-integer products (bounded: counts x corpus-size "
    "squared stays under 2^63 at fixture scales; production would "
    "carry log-counts), min-count 5 against PMI's rare-pair bias, "
    "6dp rounding for the libm ln. Top-25 fully tie-broken"
)


ROADMAP7.update(
    {
        "q239_item_similarity": (
            q239_item_similarity,
            _Q239_ORACLE,
            _Q239_NOTES,
        ),
        "q240_pmi_collocations": (
            q240_pmi_collocations,
            _Q240_ORACLE,
            _Q240_NOTES,
        ),
    }
)


def q241_unigram_cross_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    uni = toks.groupBy("w").agg(F.count("*").cast("long").alias("cw"))
    tot = uni.agg(F.sum("cw").alias("nu"))
    # per-token surprisal -ln(cw/N) rounded 9dp, decimal-carried so the
    # per-doc mean is order-independent; every token is in-vocab by
    # construction (the LM is fit on the same corpus)
    scored = (
        toks.join(uni, "w")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.round(-F.log(F.col("cw") / F.col("nu")), 9)
            .cast("decimal(25,9)")
            .alias("_s"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.round(
            (F.sum("_s").cast("double") / F.count("*")), 6
        ).alias("cross_entropy"),
    )
    return per_doc.orderBy(F.col("cross_entropy").desc(), "doc_id").limit(50)


_Q241_ORACLE = """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cw FROM toks GROUP BY w),
    tot AS (SELECT SUM(cw) AS nu FROM uni),
    scored AS (
      SELECT t.doc_id,
             CAST(round(-ln(u.cw / tot.nu), 9) AS DECIMAL(25,9)) AS s
      FROM toks t JOIN uni u ON t.w = u.w CROSS JOIN tot
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           round(CAST(SUM(s) AS DOUBLE) / COUNT(*), 6) AS cross_entropy
    FROM scored GROUP BY doc_id
    ORDER BY cross_entropy DESC, doc_id
    LIMIT 50
"""

_Q241_NOTES = (
    "UNIGRAM CROSS-ENTROPY quality scoring (the perplexity-proxy "
    "filter: docs whose tokens are surprising under the corpus's own "
    "unigram LM are outliers — gibberish, wrong language, encoding "
    "damage; the cheap stand-in for a KenLM pass, same plan shape): "
    "token surprisals -ln(c_w/N) join in from the broadcast-scaled "
    "vocabulary table, ride 9dp decimals so per-doc means are "
    "order-independent (q27 ln rule at both the per-token round and "
    "the 6dp emit), and the top-50 most-surprising docs emerge from "
    "one TakeOrderedAndProject. Vocabulary and corpus are the same "
    "pass, so every token is in-vocab by construction"
)


def q242_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents")
    uni = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("cw"))
    )
    tot = uni.agg(F.sum("cw").alias("nu"))
    w = Window.orderBy(F.col("cw").desc(), F.col("w").asc())
    ranked = (
        uni.crossJoin(F.broadcast(tot))
        .withColumn("rank", F.row_number().over(w))
        .withColumn(
            "cum_cov",
            F.sum("cw").over(w.rowsBetween(Window.unboundedPreceding, 0))
            / F.col("nu"),
        )
    )
    targets = [0.5, 0.8, 0.9, 0.95, 0.99]
    out = None
    for t in targets:
        vsize = ranked.filter(F.col("cum_cov") >= F.lit(t)).agg(
            F.min("rank").cast("long").alias("vocab_size")
        ).select(F.lit(t).alias("coverage"), "vocab_size")
        out = vsize if out is None else out.unionAll(vsize)
    return out.orderBy("coverage")


_Q242_ORACLE = """
    WITH uni AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS cw
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      GROUP BY w
    ),
    tot AS (SELECT SUM(cw) AS nu FROM uni),
    ranked AS (
      SELECT ROW_NUMBER() OVER (ORDER BY cw DESC, w) AS rank,
             SUM(cw) OVER (ORDER BY cw DESC, w
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               / tot.nu AS cum_cov
      FROM uni CROSS JOIN tot
    )
    SELECT CAST(t.coverage AS DOUBLE) AS coverage,
           CAST(MIN(rank) AS BIGINT) AS vocab_size
    FROM (VALUES (0.5), (0.8), (0.9), (0.95), (0.99)) t(coverage)
    JOIN ranked r ON r.cum_cov >= CAST(t.coverage AS DOUBLE)
    GROUP BY t.coverage
    ORDER BY coverage
"""

_Q242_NOTES = (
    "VOCABULARY COVERAGE CURVE (how many types cover 50/80/90/95/99% "
    "of tokens — the tokenizer-budget question behind every vocab-size "
    "decision, and the Zipf-shape fingerprint of a corpus): the "
    "frequency-ordered cumulative-coverage window runs over the "
    "VOCABULARY table (types, not tokens — metadata-sized next to the "
    "corpus; the single-partition window is over that small table, "
    "the q238 risk-table discipline), and each coverage threshold is "
    "a min-rank lookup. cum_cov is exact-integer running sum / total "
    "— one IEEE division per row, engine-exact; thresholds compare "
    "against exact literals"
)


ROADMAP7.update(
    {
        "q241_unigram_cross_entropy": (
            q241_unigram_cross_entropy,
            _Q241_ORACLE,
            _Q241_NOTES,
        ),
        "q242_vocab_coverage": (
            q242_vocab_coverage,
            _Q242_ORACLE,
            _Q242_NOTES,
        ),
    }
)


# --------------------------------------------------------------------------
# Round-7 continuation batch 4 (q243-q249): second-moment embedding
# statistics, the stable-global-row-number primitive, grid KS drift,
# deterministic negative sampling, Benford auditing, and event-pattern
# (MATCH_RECOGNIZE-shape) detection.
# --------------------------------------------------------------------------


def q243_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.pca import embedding_covariance

    emb = read_table(spark, sf_dir, "embeddings")
    return embedding_covariance(emb, "embedding", d=64).orderBy("i", "j")


_Q243_ORACLE = """
    WITH e AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) v
               FROM embeddings),
    prods AS (
      SELECT i, j, CAST(round(v[i+1]*v[j+1], 9) AS DECIMAL(38,9)) xy
      FROM e, generate_series(0,63) g1(i), generate_series(0,63) g2(j)
      WHERE i <= j
    ),
    sxy AS (SELECT i, j, CAST(COUNT(*) AS BIGINT) n, SUM(xy) sxy
            FROM prods GROUP BY i, j),
    sx AS (
      SELECT k, SUM(CAST(round(v[k+1],9) AS DECIMAL(38,9))) sx
      FROM e, generate_series(0,63) g(k) GROUP BY k
    )
    SELECT s.i, s.j, s.n,
      round((CAST(s.sxy AS DOUBLE)
             - CAST(a.sx AS DOUBLE)*CAST(b.sx AS DOUBLE)/s.n)/s.n, 6) + 0.0 AS cov
    FROM sxy s JOIN sx a ON s.i = a.k JOIN sx b ON s.j = b.k
    ORDER BY s.i, s.j
"""

_Q243_NOTES = (
    "EMBEDDING COVARIANCE (llm/pca.embedding_covariance — the d x d "
    "second-moment matrix behind PCA, whitening, and collapsed-dimension "
    "audits): each row expands its 64-vector into the 2,080 "
    "upper-triangle products MAP-SIDE via one nested codegen transform "
    "(no joins, no Python, no d^2 shuffle blowup — the exchange carries "
    "O(d^2) partials per task, not per row), and products ride 9dp "
    "decimals so the single hash agg is order-independent and the "
    "DuckDB oracle replays it digit-for-digit. The O(N*d^2) multiply "
    "work is covariance's irreducible cost and stays data-parallel; "
    "the result is metadata-sized at ANY corpus scale"
)


def q244_pca_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.pca import pca_project

    emb = read_table(spark, sf_dir, "embeddings")
    return pca_project(emb, "embedding", "vec_id", k=4, d=64).orderBy("vec_id")


_Q244_NOTES = (
    "PCA PROJECTION (llm/pca.pca_project — top-4 principal components "
    "per vector): covariance in one corpus pass (q243), "
    "eigendecomposition DRIVER-SIDE on the collected d x d matrix (the "
    "bounded-scalar collect class — 2,080 doubles, never rows), then a "
    "map-only JVM aggregate fold of every vector against the broadcast "
    "eigenvector literals; the corpus is never shuffled. Eigenvector "
    "signs canonicalized (largest-|coord| positive) so results are "
    "deterministic across LAPACK builds. rows-only BY DESIGN: no SQL "
    "engine eigendecomposes — the projection laws (component variance "
    "== eigenvalue, cross-component covariance == 0, corpus mean maps "
    "to origin) are pytest-pinned in tests/test_round7.py"
)


def q245_ks_drift_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.drift import ks_grid

    ev = read_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp")
    return ks_grid(
        ev.filter(F.col("ts") < cut), ev.filter(F.col("ts") >= cut), "value", k=64
    )


_Q245_ORACLE = """
    WITH mm AS (SELECT min(CAST(value AS DOUBLE)) mn, max(CAST(value AS DOUBLE)) mx
                FROM events),
    grid AS (SELECT i FROM generate_series(1, 64) g(i)),
    a AS (SELECT CAST(value AS DOUBLE) v FROM events
          WHERE ts < TIMESTAMP '2024-01-16'),
    b AS (SELECT CAST(value AS DOUBLE) v FROM events
          WHERE ts >= TIMESTAMP '2024-01-16'),
    ca AS (SELECT i,
             SUM(CASE WHEN v <= mn + i*(mx-mn)/64.0 THEN 1 ELSE 0 END) c,
             COUNT(*) n
           FROM a, grid, mm GROUP BY i),
    cb AS (SELECT i,
             SUM(CASE WHEN v <= mn + i*(mx-mn)/64.0 THEN 1 ELSE 0 END) c,
             COUNT(*) n
           FROM b, grid, mm GROUP BY i),
    rows_ AS (
      SELECT CAST(ca.i AS INTEGER) AS bin_idx,
             mm.mn + ca.i*(mm.mx-mm.mn)/64.0 AS edge,
             round(ca.c / ca.n, 6) AS f_a,
             round(cb.c / cb.n, 6) AS f_b,
             round(abs(ca.c / ca.n - cb.c / cb.n), 6) AS ecdf_gap
      FROM ca JOIN cb ON ca.i = cb.i CROSS JOIN mm
    )
    SELECT bin_idx, edge, f_a, f_b, ecdf_gap,
           MAX(ecdf_gap) OVER () AS ks
    FROM rows_
    ORDER BY bin_idx
"""

_Q245_NOTES = (
    "TWO-SAMPLE KS DRIFT ON A GRID (operators/drift.ks_grid — the "
    "distribution-shift gate that complements PSI q223 and chi-square "
    "q233 with the sup-norm ECDF view): exact KS needs both samples "
    "globally SORTED (the q184 single-partition killer); the grid form "
    "replaces the sort with ONE aggregation per side — 64 conditional "
    "sums folded map-side in whole-stage codegen, shuffle = 64 partials "
    "per task, NO Sort operator in the plan (plan-gated). Grid KS "
    "lower-bounds exact KS and converges as the grid refines. Edges "
    "mn + i*(mx-mn)/64 are the identical IEEE expression tree both "
    "engines (and /64 is a power-of-two division — exact), so bucket "
    "membership is bit-identical; counts are exact integers. The edge "
    "column is the RAW double (6dp rounding of near-tie doubles is not "
    "cross-engine stable; the raw double is, by the expression-tree "
    "argument)"
)


def q246_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.sampling import negative_sample

    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    part = read_table(spark, sf_dir, "part")
    pos = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("o_custkey") % 100 == 7)
        .select(F.col("o_custkey").alias("user_id"), F.col("l_partkey").alias("item"))
    )
    n_items = part.count()  # metadata-sized scalar (contiguous 0..P-1 keys)
    out = negative_sample(pos, "user_id", "item", n_items, k=2, salt="neg")
    return out.select(
        F.col("user").alias("user_id"), "neg_item", "draw"
    ).orderBy("user_id", "draw", "neg_item")


_Q246_ORACLE = f"""
    WITH pos AS (
      SELECT o.o_custkey AS user_id, l.l_partkey AS item
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_custkey % 100 = 7
    ),
    draws AS (
      SELECT user_id, draw,
        {_shard_sql("concat(user_id, '_', item, '_', draw)", ":neg",
                    "(SELECT COUNT(*) FROM part)")} AS neg_item
      FROM pos, (VALUES (1), (2)) d(draw)
    )
    SELECT user_id, neg_item, CAST(draw AS INTEGER) AS draw
    FROM draws
    WHERE NOT EXISTS (SELECT 1 FROM pos p
                      WHERE p.user_id = draws.user_id
                        AND p.item = draws.neg_item)
    ORDER BY user_id, draw, neg_item
"""

_Q246_NOTES = (
    "DETERMINISTIC NEGATIVE SAMPLING (llm/sampling.negative_sample — "
    "the contrastive/recommender training-pair generator): k=2 "
    "candidate items per positive drawn by the engine-wide portable "
    "md5 rule (any engine reproduces the exact sample — the oracle "
    "does), then a left-anti join drops accidental positives. "
    "Collision policy is DROP, not re-draw: re-drawing makes the "
    "round count data-dependent; dropping keeps the whole operator "
    "one-pass — draws are a map-side k-element explode and the ONLY "
    "shuffle is the anti-join on (user, item). Expected loss is "
    "density*k — negligible in the sparse recommender regime. "
    "Duplicate (user,item) positives yield duplicate draws by design "
    "(with-replacement semantics, draw index disambiguates)"
)


def q247_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import benford_audit

    li = read_table(spark, sf_dir, "lineitem")
    return benford_audit(li, "l_extendedprice")


def _benford_values_sql() -> str:
    import math

    rows = ", ".join(
        f"({d}, {float(math.log10(1.0 + 1.0 / d))!r})" for d in range(1, 10)
    )
    return f"(VALUES {rows})"


_Q247_ORACLE = f"""
    WITH base AS (
      SELECT CAST(substr(CAST(CAST(floor(CAST(l_extendedprice AS DOUBLE)) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INTEGER) AS digit
      FROM lineitem WHERE CAST(l_extendedprice AS DOUBLE) >= 1.0
        AND CAST(l_extendedprice AS DOUBLE) < 9.2e18
    ),
    counts AS (SELECT digit, CAST(COUNT(*) AS BIGINT) cnt FROM base GROUP BY digit),
    tot AS (SELECT SUM(cnt) n FROM counts),
    expected AS (SELECT digit, CAST(p_exp AS DOUBLE) AS p_exp
                 FROM {_benford_values_sql()} e(digit, p_exp))
    SELECT c.digit, c.cnt,
           round(c.cnt / t.n, 6) AS p_observed,
           round(e.p_exp, 6) AS p_expected,
           round(c.cnt / t.n - e.p_exp, 6) AS deviation,
           round(t.n * (c.cnt / t.n - e.p_exp) * (c.cnt / t.n - e.p_exp)
                 / e.p_exp, 6) AS chi2_term
    FROM counts c JOIN expected e ON c.digit = e.digit CROSS JOIN tot t
    ORDER BY c.digit
"""

_Q247_NOTES = (
    "BENFORD FIRST-DIGIT AUDIT (operators/profile.benford_audit — the "
    "fabricated-/synthetic-data smell test for scale-spanning positive "
    "quantities, data-quality family next to q108/q197): one scan, one "
    "9-group map-side-combined aggregation; digit extraction is "
    "substring-on-CAST(BIGINT) with the input filtered to [1, 9.2e18) "
    "so the cast never leaves int64 (Spark non-ANSI NULLs >= 2^63 "
    "silently, DuckDB errors — the explicit bound removes the "
    "divergence), expected "
    "shares log10(1+1/d) are full-precision literals generated from "
    "the same repr both engines parse to the identical double (the "
    "oracle VALUES are built by the same Python expression the Spark "
    "literals use), per-digit chi-square contributions summable "
    "downstream. At 100 TB: scan + 9-row shuffle"
)


def q248_pattern_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sequence import pattern_conversions

    ev = read_table(spark, sf_dir, "events")
    out = pattern_conversions(
        ev,
        partition_col="user_id",
        ts_col="ts",
        type_col="event_type",
        start_type="view",
        end_type="purchase",
        within_seconds=1800,
        blocker_type="error",
        tiebreak_col="event_id",
    )
    return out.select("user_id", "event_id", "ts", "start_ts", "latency_s").orderBy(
        "user_id", "event_id"
    )


_Q248_ORACLE = """
    WITH staged AS (
      SELECT user_id, event_id, ts, event_type,
        LAST_VALUE(CASE WHEN event_type = 'view' THEN epoch_us(ts) END
                   IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS start_us,
        LAST_VALUE(CASE WHEN event_type = 'error' THEN epoch_us(ts) END
                   IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS block_us
      FROM events
    )
    SELECT user_id, event_id, ts,
           make_timestamp(start_us) AS start_ts,
           round((epoch_us(ts) - start_us) / 1000000.0, 6) AS latency_s
    FROM staged
    WHERE event_type = 'purchase'
      AND start_us IS NOT NULL
      AND epoch_us(ts) - start_us <= 1800 * 1000000
      AND (block_us IS NULL OR block_us <= start_us)
    ORDER BY user_id, event_id
"""

_Q248_NOTES = (
    "EVENT-PATTERN DETECTION (operators/sequence.pattern_conversions — "
    "the MATCH_RECOGNIZE shape 'view then purchase within 30min with "
    "no error between', strictly stronger than funnel q125 which only "
    "orders stages): ONE window over (user, ts, event_id) carrying two "
    "conditional running-last-value columns (last view time, last "
    "error time) with an UNBOUNDED PRECEDING..1 PRECEDING frame — no "
    "self-join, no collect_list, everything after is a map-side "
    "filter. At 100 TB: a single hash-partitioned per-key sort, the "
    "sessionization cost class (skewed users salt the q64 way). Time "
    "bound compares exact integer MICROSECONDS (unix_micros/epoch_us) "
    "— no float time arithmetic; ties total-ordered by event_id"
)


def q249_stable_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rownumber import stable_row_number

    li = read_table(spark, sf_dir, "lineitem")
    key = ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice"]
    out = stable_row_number(li, key, out_col="row_num")
    return (
        out.filter((F.col("row_num") % 997) == 1)
        .select("l_orderkey", "l_linenumber", "row_num")
        .orderBy("row_num")
    )


_Q249_ORACLE = """
    WITH r AS (
      SELECT l_orderkey, l_linenumber,
             ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber,
                                         l_partkey, l_suppkey,
                                         l_extendedprice) AS row_num
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber, CAST(row_num AS BIGINT) AS row_num
    FROM r WHERE row_num % 997 = 1 ORDER BY row_num
"""

_Q249_NOTES = (
    "STABLE GLOBAL ROW NUMBER (operators/rownumber.stable_row_number — "
    "the PRIMITIVE that retires the single-partition-window class the "
    "q184/q77 weak marks came from): range-exchange on the order key "
    "(disjoint ordered partitions, the distributed-ORDER-BY machinery), "
    "per-partition row_number windows that run in PARALLEL, and a "
    "#partitions-row count aggregation turned into broadcast prefix "
    "offsets. Where range boundaries fall never changes the answer "
    "under a total order key (rank = rows strictly before, boundary- "
    "invariant); the shuffled result is persisted so the offset map "
    "and the windowed pass see identical boundaries. Plan-gated: NO "
    "SinglePartition exchange anywhere (tests/test_round7.py). The "
    "5-column key makes the fixture order total (the synthetic "
    "lineitem duplicates (orderkey,linenumber))"
)


ROADMAP7.update(
    {
        "q243_embedding_covariance": (
            q243_embedding_covariance,
            _Q243_ORACLE,
            _Q243_NOTES,
        ),
        "q244_pca_projection": (q244_pca_projection, None, _Q244_NOTES),
        "q245_ks_drift_grid": (q245_ks_drift_grid, _Q245_ORACLE, _Q245_NOTES),
        "q246_negative_sampling": (
            q246_negative_sampling,
            _Q246_ORACLE,
            _Q246_NOTES,
        ),
        "q247_benford_audit": (q247_benford_audit, _Q247_ORACLE, _Q247_NOTES),
        "q248_pattern_conversions": (
            q248_pattern_conversions,
            _Q248_ORACLE,
            _Q248_NOTES,
        ),
        "q249_stable_row_number": (
            q249_stable_row_number,
            _Q249_ORACLE,
            _Q249_NOTES,
        ),
    }
)


# --------------------------------------------------------------------------
# Round-7 continuation batch 5 (q250-q253): interpolated-bigram LM
# scoring, linear gap interpolation, reciprocal-rank hybrid retrieval
# fusion, and column-level snapshot diff attribution.
# --------------------------------------------------------------------------


def q250_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split(F.col("text"), " ").alias("t"))
    doc_bigrams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(t) - 2), i -> "
                "struct(t[i] AS w1, t[i + 1] AS w2))"
            )
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("cw"))
    )
    big = doc_bigrams.groupBy("w1", "w2").agg(
        F.count("*").cast("long").alias("cab")
    )
    tot = uni.agg(F.sum("cw").alias("nu"))
    # p(w2|w1) = 0.7*c12/c1 + 0.3*c2/N  (interpolated backoff; every
    # term in-vocab by construction - the LM is fit on the same corpus)
    scored = (
        doc_bigrams.join(big, ["w1", "w2"])
        .join(uni.select(F.col("w").alias("w1"), F.col("cw").alias("ca")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("cw").alias("cb")), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.round(
                -F.log(
                    F.lit(0.7) * F.col("cab") / F.col("ca")
                    + F.lit(0.3) * F.col("cb") / F.col("nu")
                ),
                9,
            )
            .cast("decimal(25,9)")
            .alias("_s"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(F.sum("_s").cast("double") / F.count("*"), 6).alias(
            "bigram_cross_entropy"
        ),
    )
    return per_doc.orderBy(F.col("bigram_cross_entropy").desc(), "doc_id").limit(50)


_Q250_ORACLE = """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    doc_big AS (
      SELECT doc_id, w1, w2
      FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(t) - 1),
                 i -> struct_pack(w1 := t[i], w2 := t[i + 1])),
               recursive := true)
        FROM toks
      )
    ),
    uni AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS cw
      FROM (SELECT doc_id, unnest(t) AS w FROM toks) GROUP BY w
    ),
    big AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cab
      FROM doc_big GROUP BY w1, w2
    ),
    tot AS (SELECT SUM(cw) AS nu FROM uni),
    scored AS (
      SELECT d.doc_id,
             CAST(round(-ln(CAST(0.7 AS DOUBLE) * b.cab / ua.cw
                            + CAST(0.3 AS DOUBLE) * ub.cw / tot.nu), 9)
                  AS DECIMAL(25,9)) AS s
      FROM doc_big d
      JOIN big b ON d.w1 = b.w1 AND d.w2 = b.w2
      JOIN uni ua ON d.w1 = ua.w
      JOIN uni ub ON d.w2 = ub.w
      CROSS JOIN tot
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           round(CAST(SUM(s) AS DOUBLE) / COUNT(*), 6) AS bigram_cross_entropy
    FROM scored GROUP BY doc_id
    ORDER BY bigram_cross_entropy DESC, doc_id
    LIMIT 50
"""

_Q250_NOTES = (
    "INTERPOLATED BIGRAM LM SCORING (the order-2 upgrade of q241's "
    "unigram perplexity proxy — the filter that catches word-salad "
    "docs whose unigrams are individually common but whose transitions "
    "are improbable): p(w2|w1) = 0.7*c12/c1 + 0.3*c2/N with both count "
    "tables from ONE tokenization pass (bigrams are a map-side "
    "transform over the token array, q240's zero-self-join shape); "
    "per-bigram surprisals ride 9dp decimals so per-doc means are "
    "order-independent (q241 rule); the count joins are plain hash "
    "joins on (w1,w2)/w — shuffle-partitioned, no broadcast assumption "
    "on the bigram vocabulary, which at 100 TB is large. Top-50 via "
    "TakeOrderedAndProject"
)


def q251_interpolate_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import interpolate_linear

    ev = read_table(spark, sf_dir, "events")
    # sensor-dropout fixture: 'click' rows lose their reading
    holed = ev.withColumn(
        "reading",
        F.when(F.col("event_type") != "click", F.col("value")),
    )
    out = interpolate_linear(
        holed, "user_id", "ts", "reading", tiebreak_col="event_id"
    )
    return (
        out.filter(F.col("event_type") == "click")
        .select("user_id", "event_id", "ts", "filled_value")
        .orderBy("user_id", "event_id")
    )


_Q251_ORACLE = """
    WITH holed AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN event_type <> 'click' THEN value END AS reading
      FROM events
    ),
    staged AS (
      SELECT user_id, event_id, ts, event_type, reading,
        LAST_VALUE(CASE WHEN reading IS NOT NULL THEN reading END IGNORE NULLS)
          OVER w_prev AS pv,
        LAST_VALUE(CASE WHEN reading IS NOT NULL THEN epoch_us(ts) END IGNORE NULLS)
          OVER w_prev AS pt,
        FIRST_VALUE(CASE WHEN reading IS NOT NULL THEN reading END IGNORE NULLS)
          OVER w_next AS nv,
        FIRST_VALUE(CASE WHEN reading IS NOT NULL THEN epoch_us(ts) END IGNORE NULLS)
          OVER w_next AS nt
      FROM holed
      WINDOW
        w_prev AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        w_next AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, event_id, ts,
      CASE
        WHEN reading IS NOT NULL THEN reading
        WHEN pv IS NOT NULL AND nv IS NOT NULL AND nt <> pt THEN
          round(pv + (nv - pv) * ((epoch_us(ts) - pt) / (nt - pt)), 6)
        WHEN pv IS NOT NULL THEN pv
        ELSE nv
      END AS filled_value
    FROM staged
    WHERE event_type = 'click'
    ORDER BY user_id, event_id
"""

_Q251_NOTES = (
    "LINEAR GAP INTERPOLATION (operators/timeseries.interpolate_linear "
    "— the sensor-dropout repair LOCF q101/q102 only staircase-"
    "approximates): two conditional running-value window passes over "
    "ONE (user, ts, event_id) sort give the nearest non-null neighbor "
    "on each side with its timestamp; the fill is map-side arithmetic "
    "on exact integer microseconds (boundary gaps fall back to "
    "nearest-neighbor). One hash-partitioned per-key sort, no joins, "
    "no grid explosion — the sessionization cost class. 6dp rounding "
    "on the two float multiplies keeps it oracle-portable"
)


def q252_hybrid_retrieval_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vectors import cosine
    from ..llm.retrieval import bm25_topk, rrf_fuse

    docs = read_table(spark, sf_dir, "documents")
    emb = read_table(spark, sf_dir, "embeddings")
    lex = bm25_topk(docs, "text", "doc_id", ["spark", "join", "window"], k=20)
    # Global-agg form: min over the single vec_id=0 row is that row, and it
    # makes the broadcast side a no-grouping-key aggregate — provably one
    # row, so the structural NLJ gate accepts it without an allowlist.
    qvec = emb.filter(F.col("vec_id") == 0).agg(F.min("embedding").alias("qv"))
    sem = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qvec))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine("embedding", "qv"), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
    )
    return rrf_fuse([lex, sem], "doc_id", "score", rrf_k=60, topk=10)


_Q252_ORACLE = """
    WITH toks AS (
      SELECT doc_id, t.tok
      FROM documents, UNNEST(string_split_regex(lower(text), '[^a-z]+')) AS t(tok)
      WHERE t.tok <> ''
    ), dl AS (
      SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1
    ), corpus AS (
      SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl
    ), tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf FROM toks
      WHERE tok IN ('spark', 'join', 'window') GROUP BY 1, 2
    ), df AS (
      SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1
    ), lex AS (
      SELECT tf.doc_id,
             ROUND(SUM(
               ln((c.n_docs - df.df + 0.5) / (df.df + 0.5) + 1)
               * tf.tf * (1.2 + 1)
               / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / c.avgdl))
             ), 6) AS score
      FROM tf JOIN df USING (tok) JOIN dl USING (doc_id), corpus c
      GROUP BY tf.doc_id
      ORDER BY score DESC, tf.doc_id
      LIMIT 20
    ), lex_ranked AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY round(score, 6) DESC, doc_id) AS r0
      FROM lex
    ), e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), sem AS (
      SELECT c.vec_id AS doc_id,
             round(list_cosine_similarity(c.v, q.v), 6) AS score
      FROM e c, (SELECT v FROM e WHERE vec_id = 0) q
      WHERE c.vec_id <> 0
      ORDER BY score DESC, doc_id
      LIMIT 20
    ), sem_ranked AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY round(score, 6) DESC, doc_id) AS r1
      FROM sem
    ), fused AS (
      SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
             l.r0, s.r1,
             round(
               (CASE WHEN l.r0 IS NOT NULL
                     THEN 1.0 / (60 + l.r0) ELSE 0.0 END)
               + (CASE WHEN s.r1 IS NOT NULL
                       THEN 1.0 / (60 + s.r1) ELSE 0.0 END), 9) AS rrf_score
      FROM lex_ranked l FULL OUTER JOIN sem_ranked s ON l.doc_id = s.doc_id
    )
    SELECT doc_id, CAST(r0 AS INTEGER) AS rank_1, CAST(r1 AS INTEGER) AS rank_2,
           rrf_score
    FROM fused
    ORDER BY rrf_score DESC, doc_id
    LIMIT 10
"""

_Q252_NOTES = (
    "HYBRID RETRIEVAL via RECIPROCAL-RANK FUSION (llm/retrieval."
    "rrf_fuse — the standard BM25+ANN combiner that needs no score "
    "normalization): fused(d) = sum 1/(60+rank_d) over both lists, "
    "absent-from-a-list contributes 0. The CORPUS-scale work stays in "
    "the retrievers (term-filtered BM25 q109, broadcast-query cosine "
    "q43 — both keep their scale paths); the fusion itself runs over "
    "the already-top-k METADATA-SIZED lists (20+20 rows), so its "
    "global rank windows and full-outer join are the q238 risk-table "
    "discipline, never a corpus operation. Ranks order by "
    "(round(score,6) DESC, id) so last-ulp float noise cannot flip a "
    "rank cross-engine"
)


def q253_column_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.reconcile import column_diff

    orders = read_table(spark, sf_dir, "orders")
    # deterministic synthetic drift: price bump, status flip, deletions,
    # and a block of inserted keys - all derived map-side so the oracle
    # replays the identical snapshot pair
    new = (
        orders.filter((F.col("o_orderkey") % 997) != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_custkey") % 37 == 0, F.col("o_totalprice") + 100.0
            ).otherwise(F.col("o_totalprice")),
        )
        .withColumn(
            "o_orderstatus",
            F.when(F.col("o_custkey") % 41 == 0, F.lit("X")).otherwise(
                F.col("o_orderstatus")
            ),
        )
    )
    inserted = (
        orders.filter(F.col("o_orderkey") % 991 == 0)
        .withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000)
    )
    return column_diff(
        orders,
        new.unionByName(inserted),
        ["o_orderkey"],
        ["o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"],
    )


_Q253_ORACLE = """
    WITH new_mod AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_custkey % 41 = 0 THEN 'X' ELSE o_orderstatus END
               AS o_orderstatus,
             CASE WHEN o_custkey % 37 = 0 THEN o_totalprice + 100.0
                  ELSE o_totalprice END AS o_totalprice,
             o_orderdate
      FROM orders WHERE o_orderkey % 997 <> 0
    ),
    new_ins AS (
      SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey, o_orderstatus,
             o_totalprice, o_orderdate
      FROM orders WHERE o_orderkey % 991 = 0
    ),
    new_t AS (SELECT * FROM new_mod UNION ALL SELECT * FROM new_ins),
    j AS (
      SELECT o.o_orderkey AS ok_old, n.o_orderkey AS ok_new,
             o.o_custkey AS oc, n.o_custkey AS nc,
             o.o_orderstatus AS os, n.o_orderstatus AS ns,
             o.o_totalprice AS op, n.o_totalprice AS np,
             o.o_orderdate AS od, n.o_orderdate AS nd
      FROM orders o FULL OUTER JOIN new_t n ON o.o_orderkey = n.o_orderkey
    ),
    wide AS (
      SELECT
        CAST(SUM(CASE WHEN ok_old IS NOT NULL AND ok_new IS NOT NULL
                       AND oc IS DISTINCT FROM nc THEN 1 ELSE 0 END) AS BIGINT)
          AS chg_custkey,
        CAST(SUM(CASE WHEN ok_old IS NOT NULL AND ok_new IS NOT NULL
                       AND os IS DISTINCT FROM ns THEN 1 ELSE 0 END) AS BIGINT)
          AS chg_status,
        CAST(SUM(CASE WHEN ok_old IS NOT NULL AND ok_new IS NOT NULL
                       AND op IS DISTINCT FROM np THEN 1 ELSE 0 END) AS BIGINT)
          AS chg_price,
        CAST(SUM(CASE WHEN ok_old IS NOT NULL AND ok_new IS NOT NULL
                       AND od IS DISTINCT FROM nd THEN 1 ELSE 0 END) AS BIGINT)
          AS chg_date,
        CAST(SUM(CASE WHEN ok_old IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS added,
        CAST(SUM(CASE WHEN ok_new IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS removed
      FROM j
    )
    SELECT column_name, n_rows FROM (
      SELECT '__added__' AS column_name, added AS n_rows FROM wide
      UNION ALL SELECT '__removed__', removed FROM wide
      UNION ALL SELECT 'o_custkey', chg_custkey FROM wide
      UNION ALL SELECT 'o_orderstatus', chg_status FROM wide
      UNION ALL SELECT 'o_totalprice', chg_price FROM wide
      UNION ALL SELECT 'o_orderdate', chg_date FROM wide
    )
    ORDER BY column_name
"""

_Q253_NOTES = (
    "COLUMN-LEVEL SNAPSHOT DIFF (operators/reconcile.column_diff — the "
    "drill-down after reconcile_buckets q175 / reconcile_rows q213 "
    "flags a mismatch: WHICH columns drifted and how much): one full "
    "outer join on the key (the only shuffle) feeds a single "
    "aggregation whose per-column counters are null-safe IS DISTINCT "
    "FROM sums folded map-side — n columns never means n jobs/joins/"
    "scans (the profile_table discipline). Output long-format, "
    "|cols|+2 rows at any scale; __added__/__removed__ carry key "
    "churn. Fixture drift (price bump, status flip, deletes, key-"
    "shifted inserts) is derived map-side so both engines replay the "
    "identical snapshot pair"
)


ROADMAP7.update(
    {
        "q250_bigram_lm_score": (q250_bigram_lm_score, _Q250_ORACLE, _Q250_NOTES),
        "q251_interpolate_gaps": (
            q251_interpolate_gaps,
            _Q251_ORACLE,
            _Q251_NOTES,
        ),
        "q252_hybrid_retrieval_rrf": (
            q252_hybrid_retrieval_rrf,
            _Q252_ORACLE,
            _Q252_NOTES,
        ),
        "q253_column_diff": (q253_column_diff, _Q253_ORACLE, _Q253_NOTES),
    }
)


def q254_mixed_codec_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.multimodal import image_pixel_stats, with_mixed_codec_payload

    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    stats = image_pixel_stats(with_mixed_codec_payload(docs))
    return stats.select(
        "doc_id", "img_format", "width", "height", "channels", "decoded"
    ).orderBy("doc_id")


_Q254_ORACLE = """
    SELECT doc_id,
           CASE WHEN doc_id % 5 IN (2, 3) THEN 'png' ELSE 'jpeg' END
             AS img_format,
           CAST(16 + doc_id % 17 AS INTEGER) AS width,
           CAST(16 + doc_id % 13 AS INTEGER) AS height,
           CAST(CASE WHEN doc_id % 5 = 3 THEN 4 ELSE 3 END AS INTEGER)
             AS channels,
           TRUE AS decoded
    FROM documents WHERE doc_id < 200
    ORDER BY doc_id
"""

_Q254_NOTES = (
    "MIXED-CODEC REAL DECODE (round 8 — the shapes the r7 verdict "
    "ranked top of Missing): 4:2:0 / 4:2:2 chroma-subsampled baseline "
    "JPEG (llm/jpeg.py: general HixVi MCU layout + replication "
    "upsample, T.81 A.2.3), PROGRESSIVE SOF2 JPEG (Annex G multi-scan "
    "decode: DC first/refine, AC spectral-selection with EOB runs, AC "
    "successive-approximation refinement — bit-identical to the "
    "sequential decode by construction, pinned in tests), and palette "
    "PNG (llm/multimodal.py: PLTE expansion at bit depth 1/2/4/8, "
    "tRNS alpha -> RGBA, sub-byte MSB-first index unpack, fbpp=1 "
    "filters). Every payload is a real spec-conforming stream from "
    "the in-repo encoders; the oracle pins decoded=true with true "
    "dims/channels per the doc_id % 5 rotation (channel means are "
    "pinned by round-trip tolerance pytests in tests/test_round8.py — "
    "lossy JPEG has no exact SQL twin). Arrow-batched map-only plan, "
    "no shuffle; partition parallelism is the decode scale lever"
)


ROADMAP7.update(
    {
        "q254_mixed_codec_decode": (
            q254_mixed_codec_decode,
            _Q254_ORACLE,
            _Q254_NOTES,
        ),
    }
)


def q255_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import cm_estimate, cm_sketch

    li = read_table(spark, sf_dir, "lineitem")
    sk = cm_sketch(li, "l_suppkey", depth=4, width=64)
    exact = li.groupBy("l_suppkey").agg(F.count("*").alias("exact_cnt"))
    est = cm_estimate(
        sk, exact.select("l_suppkey"), "l_suppkey", depth=4, width=64
    )
    return (
        exact.join(est, "l_suppkey")
        .select("l_suppkey", "exact_cnt", "cm_est")
        .orderBy("l_suppkey")
    )


def _q255_oracle() -> str:
    from ..operators.sketch import cm_sketch_sql

    cells = cm_sketch_sql("lineitem", "CAST(l_suppkey AS VARCHAR)", 4, 64)
    probe_hash = (
        "CAST(list_sum(list_transform(generate_series(1, 6), i -> "
        "CAST((strpos('0123456789abcdef', substr(md5(concat("
        "CAST(l_suppkey AS VARCHAR), ':cm:', CAST(r AS VARCHAR))), i, 1))"
        " - 1) AS BIGINT) * CAST(power(16, 6 - i) AS BIGINT))) AS BIGINT)"
        " % 64"
    )
    return f"""
    WITH cells AS ({cells}),
    exact AS (
      SELECT l_suppkey, COUNT(*) AS exact_cnt FROM lineitem GROUP BY 1
    ),
    pb AS (
      SELECT l_suppkey, exact_cnt, r, CAST({probe_hash} AS INTEGER) AS b
      FROM exact
      CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS r)
    )
    SELECT pb.l_suppkey, pb.exact_cnt,
           MIN(COALESCE(cells.cnt, 0)) AS cm_est
    FROM pb LEFT JOIN cells
      ON cells.row = pb.r AND cells.bucket = pb.b
    GROUP BY 1, 2
    ORDER BY pb.l_suppkey
    """


_Q255_NOTES = (
    "COUNT-MIN SKETCH frequency estimation (operators/sketch.py — the "
    "point-frequency member of the sketch family next to HLL/KMV/"
    "Misra-Gries/GK): depth x width counter table built by a map-side "
    "depth-way transform + ONE hash agg (shuffle carries cells per "
    "task, never per input row; the table is metadata-sized at any "
    "corpus size), estimates = MIN over a key's depth cells via a "
    "broadcast join of the sketch. Hashing is the engine-wide md5 rule "
    "(first 6 hex of md5(key:salt:row) mod width) so DuckDB replays "
    "the ENTIRE table and every estimate digit-for-digit — a fully "
    "deterministic, oracle-checkable sketch. The query pins "
    "est >= exact per key structurally (hash compare of both columns)"
)


def q256_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.drift import cusum_scores

    ev = read_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("event_id")
    capped = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 60)
        .select("user_id", "event_id", "value")
    )
    out = cusum_scores(
        capped, "user_id", "event_id", "value", k=0.25, h=2.0
    )
    return out.orderBy("user_id", "event_id")


_Q256_ORACLE = """
    WITH RECURSIVE capped AS (
      SELECT user_id, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id)
               AS rn
      FROM events WHERE value IS NOT NULL
      QUALIFY rn <= 60
    ),
    stats AS (
      SELECT user_id, COUNT(*) AS n,
             SUM(CAST(round(value, 9) AS DECIMAL(38,9))) AS sx,
             SUM(CAST(round(round(value, 9) * round(value, 9), 9)
                 AS DECIMAL(38,9))) AS sxx
      FROM capped GROUP BY 1
    ),
    mus AS (
      SELECT user_id, CAST(sx AS DOUBLE) / n AS mu,
             sqrt((CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / n)
               AS sigma
      FROM stats
    ),
    zs AS (
      SELECT c.user_id, c.event_id, c.rn, (c.value - m.mu) / m.sigma AS z
      FROM capped c JOIN mus m USING (user_id)
    ),
    rec AS (
      SELECT user_id, event_id, rn, z,
             GREATEST(0, z - 0.25) AS sp,
             GREATEST(0, -z - 0.25) AS sn
      FROM zs WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.event_id, s.rn, s.z,
             GREATEST(0, r.sp + s.z - 0.25),
             GREATEST(0, r.sn - s.z - 0.25)
      FROM zs s JOIN rec r ON s.user_id = r.user_id AND s.rn = r.rn + 1
    )
    SELECT user_id, event_id, z, sp AS s_pos, sn AS s_neg,
           (sp > 2.0 OR sn > 2.0) AS alarm
    FROM rec ORDER BY user_id, event_id
"""

_Q256_NOTES = (
    "TWO-SIDED TABULAR CUSUM changepoint detection per key (operators/"
    "drift.cusum_scores — the SEQUENTIAL drift detector next to the "
    "distributional PSI/KS: at which point did this series' level "
    "shift?). Inherently sequential recursion runs per key inside a "
    "grouped Arrow batch (keys parallelize, one key-shuffle — the same "
    "cost class as any per-key window); standardization means/stds "
    "come from 9dp-decimal sums and every derived double (mu, sigma, "
    "z, each max(0, .) recursion step) is RAW IEEE arithmetic on "
    "identical inputs — never re-rounded — so the DuckDB WITH "
    "RECURSIVE oracle matches BIT-FOR-BIT (repr-faithful hash), rare "
    "for a sequential operator. Series capped at 60 rows/key to bound "
    "the oracle's recursion depth; the operator itself has no cap"
)


def q257_welch_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mlmetrics import welch_ttest

    ev = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .withColumn(
            "variant",
            F.when(F.col("user_id") % 2 == 0, "a").otherwise("b"),
        )
    )
    return welch_ttest(
        ev, "event_type", "variant", "value", "a", "b"
    ).orderBy("event_type")


_Q257_ORACLE = """
    WITH tagged AS (
      SELECT event_type,
             CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS variant,
             value
      FROM events WHERE value IS NOT NULL
    ),
    per AS (
      SELECT event_type, variant, COUNT(*) AS n,
             SUM(CAST(round(value, 9) AS DECIMAL(38,9))) AS sx,
             SUM(CAST(round(round(value, 9) * round(value, 9), 9)
                 AS DECIMAL(38,9))) AS sxx
      FROM tagged GROUP BY 1, 2
    ),
    sides AS (
      SELECT a.event_type,
             a.n AS n_a, b.n AS n_b,
             CAST(a.sx AS DOUBLE) / a.n AS mean_a,
             CAST(b.sx AS DOUBLE) / b.n AS mean_b,
             (CAST(a.sxx AS DOUBLE) - CAST(a.sx AS DOUBLE)
              * CAST(a.sx AS DOUBLE) / a.n) / (a.n - 1) AS var_a,
             (CAST(b.sxx AS DOUBLE) - CAST(b.sx AS DOUBLE)
              * CAST(b.sx AS DOUBLE) / b.n) / (b.n - 1) AS var_b
      FROM (SELECT * FROM per WHERE variant = 'a') a
      JOIN (SELECT * FROM per WHERE variant = 'b') b USING (event_type)
    )
    SELECT event_type, n_a, n_b, mean_a, mean_b,
           (mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b) AS t_stat,
           (var_a / n_a + var_b / n_b) * (var_a / n_a + var_b / n_b)
             / ((var_a / n_a) * (var_a / n_a) / (n_a - 1)
                + (var_b / n_b) * (var_b / n_b) / (n_b - 1)) AS df_welch
    FROM sides ORDER BY event_type
"""

_Q257_NOTES = (
    "WELCH TWO-SAMPLE T-TEST per segment (operators/mlmetrics."
    "welch_ttest — the A/B experiment readout: unequal-variance t and "
    "Welch-Satterthwaite df per event_type between deterministic "
    "user-parity variants): ONE decimal-stabilized hash agg over "
    "(segment, variant) — map-side combined, metadata-sized — then a "
    "segments-sized self-join. t and df are raw IEEE doubles of the "
    "identical decimal moments, bit-matched by the oracle; the p-value "
    "lookup (t CDF) is a client-side table, the engine contract ends "
    "at (t, df)"
)


def q258_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import mutual_information

    ev = read_table(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 5).alias("cohort")
    )
    return mutual_information(ev, "event_type", "cohort")


_Q258_ORACLE = """
    WITH cells AS (
      SELECT CAST(event_type AS VARCHAR) AS x,
             CAST(user_id % 5 AS VARCHAR) AS y, COUNT(*) AS nxy
      FROM events
      WHERE event_type IS NOT NULL AND user_id IS NOT NULL
      GROUP BY 1, 2
    ),
    mx AS (SELECT x, SUM(nxy) AS nx FROM cells GROUP BY 1),
    my AS (SELECT y, SUM(nxy) AS ny FROM cells GROUP BY 1),
    tot AS (SELECT SUM(nxy) AS n FROM cells),
    mi AS (
      SELECT COUNT(*) AS cells, MAX(CAST(t.n AS DOUBLE)) AS n,
             SUM(CAST(round(CAST(c.nxy AS DOUBLE) / t.n
                 * ln(CAST(c.nxy AS DOUBLE) * t.n
                      / (CAST(mx.nx AS DOUBLE) * CAST(my.ny AS DOUBLE))),
                 9) AS DECIMAL(38,9))) AS mi_d
      FROM cells c JOIN mx ON c.x = mx.x JOIN my ON c.y = my.y
      CROSS JOIN tot t
    ),
    hx AS (
      SELECT SUM(CAST(round(
               -(CAST(nx AS DOUBLE) / t.n) * ln(CAST(nx AS DOUBLE) / t.n),
               9) AS DECIMAL(38,9))) AS hx_d
      FROM mx CROSS JOIN tot t
    ),
    hy AS (
      SELECT SUM(CAST(round(
               -(CAST(ny AS DOUBLE) / t.n) * ln(CAST(ny AS DOUBLE) / t.n),
               9) AS DECIMAL(38,9))) AS hy_d
      FROM my CROSS JOIN tot t
    )
    SELECT mi.cells, CAST(mi.n AS BIGINT) AS n,
           round(CAST(mi_d AS DOUBLE), 6) AS mi,
           round(CAST(hx_d AS DOUBLE), 6) AS h_x,
           round(CAST(hy_d AS DOUBLE), 6) AS h_y,
           round(CAST(mi_d AS DOUBLE)
                 / sqrt(CAST(hx_d AS DOUBLE) * CAST(hy_d AS DOUBLE)), 6)
             + 0.0 AS nmi
    FROM mi CROSS JOIN hx CROSS JOIN hy
"""

_Q258_NOTES = (
    "MUTUAL INFORMATION + marginal entropies + NMI between two "
    "categorical columns (operators/profile.mutual_information — the "
    "feature-selection/redundancy readout next to FD discovery, which "
    "is its MI(X;Y)=H(Y) limit): one hash agg over (x,y) cells, "
    "marginals derived from the SAME cells (no second corpus scan), "
    "per-cell nats terms 9dp-rounded and decimal-summed so the "
    "reduction is order-independent and the oracle replays it "
    "digit-for-digit. Output one row at 6dp"
)


def q259_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import acf_by_key

    ev = read_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    return acf_by_key(ev, "user_id", "event_id", "value").orderBy(
        "user_id", "lag"
    )


_Q259_ORACLE = """
    WITH base AS (
      SELECT user_id, event_id, value FROM events WHERE value IS NOT NULL
    ),
    stats AS (
      SELECT user_id, COUNT(*) AS n,
             SUM(CAST(round(value, 9) AS DECIMAL(38,9))) AS sx
      FROM base GROUP BY 1
    ),
    zs AS (
      SELECT b.user_id, b.event_id,
             round(b.value, 9) - CAST(s.sx AS DOUBLE) / s.n AS z
      FROM base b JOIN stats s USING (user_id)
    ),
    lagged AS (
      SELECT user_id, event_id, z,
             lag(z, 1) OVER w AS z1,
             lag(z, 2) OVER w AS z2,
             lag(z, 3) OVER w AS z3
      FROM zs
      WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    ),
    num AS (
      SELECT user_id, u.lag,
             COUNT(*) AS n_pairs,
             SUM(CAST(round(z * CASE u.lag WHEN 1 THEN z1
                                          WHEN 2 THEN z2
                                          ELSE z3 END, 9)
                 AS DECIMAL(38,9))) AS num
      FROM lagged
      CROSS JOIN (SELECT unnest(generate_series(1, 3)) AS lag) u
      WHERE CASE u.lag WHEN 1 THEN z1 WHEN 2 THEN z2 ELSE z3 END
            IS NOT NULL
      GROUP BY 1, 2
    ),
    den AS (
      SELECT user_id,
             SUM(CAST(round(z * z, 9) AS DECIMAL(38,9))) AS szz
      FROM zs GROUP BY 1
    )
    SELECT n.user_id, CAST(n.lag AS INTEGER) AS lag, n.n_pairs,
           round(CAST(n.num AS DOUBLE) / CAST(d.szz AS DOUBLE), 6)
             + 0.0 AS acf
    FROM num n JOIN den d USING (user_id)
    ORDER BY n.user_id, n.lag
"""

_Q259_NOTES = (
    "PER-KEY LAG-k AUTOCORRELATION (operators/timeseries.acf_by_key — "
    "the seasonality/persistence readout next to interpolation/SCD2): "
    "one (key, order) window sort shared by ALL lags (lag columns ride "
    "the same frame), one map-side array-of-structs explode (rows x "
    "|lags|, no self-join), one hash agg. Means from decimal sums; "
    "z-products 9dp-rounded decimals (order-independent reduction); "
    "the oracle replays the identical window + sums digit-for-digit. "
    "At 100 TB this is the sort-once multi-statistic pattern: adding a "
    "lag adds zero shuffles"
)


ROADMAP7.update(
    {
        "q255_count_min_sketch": (
            q255_count_min_sketch,
            _q255_oracle(),
            _Q255_NOTES,
        ),
        "q256_cusum_changepoints": (
            q256_cusum_changepoints,
            _Q256_ORACLE,
            _Q256_NOTES,
        ),
        "q257_welch_ab_test": (
            q257_welch_ab_test,
            _Q257_ORACLE,
            _Q257_NOTES,
        ),
        "q258_mutual_information": (
            q258_mutual_information,
            _Q258_ORACLE,
            _Q258_NOTES,
        ),
        "q259_autocorrelation": (
            q259_autocorrelation,
            _Q259_ORACLE,
            _Q259_NOTES,
        ),
    }
)


def q260_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.features import target_encode

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    return (
        target_encode(li, "l_returnflag", "l_quantity", m=10.0)
        .select("l_orderkey", "l_linenumber", "l_returnflag", "te")
        .orderBy("l_orderkey", "l_linenumber")
    )


_Q260_ORACLE = """
    WITH per AS (
      SELECT l_returnflag, COUNT(*) AS n_cat,
             SUM(CAST(round(CAST(l_quantity AS DOUBLE), 9)
                 AS DECIMAL(38,9))) AS sy
      FROM lineitem GROUP BY 1
    ),
    g AS (
      SELECT COUNT(*) AS n_all,
             SUM(CAST(round(CAST(l_quantity AS DOUBLE), 9)
                 AS DECIMAL(38,9))) AS sy_all
      FROM lineitem
    )
    SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
           (CAST(p.sy AS DOUBLE) - CAST(l.l_quantity AS DOUBLE)
            + 10.0 * (CAST(g.sy_all AS DOUBLE) / g.n_all))
             / (p.n_cat - 1 + 10.0) AS te
    FROM lineitem l JOIN per p USING (l_returnflag) CROSS JOIN g
    ORDER BY l.l_orderkey, l.l_linenumber
"""

_Q260_NOTES = (
    "LEAVE-ONE-OUT SMOOTHED TARGET ENCODING (operators/features."
    "target_encode — the leak-free categorical encoder: te_i = "
    "(sum_cat(y) - y_i + m*prior)/(n_cat - 1 + m), so a row can never "
    "see its own label and singleton categories shrink to the prior): "
    "one (cat) hash agg + one 1-row global agg, both broadcast back; "
    "the per-row encoding is a map-side expression over the original "
    "partitioning — zero row shuffles at any scale. Decimal label "
    "sums; te is the raw IEEE double of identical inputs, bit-matched "
    "by the oracle"
)


def q261_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.features import feature_hash

    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 200
    )
    return feature_hash(docs, "doc_id", "text", dim=32).orderBy(
        "doc_id", "dim_idx"
    )


def _q261_oracle() -> str:
    bucket = _shard_sql("tok", ":fh", 32)
    return f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
      FROM documents WHERE doc_id < 200
    ),
    h AS (
      SELECT doc_id,
             CAST({bucket} AS INTEGER) AS dim_idx,
             CASE WHEN (strpos('0123456789abcdef',
                        substr(md5(concat(tok, ':fh')), 7, 1)) - 1) % 2 = 0
                  THEN 1 ELSE -1 END AS s
      FROM toks WHERE tok <> ''
    )
    SELECT doc_id, dim_idx, CAST(SUM(s) AS BIGINT) AS val
    FROM h GROUP BY 1, 2
    HAVING SUM(s) <> 0
    ORDER BY doc_id, dim_idx
    """


_Q261_NOTES = (
    "FEATURE HASHING / hashing trick (operators/features.feature_hash "
    "— unbounded token vocabularies into a fixed dimensionality, "
    "Weinberger et al. 2009: bucket = md5(tok:salt) mod d, a second "
    "md5 hex digit gives the +-1 sign so collisions cancel unbiased): "
    "map-side split+explode, ONE (id, dim) hash agg, no joins, no "
    "vocabulary state — the streaming-friendly encoder. Sparse "
    "(id, dim_idx, val) output is the 100 TB-honest shape. md5 rule "
    "makes every bucket and sign digit-replayable in the oracle"
)


def q262_woe_information_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.features import woe_iv

    orders = read_table(spark, sf_dir, "orders").withColumn(
        "bad", F.col("o_orderstatus") == "F"
    )
    out = woe_iv(orders, "o_orderpriority", "bad")
    # ln() is not correctly-rounded — JVM vs libm differ in the last
    # ulp — so the catalog surface rounds at 6dp (both engines round
    # the same double, far from any tie at this magnitude)
    return out.select(
        "o_orderpriority",
        "n_pos",
        "n_neg",
        F.round("woe", 6).alias("woe"),
        F.round("iv_term", 6).alias("iv_term"),
    ).orderBy("o_orderpriority")


_Q262_ORACLE = """
    WITH per AS (
      SELECT o_orderpriority,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_pos,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END)
                  AS BIGINT) AS n_neg
      FROM orders GROUP BY 1
    ),
    t AS (
      SELECT CAST(SUM(n_pos) AS BIGINT) AS p_all,
             CAST(SUM(n_neg) AS BIGINT) AS n_all
      FROM per
    )
    SELECT o_orderpriority, n_pos, n_neg,
           round(ln(((n_pos + 0.5) / (p_all + 1.0))
              / ((n_neg + 0.5) / (n_all + 1.0))), 6) AS woe,
           round((CAST(n_pos AS DOUBLE) / p_all
                  - CAST(n_neg AS DOUBLE) / n_all)
             * ln(((n_pos + 0.5) / (p_all + 1.0))
                  / ((n_neg + 0.5) / (n_all + 1.0))), 6) AS iv_term
    FROM per CROSS JOIN t
    ORDER BY o_orderpriority
"""

_Q262_NOTES = (
    "WEIGHT OF EVIDENCE + INFORMATION VALUE per category (operators/"
    "features.woe_iv — the monotone-risk categorical encoding and its "
    "feature-strength summary, Laplace-smoothed so empty cells stay "
    "finite): one (cat) hash agg with conditional counts; P/N totals "
    "derive from the SAME aggregate rows (broadcast 1-row — no second "
    "scan). woe/iv are raw IEEE doubles of exact integer counts, "
    "bit-matched by the oracle; SUM(iv_term) is the feature's IV"
)


def q263_temporal_embargo_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.sampling import temporal_split_embargo

    ev = read_table(spark, sf_dir, "events")
    return temporal_split_embargo(
        ev, "user_id", "ts", 0.8, 3600
    ).select("event_id", "user_id", "split").orderBy("event_id")


_Q263_ORACLE = """
    WITH cuts AS (
      SELECT user_id,
             quantile_disc(CAST(epoch_us(ts) AS DOUBLE), 0.8) AS cut_us
      FROM events GROUP BY 1
    )
    SELECT e.event_id, e.user_id,
           CASE WHEN c.cut_us - epoch_us(e.ts) > 3600000000 THEN 'train'
                WHEN epoch_us(e.ts) > c.cut_us THEN 'test'
                ELSE 'embargo' END AS split
    FROM events e JOIN cuts c USING (user_id)
    ORDER BY e.event_id
"""

_Q263_NOTES = (
    "TEMPORAL TRAIN/TEST SPLIT WITH EMBARGO (llm/sampling."
    "temporal_split_embargo — the time-series sibling of the "
    "cluster-embargo leakage_safe_split: per-key cutoff at the "
    "DISCRETE 0.8 quantile of the key's own timestamps — an actual "
    "observed value, no interpolation ambiguity — and rows within the "
    "embargo interval before the cutoff are dropped so train features "
    "cannot see test-adjacent time): one per-key exact-quantile agg "
    "broadcast back, assignment map-side. Spark percentile_disc and "
    "DuckDB quantile_disc agree on the smallest-cume_dist>=p element "
    "(verified empirically)"
)


ROADMAP7.update(
    {
        "q260_target_encoding": (
            q260_target_encoding,
            _Q260_ORACLE,
            _Q260_NOTES,
        ),
        "q261_feature_hashing": (
            q261_feature_hashing,
            _q261_oracle(),
            _Q261_NOTES,
        ),
        "q262_woe_information_value": (
            q262_woe_information_value,
            _Q262_ORACLE,
            _Q262_NOTES,
        ),
        "q263_temporal_embargo_split": (
            q263_temporal_embargo_split,
            _Q263_ORACLE,
            _Q263_NOTES,
        ),
    }
)


def q264_spearman_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mlmetrics import spearman_by_group

    ev = read_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    return spearman_by_group(ev, "event_type", "user_id", "value").orderBy(
        "event_type"
    )


_Q264_ORACLE = """
    WITH base AS (
      SELECT event_type, user_id, value FROM events
      WHERE value IS NOT NULL
    ),
    ranked AS (
      SELECT event_type,
             CAST(rank() OVER (PARTITION BY event_type ORDER BY user_id)
                  AS DOUBLE)
               + (COUNT(*) OVER (PARTITION BY event_type, user_id) - 1)
                 / 2.0 AS rx,
             CAST(rank() OVER (PARTITION BY event_type ORDER BY value)
                  AS DOUBLE)
               + (COUNT(*) OVER (PARTITION BY event_type, value) - 1)
                 / 2.0 AS ry
      FROM base
    ),
    agg AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(CAST(rx AS DECIMAL(38,9))) AS sx,
             SUM(CAST(ry AS DECIMAL(38,9))) AS sy,
             SUM(CAST(round(rx * ry, 9) AS DECIMAL(38,9))) AS sxy,
             SUM(CAST(round(rx * rx, 9) AS DECIMAL(38,9))) AS sxx,
             SUM(CAST(round(ry * ry, 9) AS DECIMAL(38,9))) AS syy
      FROM ranked GROUP BY 1
    )
    SELECT event_type, n,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
             + 0.0 AS rho
    FROM agg ORDER BY event_type
"""

_Q264_NOTES = (
    "SPEARMAN RANK CORRELATION per group with average-rank tie "
    "handling (operators/mlmetrics.spearman_by_group — the monotone-"
    "association companion to Pearson/regr_: rank() + per-value tie "
    "count windows sharing ONE group exchange, then decimal Pearson "
    "moments over the ranks). Ranks are exact halves and every "
    "downstream op is correctly-rounded IEEE, rho rounds at 6dp: the rank-product "
    "decimal sums exceed 2^53 at scale, where decimal->double casts "
    "are last-ulp engine-dependent (the q264/q266 lesson — raw-double "
    "bit portability holds only for sub-2^53 decimal pipelines)"
)


def q265_conformal_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mlmetrics import conformal_intervals

    ev = read_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    return conformal_intervals(
        ev, "event_type", "event_id", "value", alpha=0.9
    ).orderBy("event_id")


_Q265_ORACLE = """
    WITH tagged AS (
      SELECT event_type, event_id, value,
             CAST(list_sum(list_transform(generate_series(1, 6), i ->
               CAST((strpos('0123456789abcdef', substr(md5(concat(
                 CAST(event_id AS VARCHAR), ':conf')), i, 1)) - 1)
                 AS BIGINT)
               * CAST(power(16, 6 - i) AS BIGINT))) AS BIGINT) % 2 = 0
               AS fit
      FROM events WHERE value IS NOT NULL
    ),
    pred AS (
      SELECT event_type,
             CAST(SUM(CAST(round(value, 9) AS DECIMAL(38,9)))
                  AS DOUBLE) / COUNT(*) AS pred
      FROM tagged WHERE fit GROUP BY 1
    ),
    calib AS (
      SELECT t.event_type, t.event_id, t.value, p.pred
      FROM tagged t JOIN pred p USING (event_type)
      WHERE NOT t.fit
    ),
    radius AS (
      SELECT event_type, quantile_disc(abs(value - pred), 0.9) AS q
      FROM calib GROUP BY 1
    )
    SELECT c.event_id, c.event_type, c.value AS y, c.pred,
           c.pred - r.q AS lo, c.pred + r.q AS hi
    FROM calib c JOIN radius r USING (event_type)
    ORDER BY c.event_id
"""

_Q265_NOTES = (
    "SPLIT-CONFORMAL PREDICTION INTERVALS per segment (operators/"
    "mlmetrics.conformal_intervals — distribution-free coverage: the "
    "alpha-quantile of calibration |residuals| around a fit-half mean "
    "prediction gives finite-sample coverage >= alpha): deterministic "
    "md5 half-split, two metadata-sized per-segment aggs (decimal "
    "mean; DISCRETE quantile — an observed residual) broadcast back, "
    "everything else map-side. Bit-portable with zero rounding "
    "(md5 split + quantile_disc + correctly-rounded arithmetic); "
    "coverage law pinned in pytest"
)


def q266_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import gini_lorenz

    li = read_table(spark, sf_dir, "lineitem")
    return gini_lorenz(
        li, "l_returnflag", "l_extendedprice", "l_orderkey"
    ).orderBy("l_returnflag")


_Q266_ORACLE = """
    WITH ranked AS (
      SELECT l_returnflag,
             round(CAST(l_extendedprice AS DOUBLE), 9) AS x,
             CAST(row_number() OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice, l_orderkey) AS DOUBLE) AS i
      FROM lineitem
    ),
    agg AS (
      SELECT l_returnflag, COUNT(*) AS n,
             SUM(CAST(x AS DECIMAL(38,9))) AS sx,
             SUM(CAST(round(i * x, 9) AS DECIMAL(38,9))) AS six
      FROM ranked GROUP BY 1
    )
    SELECT l_returnflag, n, CAST(sx AS DOUBLE) AS total,
           round(2.0 * CAST(six AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
             - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6)
             + 0.0 AS gini
    FROM agg ORDER BY l_returnflag
"""

_Q266_NOTES = (
    "GINI CONCENTRATION coefficient per group (operators/profile."
    "gini_lorenz — how unevenly a quantity is spread across members; "
    "the curation readout for token/domain imbalance): exact rank "
    "formula 2*Sum(i*x_i)/(n*Sum x) - (n+1)/n over ONE per-group "
    "window sort with deterministic tie order, one decimal agg — the "
    "sort-once pattern. 6dp output (the i*x decimal sum exceeds 2^53 "
    "at scale); row_number tie order pinned by the (value, id) sort "
    "in both engines"
)


def q267_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mlmetrics import isotonic_calibrate

    ev = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .withColumn("lab", (F.col("value") > 40).cast("double"))
    )
    return isotonic_calibrate(ev, "event_type", "value", "lab").orderBy(
        "event_type", "value", "y"
    )


_Q267_ORACLE = """
    WITH base AS (
      SELECT event_type AS g, CAST(value AS DOUBLE) AS score,
             CAST(value > 40 AS DOUBLE) AS y
      FROM events WHERE value IS NOT NULL
    ),
    pos AS (
      SELECT g, score, y,
             row_number() OVER (PARTITION BY g ORDER BY score, y) AS i,
             sum(y) OVER (PARTITION BY g ORDER BY score, y
                          ROWS UNBOUNDED PRECEDING) AS s
      FROM base
    ),
    pairs AS (
      SELECT a.g, a.i AS j, b.i AS k,
             (b.s - a.s + a.y) / (b.i - a.i + 1) AS avg_jk
      FROM pos a JOIN pos b ON a.g = b.g AND b.i >= a.i
    ),
    m AS (
      SELECT g, j, k AS i,
             min(avg_jk) OVER (PARTITION BY g, j ORDER BY k DESC
                               ROWS UNBOUNDED PRECEDING) AS mn
      FROM pairs
    ),
    fit AS (SELECT g, i, max(mn) AS cal FROM m WHERE j <= i GROUP BY g, i)
    SELECT p.g AS event_type, p.score AS value, p.y AS y,
           round(f.cal, 9) AS calibrated
    FROM pos p JOIN fit f ON f.g = p.g AND f.i = p.i
    ORDER BY event_type, value, y
"""

_Q267_NOTES = (
    "ISOTONIC (PAV) CALIBRATION per group (operators/mlmetrics."
    "isotonic_calibrate — the non-parametric monotone calibration map, "
    "no bin-width choice, next to q227's fixed-bin report): pool-"
    "adjacent-violators is inherently sequential per group, so it runs "
    "in a grouped Arrow batch over numpy (keys parallelize, one key "
    "shuffle — the CUSUM contract). Converted from rows-only in round "
    "11 (VERDICT r10 item 4, fourth conversion): PAV's fit has the "
    "minimax closed form fitted[i] = max_{j<=i} min_{k>=i} avg(y_j..k) "
    "[Best & Chakravarti 1990], O(n^2)-pair-expressible in SQL at "
    "oracle scale; with 0/1 labels every pool mean is an exact "
    "small-int / small-int division, so both engines produce "
    "bit-identical doubles (9dp-rounded on both legs as belt). "
    "Monotonicity / mean-preservation / block-mean laws stay "
    "pytest-pinned"
)


ROADMAP7.update(
    {
        "q264_spearman_correlation": (
            q264_spearman_correlation,
            _Q264_ORACLE,
            _Q264_NOTES,
        ),
        "q265_conformal_intervals": (
            q265_conformal_intervals,
            _Q265_ORACLE,
            _Q265_NOTES,
        ),
        "q266_gini_concentration": (
            q266_gini_concentration,
            _Q266_ORACLE,
            _Q266_NOTES,
        ),
        "q267_isotonic_calibration": (
            q267_isotonic_calibration,
            _Q267_ORACLE,
            _Q267_NOTES,
        ),
    }
)


def q268_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangular cohort-retention matrix: users cohorted by their
    first-activity month; each later month's retention is the distinct
    active share of the cohort. The analytics classic the KM survival
    curve (q238) summarizes — this is the full matrix form.

    Plan: one distinct (user, month) projection feeds BOTH the cohort
    assignment (min month per user) and the activity matrix — the
    cohort frame is user-sized and broadcasts; ratios are small-int
    divisions (sub-2^53 → raw doubles bit-portable)."""
    ev = read_table(spark, sf_dir, "events")
    um = (
        ev.select(
            "user_id",
            F.date_trunc("month", F.col("ts").cast("timestamp")).alias("m"),
        )
        .distinct()
    )
    cohorts = um.groupBy("user_id").agg(F.min("m").alias("cohort_month"))
    sizes = cohorts.groupBy("cohort_month").agg(
        F.count("*").alias("cohort_size")
    )
    mat = (
        um.join(F.broadcast(cohorts), "user_id")
        .select(
            "user_id",
            "cohort_month",
            F.months_between(F.col("m"), F.col("cohort_month"))
            .cast("int")
            .alias("month_offset"),
        )
        .groupBy("cohort_month", "month_offset")
        .agg(F.count("*").alias("n_active"))
    )
    return (
        mat.join(F.broadcast(sizes), "cohort_month")
        .select(
            "cohort_month",
            "month_offset",
            "n_active",
            "cohort_size",
            (
                F.col("n_active").cast("double") / F.col("cohort_size")
            ).alias("retention"),
        )
        .orderBy("cohort_month", "month_offset")
    )


_Q268_ORACLE = """
    WITH um AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('month', ts) AS TIMESTAMP) AS m
      FROM events
    ),
    cohorts AS (
      SELECT user_id, MIN(m) AS cohort_month FROM um GROUP BY 1
    ),
    sizes AS (
      SELECT cohort_month, COUNT(*) AS cohort_size FROM cohorts GROUP BY 1
    ),
    mat AS (
      SELECT c.cohort_month,
             CAST(date_diff('month', c.cohort_month, u.m) AS INTEGER)
               AS month_offset,
             COUNT(*) AS n_active
      FROM um u JOIN cohorts c USING (user_id)
      GROUP BY 1, 2
    )
    SELECT m.cohort_month, m.month_offset, m.n_active, s.cohort_size,
           CAST(m.n_active AS DOUBLE) / s.cohort_size AS retention
    FROM mat m JOIN sizes s USING (cohort_month)
    ORDER BY m.cohort_month, m.month_offset
"""

_Q268_NOTES = (
    "COHORT RETENTION MATRIX (first-activity-month cohorts x month "
    "offset, distinct-active share — the full-matrix form of q238's "
    "survival summary): ONE distinct (user, month) projection feeds "
    "both cohort assignment and the activity matrix; the cohort frame "
    "is user-sized and broadcasts, so the event corpus is scanned "
    "once and never re-shuffled. Month arithmetic is exact on "
    "truncated dates in both engines; retention ratios are small-int "
    "divisions — raw-double bit-portable per the SCALE.md taxonomy"
)


ROADMAP7.update(
    {
        "q268_cohort_retention": (
            q268_cohort_retention,
            _Q268_ORACLE,
            _Q268_NOTES,
        ),
    }
)


def q269_kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import canonical_edges, k_core

    ev = read_table(spark, sf_dir, "events")
    pairs = ev.select(
        (F.col("user_id") % 397).alias("src"),
        (F.col("event_id") % 389).alias("dst"),
    )
    edges = canonical_edges(pairs, "src", "dst")
    return k_core(edges, k=4).orderBy("node")


def _q269_oracle(k: int = 4, rounds: int = 6) -> str:
    """Unrolled peeling oracle (the q230 LPA discipline): one
    degree+filter+join CTE chain per round. The Spark side iterates to
    the TRUE fixpoint; the unroll is safe because the fixture reaches
    it in ≤ 4 rounds at both driver scales (measured) and extra rounds
    are no-ops on a converged edge set."""
    head = """
    WITH e0 AS MATERIALIZED (
      SELECT DISTINCT LEAST(user_id % 397, event_id % 389) AS a,
                      GREATEST(user_id % 397, event_id % 389) AS b
      FROM events
      WHERE user_id % 397 <> event_id % 389
    )"""
    parts = [head]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(f""",
    d{r} AS MATERIALIZED (
      SELECT node, COUNT(*) AS deg FROM (
        SELECT a AS node FROM e{p} UNION ALL SELECT b AS node FROM e{p}
      ) GROUP BY 1
    ),
    k{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE deg >= {k}),
    e{r} AS MATERIALIZED (
      SELECT e.a, e.b
      FROM e{p} e
      JOIN k{r} ka ON e.a = ka.node
      JOIN k{r} kb ON e.b = kb.node
    )""")
    parts.append(f"""
    SELECT node, COUNT(*) AS degree FROM (
      SELECT a AS node FROM e{rounds}
      UNION ALL SELECT b AS node FROM e{rounds}
    ) GROUP BY 1 ORDER BY node""")
    return "".join(parts)


_Q269_NOTES = (
    "K-CORE DECOMPOSITION (operators/graph.k_core — the dense-backbone "
    "filter: iterative peeling of nodes with degree < k until "
    "fixpoint, next to triangles/LPA in the graph family): each round "
    "is one degree agg + two semi-joins (keyed shuffles only, no "
    "NLJ), the edge set only shrinks, lineage truncated per round "
    "(eager localCheckpoint) with an O(1) convergence count. Oracle "
    "is the q230-style unrolled-CTE peel (6 rounds > the measured "
    "fixpoint at both driver scales; extra rounds are no-ops)"
)


ROADMAP7.update(
    {
        "q269_kcore_decomposition": (
            q269_kcore_decomposition,
            _q269_oracle(),
            _Q269_NOTES,
        ),
    }
)


def q270_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import rake_keywords

    docs = read_table(spark, sf_dir, "documents")
    return rake_keywords(docs, "doc_id", "text").orderBy("word")


def _q270_oracle() -> str:
    from ..functions.text import STOPWORDS

    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
    WITH toks AS MATERIALIZED (
      SELECT _doc, u['i'] - 1 AS _pos,
             regexp_replace(u['t'], '[^a-z0-9]', '', 'g') AS _tok
      FROM (
        SELECT doc_id AS _doc,
               unnest(list_transform(
                 string_split_regex(lower(trim(text)), '\\s+'),
                 (x, i) -> {{'t': x, 'i': i}})) AS u
        FROM documents
      )
    ),
    flagged AS MATERIALIZED (
      SELECT _doc, _pos, _tok,
             (_tok IN ({stop_list}) OR _tok = '') AS _stop,
             SUM(CASE WHEN (_tok IN ({stop_list}) OR _tok = '')
                 THEN 1 ELSE 0 END)
               OVER (PARTITION BY _doc ORDER BY _pos) AS _isl
      FROM toks
    ),
    islands AS MATERIALIZED (
      SELECT _doc, _pos, _tok, _isl FROM flagged WHERE NOT _stop
    ),
    phrases AS MATERIALIZED (
      SELECT _doc, _isl, COUNT(*) AS _plen FROM islands GROUP BY 1, 2
    )
    SELECT i._tok AS word, COUNT(*) AS freq,
           CAST(SUM(p._plen) AS BIGINT) AS degree,
           CAST(SUM(p._plen) AS DOUBLE) / COUNT(*) AS score
    FROM islands i JOIN phrases p USING (_doc, _isl)
    GROUP BY 1 ORDER BY word
    """


_Q270_NOTES = (
    "RAKE KEYWORD EXTRACTION (functions/text.rake_keywords, Rose et "
    "al. 2010 — corpus keyword scores degree/freq where degree sums "
    "the lengths of the stopword-delimited phrases a word appears in): "
    "phrase segmentation is GAPS-AND-ISLANDS (posexplode + stopword "
    "flag + running-sum island id per doc — one per-doc window, no "
    "regex-dialect surgery), then two corpus-keyed aggs. Score is a "
    "small-int division — raw-double bit-portable. DuckDB twin "
    "replays the identical island construction (regexp_replace with "
    "the 'g' flag — DuckDB replaces first-only by default, the one "
    "dialect trap here)"
)


ROADMAP7.update(
    {
        "q270_rake_keywords": (
            q270_rake_keywords,
            _q270_oracle(),
            _Q270_NOTES,
        ),
    }
)


def q271_bpe_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.bpe import bpe_train

    docs = read_table(spark, sf_dir, "documents")
    merges, _state = bpe_train(docs, "text", n_merges=12)
    return spark.createDataFrame(
        [
            (rank, left, right, merged, cnt)
            for rank, (left, right, merged, cnt) in enumerate(merges, 1)
        ],
        "rank int, left string, right string, merged string, pair_count long",
    ).orderBy("rank")


_Q271_NOTES = (
    "DISTRIBUTED BPE TOKENIZER TRAINING (llm/bpe.bpe_train, Sennrich "
    "et al. 2016 — learns the merge table behind GPT-2-style "
    "vocabularies; completes the round-6 pluggable-tokenizer boundary "
    "with an in-engine trainer): ONE corpus scan builds the "
    "distinct-word frequency table, which stays a DataFrame (at 100 "
    "TB the type table itself exceeds driver memory); each merge "
    "round is a map-side adjacent-pair explode + one hash agg + an "
    "O(1) argmax collect (count desc, pair asc tie rule) + a map-side "
    "Arrow rewrite, lineage truncated per round. Inherently iterative "
    "(PageRank class): rows-only entry; EXACT merge-sequence parity "
    "with a pure-python reference BPE is pytest-pinned"
)


ROADMAP7.update(
    {
        "q271_bpe_vocabulary": (q271_bpe_vocabulary, None, _Q271_NOTES),
    }
)


def q272_fd_violation_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import fd_repair

    # near-FD fixture: y = user_id % 7 corrupted on event_id % 97 == 0
    # rows (deterministic, replayed identically by the oracle) — the
    # repair must recover the majority (clean) value per user
    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        F.when(F.col("event_id") % 97 == 0, (F.col("user_id") + 1) % 7)
        .otherwise(F.col("user_id") % 7)
        .alias("segment"),
    )
    return fd_repair(ev, ["user_id"], "segment").orderBy("user_id")


_Q272_ORACLE = """
    WITH fx AS (
      SELECT user_id,
             CASE WHEN event_id % 97 = 0 THEN (user_id + 1) % 7
                  ELSE user_id % 7 END AS segment
      FROM events
    ),
    pair AS (
      SELECT user_id, segment AS _y, COUNT(*) AS _c
      FROM fx WHERE segment IS NOT NULL
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT user_id, _y, _c,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY _c DESC, _y ASC) AS _rk,
             SUM(_c) OVER (PARTITION BY user_id) AS _n,
             COUNT(*) OVER (PARTITION BY user_id) AS _nd
      FROM pair
    )
    SELECT user_id, _y AS suggested, CAST(_n AS BIGINT) AS n_rows,
           CAST(_nd AS BIGINT) AS n_distinct,
           CAST(_c AS DOUBLE) / _n AS support
    FROM ranked WHERE _rk = 1 AND _nd > 1
    ORDER BY user_id
"""

_Q272_NOTES = (
    "FD VIOLATION REPAIR (operators/profile.fd_repair — the action "
    "step after q234's FD discovery flags X->Y as ALMOST holding: "
    "modal-value suggestions per violating determinant group, ties to "
    "the smallest value for determinism): one (X,Y) hash agg, then "
    "argmax/total windows over the DISTINCT-PAIR table (group "
    "cardinality, not row cardinality — metadata-shaped at 100 TB). "
    "Fixture corruption is a deterministic map-side CASE both engines "
    "replay identically; support ratios are small-int divisions"
)


ROADMAP7.update(
    {
        "q272_fd_violation_repair": (
            q272_fd_violation_repair,
            _Q272_ORACLE,
            _Q272_NOTES,
        ),
    }
)


def q273_streaming_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q256's exact CUSUM configuration driven through the STREAMING
    runtime: the capped per-key series is standardized batch-side (the
    reference yardstick), split into two ORDERED parquet chunks, and
    replayed file-by-file through the stateful stream — so the oracle
    is the SAME recursive SQL as q256, now pinning cross-micro-batch
    state carry under the driver's hash compare."""
    import os
    import tempfile

    from pyspark.sql import Window

    from ..streaming.cusum import streaming_cusum
    from ..streaming.runner import run_available_now

    dec = "decimal(38,9)"
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("event_id")
    capped = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 60)
        .select("user_id", "event_id", "value")
    )
    xd = F.round(F.col("value").cast("double"), 9)
    stats = (
        capped.select(
            "user_id",
            xd.cast(dec).alias("x"),
            F.round(xd * xd, 9).cast(dec).alias("xx"),
        )
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("xx").alias("sxx"),
        )
        .select(
            "user_id",
            (F.col("sx").cast("double") / F.col("n")).alias("mu"),
            F.sqrt(
                (
                    F.col("sxx").cast("double")
                    - F.col("sx").cast("double")
                    * F.col("sx").cast("double")
                    / F.col("n")
                )
                / F.col("n")
            ).alias("sigma"),
        )
    )
    z = capped.join(F.broadcast(stats), "user_id").select(
        "user_id",
        "event_id",
        (
            (F.col("value").cast("double") - F.col("mu")) / F.col("sigma")
        ).alias("z"),
    )
    # Replay-fixture synthesis stays DISTRIBUTED (VERDICT r8 item 4): the
    # split point is a metadata-sized exact median from approxQuantile
    # (relativeError=0 → deterministic), and each chunk is written by
    # Spark — nothing data-sized ever lands on the driver. streaming_cusum
    # sorts within each micro-batch, so only the file-level event_id split
    # (all ≤ cut before all > cut) carries the ordering contract; the
    # single-file-per-chunk layout IS the two-batch replay fixture.
    import glob as _glob
    import shutil

    z = z.persist()
    cut = z.stat.approxQuantile("event_id", [0.5], 0.0)[0]
    d = tempfile.mkdtemp(prefix="q273_zstream_")
    chunks = (
        z.filter(F.col("event_id") <= cut),
        z.filter(F.col("event_id") > cut),
    )
    for i, chunk in enumerate(chunks):
        stage = os.path.join(d, f"_stage{i}")
        chunk.coalesce(1).write.parquet(stage)
        shutil.move(
            _glob.glob(os.path.join(stage, "part-*.parquet"))[0],
            os.path.join(d, f"part{i}.parquet"),
        )
        shutil.rmtree(stage)
    z.unpersist()
    zstream = (
        spark.readStream.schema("user_id long, event_id long, z double")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = run_available_now(
        streaming_cusum(zstream, "user_id", "event_id", k=0.25, h=2.0),
        output_mode="update",
    )
    return out.orderBy("user_id", "event_id")


_Q273_NOTES = (
    "STREAMING CUSUM (streaming/cusum.streaming_cusum — the stateful-"
    "stream twin of q256, SURVEY 2.9 batch/stream parity family): "
    "per-key (s+, s-) state in applyInPandasWithState carried across "
    "micro-batches (two-file ordered availableNow replay, "
    "maxFilesPerTrigger=1 so the state REALLY crosses a batch "
    "boundary); standardization is a batch-side reference yardstick "
    "joined stream-static. The oracle is q256's WITH RECURSIVE SQL "
    "verbatim — a hash-green streaming query, possible because every "
    "recursion step is raw IEEE arithmetic on identical inputs"
)


ROADMAP7.update(
    {
        "q273_streaming_cusum": (
            q273_streaming_cusum,
            _Q256_ORACLE,
            _Q273_NOTES,
        ),
    }
)


def q274_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.similarity import truncation_recall

    emb = read_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 400
    )
    return truncation_recall(emb, dims=(4, 8, 16))


_Q274_ORACLE = """
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings WHERE vec_id < 400
    ),
    pairs AS MATERIALIZED (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id, u.dim,
             round(list_cosine_similarity(q.v[1:u.dim], c.v[1:u.dim]), 6)
               AS cos
      FROM e q JOIN e c ON c.vec_id <> q.vec_id
      CROSS JOIN (SELECT unnest([4, 8, 16, 64]) AS dim) u
    ),
    top1 AS (
      SELECT query_id, dim, cand_id FROM (
        SELECT query_id, dim, cand_id,
               row_number() OVER (PARTITION BY query_id, dim
                                  ORDER BY cos DESC, cand_id) AS rk
        FROM pairs
      ) WHERE rk = 1
    ),
    full_top AS (
      SELECT query_id, cand_id AS full_cand FROM top1 WHERE dim = 64
    )
    SELECT t.dim, COUNT(*) AS n_queries,
           CAST(SUM(CASE WHEN t.cand_id = f.full_cand THEN 1 ELSE 0 END)
                AS BIGINT) AS n_matched,
           CAST(SUM(CASE WHEN t.cand_id = f.full_cand THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS recall
    FROM top1 t JOIN full_top f USING (query_id)
    GROUP BY t.dim ORDER BY t.dim
"""

_Q274_NOTES = (
    "MATRYOSHKA TRUNCATION RECALL (llm/similarity.truncation_recall — "
    "the go/no-go measurement before storing truncated embeddings: "
    "fraction of vectors keeping their FULL-dim exact top-1 neighbor "
    "when cosine runs on only the first d components; MRL-trained "
    "models hold recall at small d, ordinary embeddings collapse): "
    "ONE require_small-guarded pairwise scoring with ALL dims' "
    "cosines per pair map-side (struct explode — one crossJoin, not "
    "|dims|+1), one (query, dim) rank window, a broadcast self-join "
    "vs the full-dim top-1. At corpus scale the contract is a "
    "hash-sampled probe subset (the q43 exact-baseline class). "
    "Full-dim recall == 1.0 is a structural invariant the hash "
    "compare pins"
)


ROADMAP7.update(
    {
        "q274_truncation_recall": (
            q274_truncation_recall,
            _Q274_ORACLE,
            _Q274_NOTES,
        ),
    }
)


def q275_compression_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.quality import compression_quality

    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 500
    )
    return compression_quality(docs).orderBy("doc_id")


_Q275_NOTES = (
    "COMPRESSION-RATIO QUALITY SIGNAL (llm/quality.compression_quality "
    "— the Gopher-rule catch-all next to the n-gram repetition scores: "
    "deflate_len/utf8_len flags both tails, over-compressible "
    "boilerplate and incompressible binary/base64 noise): stdlib zlib "
    "at pinned level 6 inside Arrow-batched mapInPandas — map-only, "
    "shuffle-free, partition parallelism is the scale lever. No SQL "
    "engine exposes deflate: rows-only entry; the monotone laws "
    "(repetitive text compresses far below prose; random noise above) "
    "are pytest-pinned"
)


ROADMAP7.update(
    {
        "q275_compression_quality": (
            q275_compression_quality,
            None,
            _Q275_NOTES,
        ),
    }
)


def q276_corpus_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.drift import corpus_kl

    docs = read_table(spark, sf_dir, "documents")
    return corpus_kl(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
    )


_Q276_ORACLE = """
    WITH ta AS (
      SELECT regexp_replace(u, '[^a-z0-9]', '', 'g') AS t
      FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\\s+'))
              AS u
            FROM documents WHERE doc_id % 2 = 0)
    ),
    tb AS (
      SELECT regexp_replace(u, '[^a-z0-9]', '', 'g') AS t
      FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\\s+'))
              AS u
            FROM documents WHERE doc_id % 2 = 1)
    ),
    ca AS (SELECT t, COUNT(*) AS ca FROM ta WHERE t <> '' GROUP BY 1),
    cb AS (SELECT t, COUNT(*) AS cb FROM tb WHERE t <> '' GROUP BY 1),
    j AS (
      SELECT COALESCE(ca.t, cb.t) AS t,
             COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
      FROM ca FULL OUTER JOIN cb ON ca.t = cb.t
    ),
    tot AS (
      SELECT COUNT(*) AS v, CAST(SUM(ca) AS BIGINT) AS na,
             CAST(SUM(cb) AS BIGINT) AS nb
      FROM j
    ),
    terms AS (
      SELECT v, na, nb,
             (ca + 0.5) / (na + 0.5 * v) AS p,
             (cb + 0.5) / (nb + 0.5 * v) AS q
      FROM j CROSS JOIN tot
    )
    SELECT CAST(MAX(v) AS BIGINT) AS vocab,
           MAX(na) AS n_a, MAX(nb) AS n_b,
           round(CAST(SUM(CAST(round(p * ln(p / q), 9)
                 AS DECIMAL(38,9))) AS DOUBLE), 6) + 0.0 AS kl_ab,
           round(CAST(SUM(CAST(round(q * ln(q / p), 9)
                 AS DECIMAL(38,9))) AS DOUBLE), 6) + 0.0 AS kl_ba,
           round(CAST(SUM(CAST(round(
                 (p * ln(p / ((p + q) / 2.0))
                  + q * ln(q / ((p + q) / 2.0))) / 2.0, 9)
                 AS DECIMAL(38,9))) AS DOUBLE), 6) + 0.0 AS js
    FROM terms
"""

_Q276_NOTES = (
    "CORPUS KL / JENSEN-SHANNON DIVERGENCE (operators/drift.corpus_kl "
    "— the TEXT drift detector next to the numeric PSI/KS: smoothed "
    "unigram distributions of two corpora on the union vocabulary, "
    "KL both directions + symmetric JS): one tokenize+count agg per "
    "side, a token-keyed full-outer vocab join (no broadcast "
    "assumption on the vocabulary — the q250 rule), 9dp-decimal nats "
    "sums, 6dp output (ln). Fixture split is doc parity so both "
    "engines build identical corpora"
)


def q277_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import seasonal_naive_backtest

    ev = read_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    return seasonal_naive_backtest(
        ev, "user_id", "event_id", "value", season=7
    ).orderBy("user_id")


_Q277_ORACLE = """
    WITH lagged AS (
      SELECT user_id,
             round(value - lag(value, 7) OVER (PARTITION BY user_id
                                               ORDER BY event_id), 9)
               AS e
      FROM events WHERE value IS NOT NULL
    ),
    errs AS (SELECT user_id, e FROM lagged WHERE e IS NOT NULL)
    SELECT user_id, COUNT(*) AS n_eval,
           CAST(SUM(CAST(round(abs(e), 9) AS DECIMAL(38,9))) AS DOUBLE)
             / COUNT(*) AS mae,
           sqrt(CAST(SUM(CAST(round(e * e, 9) AS DECIMAL(38,9)))
                AS DOUBLE) / COUNT(*)) AS rmse,
           CAST(SUM(CAST(e AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*)
             AS bias
    FROM errs GROUP BY 1 ORDER BY user_id
"""

_Q277_NOTES = (
    "SEASONAL-NAIVE FORECAST BACKTEST (operators/timeseries."
    "seasonal_naive_backtest — the baseline every forecasting model "
    "must beat: y_hat_t = y_(t-season), per-key MAE/RMSE/bias over "
    "rows with a season-lagged ancestor): ONE per-key window lag on "
    "the family's shared (key, order) sort, decimal error sums, "
    "raw-IEEE outputs (sums sub-2^53, ops correctly rounded). "
    "Opens the forecast-eval family next to drift/eval"
)


ROADMAP7.update(
    {
        "q276_corpus_kl_divergence": (
            q276_corpus_kl_divergence,
            _Q276_ORACLE,
            _Q276_NOTES,
        ),
        "q277_seasonal_naive_backtest": (
            q277_seasonal_naive_backtest,
            _Q277_ORACLE,
            _Q277_NOTES,
        ),
    }
)


def q278_expectation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.expectations import expectation_report

    orders = read_table(spark, sf_dir, "orders")
    rules = [
        ("orderkey_not_null", "not_null", "o_orderkey", {}),
        ("orderkey_unique", "unique", "o_orderkey", {}),
        ("status_in_set", "in_set", "o_orderstatus",
         {"values": ["F", "O", "P"]}),
        ("price_in_range", "in_range", "o_totalprice",
         {"lo": 0, "hi": 1000000}),
        ("priority_format", "matches", "o_orderpriority",
         {"pattern": "^[1-5]-[A-Z ]+$"}),
        ("custkey_nonneg", "in_range", "o_custkey",
         {"lo": 0, "hi": 9223372036854775807}),
    ]
    return expectation_report(orders, rules).orderBy("rule")


_Q278_ORACLE = """
    WITH wide AS (
      SELECT COUNT(*) AS n_all,
             CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS v_null,
             COUNT(o_orderkey) AS n_ok,
             COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS v_uni,
             COUNT(o_orderstatus) AS n_st,
             CAST(SUM(CASE WHEN o_orderstatus IS NOT NULL
                           AND o_orderstatus NOT IN ('F', 'O', 'P')
                      THEN 1 ELSE 0 END) AS BIGINT) AS v_st,
             COUNT(o_totalprice) AS n_pr,
             CAST(SUM(CASE WHEN o_totalprice IS NOT NULL
                           AND NOT (o_totalprice BETWEEN 0 AND 1000000)
                      THEN 1 ELSE 0 END) AS BIGINT) AS v_pr,
             COUNT(o_orderpriority) AS n_fmt,
             CAST(SUM(CASE WHEN o_orderpriority IS NOT NULL
                           AND NOT regexp_matches(o_orderpriority,
                                                  '^[1-5]-[A-Z ]+$')
                      THEN 1 ELSE 0 END) AS BIGINT) AS v_fmt,
             COUNT(o_custkey) AS n_ck,
             CAST(SUM(CASE WHEN o_custkey IS NOT NULL
                           AND NOT (o_custkey BETWEEN 0
                                    AND 9223372036854775807)
                      THEN 1 ELSE 0 END) AS BIGINT) AS v_ck
      FROM orders
    )
    SELECT rule, "column", n_checked, n_violations,
           CASE WHEN n_checked = 0 THEN 1.0
                ELSE 1.0 - CAST(n_violations AS DOUBLE) / n_checked
           END AS pass_rate,
           CASE WHEN n_checked = 0 THEN TRUE
                ELSE CAST(n_violations AS DOUBLE) / n_checked <= 0.0
           END AS passed
    FROM (
      SELECT 'custkey_nonneg' AS rule, 'o_custkey' AS "column",
             n_ck AS n_checked, v_ck AS n_violations FROM wide
      UNION ALL
      SELECT 'orderkey_not_null', 'o_orderkey', n_all, v_null FROM wide
      UNION ALL
      SELECT 'orderkey_unique', 'o_orderkey', n_ok, v_uni FROM wide
      UNION ALL
      SELECT 'price_in_range', 'o_totalprice', n_pr, v_pr FROM wide
      UNION ALL
      SELECT 'priority_format', 'o_orderpriority', n_fmt, v_fmt FROM wide
      UNION ALL
      SELECT 'status_in_set', 'o_orderstatus', n_st, v_st FROM wide
    )
    ORDER BY rule
"""

_Q278_NOTES = (
    "EXPECTATION-SUITE RUNNER / data contract gate (operators/"
    "expectations.expectation_report — the Great-Expectations-shaped "
    "ingest gate next to profiling: declarative not_null/unique/"
    "in_range/matches/in_set/min_length rules): ALL rules fold into "
    "ONE aggregation pass (conditional sums map-side; uniqueness as "
    "count - countDistinct in the SAME agg) — N rules never means N "
    "jobs or scans. Long-format one-row-per-rule output; pass_rate is "
    "a small-int division (raw-portable). NULL semantics: non-null "
    "rules skip NULLs (compose with not_null to forbid)"
)


ROADMAP7.update(
    {
        "q278_expectation_report": (
            q278_expectation_report,
            _Q278_ORACLE,
            _Q278_NOTES,
        ),
    }
)


def q279_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.features import quantile_normalize

    ev = read_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    return quantile_normalize(ev, "event_type", "value", "event_id").orderBy(
        "event_id"
    )


_Q279_ORACLE = """
    WITH base AS (
      SELECT event_id, event_type, CAST(value AS DOUBLE) AS v
      FROM events WHERE value IS NOT NULL
    ),
    ranked AS (
      SELECT event_id, event_type, v,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY v, event_id) AS r,
             COUNT(*) OVER (PARTITION BY event_type) AS ng
      FROM base
    ),
    gsorted AS (
      SELECT v AS gv,
             row_number() OVER (ORDER BY v, event_id) AS idx
      FROM base
    ),
    tot AS (SELECT COUNT(*) AS n FROM base)
    SELECT r.event_id, r.event_type, r.v AS value, g.gv AS normalized
    FROM ranked r
    CROSS JOIN tot
    JOIN gsorted g
      ON g.idx = LEAST(tot.n,
                       CAST(ceil((r.r - 0.5) / r.ng * tot.n) AS BIGINT))
    ORDER BY r.event_id
"""

_Q279_NOTES = (
    "PER-GROUP QUANTILE NORMALIZATION (operators/features."
    "quantile_normalize — cross-domain distribution harmonization, "
    "microarray heritage: each value maps to the GLOBAL observed value "
    "at its within-group quantile position, so every group ends up "
    "with the identical distribution — z-scoring can't do this when "
    "SHAPES differ, not just moments): within-group rank windows + a "
    "global index from stable_row_number (range exchange + local "
    "offsets — NO SinglePartition window) + one integer-keyed "
    "equi-join. Deterministic (value, id) tie order replayed by the "
    "oracle's row_number"
)


ROADMAP7.update(
    {
        "q279_quantile_normalize": (
            q279_quantile_normalize,
            _Q279_ORACLE,
            _Q279_NOTES,
        ),
    }
)


# --- distributed prefix scan (round 8, batch 6) ------------------------------
def q280_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os as _os

    from ..operators.prefix import prefix_agg
    from ..sources.readers import footer_lead_boundaries

    # split=False: prefix_agg's bucket exchange is the first op and the
    # approxQuantile edge pass re-scans; the split exchange measured
    # net-negative (A/B 1.41 s vs 1.61 s)
    src = read_table(spark, sf_dir, "orders", split=False).select(
        "o_orderkey",
        "o_orderdate",
        F.col("o_totalprice").cast("decimal(28,2)").alias("_p"),
    )
    # Bucket boundaries from the parquet footer's row-group statistics
    # (OPTIMIZATION_r16 / VERDICT r15 item 6): metadata-only, replacing
    # the approxQuantile pass that cost one full scan + one extra
    # driver-blocking job per execution. Results are identical for any
    # monotone boundary set (prefix_agg's combine is exact regardless of
    # balance); None falls back to the approxQuantile pass.
    bounds = footer_lead_boundaries(
        _os.path.join(sf_dir, "orders.parquet"),
        "o_orderdate",
        spark.sparkContext.defaultParallelism,
    )
    return (
        prefix_agg(
            src,
            ["o_orderdate", "o_orderkey"],
            "_p",
            agg="sum",
            out_col="_run",
            boundaries=bounds,
        )
        # exact decimal accumulation, double on the wire (the engine-wide
        # decimal-carry rule): cast-of-exact-decimal is the same nearest
        # double in both engines
        .select(
            "o_orderkey",
            "o_orderdate",
            F.col("_p").cast("double").alias("total_price"),
            F.col("_run").cast("double").alias("running_total"),
        )
        .orderBy("o_orderkey")
    )


_Q280_ORACLE = """
    SELECT o_orderkey, o_orderdate,
           CAST(CAST(o_totalprice AS DECIMAL(28,2)) AS DOUBLE) AS total_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) OVER (
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_total
    FROM orders
    ORDER BY o_orderkey
"""

_Q280_NOTES = (
    "DISTRIBUTED PREFIX SCAN (operators/prefix.prefix_agg — cumulative "
    "SUM OVER a global ORDER BY with NO SinglePartition window, the "
    "two-phase Blelloch scan in DataFrame ops): approxQuantile edges "
    "bucket the lead key map-side (monotone literal chain, the q79 "
    "sampled-boundaries discipline), ONE balanced hash exchange computes "
    "bucket-local prefixes, a k-row totals agg prefix-combines through "
    "the bounded pmod(bucket,1) window and broadcasts back. Decimal "
    "accumulator so local+offset regrouping is exact (associative) — "
    "bit-identical to the oracle's sequential window"
)


def q281_skyline_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import prefix_agg

    pts = (
        read_table(spark, sf_dir, "part")
        .groupBy("p_retailprice", "p_size")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )
    scanned = prefix_agg(
        pts,
        [("p_retailprice", "asc"), ("p_size", "desc")],
        "p_size",
        agg="max",
        inclusive=False,
        out_col="cm",
    )
    return (
        scanned.filter(F.col("cm").isNull() | (F.col("cm") < F.col("p_size")))
        .select("p_retailprice", "p_size", "n_parts")
        .orderBy("p_retailprice", "p_size")
    )


_Q281_ORACLE = """
    WITH pts AS (
      SELECT p_retailprice, p_size, COUNT(*) AS n_parts
      FROM part GROUP BY 1, 2
    ),
    scan AS (
      SELECT p_retailprice, p_size, n_parts,
             MAX(p_size) OVER (
               ORDER BY p_retailprice ASC, p_size DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS cm
      FROM pts
    )
    SELECT p_retailprice, p_size, n_parts
    FROM scan WHERE cm IS NULL OR cm < p_size
    ORDER BY p_retailprice, p_size
"""

_Q281_NOTES = (
    "SKYLINE / PARETO FRONTIER (minimize price, maximize size) via the "
    "classic sort-scan reduction: dedupe to distinct points (one hash "
    "agg), then a point is dominated iff the EXCLUSIVE running max of "
    "size over (price asc, size desc) reaches its size — equal-price "
    "ties are handled because distinct points at the same price sort "
    "larger-size-first. The running max is prefix_agg, so the whole "
    "skyline is two exchanges and never all-pairs; the oracle replays "
    "the identical scan with a window"
)


def q282_export_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import plan_shards

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return plan_shards(
        docs, "n_chars", 100_000, order_by=["doc_id"]
    ).orderBy("doc_id")


_Q282_ORACLE = """
    SELECT doc_id, n_chars,
           CAST(COALESCE(SUM(n_chars) OVER (
                  ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ), 0) // 100000 AS BIGINT) AS shard
    FROM documents
    ORDER BY doc_id
"""

_Q282_NOTES = (
    "EXPORT SHARD / COMPACTION PLANNING (operators/prefix.plan_shards): "
    "assign corpus items to ~target-byte output shards by cutting on the "
    "exclusive running size — the greedy writer loop made distributed "
    "and RERUNNABLE (pure function of order+sizes, identical plan on "
    "re-run or cross-engine, unlike stateful first-fit packing). "
    "Integer DIV on the exact long prefix (no double floor: 100 TB "
    "prefixes exceed 2^53). Same planner applies to small-file "
    "compaction over the footer index (sources/fileindex.py) — pytest "
    "covers that path; here the oracle replays the document-export form"
)


ROADMAP7.update(
    {
        "q280_running_revenue": (q280_running_revenue, _Q280_ORACLE, _Q280_NOTES),
        "q281_skyline_frontier": (q281_skyline_frontier, _Q281_ORACLE, _Q281_NOTES),
        "q282_export_shards": (q282_export_shards, _Q282_ORACLE, _Q282_NOTES),
    }
)


def q283_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sequence import window_funnel

    ev = read_table(spark, sf_dir, "events")
    return window_funnel(
        ev,
        "user_id",
        "ts",
        "event_type",
        ["view", "click", "purchase"],
        window_seconds=7200,
    ).orderBy("user_id")


_Q283_ORACLE = """
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS us
      FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
    ),
    keys AS (SELECT DISTINCT user_id FROM ev),
    s1 AS (
      SELECT user_id, MIN(us) AS t1 FROM ev
      WHERE event_type = 'view' GROUP BY 1
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.us) AS t2
      FROM ev e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click'
        AND e.us > s1.t1 AND e.us <= s1.t1 + 7200000000
      GROUP BY 1
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.us) AS t3
      FROM ev e JOIN s2 USING (user_id) JOIN s1 USING (user_id)
      WHERE e.event_type = 'purchase'
        AND e.us > s2.t2 AND e.us <= s1.t1 + 7200000000
      GROUP BY 1
    )
    SELECT k.user_id,
           CASE WHEN t3 IS NOT NULL THEN 3
                WHEN t2 IS NOT NULL THEN 2
                WHEN t1 IS NOT NULL THEN 1
                ELSE 0 END AS funnel_level,
           make_timestamp(t1) AS anchor_ts
    FROM keys k
    LEFT JOIN s1 USING (user_id)
    LEFT JOIN s2 USING (user_id)
    LEFT JOIN s3 USING (user_id)
    ORDER BY k.user_id
"""

_Q283_NOTES = (
    "MULTI-STEP WINDOW FUNNEL (operators/sequence.window_funnel — the "
    "windowFunnel shape: first-touch anchor at the earliest step-1 "
    "event, each later step the earliest strictly-after match within "
    "the anchor window): funnel-relevant events only into ONE "
    "groupBy(key) sorted collect_list, then a JVM higher-order "
    "aggregate fold walks each list once — one exchange, no window, no "
    "self-joins, no Python. Exact integer-microsecond time compares "
    "(unix_micros ≡ epoch_us); the oracle replays first-touch greedy "
    "as nested MIN() CTEs"
)


def q284_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import bfs_hops, canonical_edges

    ev = read_table(spark, sf_dir, "events")
    pairs = ev.select(
        (F.col("user_id") % 97).alias("src"),
        (F.col("event_id") % 89).alias("dst"),
    )
    edges = canonical_edges(pairs, "src", "dst")
    seeds = (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .filter(F.col("node") < 5)
        .distinct()
    )
    return bfs_hops(edges, seeds, max_hops=3).orderBy("node")


_Q284_ORACLE = """
    WITH RECURSIVE base AS (
      SELECT DISTINCT LEAST(user_id % 97, event_id % 89) AS a,
                      GREATEST(user_id % 97, event_id % 89) AS b
      FROM events
      WHERE user_id % 97 <> event_id % 89
    ),
    und AS (
      SELECT a AS src, b AS dst FROM base
      UNION ALL
      SELECT b AS src, a AS dst FROM base
    ),
    seeds AS (
      SELECT DISTINCT src AS node FROM und WHERE src < 5
    ),
    walk(node, hops) AS (
      SELECT node, 0 FROM seeds
      UNION
      SELECT u.dst, w.hops + 1
      FROM walk w JOIN und u ON u.src = w.node
      WHERE w.hops < 3
    )
    SELECT node, MIN(hops) AS hops FROM walk GROUP BY node ORDER BY node
"""

_Q284_NOTES = (
    "MULTI-SOURCE BFS HOP DISTANCE (operators/graph.bfs_hops — "
    "min hops from any seed, the within-N-hops fraud/crawl sweep): "
    "level-synchronous FRONTIER expansion — each round the newly "
    "reached set (not the whole visited set) joins the edges once, "
    "left_anti vs visited, per-round localCheckpoint + O(1) "
    "empty-frontier stop — total work O(E), never O(E x rounds). "
    "Oracle = bounded WITH RECURSIVE walk + MIN(hops) rollup"
)


ROADMAP7.update(
    {
        "q283_window_funnel": (q283_window_funnel, _Q283_ORACLE, _Q283_NOTES),
        "q284_bfs_hops": (q284_bfs_hops, _Q284_ORACLE, _Q284_NOTES),
    }
)


def q285_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import strip_html

    docs = read_table(spark, sf_dir, "documents")
    synth = F.concat(
        F.lit("<html><head><style>body{color:red}</style><script>var a="),
        F.col("doc_id").cast("string"),
        F.lit(";</script></head><body><h1>"),
        F.col("source"),
        F.lit("</h1><p>"),
        F.substring(F.col("text"), 1, 200),
        F.lit(" &amp; more</p><!-- id "),
        F.col("doc_id").cast("string"),
        F.lit(" --><div>tail&nbsp;"),
        F.col("lang"),
        F.lit("&#39;s &lt;end&gt;</div></body></html>"),
    )
    return docs.select(
        "doc_id", strip_html(synth).alias("clean")
    ).orderBy("doc_id")


_Q285_ORACLE = """
    SELECT doc_id,
      trim(regexp_replace(
        replace(replace(replace(replace(replace(replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(synth, '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
                '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
              '(?s)<!--.*?-->', ' ', 'g'),
            '<[^>]+>', ' ', 'g'),
          '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
          '&nbsp;', ' '), '&amp;', '&'),
        '\\s+', ' ', 'g')) AS clean
    FROM (
      SELECT doc_id,
             '<html><head><style>body{color:red}</style><script>var a='
             || CAST(doc_id AS VARCHAR)
             || ';</script></head><body><h1>' || source || '</h1><p>'
             || substr(text, 1, 200) || ' &amp; more</p><!-- id '
             || CAST(doc_id AS VARCHAR) || ' --><div>tail&nbsp;' || lang
             || '&#39;s &lt;end&gt;</div></body></html>' AS synth
      FROM documents
    )
    ORDER BY doc_id
"""

_Q285_NOTES = (
    "HTML BOILERPLATE STRIP (functions/text.strip_html — the lexical "
    "web-corpus cleaning pass: script/style/comment blocks dropped WITH "
    "contents, tags to spaces so adjacent blocks never fuse, the six "
    "dominant entities decoded with &amp; LAST so &amp;lt; stays "
    "literal, whitespace collapsed): chained regexp_replace/replace in "
    "the Java-regex/RE2 common subset — map-only, whole-stage codegen, "
    "zero parser dependency; deterministic HTML synthesized per doc so "
    "both engines strip identical markup"
)


def q286_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import url_host, url_normalize, url_registered_domain

    docs = read_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    synth = (
        F.when(
            d % 4 == 0,
            F.concat(
                F.lit("HTTP://WWW.Example"), (d % 7).cast("string"),
                F.lit(".COM:80/p/"), d.cast("string"),
                F.lit("?utm_source=a&x="), d.cast("string"), F.lit("#frag"),
            ),
        )
        .when(
            d % 4 == 1,
            F.concat(
                F.lit("https://news.site"), (d % 5).cast("string"),
                F.lit(".co.uk:443/a/"), d.cast("string"), F.lit("?fbclid=zz"),
            ),
        )
        .when(
            d % 4 == 2,
            F.concat(
                F.lit("https://cdn.host"), (d % 3).cast("string"),
                F.lit(".org/img.png?gclid=1&v=2&utm_medium=m"),
            ),
        )
        .otherwise(
            F.concat(F.lit("http://plain.example.net/page"), d.cast("string"))
        )
    )
    return docs.select(
        "doc_id",
        url_normalize(synth).alias("canonical"),
        url_host(synth).alias("host"),
        url_registered_domain(synth).alias("domain"),
    ).orderBy("doc_id")


_Q286_ORACLE = """
    WITH synth AS (
      SELECT doc_id,
        CASE
          WHEN doc_id % 4 = 0 THEN
            'HTTP://WWW.Example' || CAST(doc_id % 7 AS VARCHAR)
            || '.COM:80/p/' || CAST(doc_id AS VARCHAR)
            || '?utm_source=a&x=' || CAST(doc_id AS VARCHAR) || '#frag'
          WHEN doc_id % 4 = 1 THEN
            'https://news.site' || CAST(doc_id % 5 AS VARCHAR)
            || '.co.uk:443/a/' || CAST(doc_id AS VARCHAR) || '?fbclid=zz'
          WHEN doc_id % 4 = 2 THEN
            'https://cdn.host' || CAST(doc_id % 3 AS VARCHAR)
            || '.org/img.png?gclid=1&v=2&utm_medium=m'
          ELSE 'http://plain.example.net/page' || CAST(doc_id AS VARCHAR)
        END AS url
      FROM documents
    ),
    parts AS (
      SELECT doc_id, url,
        lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
        lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)) AS auth_raw,
        regexp_replace(regexp_replace(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', ''),
                       '#.*$', '') AS rest0
      FROM synth
    ),
    cleaned AS (
      SELECT doc_id, url, scheme,
        CASE WHEN scheme = 'http' THEN regexp_replace(auth_raw, ':80$', '')
             WHEN scheme = 'https' THEN regexp_replace(auth_raw, ':443$', '')
             ELSE auth_raw END AS auth,
        lower(regexp_replace(regexp_replace(
          regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1),
          '^[^@]*@', ''), ':[0-9]+$', '')) AS host,
        regexp_replace(
          regexp_replace(
            regexp_replace(rest0,
              '&(utm_[a-zA-Z]+|fbclid|gclid|msclkid)=[^&#]*', '', 'g'),
            '\\?(utm_[a-zA-Z]+|fbclid|gclid|msclkid)=[^&#]*&', '?', 'g'),
          '\\?(utm_[a-zA-Z]+|fbclid|gclid|msclkid)=[^&#]*$', '', 'g') AS rest
      FROM parts
    )
    SELECT doc_id,
           scheme || '://' || auth || rest AS canonical,
           host,
           CASE WHEN regexp_matches(host,
                  '[^.]+\\.(co|com|net|org|gov|ac|edu)\\.[a-z]{2}$')
                THEN regexp_extract(host, '([^.]+\\.[^.]+\\.[^.]+)$', 1)
                ELSE regexp_extract(host, '([^.]+\\.[^.]+)$', 1) END AS domain
    FROM cleaned
    ORDER BY doc_id
"""

_Q286_NOTES = (
    "URL CANONICALIZATION (functions/text.url_normalize / url_host / "
    "url_registered_domain — the crawl-dedup and per-site-quota key): "
    "lowercase scheme+authority, fragment dropped, default ports "
    "stripped per scheme, tracking params (utm_*, fbclid, gclid, "
    "msclkid) removed with separator repair, registered domain by the "
    "ccTLD-second-level heuristic (PSL table can broadcast-join behind "
    "the same contract). Pure regexp chains in the Java/RE2 common "
    "subset, NO replacement backrefs (the one divergent dialect "
    "feature); map-only whole-stage codegen"
)


ROADMAP7.update(
    {
        "q285_html_strip": (q285_html_strip, _Q285_ORACLE, _Q285_NOTES),
        "q286_url_canonical": (q286_url_canonical, _Q286_ORACLE, _Q286_NOTES),
    }
)


def q287_jw_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.entity import blocked_link_jw

    sup = read_table(spark, sf_dir, "supplier")
    # q232's deterministic noise fixture: one substituted digit (high
    # JW, linkable) vs every 5th row losing three characters (lower JW,
    # rejected at the 0.93 threshold)
    light = F.concat(
        F.expr("substring(s_name, 1, CAST(9 + s_suppkey % 3 AS INT))"),
        F.lit("X"),
        F.expr("substring(s_name, CAST(11 + s_suppkey % 3 AS INT))"),
    )
    heavy = F.concat(
        F.expr("substring(s_name, 1, 9)"), F.expr("substring(s_name, 13)")
    )
    dirty = sup.select(
        F.col("s_suppkey").alias("dirty_id"),
        F.when(F.col("s_suppkey") % 5 == 0, heavy).otherwise(light).alias(
            "dirty_name"
        ),
    )
    blocks = [
        (F.substring(F.col("s_name"), -4, 4), F.substring(F.col("dirty_name"), -4, 4)),
        (F.substring(F.col("s_name"), 10, 3), F.substring(F.col("dirty_name"), 10, 3)),
    ]
    return (
        blocked_link_jw(
            sup, dirty, "s_suppkey", "dirty_id", "s_name", "dirty_name",
            blocks, threshold=0.93,
        )
        .select(
            "s_suppkey", "dirty_id", F.round(F.col("jw"), 6).alias("jw")
        )
        .orderBy("s_suppkey", "dirty_id")
    )


_Q287_ORACLE = """
    WITH dirty AS (
      SELECT s_suppkey AS dirty_id,
             CASE WHEN s_suppkey % 5 = 0
                  THEN substr(s_name, 1, 9) || substr(s_name, 13)
                  ELSE substr(s_name, 1, CAST(9 + s_suppkey % 3 AS INTEGER))
                       || 'X'
                       || substr(s_name, CAST(11 + s_suppkey % 3 AS INTEGER))
             END AS dirty_name
      FROM supplier
    ),
    cands AS (
      SELECT l.s_suppkey, r.dirty_id, l.s_name, r.dirty_name
      FROM supplier l
      JOIN dirty r ON right(l.s_name, 4) = right(r.dirty_name, 4)
      UNION
      SELECT l.s_suppkey, r.dirty_id, l.s_name, r.dirty_name
      FROM supplier l
      JOIN dirty r ON substr(l.s_name, 10, 3) = substr(r.dirty_name, 10, 3)
    )
    SELECT s_suppkey, dirty_id,
           round(jaro_winkler_similarity(s_name, dirty_name), 6) AS jw
    FROM cands
    WHERE jaro_winkler_similarity(s_name, dirty_name) >= 0.93
    ORDER BY s_suppkey, dirty_id
"""

_Q287_NOTES = (
    "JARO-WINKLER ENTITY RESOLUTION (llm/entity.blocked_link_jw — the "
    "record-linkage scorer for NAME fields: prefix-weighted, length-"
    "normalized, transposition-tolerant where raw edit distance over-"
    "penalizes short strings): same multi-pass block-then-verify shape "
    "as q232, verify scorer an Arrow-batched pandas UDF pinned to "
    "DuckDB's jaro_winkler_similarity semantics (empty->0, boost only "
    "above 0.7, prefix<=4, scale 0.1 — integer-ratio IEEE arithmetic, "
    "validated bit-identical on 600+ randomized pairs, no rounding "
    "slack needed; output rounded 6dp for wire stability only). The "
    "threshold separates the one-substitution noise class from the "
    "three-deletion class, so precision and recall are both visible"
)


ROADMAP7.update(
    {
        "q287_jw_entity_resolution": (
            q287_jw_entity_resolution,
            _Q287_ORACLE,
            _Q287_NOTES,
        ),
    }
)


def q288_weighted_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import weighted_quantile

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_extendedprice",
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("long").alias("w"),
    )
    return weighted_quantile(
        li,
        "l_extendedprice",
        "w",
        [0.25, 0.5, 0.75, 0.9],
        tiebreak_cols=["l_orderkey", "l_linenumber"],
    ).orderBy("q")


_Q288_ORACLE = """
    WITH base AS (
      SELECT l_extendedprice AS v, CAST(l_quantity AS BIGINT) AS w,
             l_orderkey, l_linenumber
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND CAST(l_quantity AS BIGINT) > 0
        AND l_extendedprice IS NOT NULL
    ),
    cum AS (
      SELECT v, SUM(w) OVER (
               ORDER BY v, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cw
      FROM base
    ),
    tot AS (SELECT SUM(w) AS tw FROM base),
    grid(q) AS (VALUES (0.25), (0.5), (0.75), (0.9))
    SELECT CAST(g.q AS DOUBLE) AS q,
           MIN(CASE WHEN c.cw >= g.q * t.tw THEN c.v END) AS value
    FROM cum c CROSS JOIN tot t CROSS JOIN grid g
    GROUP BY g.q
    ORDER BY q
"""

_Q288_NOTES = (
    "EXACT WEIGHTED QUANTILES (operators/prefix.weighted_quantile — "
    "lower/type-1: smallest value whose cumulative weight reaches q*W; "
    "frequency-weighted percentiles, inexpressible by percentile_"
    "approx): one prefix_agg running weight (balanced exchange, no "
    "SinglePartition), 1-row total broadcast, ONE aggregate with |qs| "
    "conditional MINs map-side-combined. Integer weights keep the "
    "cumulative sum exact BIGINT; the only float op is the q*W "
    "threshold multiply — identical IEEE in both engines"
)


ROADMAP7.update(
    {
        "q288_weighted_quantiles": (
            q288_weighted_quantiles,
            _Q288_ORACLE,
            _Q288_NOTES,
        ),
    }
)


def q289_postings_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.retrieval import build_postings

    docs = read_table(spark, sf_dir, "documents")
    # Driver-canon contract (catalog.py:5-9): scalar output columns only.
    # The operator's API keeps real arrays; THIS catalog anchor serializes
    # them with to_json (bracketed, no whitespace — bit-identical to
    # DuckDB's to_json VARCHAR cast) so the driver's pandas sort/hash
    # canonicalizer never sees an unhashable list (the r09 failure).
    return (
        build_postings(docs, "doc_id", "text", block_size=64)
        .filter(F.col("df") >= 5)
        .select(
            "token",
            "block",
            F.to_json("doc_gaps").alias("doc_gaps"),
            F.to_json("positions").alias("positions"),
            "df",
        )
        .orderBy("token", "block")
    )


_Q289_ORACLE = """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS ts
      FROM documents
    ),
    flat AS (
      SELECT doc_id, e.tok AS token, e.pos AS pos
      FROM (
        SELECT doc_id,
               unnest(list_transform(ts,
                 (x, i) -> struct_pack(tok := x, pos := i - 1))) AS e
        FROM toks
      )
    ),
    perdoc AS (
      SELECT token, doc_id, list_sort(list(pos)) AS poss
      FROM flat GROUP BY token, doc_id
    ),
    blocked AS (
      SELECT token, doc_id, poss,
             CAST((row_number() OVER (PARTITION BY token ORDER BY doc_id)
                   - 1) // 64 AS BIGINT) AS block,
             COUNT(*) OVER (PARTITION BY token) AS df
      FROM perdoc
    ),
    entries AS (
      SELECT token, block, MAX(df) AS df,
             list(doc_id ORDER BY doc_id) AS ids,
             list(poss ORDER BY doc_id) AS positions
      FROM blocked GROUP BY token, block
    )
    SELECT token, block,
           CAST(to_json(list_transform(ids,
             (x, i) -> x - CASE WHEN i = 1 THEN 0 ELSE ids[i - 1] END))
             AS VARCHAR) AS doc_gaps,
           CAST(to_json(positions) AS VARCHAR) AS positions, df
    FROM entries
    WHERE df >= 5
    ORDER BY token, block
"""

_Q289_NOTES = (
    "POSITIONAL INVERTED-INDEX CONSTRUCTION (llm/retrieval."
    "build_postings — the search-infra ARTIFACT bm25_topk queries "
    "against, materialized: per (token, block) delta-encoded doc ids + "
    "per-doc sorted position lists + cross-block df): posting lists "
    "SHARDED into 64-doc blocks so a stop token becomes many bounded "
    "rows, never one giant array (the segment-block layout); one "
    "posexplode + (token,doc) agg + token-keyed window pair — the "
    "index IS a DataFrame, never collected. Delta chain replayed "
    "token-identically by DuckDB's indexed list_transform"
)


ROADMAP7.update(
    {
        "q289_postings_index": (q289_postings_index, _Q289_ORACLE, _Q289_NOTES),
    }
)


def q290_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.audio import audio_stats, with_wav_payload

    docs = read_table(spark, sf_dir, "documents")
    payloads = with_wav_payload(docs, "doc_id", every=5)
    return (
        audio_stats(payloads)
        .select(
            "doc_id", "sample_rate", "channels", "bits", "n_frames",
            "duration_s", "peak_abs", "mean_square", "zero_crossings",
        )
        .orderBy("doc_id")
    )


_Q290_ORACLE = """
    WITH ids AS (
      SELECT doc_id, 800 + (doc_id % 7) * 160 AS n
      FROM documents WHERE doc_id % 5 = 0
    ),
    samples AS (
      SELECT doc_id, n, i,
             (doc_id * 7349 + i * (i + 13) * 2654435761) % 65536 - 32768 AS s
      FROM ids, UNNEST(generate_series(0, n - 1)) AS t(i)
    ),
    flagged AS (
      SELECT doc_id, n, i, s,
             CASE WHEN (s >= 0) <>
                  (lag(s) OVER (PARTITION BY doc_id ORDER BY i) >= 0)
                  THEN 1 ELSE 0 END AS flip
      FROM samples
    )
    SELECT doc_id,
           8000 AS sample_rate,
           1 AS channels,
           CAST(CASE doc_id % 3 WHEN 0 THEN 16 WHEN 1 THEN 32 ELSE 64 END
                AS INTEGER) AS bits,
           CAST(MAX(n) AS BIGINT) AS n_frames,
           CAST(MAX(n) AS DOUBLE) / 8000 AS duration_s,
           CAST(MAX(ABS(s)) AS BIGINT) AS peak_abs,
           CAST(SUM(s * s) AS DOUBLE) / MAX(n) AS mean_square,
           CAST(SUM(flip) AS BIGINT) AS zero_crossings
    FROM flagged
    GROUP BY doc_id
    ORDER BY doc_id
"""

_Q290_NOTES = (
    "REAL AUDIO DECODE + FEATURES (llm/audio — from-spec RIFF/WAVE "
    "parser: integer PCM at 8/16/24/32 bits AND IEEE-float format 3 at "
    "32/64 bits (r8 verdict item 7; floats scale to the 16-bit integer "
    "domain via round(x*2^15), bit-exact on the dyadic fixture), "
    "chunk-walk tolerant; the fixture cycles all three fmt arms over "
    "the SAME waveform so the float decode path is oracle-pinned, not "
    "just pytest-pinned; audio_stats over "
    "Arrow mapInPandas: duration, peak, mean-square energy, zero "
    "crossings — map-only, shuffle-free, the image_pixel_stats "
    "contract extended to audio with decoded=false degradation for "
    "non-PCM codecs): the FIXTURE-DIFFERENTIAL oracle never parses a "
    "WAV byte — it regenerates the deterministic BIGINT waveform with "
    "generate_series and reproduces every stat (exact-integer peak/zc/"
    "sum-of-squares, one IEEE division) bit-for-bit, so a decoder bug "
    "anywhere in the chunk walk or PCM unpack hash-fails"
)


ROADMAP7.update(
    {
        "q290_audio_features": (q290_audio_features, _Q290_ORACLE, _Q290_NOTES),
    }
)


def q291_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import mad_outliers

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    return mad_outliers(ev, ["event_type"], "value", k=3.0).orderBy("event_id")


_Q291_ORACLE = """
    WITH base AS (
      SELECT event_id, event_type, value FROM events WHERE value IS NOT NULL
    ),
    med AS (
      SELECT event_type, quantile_disc(value, 0.5) AS med
      FROM base GROUP BY event_type
    ),
    mad AS (
      SELECT b.event_type,
             quantile_disc(abs(b.value - m.med), 0.5) AS mad
      FROM base b JOIN med m USING (event_type)
      GROUP BY b.event_type
    )
    SELECT b.event_id, b.event_type, b.value, m.med, d.mad,
           abs(b.value - m.med) > (3.0 * 1.4826) * d.mad AS is_outlier
    FROM base b
    JOIN med m USING (event_type)
    JOIN mad d USING (event_type)
    ORDER BY b.event_id
"""

_Q291_NOTES = (
    "ROBUST MAD OUTLIER FLAGS (operators/profile.mad_outliers — "
    "|x-med| > k*1.4826*MAD, the detector whose yardstick outliers "
    "can't inflate, unlike mean/std z-scores): two group aggregations "
    "with group-count-sized results broadcast back, flagging map-side. "
    "percentile_disc keeps medians OBSERVED values (Spark "
    "percentile_disc == DuckDB quantile_disc, the q263 parity) so "
    "every comparison is exact IEEE — no interpolation ambiguity, no "
    "rounding slack"
)


def q292_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.privacy import k_anonymity_audit

    cust = read_table(spark, sf_dir, "customer")
    return k_anonymity_audit(
        cust, ["c_nationkey", "c_mktsegment"], k=10
    ).orderBy("c_nationkey", "c_mktsegment")


_Q292_ORACLE = """
    SELECT c_nationkey, c_mktsegment,
           COUNT(*) AS group_size,
           COUNT(*) < 10 AS violates
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    ORDER BY c_nationkey, c_mktsegment
"""

_Q292_NOTES = (
    "K-ANONYMITY AUDIT (operators/privacy.k_anonymity_audit — the "
    "group-size half of the re-identification story beside q222's "
    "l-diversity: a quasi-identifier combination shared by fewer than "
    "k records narrows any of them to a small candidate set): ONE hash "
    "aggregation, NULL quasi patterns audited as their own group (the "
    "conservative choice)"
)


def q293_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.privacy import dp_counts

    orders = read_table(spark, sf_dir, "orders")
    return dp_counts(orders, ["o_orderpriority"], epsilon=0.5).orderBy(
        "o_orderpriority"
    )


_Q293_ORACLE = """
    WITH counts AS (
      SELECT o_orderpriority, COUNT(*) AS true_count
      FROM orders GROUP BY o_orderpriority
    ),
    noise AS (
      SELECT o_orderpriority, true_count,
        (CAST(list_sum(list_transform(generate_series(1, 6), i ->
           CAST((strpos('0123456789abcdef',
                 substr(md5(o_orderpriority || ':dp'), i, 1)) - 1) AS BIGINT)
           * CAST(power(16, 6 - i) AS BIGINT))) AS DOUBLE) + 0.5)
        / 16777216.0 AS u
      FROM counts
    )
    SELECT o_orderpriority, true_count,
           round(CAST(true_count AS DOUBLE)
                 + (-(1.0 / 0.5) * sign(u - 0.5)
                    * ln(1.0 - 2.0 * abs(u - 0.5))), 6) AS noisy_count
    FROM noise
    ORDER BY o_orderpriority
"""

_Q293_NOTES = (
    "DP NOISY COUNTS (operators/privacy.dp_counts — the epsilon-DP "
    "Laplace mechanism for sensitivity-1 counts, noise via the "
    "DETERMINISTIC inverse-CDF transform -(1/eps)*sign(u-1/2)*"
    "ln(1-2|u-1/2|) with u from the engine-wide md5 hash rule, so "
    "audits replay the exact release; salt is the release secret): "
    "one hash agg + map-side noise; 6dp because ln() is not "
    "correctly-rounded across libm implementations (the q262 lesson). "
    "The oracle re-derives u digit-by-digit from the same md5 hex"
)


ROADMAP7.update(
    {
        "q291_mad_outliers": (q291_mad_outliers, _Q291_ORACLE, _Q291_NOTES),
        "q292_k_anonymity": (q292_k_anonymity, _Q292_ORACLE, _Q292_NOTES),
        "q293_dp_counts": (q293_dp_counts, _Q293_ORACLE, _Q293_NOTES),
    }
)


def q294_streaming_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q283's exact funnel configuration driven through the STREAMING
    runtime: funnel-step events split into two per-key-ordered parquet
    chunks (each user's first event in chunk 0) and replayed
    file-by-file through the stateful stream; the final state per key
    (max n_seen) must reproduce the batch fold — the oracle is q283's
    nested-MIN SQL with the anchor kept in epoch micros."""
    import os
    import tempfile

    from ..streaming.funnel import streaming_funnel
    from ..streaming.runner import run_available_now

    steps = ["view", "click", "purchase"]
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(steps)
    )
    # Replay-fixture synthesis stays DISTRIBUTED (VERDICT r8 item 4): the
    # per-user first-event flag is a window function, the two chunks are
    # Spark-written — nothing data-sized lands on the driver. The funnel
    # fold is tie-insensitive (nested MINs over timestamps), so any
    # deterministic tiebreak for the chunk-0 seed row is valid.
    import glob as _glob
    import shutil

    from pyspark.sql import Window

    base = (
        ev.select(
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts"),
            "event_type",
        )
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy("ts", "event_type")
            ),
        )
        .persist()
    )
    d = tempfile.mkdtemp(prefix="q294_funnel_")
    chunks = (base.filter(F.col("_rn") == 1), base.filter(F.col("_rn") > 1))
    for i, chunk in enumerate(chunks):
        stage = os.path.join(d, f"_stage{i}")
        chunk.drop("_rn").coalesce(1).write.parquet(stage)
        shutil.move(
            _glob.glob(os.path.join(stage, "part-*.parquet"))[0],
            os.path.join(d, f"part{i}.parquet"),
        )
        shutil.rmtree(stage)
    base.unpersist()
    stream = (
        spark.readStream.schema("user_id long, ts long, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = run_available_now(
        streaming_funnel(stream, "user_id", "ts", "event_type", steps, 7200),
        output_mode="update",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_seen").desc())
    return (
        out.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("user_id", "funnel_level", "anchor_us")
        .orderBy("user_id")
    )


_Q294_ORACLE = """
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS us
      FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
    ),
    keys AS (SELECT DISTINCT user_id FROM ev),
    s1 AS (
      SELECT user_id, MIN(us) AS t1 FROM ev
      WHERE event_type = 'view' GROUP BY 1
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.us) AS t2
      FROM ev e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click'
        AND e.us > s1.t1 AND e.us <= s1.t1 + 7200000000
      GROUP BY 1
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.us) AS t3
      FROM ev e JOIN s2 USING (user_id) JOIN s1 USING (user_id)
      WHERE e.event_type = 'purchase'
        AND e.us > s2.t2 AND e.us <= s1.t1 + 7200000000
      GROUP BY 1
    )
    SELECT k.user_id,
           CASE WHEN t3 IS NOT NULL THEN 3
                WHEN t2 IS NOT NULL THEN 2
                WHEN t1 IS NOT NULL THEN 1
                ELSE 0 END AS funnel_level,
           t1 AS anchor_us
    FROM keys k
    LEFT JOIN s1 USING (user_id)
    LEFT JOIN s2 USING (user_id)
    LEFT JOIN s3 USING (user_id)
    ORDER BY k.user_id
"""

_Q294_NOTES = (
    "STREAMING WINDOW FUNNEL (streaming/funnel.streaming_funnel — the "
    "stateful-stream twin of q283, SURVEY 2.9 batch/stream parity "
    "family): per-key (level, anchor, last-step, n_seen) state in "
    "applyInPandasWithState carried across micro-batches; the per-key "
    "replay split puts each user's FIRST event alone in chunk 0 so "
    "every multi-step conversion MUST advance across a batch boundary "
    "(the strongest possible state-carry exercise). Oracle = q283's "
    "nested-MIN first-touch SQL with the anchor in epoch micros — a "
    "hash-green streaming query"
)


ROADMAP7.update(
    {
        "q294_streaming_funnel": (
            q294_streaming_funnel,
            _Q294_ORACLE,
            _Q294_NOTES,
        ),
    }
)


def q295_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import canonical_edges, link_prediction_features

    ev = read_table(spark, sf_dir, "events")
    pairs = ev.select(
        (F.col("user_id") % 97).alias("src"),
        (F.col("event_id") % 89).alias("dst"),
    )
    edges = canonical_edges(pairs, "src", "dst")
    return link_prediction_features(edges, max_degree=1000).orderBy("a", "b")


_Q295_ORACLE = """
    WITH base AS (
      SELECT DISTINCT LEAST(user_id % 97, event_id % 89) AS a,
                      GREATEST(user_id % 97, event_id % 89) AS b
      FROM events
      WHERE user_id % 97 <> event_id % 89
    ),
    und AS (
      SELECT a AS src, b AS dst FROM base
      UNION ALL
      SELECT b AS src, a AS dst FROM base
    ),
    deg AS (SELECT src, COUNT(*) AS deg FROM und GROUP BY src),
    wedges AS (
      SELECT e1.src AS u, e2.src AS v, d.deg AS deg_w
      FROM und e1
      JOIN deg d ON d.src = e1.dst AND d.deg <= 1000
      JOIN und e2 ON e2.dst = e1.dst
      WHERE e1.src < e2.src
    ),
    scored AS (
      SELECT u, v, COUNT(*) AS cn,
             SUM(CAST(round(1.0 / ln(deg_w), 9) AS DECIMAL(25,9))) AS aa
      FROM wedges GROUP BY u, v
    ),
    cand AS (
      SELECT s.* FROM scored s
      ANTI JOIN base b ON b.a = s.u AND b.b = s.v
    )
    SELECT c.u AS a, c.v AS b, c.cn AS common_neighbors,
           round(CAST(c.cn AS DOUBLE)
                 / CAST(du.deg + dv.deg - c.cn AS DOUBLE), 9) AS jaccard,
           round(CAST(c.aa AS DOUBLE), 6) AS adamic_adar
    FROM cand c
    JOIN deg du ON du.src = c.u
    JOIN deg dv ON dv.src = c.v
    ORDER BY a, b
"""

_Q295_NOTES = (
    "LINK PREDICTION FEATURES (operators/graph.link_prediction_features "
    "— common neighbors, neighborhood Jaccard, Adamic-Adar for "
    "NON-edges sharing a neighbor): one wedge self-join through "
    "degree-capped centers (hub mitigation: Sum deg(w)^2 wedge volume, "
    "and a celebrity shared neighbor is weak evidence anyway — exactly "
    "what 1/ln(deg) encodes), one degree agg, left_anti vs existing "
    "edges. Adamic-Adar terms 9dp-decimal-summed (order-free "
    "reduction), output 6dp per the libm-ln rule; common neighbor w "
    "always has deg>=2 so ln never hits zero"
)


ROADMAP7.update(
    {
        "q295_link_prediction": (q295_link_prediction, _Q295_ORACLE, _Q295_NOTES),
    }
)


def q296_set_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cardinality import set_cardinality_estimates

    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    return set_cardinality_estimates(
        orders, li, "o_custkey", "l_partkey", hex_zeros=1
    )


_Q296_ORACLE = """
    WITH ls AS (
      SELECT DISTINCT o_custkey AS k FROM orders
      WHERE substr(md5(CAST(o_custkey AS VARCHAR) || ':scard'), 1, 1) = '0'
    ),
    rs AS (
      SELECT DISTINCT l_partkey AS k FROM lineitem
      WHERE substr(md5(CAST(l_partkey AS VARCHAR) || ':scard'), 1, 1) = '0'
    ),
    c AS (
      SELECT (SELECT COUNT(*) FROM ls) AS na,
             (SELECT COUNT(*) FROM rs) AS nb,
             (SELECT COUNT(*) FROM ls JOIN rs USING (k)) AS ni
    )
    SELECT CAST(na * 16 AS BIGINT) AS est_left,
           CAST(nb * 16 AS BIGINT) AS est_right,
           CAST(ni * 16 AS BIGINT) AS est_intersection,
           CAST((na + nb - ni) * 16 AS BIGINT) AS est_union,
           round(CAST(ni AS DOUBLE) / CAST(na + nb - ni AS DOUBLE), 9)
             AS jaccard
    FROM c
"""

_Q296_NOTES = (
    "KMV SET-OPERATION CARDINALITIES (operators/cardinality."
    "set_cardinality_estimates — |A|, |B|, intersection, union, "
    "Jaccard between two key columns from ONE shared deterministic "
    "key-hash sample): the shared salt means a key survives on both "
    "sides or neither, so sampled-set intersection IS a Bernoulli "
    "sample of the true intersection (independent per-side samples "
    "would be quadratically wrong); Jaccard is a same-scale ratio, "
    "no scaling needed. Two map-side filters + sample-sized "
    "distincts/join; md5 rule replayed digit-for-digit by the oracle"
)


ROADMAP7.update(
    {
        "q296_set_cardinality": (q296_set_cardinality, _Q296_ORACLE, _Q296_NOTES),
    }
)


def q297_audio_spectral(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.audio import audio_spectral, with_wav_payload

    docs = read_table(spark, sf_dir, "documents")
    payloads = with_wav_payload(docs, "doc_id", every=10)
    return (
        audio_spectral(payloads, n_fft=256)
        .filter(F.col("decoded"))
        .select("doc_id", "centroid_hz", "bandwidth_hz", "rolloff_hz", "flatness")
        .orderBy("doc_id")
    )


_Q297_NOTES = (
    "AUDIO SPECTRAL FEATURES (llm/audio.audio_spectral — centroid/"
    "bandwidth/85%-rolloff/flatness from non-overlapping rectangular-"
    "window rfft frames averaged Welch-style, DC excluded from "
    "flatness): the speech/music/noise triage signals amplitude stats "
    "can't see. ROWS-ONLY by design — no SQL FFT exists; correctness "
    "pinned by construction laws in pytest (a pure tone's centroid IS "
    "its frequency, noise is flatter and wider — the isotonic-PAV "
    "precedent). Arrow mapInPandas, map-only, shuffle-free"
)


ROADMAP7.update(
    {
        "q297_audio_spectral": (q297_audio_spectral, None, _Q297_NOTES),
    }
)


def q298_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus-curation funnel in ONE scan: every stage of the
    standard pipeline (lang-ID -> quality gate -> exact near-dup
    canonicalization -> hash-rank sampling) computed as FLAGS over the
    same pass, one fingerprint-keyed window for first-wins dedup, one
    aggregate of cumulative-conjunction conditional sums — the report a
    curation run ships with (how much survived each gate, in docs and
    chars), never five scans."""
    from pyspark.sql import Window

    from ..functions.text import fingerprint, lang_id, quality_score, tokens

    docs = read_table(spark, sf_dir, "documents")
    tk = tokens("text")
    base = docs.select(
        "doc_id",
        "n_chars",
        (lang_id("text", tk) == "en").alias("s_lang"),
        (quality_score("text", tk) >= 0.75).alias("s_qual"),
        fingerprint("text").alias("fp"),
    ).withColumn("s_filt", F.col("s_lang") & F.col("s_qual"))
    w = Window.partitionBy("fp", "s_filt").orderBy("doc_id")
    flagged = base.withColumn(
        "s_canon", F.col("s_filt") & (F.row_number().over(w) == 1)
    ).withColumn(
        "s_samp",
        F.col("s_canon")
        & (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":cur"))),
                    1,
                    6,
                ),
                16,
                10,
            ).cast("long")
            % 100
            < 50
        ),
    )

    def stage(flag, name):
        return F.struct(
            F.lit(name).alias("stage"),
            F.sum(F.when(flag, 1).otherwise(0)).cast("long").alias("n_docs"),
            F.sum(F.when(flag, F.col("n_chars")).otherwise(0))
            .cast("long")
            .alias("n_chars_total"),
        )

    wide = flagged.agg(
        stage(F.lit(True), "1_raw").alias("a"),
        stage(F.col("s_lang"), "2_lang").alias("b"),
        stage(F.col("s_filt"), "3_quality").alias("c"),
        stage(F.col("s_canon"), "4_dedup").alias("d"),
        stage(F.col("s_samp"), "5_sample").alias("e"),
    )
    return (
        wide.select(
            F.explode(
                F.array(F.col("a"), F.col("b"), F.col("c"), F.col("d"), F.col("e"))
            ).alias("r")
        )
        .select("r.stage", "r.n_docs", "r.n_chars_total")
        .orderBy("stage")
    )


from ..functions.text import STOPWORDS as _CUR_STOPWORDS

_CUR_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in _CUR_STOPWORDS) + "]"

_Q298_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, text, n_chars,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS t
      FROM documents
    ),
    feats AS (
      SELECT doc_id, n_chars,
             CASE WHEN len(t) = 0 THEN 0.0
                  ELSE CAST(len(list_filter(t, x -> list_contains(
                    {_CUR_STOP_SQL}, x))) AS DOUBLE)
                    / len(t) END AS stop_ratio,
             CASE WHEN length(text) = 0 THEN 0.0
                  ELSE CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '',
                    'g')) AS DOUBLE) / length(text) END AS punct_ratio,
             CASE WHEN len(t) = 0 THEN 0.0
                  ELSE CAST(list_sum(list_transform(t, x -> length(x)))
                    AS DOUBLE) / len(t) END AS avg_wlen,
             length(text) AS n_len,
             md5(array_to_string(list_sort(list_distinct(t)), ' ')) AS fp
      FROM toks
    ),
    flags AS (
      SELECT doc_id, n_chars, fp,
             stop_ratio >= 0.05 AS s_lang,
             (stop_ratio >= 0.05) AND
             ((CASE WHEN n_len BETWEEN 100 AND 20000 THEN 0.25 ELSE 0.0 END
               + CASE WHEN punct_ratio <= 0.1 THEN 0.25 ELSE 0.0 END
               + CASE WHEN stop_ratio BETWEEN 0.02 AND 0.6 THEN 0.25 ELSE 0.0 END
               + CASE WHEN avg_wlen BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0.0 END)
              >= 0.75) AS s_filt
      FROM feats
    ),
    canon AS (
      SELECT doc_id, n_chars, s_lang, s_filt,
             s_filt AND (row_number() OVER (
               PARTITION BY fp, s_filt ORDER BY doc_id) = 1) AS s_canon
      FROM flags
    ),
    samp AS (
      SELECT *, s_canon AND (
        CAST(list_sum(list_transform(generate_series(1, 6), i ->
          CAST((strpos('0123456789abcdef',
                substr(md5(CAST(doc_id AS VARCHAR) || ':cur'), i, 1)) - 1)
            AS BIGINT) * CAST(power(16, 6 - i) AS BIGINT))) AS BIGINT)
        % 100 < 50) AS s_samp
      FROM canon
    )
    SELECT '1_raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars_total FROM samp
    UNION ALL
    SELECT '2_lang', CAST(SUM(CASE WHEN s_lang THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(CASE WHEN s_lang THEN n_chars ELSE 0 END) AS BIGINT) FROM samp
    UNION ALL
    SELECT '3_quality', CAST(SUM(CASE WHEN s_filt THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(CASE WHEN s_filt THEN n_chars ELSE 0 END) AS BIGINT) FROM samp
    UNION ALL
    SELECT '4_dedup', CAST(SUM(CASE WHEN s_canon THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(CASE WHEN s_canon THEN n_chars ELSE 0 END) AS BIGINT) FROM samp
    UNION ALL
    SELECT '5_sample', CAST(SUM(CASE WHEN s_samp THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(CASE WHEN s_samp THEN n_chars ELSE 0 END) AS BIGINT) FROM samp
    ORDER BY stage
"""

_Q298_NOTES = (
    "END-TO-END CURATION FUNNEL (the pipeline showcase: lang-ID -> "
    "quality gate -> exact near-dup canonicalization -> hash-rank "
    "sample, composed from the engine's own primitives lang_id/"
    "quality_score/fingerprint/md5-rule): ONE scan computing every "
    "stage as cumulative-conjunction FLAGS, one fingerprint-keyed "
    "window for first-wins dedup AMONG survivors (partition by "
    "(fp, s_filt) so filtered-out rows can't steal canonical slots), "
    "one aggregate of conditional sums — the survival report in docs "
    "and chars, never five scans. Quality threshold 0.75, sample 50%"
)


ROADMAP7.update(
    {
        "q298_curation_funnel": (q298_curation_funnel, _Q298_ORACLE, _Q298_NOTES),
    }
)


def q299_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialized-view maintenance differential: history (first
    ~80% of orders by key hash) is aggregated ONCE into a base table;
    the remaining delta folds in via merge_aggregates; the refreshed
    table must equal the oracle's full recompute over ALL orders —
    merge(agg(A), agg(B)) == agg(A ∪ B), pinned cross-engine."""
    from ..operators.aggregate import aggregate_table, merge_aggregates

    orders = read_table(spark, sf_dir, "orders").withColumn(
        "_p", F.col("o_totalprice").cast("decimal(28,2)")
    )
    specs = {
        "n_orders": ("count", None),
        "revenue": ("sum", "_p"),
        "first_date": ("min", "o_orderdate"),
        "last_date": ("max", "o_orderdate"),
    }
    hist = orders.filter(F.col("o_orderkey") % 5 != 0)
    delta = orders.filter(F.col("o_orderkey") % 5 == 0)
    base = aggregate_table(hist, ["o_orderpriority"], specs)
    merged = merge_aggregates(base, delta, ["o_orderpriority"], specs)
    return merged.select(
        "o_orderpriority",
        "n_orders",
        F.col("revenue").cast("double").alias("revenue"),
        "first_date",
        "last_date",
    ).orderBy("o_orderpriority")


_Q299_ORACLE = """
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE)
             AS revenue,
           MIN(o_orderdate) AS first_date,
           MAX(o_orderdate) AS last_date
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""

_Q299_NOTES = (
    "INCREMENTAL AGGREGATE MAINTENANCE (operators/aggregate."
    "merge_aggregates — fold an append-only delta into a materialized "
    "aggregate table, cost |delta| + |table|, never a history rescan: "
    "the day's 100 GB refreshes a view over years): mergeable monoid "
    "aggs only (count/sum by SUM, min/max by themselves; avg derives "
    "from sum+count at read time, non-decomposable aggs routed to the "
    "sketch family by a ValueError). The DIFFERENTIAL is the whole "
    "point: the oracle recomputes from ALL raw rows while Spark merges "
    "base+delta — hash equality proves merge(agg(A), agg(B)) == "
    "agg(A UNION B) down to the decimal sums"
)


ROADMAP7.update(
    {
        "q299_incremental_agg": (q299_incremental_agg, _Q299_ORACLE, _Q299_NOTES),
    }
)


def q300_geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.spatial import geo_radius_join_pairs

    cust = read_table(spark, sf_dir, "customer")
    # deterministic lat/lon: mid-latitude band, sub-degree jitter from
    # the key so distances vary smoothly
    pts = cust.select(
        F.col("c_custkey").alias("pid"),
        (
            (F.col("c_custkey") % 100).cast("double") / 10.0
            - 5.0
            + (F.col("c_custkey") % 977).cast("double") / 97700.0
        ).alias("lat"),
        (
            (F.col("c_custkey") % 73).cast("double") / 7.0
            + (F.col("c_custkey") % 353).cast("double") / 35300.0
        ).alias("lon"),
    )
    return geo_radius_join_pairs(
        pts, "pid", "lat", "lon", radius_m=25000.0
    ).orderBy("id_a", "id_b")


_Q300_ORACLE = """
    WITH pts AS (
      SELECT c_custkey AS pid,
             CAST(c_custkey % 100 AS DOUBLE) / 10.0 - 5.0
               + CAST(c_custkey % 977 AS DOUBLE) / 97700.0 AS lat,
             CAST(c_custkey % 73 AS DOUBLE) / 7.0
               + CAST(c_custkey % 353 AS DOUBLE) / 35300.0 AS lon
      FROM customer
    ),
    grid AS (
      SELECT pid, lat, lon,
             CAST(floor(lat / (25000.0 / 111194.92664455873)) AS BIGINT)
               AS cy,
             CAST(floor(lon / (25000.0 / (111194.92664455873
               * cos(radians(75.0))))) AS BIGINT) AS cx
      FROM pts WHERE abs(lat) <= 75.0
    ),
    rep AS (
      SELECT g.pid, g.lat, g.lon, g.cx + dx.d AS cx, g.cy + dy.d AS cy
      FROM grid g,
           (VALUES (-1), (0), (1)) dx(d),
           (VALUES (-1), (0), (1)) dy(d)
    ),
    cand AS (
      SELECT r.pid AS id_a, s.pid AS id_b,
             2.0 * 6371000.0 * asin(sqrt(
               sin(radians(s.lat - r.lat) / 2) * sin(radians(s.lat - r.lat) / 2)
               + cos(radians(r.lat)) * cos(radians(s.lat))
               * sin(radians(s.lon - r.lon) / 2)
               * sin(radians(s.lon - r.lon) / 2))) AS dist_m
      FROM rep r JOIN grid s ON s.cx = r.cx AND s.cy = r.cy
      WHERE r.pid < s.pid
    )
    SELECT id_a, id_b, round(dist_m, 6) AS dist_m
    FROM cand WHERE dist_m <= 25000.0
    ORDER BY id_a, id_b
"""

_Q300_NOTES = (
    "GEODESIC RADIUS SELF-JOIN (operators/spatial.geo_radius_join_pairs "
    "— the lat/lon twin of q226's planar grid join: latitude cells "
    "radius-tall, longitude cells radius-wide AT the worst-case "
    "latitude cap so every in-range cell stays >= radius wide; 3x3 "
    "replication on one side, equi-join on cell, exact haversine "
    "behind it — never a cross join, dense-city skew is an AQE "
    "skew-join concern not a plan concern). Haversine is raw IEEE "
    "trig in identical order both engines, 6dp output; pre-verified "
    "at every driver scale per the q257/q262 trig/libm convention"
)


ROADMAP7.update(
    {
        "q300_geo_radius_join": (q300_geo_radius_join, _Q300_ORACLE, _Q300_NOTES),
    }
)


def q301_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-users-to-date curve WITHOUT a running COUNT(DISTINCT)
    (which no engine can window at scale): each user contributes at
    their FIRST event day (one user-keyed agg), days roll up new-user
    counts (one day-keyed agg, day-count-sized), and the cumulative
    curve is a prefix_agg sum — the audience-growth / vocabulary-growth
    shape on event data."""
    from ..operators.prefix import prefix_agg

    ev = read_table(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(
        F.min(F.to_date(F.col("ts").cast("timestamp"))).alias("day")
    )
    daily = first_day.groupBy("day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    return (
        prefix_agg(daily, ["day"], "new_users", agg="sum",
                   out_col="cumulative_users")
        .select(
            # date -> timestamp on the wire: pandas sees datetime64 on
            # both engines (Spark DATE collects as object-date)
            F.col("day").cast("timestamp").alias("day"),
            "new_users",
            F.col("cumulative_users").cast("long").alias("cumulative_users"),
        )
        .orderBy("day")
    )


_Q301_ORACLE = """
    WITH first_day AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS day
      FROM events GROUP BY user_id
    ),
    daily AS (
      SELECT day, COUNT(*) AS new_users FROM first_day GROUP BY day
    )
    SELECT CAST(day AS TIMESTAMP) AS day, new_users,
           CAST(SUM(new_users) OVER (
             ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cumulative_users
    FROM daily
    ORDER BY day
"""

_Q301_NOTES = (
    "CUMULATIVE DISTINCT CURVE (distinct-users-to-date, the audience/"
    "vocabulary growth shape): a running COUNT(DISTINCT) is "
    "unwindowable at scale in ANY engine — decomposed as first-"
    "occurrence attribution (one user-keyed agg) -> per-day new-user "
    "counts (day-count-sized) -> prefix_agg cumulative sum (no "
    "SinglePartition). Exact BIGINT throughout"
)


ROADMAP7.update(
    {
        "q301_cumulative_distinct": (
            q301_cumulative_distinct,
            _Q301_ORACLE,
            _Q301_NOTES,
        ),
    }
)


def q302_join_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.advisor import advise_join

    return advise_join(
        spark,
        f"{sf_dir}/orders.parquet",
        f"{sf_dir}/lineitem.parquet",
        "o_orderkey",
        "l_orderkey",
    )


_Q302_NOTES = (
    "JOIN-STRATEGY ADVISOR (operators/advisor.advise_join — composes "
    "the engine's own probes into the pre-shuffle decision: footer "
    "storage profile for compressed bytes (metadata-only), key-hash "
    "sampled OUTPUT-size estimate (the failure mode size-based "
    "planners miss), one-agg skew factor on the bigger side; emits "
    "broadcast_left/right, shuffle_salted, or shuffle_hash_or_merge). "
    "ROWS-ONLY: the byte probe reads THIS run's parquet footers, "
    "which a static SQL twin cannot path-parameterize; strategy laws "
    "pinned in pytest on known fixtures"
)


ROADMAP7.update(
    {
        "q302_join_advisor": (q302_join_advisor, None, _Q302_NOTES),
    }
)


def q303_ranking_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG/MRR/P@10 over a deterministic ranking fixture: 5 queries,
    per-query ranking by the md5 rule (so both engines produce the
    identical 'retrieval run'), graded qrels from a doc_id residue —
    the metric operator is what's under test, with hits, misses,
    graded gains and no-relevant queries all present."""
    from pyspark.sql import Window

    from ..llm.retrieval import ranking_metrics

    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    base = docs.withColumn("query_id", (F.col("doc_id") % 5).cast("long"))
    w = Window.partitionBy("query_id").orderBy(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":rank"))),
        F.col("doc_id"),
    )
    results = (
        base.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "doc_id", "rank")
    )
    qrels = docs.select(
        (F.col("doc_id") % 5).cast("long").alias("query_id"),
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, 2)
        .when(F.col("doc_id") % 7 == 1, 1)
        .otherwise(0)
        .alias("rel"),
    ).filter(F.col("rel") > 0)
    return ranking_metrics(results, qrels, k=10).orderBy("query_id")


_Q303_ORACLE = """
    WITH base AS (
      SELECT doc_id, CAST(doc_id % 5 AS BIGINT) AS query_id FROM documents
    ),
    results AS (
      SELECT query_id, doc_id,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY md5(CAST(doc_id AS VARCHAR) || ':rank'), doc_id
             ) AS rank
      FROM base
      QUALIFY rank <= 10
    ),
    qrels AS (
      SELECT CAST(doc_id % 5 AS BIGINT) AS query_id, doc_id,
             CASE WHEN doc_id % 7 = 0 THEN 2
                  WHEN doc_id % 7 = 1 THEN 1 ELSE 0 END AS rel
      FROM documents
      WHERE doc_id % 7 IN (0, 1)
    ),
    hits AS (
      SELECT r.query_id, r.rank,
             CAST(COALESCE(q.rel, 0) AS DOUBLE) AS rel
      FROM results r
      LEFT JOIN qrels q ON q.query_id = r.query_id AND q.doc_id = r.doc_id
    ),
    per_query AS (
      SELECT query_id,
             round(SUM(rel / log2(CAST(rank AS DOUBLE) + 1.0)), 9) AS dcg,
             MAX(CASE WHEN rel > 0 THEN 1.0 / rank END) AS rr,
             SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) / 10.0 AS prec
      FROM hits GROUP BY query_id
    ),
    ideal AS (
      SELECT query_id,
             round(SUM(CAST(rel AS DOUBLE)
                       / log2(CAST(irank AS DOUBLE) + 1.0)), 9) AS idcg
      FROM (
        SELECT query_id, rel,
               row_number() OVER (
                 PARTITION BY query_id ORDER BY rel DESC, doc_id ASC
               ) AS irank
        FROM qrels
      )
      WHERE irank <= 10
      GROUP BY query_id
    )
    SELECT p.query_id,
           round(p.dcg / i.idcg, 6) AS ndcg,
           round(COALESCE(p.rr, 0.0), 6) AS mrr,
           round(p.prec, 6) AS precision
    FROM per_query p JOIN ideal i USING (query_id)
    ORDER BY p.query_id
"""

_Q303_NOTES = (
    "RANKING-QUALITY METRICS (llm/retrieval.ranking_metrics — NDCG@k / "
    "MRR@k / Precision@k per query, the feedback loop that makes the "
    "bm25/tfidf/rrf family TUNABLE): graded DCG rel/log2(rank+1), "
    "deterministic IDCG tie order (rel DESC, doc ASC), trec_eval's "
    "drop-no-relevant-queries convention; one (query,doc) left join + "
    "one query-keyed ideal window + one agg. log2 raw IEEE in "
    "identical order, 6dp per the libm rule; fixture ranking by the "
    "md5 rule so both engines score the identical run"
)


ROADMAP7.update(
    {
        "q303_ranking_metrics": (q303_ranking_metrics, _Q303_ORACLE, _Q303_NOTES),
    }
)


def q304_video_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.video import video_frame_stats, with_mjpeg_payload

    docs = read_table(spark, sf_dir, "documents")
    payloads = with_mjpeg_payload(docs, "doc_id", every=25)
    return (
        video_frame_stats(payloads, every=2)
        .filter(F.col("decoded"))
        .select(
            "doc_id", "fps", "width", "height", "n_frames", "duration_s",
            "frames_sampled", "motion",
        )
        .orderBy("doc_id")
    )


_Q304_NOTES = (
    "REAL VIDEO DECODE + FEATURES (llm/video — Motion-JPEG AVI: the "
    "RIFF chunk walker from the audio work demuxes the container, the "
    "in-repo pure-numpy JPEG codec decodes every sampled frame; "
    "per-video means + a MOTION score (mean inter-frame pixel delta) "
    "over every-k-th-frame sampling so per-row cost is independent of "
    "clip length; inter-frame codecs degrade to decoded=false — the "
    "image/audio contract; retires the LAST _fake_decode stub class). "
    "ROWS-ONLY: the JPEG DCT round-trip has no SQL twin; container "
    "fields and motion laws pinned in pytest (still clip == 0, "
    "shifting gradient > 0, frame decode within quantization error)"
)


ROADMAP7.update(
    {
        "q304_video_features": (q304_video_features, None, _Q304_NOTES),
    }
)


def q305_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.similarity import int8_quantize_stats

    emb = read_table(spark, sf_dir, "embeddings")
    return int8_quantize_stats(emb).orderBy("vec_id")


_Q305_ORACLE = """
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    st AS (
      SELECT vec_id, v, list_min(v) AS mn,
             (list_max(v) - list_min(v)) / 255.0 AS scale
      FROM e
    )
    SELECT vec_id,
           round(scale, 9) AS scale,
           round(mn, 6) AS zero_point,
           CASE WHEN scale = 0 THEN 0.0 ELSE
             round(list_sum(list_transform(v, x ->
               round(abs(x - (mn + floor((x - mn) / scale + 0.5) * scale)),
                     9))) / len(v), 9)
           END AS mae
    FROM st
    ORDER BY vec_id
"""

_Q305_NOTES = (
    "INT8 EMBEDDING QUANTIZATION ACCOUNTING (llm/similarity."
    "int8_quantize_stats — per-vector affine scale/zero-point plus the "
    "reconstruction MAE actually incurred, the question before "
    "shipping an index at 1/4 the bytes): explicit floor(x+0.5) "
    "rounding (never round(): HALF_UP vs banker's differs across "
    "engines), map-only HOF arithmetic, per-element error terms 9dp "
    "before the fold (the q43 convention)"
)


def q306_hamming_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.similarity import hamming_rerank

    emb = read_table(spark, sf_dir, "embeddings")
    return hamming_rerank(
        emb.filter(F.col("vec_id") < 5), emb, k=5, shortlist=20
    ).orderBy("query_id", "rank")


_Q306_ORACLE = """
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    packed AS (
      SELECT vec_id, v,
        CAST(list_sum(list_transform(generate_series(1, 32), i ->
          CASE WHEN v[i] > 0 THEN CAST(1 AS BIGINT) << (i - 1)
               ELSE 0 END)) AS BIGINT) AS lo,
        CAST(list_sum(list_transform(generate_series(33, 64), i ->
          CASE WHEN v[i] > 0 THEN CAST(1 AS BIGINT) << (i - 33)
               ELSE 0 END)) AS BIGINT) AS hi
      FROM e
    ),
    cand AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id, q.v AS qv, c.v AS cv,
             CAST(bit_count(xor(q.lo, c.lo))
                  + bit_count(xor(q.hi, c.hi)) AS INTEGER) AS hamming
      FROM packed q JOIN packed c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < 5
    ),
    short AS (
      SELECT query_id, cand_id, hamming, qv, cv,
             row_number() OVER (
               PARTITION BY query_id ORDER BY hamming, cand_id) AS hrank
      FROM cand
      QUALIFY hrank <= 20
    ),
    scored AS (
      SELECT query_id, cand_id, hamming,
             round(list_cosine_similarity(qv, cv), 6) AS cos_sim
      FROM short
    )
    SELECT query_id, cand_id, hamming, cos_sim, rank FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, cand_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    ORDER BY query_id, rank
"""

_Q306_NOTES = (
    "BINARY HAMMING TWO-STAGE RETRIEVAL (llm/similarity.hamming_rerank "
    "— sign-bit embeddings at 16 bytes/vector shortlist by XOR + "
    "bit_count, exact cosine reranks only the shortlist: the classic "
    "serving memory/accuracy trade): bits packed 32-per-BIGINT (never "
    "bit 63 — engines disagree on signed shift overflow), queries "
    "broadcast against the packed corpus (the q43 discipline, corpus "
    "never shuffles), integer hamming with deterministic id ties. "
    "Oracle replays the packing digit-for-digit and reranks with "
    "list_cosine_similarity"
)


ROADMAP7.update(
    {
        "q305_int8_quantization": (
            q305_int8_quantization,
            _Q305_ORACLE,
            _Q305_NOTES,
        ),
        "q306_hamming_rerank": (q306_hamming_rerank, _Q306_ORACLE, _Q306_NOTES),
    }
)


def q307_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-adjusted anomaly detection as a composition: per
    (event_type, hour-of-day) MEDIAN baseline (the seasonal profile)
    subtracts out the daily cycle, then the robust MAD flag
    (mad_outliers) runs on the RESIDUAL — a spike at 3am is judged
    against 3am's norm, not the whole day's. Two metadata-sized
    baseline broadcasts + the MAD pass; flagged rows only."""
    from ..operators.profile import mad_outliers

    ev = read_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    keyed = ev.select(
        "event_id",
        "event_type",
        F.hour(F.col("ts").cast("timestamp")).alias("hod"),
        "value",
    )
    baseline = keyed.groupBy("event_type", "hod").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias(
            "season_med"
        )
    )
    resid = keyed.join(F.broadcast(baseline), ["event_type", "hod"]).withColumn(
        "residual", F.col("value") - F.col("season_med")
    )
    flagged = mad_outliers(resid, ["event_type"], "residual", k=3.0)
    return (
        flagged.filter(F.col("is_outlier"))
        .select("event_id", "event_type", "hod", "value", "season_med",
                "residual")
        .orderBy("event_id")
    )


_Q307_ORACLE = """
    WITH keyed AS (
      SELECT event_id, event_type,
             CAST(extract(hour FROM ts) AS INTEGER) AS hod, value
      FROM events WHERE value IS NOT NULL
    ),
    baseline AS (
      SELECT event_type, hod,
             quantile_disc(value, 0.5) AS season_med
      FROM keyed GROUP BY event_type, hod
    ),
    resid AS (
      SELECT k.event_id, k.event_type, k.hod, k.value, b.season_med,
             k.value - b.season_med AS residual
      FROM keyed k JOIN baseline b USING (event_type, hod)
    ),
    med AS (
      SELECT event_type, quantile_disc(residual, 0.5) AS med
      FROM resid GROUP BY event_type
    ),
    mad AS (
      SELECT r.event_type,
             quantile_disc(abs(r.residual - m.med), 0.5) AS mad
      FROM resid r JOIN med m USING (event_type)
      GROUP BY r.event_type
    )
    SELECT r.event_id, r.event_type, r.hod, r.value, r.season_med,
           r.residual
    FROM resid r
    JOIN med m USING (event_type)
    JOIN mad d USING (event_type)
    WHERE abs(r.residual - m.med) > (3.0 * 1.4826) * d.mad
    ORDER BY r.event_id
"""

_Q307_NOTES = (
    "SEASONALITY-ADJUSTED ANOMALIES (composition showcase: per-(type, "
    "hour-of-day) MEDIAN baseline subtracts the daily cycle, robust "
    "MAD flags run on the RESIDUAL — a 3am spike judged against 3am's "
    "norm): two metadata-sized percentile_disc baselines broadcast "
    "back, flagging map-side; every comparison exact IEEE via the "
    "percentile_disc==quantile_disc parity — no rounding slack"
)


def q308_conversion_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on FUNNEL CONVERSION between hash-split
    variants: window_funnel levels per user, md5-rule A/B assignment,
    pooled-proportion z per step transition — the product-analytics
    readout (did the variant move view->click and click->purchase?)."""
    from ..operators.sequence import window_funnel

    ev = read_table(spark, sf_dir, "events")
    funnel = window_funnel(
        ev, "user_id", "ts", "event_type",
        ["view", "click", "purchase"], window_seconds=7200,
    )
    assigned = funnel.withColumn(
        "variant",
        F.when(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":ab"))),
                    1, 6,
                ), 16, 10,
            ).cast("long") % 2 == 0,
            F.lit("A"),
        ).otherwise(F.lit("B")),
    )
    # ONE no-grouping aggregate with per-variant conditional sums — no
    # per-variant frames, no join at all (a groupBy(variant) + self-join
    # would plan a non-scalar BNLJ the queue gate rightly flags)
    is_a = F.col("variant") == "A"

    def lv(cond, level):
        return F.sum(
            F.when(cond & (F.col("funnel_level") >= level), 1).otherwise(0)
        )

    j = assigned.agg(
        lv(is_a, 1).alias("a1"), lv(is_a, 2).alias("a2"),
        lv(is_a, 3).alias("a3"),
        lv(~is_a, 1).alias("b1"), lv(~is_a, 2).alias("b2"),
        lv(~is_a, 3).alias("b3"),
    )

    def ztest(sa, base_a, sb, base_b, step):
        # nullif guards: an empty step base (tiny fixtures) yields NULL
        # rates/z rather than a division error — mirrored in the oracle
        na = F.nullif(F.col(base_a).cast("double"), F.lit(0.0))
        nb = F.nullif(F.col(base_b).cast("double"), F.lit(0.0))
        pa = F.col(sa).cast("double") / na
        pb = F.col(sb).cast("double") / nb
        pool = (F.col(sa) + F.col(sb)).cast("double") / (
            F.col(base_a) + F.col(base_b)
        ).cast("double")
        se = F.nullif(
            F.sqrt(
                pool * (F.lit(1.0) - pool) * (F.lit(1.0) / na + F.lit(1.0) / nb)
            ),
            F.lit(0.0),
        )
        return F.struct(
            F.lit(step).alias("step"),
            F.col(base_a).cast("long").alias("n_a"),
            F.col(sa).cast("long").alias("conv_a"),
            F.col(base_b).cast("long").alias("n_b"),
            F.col(sb).cast("long").alias("conv_b"),
            F.round(pa, 9).alias("rate_a"),
            F.round(pb, 9).alias("rate_b"),
            F.round((pa - pb) / se, 6).alias("z"),
        )

    wide = j.select(
        F.explode(
            F.array(
                ztest("a2", "a1", "b2", "b1", "view_to_click"),
                ztest("a3", "a2", "b3", "b2", "click_to_purchase"),
            )
        ).alias("r")
    )
    return wide.select("r.*").orderBy("step")


_Q308_ORACLE = """
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS us
      FROM events WHERE event_type IN ('view', 'click', 'purchase')
    ),
    keys AS (SELECT DISTINCT user_id FROM ev),
    s1 AS (SELECT user_id, MIN(us) AS t1 FROM ev
           WHERE event_type = 'view' GROUP BY 1),
    s2 AS (SELECT e.user_id, MIN(e.us) AS t2 FROM ev e JOIN s1 USING (user_id)
           WHERE e.event_type = 'click' AND e.us > s1.t1
             AND e.us <= s1.t1 + 7200000000 GROUP BY 1),
    s3 AS (SELECT e.user_id, MIN(e.us) AS t3
           FROM ev e JOIN s2 USING (user_id) JOIN s1 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.us > s2.t2
             AND e.us <= s1.t1 + 7200000000 GROUP BY 1),
    lv AS (
      SELECT k.user_id,
             CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
                  WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS lvl,
             CASE WHEN CAST(list_sum(list_transform(generate_series(1, 6),
               i -> CAST((strpos('0123456789abcdef', substr(md5(
                 CAST(k.user_id AS VARCHAR) || ':ab'), i, 1)) - 1) AS BIGINT)
                 * CAST(power(16, 6 - i) AS BIGINT))) AS BIGINT) % 2 = 0
               THEN 'A' ELSE 'B' END AS variant
      FROM keys k
      LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
      LEFT JOIN s3 USING (user_id)
    ),
    pv AS (
      SELECT variant,
             SUM(CASE WHEN lvl >= 1 THEN 1 ELSE 0 END) AS l1,
             SUM(CASE WHEN lvl >= 2 THEN 1 ELSE 0 END) AS l2,
             SUM(CASE WHEN lvl >= 3 THEN 1 ELSE 0 END) AS l3
      FROM lv GROUP BY variant
    ),
    wide AS (
      SELECT
        (SELECT l1 FROM pv WHERE variant = 'A') AS a1,
        (SELECT l2 FROM pv WHERE variant = 'A') AS a2,
        (SELECT l3 FROM pv WHERE variant = 'A') AS a3,
        (SELECT l1 FROM pv WHERE variant = 'B') AS b1,
        (SELECT l2 FROM pv WHERE variant = 'B') AS b2,
        (SELECT l3 FROM pv WHERE variant = 'B') AS b3
    ),
    steps AS (
      SELECT 'view_to_click' AS step, a1 AS base_a, a2 AS conv_a,
             b1 AS base_b, b2 AS conv_b FROM wide
      UNION ALL
      SELECT 'click_to_purchase', a2, a3, b2, b3 FROM wide
    )
    SELECT step,
           CAST(base_a AS BIGINT) AS n_a, CAST(conv_a AS BIGINT) AS conv_a,
           CAST(base_b AS BIGINT) AS n_b, CAST(conv_b AS BIGINT) AS conv_b,
           round(CAST(conv_a AS DOUBLE) / nullif(base_a, 0), 9) AS rate_a,
           round(CAST(conv_b AS DOUBLE) / nullif(base_b, 0), 9) AS rate_b,
           round((CAST(conv_a AS DOUBLE) / nullif(base_a, 0)
                  - CAST(conv_b AS DOUBLE) / nullif(base_b, 0))
                 / nullif(sqrt((CAST(conv_a + conv_b AS DOUBLE)
                                / (base_a + base_b))
                        * (1.0 - CAST(conv_a + conv_b AS DOUBLE)
                                 / (base_a + base_b))
                        * (1.0 / nullif(base_a, 0)
                           + 1.0 / nullif(base_b, 0))), 0.0), 6) AS z
    FROM steps
    ORDER BY step
"""

_Q308_NOTES = (
    "FUNNEL CONVERSION A/B Z-TEST (composition: window_funnel levels "
    "per user + md5-rule variant assignment + pooled two-proportion z "
    "per step transition — the product-analytics readout): funnel is "
    "one fold exchange, variant counts are a 2-row aggregate, the z "
    "arithmetic is identical-order IEEE on exact integer counts (6dp "
    "for the sqrt). Column names step/n/conv per variant so the "
    "readout doubles as the sample-size report"
)


ROADMAP7.update(
    {
        "q307_seasonal_anomaly": (
            q307_seasonal_anomaly,
            _Q307_ORACLE,
            _Q307_NOTES,
        ),
        "q308_conversion_ab_test": (
            q308_conversion_ab_test,
            _Q308_ORACLE,
            _Q308_NOTES,
        ),
    }
)


def q309_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.cluster import silhouette_simplified

    emb = read_table(spark, sf_dir, "embeddings")
    return silhouette_simplified(emb).orderBy("label")


_Q309_ORACLE = """
    WITH exploded AS (
      SELECT label, e.dim, e.x
      FROM (
        SELECT label,
               unnest(list_transform(embedding, (v, i) ->
                 struct_pack(dim := i - 1, x := CAST(v AS DOUBLE)))) AS e
        FROM embeddings
      )
    ),
    per_dim AS (
      SELECT label, dim,
             CAST(SUM(CAST(round(x, 9) AS DECIMAL(38,12))) AS DOUBLE)
               / COUNT(*) AS c
      FROM exploded GROUP BY label, dim
    ),
    cents AS (
      SELECT label AS clabel, list(c ORDER BY dim) AS centroid
      FROM per_dim GROUP BY label
    ),
    scored AS (
      SELECT v.vec_id, v.label, c.clabel,
             sqrt(list_sum(list_transform(generate_series(1, len(c.centroid)),
               i -> round((CAST(v.embedding[i] AS DOUBLE) - c.centroid[i])
                          * (CAST(v.embedding[i] AS DOUBLE) - c.centroid[i]),
                          9)))) AS dist
      FROM embeddings v CROSS JOIN cents c
    ),
    per_vec AS (
      SELECT vec_id, label,
             MAX(CASE WHEN label = clabel THEN dist END) AS a,
             MIN(CASE WHEN label <> clabel THEN dist END) AS b
      FROM scored GROUP BY vec_id, label
    ),
    svals AS (
      SELECT label,
             CASE WHEN greatest(a, b) = 0 THEN 0.0
                  ELSE round((b - a) / greatest(a, b), 6) END AS s
      FROM per_vec WHERE b IS NOT NULL
    )
    SELECT label, COUNT(*) AS n,
           round(CAST(SUM(CAST(s AS DECIMAL(38,12))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_silhouette
    FROM svals GROUP BY label
    ORDER BY label
"""

_Q309_NOTES = (
    "SIMPLIFIED SILHOUETTE (llm/cluster.silhouette_simplified — the "
    "clustering-quality readout at corpus scale: exact silhouette is "
    "all-pairs O(n^2); the simplified form scores vectors against "
    "CENTROIDS only, one decimal-summed centroid build + one labels-"
    "sized broadcast per vector): per-element distance terms 9dp "
    "before the fold (q43 convention), per-vector s 6dp, per-label "
    "mean decimal-summed so the reduction is order-free; "
    "zero-denominator vectors score 0 by convention"
)


ROADMAP7.update(
    {
        "q309_silhouette": (q309_silhouette, _Q309_ORACLE, _Q309_NOTES),
    }
)


def q310_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR over a deterministic candidate set: 5 queries x 40 hash-
    scored candidates from the embeddings table."""
    from ..llm.retrieval import mmr_diversify

    emb = read_table(spark, sf_dir, "embeddings")
    cands = (
        emb.select(
            (F.col("vec_id") % 5).alias("query_id"),
            F.col("vec_id").alias("doc_id"),
            "embedding",
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("vec_id").cast("string"), F.lit(":rel"))),
                        1, 6,
                    ), 16, 10,
                ).cast("double")
                / F.lit(float(1 << 24))
            ).alias("rel"),
        )
        .filter(F.col("doc_id") < 200)
    )
    return mmr_diversify(cands, k=5, lam=0.7).orderBy("query_id", "mmr_rank")


_Q310_ORACLE = """
    WITH RECURSIVE cand AS (
      SELECT vec_id % 5 AS query_id,
             vec_id AS doc_id,
             CAST(('0x' || substring(md5(CAST(vec_id AS VARCHAR) || ':rel'), 1, 6))
                  AS BIGINT) / 16777216.0 AS rel,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
      WHERE vec_id < 200
    ),
    sel AS (
      SELECT query_id,
             pick['doc_id'] AS doc_id,
             1 AS mmr_rank,
             pick['s'] AS raw_score,
             [pick['doc_id']] AS picked,
             [pick['v']] AS picked_vs
      FROM (
        SELECT query_id,
               max(struct_pack(s := 0.7 * rel, d := -doc_id,
                               doc_id := doc_id, v := v)) AS pick
        FROM cand GROUP BY query_id
      )
      UNION ALL
      SELECT query_id,
             pick['doc_id'],
             mmr_rank + 1,
             pick['s'],
             list_append(picked, pick['doc_id']),
             list_append(picked_vs, pick['v'])
      FROM (
        SELECT s.query_id,
               any_value(s.mmr_rank) AS mmr_rank,
               any_value(s.picked) AS picked,
               any_value(s.picked_vs) AS picked_vs,
               max(struct_pack(
                 s := 0.7 * c.rel - (1 - 0.7) * greatest(0, list_max(list_transform(
                        s.picked_vs, pv -> list_cosine_similarity(c.v, pv)))),
                 d := -c.doc_id, doc_id := c.doc_id, v := c.v)) AS pick
        FROM sel s
        JOIN cand c
          ON c.query_id = s.query_id AND NOT list_contains(s.picked, c.doc_id)
        WHERE s.mmr_rank < 5
        GROUP BY s.query_id
      )
    )
    SELECT query_id, doc_id, CAST(mmr_rank AS INTEGER) AS mmr_rank,
           round(raw_score, 6) AS mmr_score
    FROM sel
    ORDER BY query_id, mmr_rank
"""

_Q310_NOTES = (
    "MMR DIVERSIFICATION (llm/retrieval.mmr_diversify — maximal "
    "marginal relevance between retrieval and the context window: "
    "greedy argmax of lam*rel - (1-lam)*max(0, max-sim-to-selected) so "
    "near-duplicate passages stop crowding the second topic; the "
    "penalty clamps at 0 — a negative cosine is 'maximally diverse', "
    "never a bonus): per-query grouped Arrow batch over ALREADY-TOP-N "
    "candidates (the rrf_fuse contract), keys parallelize. Converted "
    "from rows-only in round 11 (VERDICT r10 item 4): the greedy chain "
    "is deterministic given the md5 rel scores, so a recursive CTE "
    "replays the argmax exactly — max(struct(score, -doc_id, ...)) is "
    "the tie-broken argmax, the picked-vector list rides in the "
    "recursion state, verified rank-for-rank at all three fixture "
    "scales; lam=1-reduction and near-dup-demotion laws stay pinned in "
    "pytest"
)


ROADMAP7.update(
    {
        "q310_mmr_diversify": (q310_mmr_diversify, _Q310_ORACLE, _Q310_NOTES),
    }
)


def q311_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.drift import embedding_drift

    emb = read_table(spark, sf_dir, "embeddings")
    ref = emb.filter(F.col("vec_id") % 2 == 0)
    cur = emb.filter(F.col("vec_id") % 2 == 1)
    return embedding_drift(ref, cur)


_Q311_ORACLE = """
    WITH e AS (
      SELECT vec_id, vec_id % 2 AS side,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    exploded AS (
      SELECT side, vec_id, u.dim, u.x
      FROM (
        SELECT side, vec_id,
               unnest(list_transform(v, (x, i) ->
                 struct_pack(dim := i - 1, x := x))) AS u
        FROM e
      )
    ),
    mu AS (
      SELECT side, dim,
             CAST(SUM(CAST(round(x, 9) AS DECIMAL(38,12))) AS DOUBLE)
               / COUNT(*) AS m
      FROM exploded GROUP BY side, dim
    ),
    shift AS (
      SELECT sqrt(CAST(SUM(CAST(round((a.m - b.m) * (a.m - b.m), 12)
                   AS DECIMAL(38,14))) AS DOUBLE)) AS centroid_shift
      FROM mu a JOIN mu b ON a.dim = b.dim AND a.side = 0 AND b.side = 1
    ),
    norms AS (
      SELECT side, COUNT(*) AS n,
             CAST(SUM(CAST(round(nrm, 9) AS DECIMAL(38,12))) AS DOUBLE)
               / COUNT(*) AS mean_norm
      FROM (
        SELECT side,
               sqrt(list_sum(list_transform(v, x -> round(x * x, 9)))) AS nrm
        FROM e
      ) GROUP BY side
    ),
    dist AS (
      SELECT x.side, x.vec_id,
             sqrt(CAST(SUM(CAST(round((x.x - m.m) * (x.x - m.m), 9)
                  AS DECIMAL(38,12))) AS DOUBLE)) AS d
      FROM exploded x JOIN mu m ON m.side = x.side AND m.dim = x.dim
      GROUP BY x.side, x.vec_id
    ),
    disp AS (
      SELECT side,
             CAST(SUM(CAST(round(d, 9) AS DECIMAL(38,12))) AS DOUBLE)
               / COUNT(*) AS dispersion
      FROM dist GROUP BY side
    )
    SELECT CAST((SELECT n FROM norms WHERE side = 0) AS BIGINT) AS n_ref,
           CAST((SELECT n FROM norms WHERE side = 1) AS BIGINT) AS n_cur,
           round((SELECT centroid_shift FROM shift), 6) AS centroid_shift,
           round((SELECT mean_norm FROM norms WHERE side = 1)
                 / (SELECT mean_norm FROM norms WHERE side = 0), 6)
             AS norm_ratio,
           round((SELECT dispersion FROM disp WHERE side = 0), 6)
             AS dispersion_ref,
           round((SELECT dispersion FROM disp WHERE side = 1), 6)
             AS dispersion_cur
"""

_Q311_NOTES = (
    "EMBEDDING-SPACE DRIFT (operators/drift.embedding_drift — the "
    "semantic member of the drift family: PSI/KS watch scalar columns, "
    "KL/JS watches token text, this watches the vector space an index "
    "lives in): centroid L2 shift (content mix / encoder moved), mean-"
    "norm ratio (encoder rescale signature), per-side mean dispersion "
    "about the centroid (spread change without a d^2 covariance pass). "
    "One posexplode + d-row agg per side + broadcast recombination — "
    "never a corpus shuffle; every reduction decimal-summed"
)


ROADMAP7.update(
    {
        "q311_embedding_drift": (
            q311_embedding_drift,
            _Q311_ORACLE,
            _Q311_NOTES,
        ),
    }
)


def q312_bot_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import bot_signature

    ev = read_table(spark, sf_dir, "events")
    return bot_signature(
        ev, "user_id", "ts", min_events=20, cv_threshold=0.1
    ).orderBy("user_id")


_Q312_ORACLE = """
    WITH gaps AS (
      SELECT user_id,
             CAST(epoch_us(ts)
                  - lag(epoch_us(ts)) OVER (
                      PARTITION BY user_id ORDER BY ts) AS DOUBLE)
               / 1e6 AS gap
      FROM events
    ),
    g AS (SELECT user_id, round(gap, 9) AS gd FROM gaps WHERE gap IS NOT NULL),
    stats AS (
      SELECT user_id, COUNT(*) + 1 AS n_events,
             SUM(CAST(gd AS DECIMAL(38,9))) AS sg,
             SUM(CAST(round(gd * gd, 9) AS DECIMAL(38,9))) AS sgg
      FROM g GROUP BY user_id
    ),
    calc AS (
      SELECT user_id, n_events,
             CAST(sg AS DOUBLE) / (n_events - 1) AS mean,
             CAST(sgg AS DOUBLE) / (n_events - 1)
               - (CAST(sg AS DOUBLE) / (n_events - 1))
               * (CAST(sg AS DOUBLE) / (n_events - 1)) AS var
      FROM stats WHERE n_events >= 20
    )
    SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
           floor(mean * 1e6 + 0.5) / 1e6 AS mean_gap_s,
           floor(CASE WHEN mean <= 0 THEN 0.0
                      ELSE sqrt(greatest(var, 0.0)) / mean END
                 * 1e6 + 0.5) / 1e6 AS cv_gap,
           floor(CASE WHEN mean <= 0 THEN 0.0
                      ELSE sqrt(greatest(var, 0.0)) / mean END
                 * 1e6 + 0.5) / 1e6 < 0.1 AS is_bot
    FROM calc
    ORDER BY user_id
"""

_Q312_NOTES = (
    "AUTOMATION-SIGNATURE DETECTION (operators/profile.bot_signature — "
    "inter-event-gap coefficient of variation: Poisson-ish humans sit "
    "near CV 1, metronomic schedulers near 0 — the traffic-quality "
    "triage heuristic): one per-key lag window, decimal-summed gap "
    "moments, raw-IEEE mean/CV of identical sums; emits stats so the "
    "threshold tunes downstream"
)


def q313_wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.drift import wasserstein_1d

    ev = read_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    a = ev.filter(F.col("user_id") % 2 == 0)
    b = ev.filter(F.col("user_id") % 2 == 1)
    return wasserstein_1d(a, b, "value")


_Q313_ORACLE = """
    WITH tagged AS (
      SELECT CAST(value AS DOUBLE) AS v,
             CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS ca,
             CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS cb
      FROM events WHERE value IS NOT NULL
    ),
    counts AS (
      SELECT v, SUM(ca) AS ca, SUM(cb) AS cb FROM tagged GROUP BY v
    ),
    ordered AS (
      SELECT v, ca, cb,
             SUM(ca) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
             SUM(cb) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b,
             LEAD(v) OVER (ORDER BY v) AS next_v
      FROM counts
    ),
    tot AS (SELECT SUM(ca) AS n_a, SUM(cb) AS n_b FROM counts)
    SELECT CAST(t.n_a AS BIGINT) AS n_a, CAST(t.n_b AS BIGINT) AS n_b,
           round(CAST(SUM(CAST(round(
             abs(CAST(o.cum_a AS DOUBLE) / t.n_a
                 - CAST(o.cum_b AS DOUBLE) / t.n_b)
             * (o.next_v - o.v), 9) AS DECIMAL(38,12))) AS DOUBLE), 6)
             AS wasserstein
    FROM ordered o CROSS JOIN tot t
    WHERE o.next_v IS NOT NULL
    GROUP BY t.n_a, t.n_b
"""

_Q313_NOTES = (
    "EXACT 1-D WASSERSTEIN DRIFT (operators/drift.wasserstein_1d — the "
    "earth-mover member of the drift family: unlike KS's max CDF gap "
    "or binned PSI, W1 weighs HOW FAR mass moved): per-value counts, "
    "prefix_agg running CDFs for both sides, and the successor value "
    "as an EXCLUSIVE PREFIX MIN over the descending order (the suffix "
    "trick — no global lead() window, no SinglePartition); 9dp segment "
    "terms decimal-summed. Shift law pinned in pytest: uniform+7 -> "
    "W1 == 7 exactly"
)


ROADMAP7.update(
    {
        "q312_bot_signature": (q312_bot_signature, _Q312_ORACLE, _Q312_NOTES),
        "q313_wasserstein_drift": (
            q313_wasserstein_drift,
            _Q313_ORACLE,
            _Q313_NOTES,
        ),
    }
)


def q314_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-codec image near-dup: every sampled doc plants the SAME
    striped picture twice — once as PNG (id*2), once as JPEG (id*2+1).
    The dhash banding pairs each planted cross-codec twin; the stripe
    parameters cycle with period 50 sampled docs, so at larger SFs
    fixture-period REPEATS also (correctly) pair — every emitted pair
    is a genuine same-picture match by construction."""
    import numpy as np

    from pyspark.sql import types as T

    from ..llm.multimodal import image_dhash, image_near_dup_pairs

    docs = read_table(spark, sf_dir, "documents").select("doc_id")

    def gen(batches):
        import pandas as pd

        from ..llm.jpeg import encode_jpeg_pixels
        from ..llm.multimodal import encode_png  # noqa: F401  (fixture twin)

        for pdf in batches:
            out_ids, out_pay = [], []
            for i in (int(x) for x in pdf["doc_id"] if int(x) % 25 == 0):
                ys, xs = np.mgrid[0:24, 0:32]
                # STRUCTURALLY distinct per doc (dhash is shift-
                # invariant, so constant offsets all collide — vary the
                # stripe frequency and orientation instead)
                fx, fy = 3 + (i // 25) % 11, 2 + (i // 25) % 7
                base = (xs * fx + ys * fy) if (i // 25) % 2 == 0 else (
                    xs * fy - ys * fx
                )
                pic = np.stack(
                    [
                        (base * 7) % 256,
                        (base * 3 + xs) % 256,
                        (base * 5 + ys) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                import binascii
                import struct
                import zlib

                def chunk(typ, data):
                    body = typ + data
                    return (
                        struct.pack(">I", len(data)) + body
                        + struct.pack(">I", binascii.crc32(body) & 0xFFFFFFFF)
                    )

                raw = b"".join(b"\x00" + pic[y].tobytes() for y in range(24))
                png = (
                    b"\x89PNG\r\n\x1a\n"
                    + chunk(b"IHDR", struct.pack(">IIBBBBB", 32, 24, 8, 2, 0, 0, 0))
                    + chunk(b"IDAT", zlib.compress(raw))
                    + chunk(b"IEND", b"")
                )
                out_ids += [i * 2, i * 2 + 1]
                out_pay += [bytearray(png), bytearray(encode_jpeg_pixels(pic))]
            yield pd.DataFrame({"doc_id": out_ids, "payload": out_pay})

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    payloads = docs.mapInPandas(gen, schema)
    hashes = image_dhash(payloads)
    # hamming 10: JPEG quantization on high-frequency stripes can flip
    # more bits than photographic content would (measured at sf0.1:
    # 199/200 twins within 10; the one outlier is the honest recall
    # limit of dhash under extreme-frequency quantization noise)
    return image_near_dup_pairs(hashes, max_hamming=10).orderBy(
        "doc_a", "doc_b"
    )


_Q314_NOTES = (
    "CROSS-CODEC IMAGE NEAR-DUP (llm/multimodal.image_dhash + "
    "image_near_dup_pairs — the multimodal member of the dedup family: "
    "perceptual difference-hash over REAL decoded pixels survives "
    "re-encoding where byte md5 sees unrelated blobs; 64 bits packed "
    "32-per-BIGINT, LSH-style 16-bit banding -> equi-join candidates "
    "-> exact XOR+bit_count verify, never all-pairs): the fixture "
    "plants each picture as PNG AND JPEG, so every emitted pair is a "
    "planted cross-codec twin. ROWS-ONLY (pixel decode has no SQL "
    "twin); cross-codec-stability and banding laws pinned in pytest"
)


ROADMAP7.update(
    {
        "q314_image_near_dup": (q314_image_near_dup, None, _Q314_NOTES),
    }
)


def q315_psl_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Public-Suffix-List registered domains over synthesized crawl URLs
    (functions/psl.psl_registered_domain): the PSL algorithm — longest
    match, wildcard rules, exception overrides, private-section
    multi-tenant suffixes — as D broadcast left joins on computed
    suffix keys. Shuffle-free map-side plan; the heuristic
    url_registered_domain column stays alongside to expose exactly
    where the PSL correction bites (agree=false rows)."""
    from ..functions.psl import psl_registered_domain
    from ..functions.text import url_registered_domain

    docs = read_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    host = (
        F.when(d % 8 == 0, F.concat(F.lit("a"), (d % 5).cast("string"), F.lit(".b.ac.uk")))
        .when(d % 8 == 1, F.concat(F.lit("shop"), (d % 7).cast("string"), F.lit(".com.au")))
        .when(d % 8 == 2, F.concat(F.lit("tienda"), (d % 3).cast("string"), F.lit(".gob.mx")))
        .when(d % 8 == 3, F.concat(F.lit("u"), (d % 11).cast("string"), F.lit(".github.io")))
        .when(d % 8 == 4, F.concat(F.lit("x"), (d % 4).cast("string"), F.lit(".foo.ck")))
        .when(d % 8 == 5, F.lit("sub.www.ck"))
        .when(d % 8 == 6, F.concat(F.lit("w"), (d % 6).cast("string"), F.lit(".city.kawasaki.jp")))
        .otherwise(F.concat(F.lit("www.example"), (d % 9).cast("string"), F.lit(".com")))
    )
    url = F.concat(F.lit("https://"), host, F.lit("/p/"), d.cast("string"))
    base = docs.select("doc_id", url.alias("url"))
    out = psl_registered_domain(base, "url", out_col="psl_domain")
    return (
        out.withColumn("heuristic_domain", url_registered_domain("url"))
        .withColumn(
            "agree",
            F.coalesce(F.col("psl_domain") == F.col("heuristic_domain"), F.lit(False)),
        )
        .select("doc_id", "psl_domain", "heuristic_domain", "agree")
        .orderBy("doc_id")
    )


def _q315_oracle() -> str:
    """DuckDB replay of the SAME snapshot + algorithm: rules CTE from
    functions.psl constants (cannot drift), candidate suffixes by depth,
    exception-beats-longest prevailing, implicit-* default."""
    from ..functions.psl import oracle_rules_values

    return f"""
    WITH raw_rules(rule) AS (VALUES {oracle_rules_values()}),
    r AS (
      SELECT CASE WHEN rule LIKE '!%' THEN substr(rule, 2) ELSE rule END AS key,
             len(string_split(CASE WHEN rule LIKE '!%' THEN substr(rule, 2)
                              ELSE rule END, '.')) AS k,
             rule LIKE '!%' AS exc,
             rule LIKE '*.%' AS wild
      FROM raw_rules
    ),
    synth AS (
      SELECT doc_id,
        CASE doc_id % 8
          WHEN 0 THEN 'a' || CAST(doc_id % 5 AS VARCHAR) || '.b.ac.uk'
          WHEN 1 THEN 'shop' || CAST(doc_id % 7 AS VARCHAR) || '.com.au'
          WHEN 2 THEN 'tienda' || CAST(doc_id % 3 AS VARCHAR) || '.gob.mx'
          WHEN 3 THEN 'u' || CAST(doc_id % 11 AS VARCHAR) || '.github.io'
          WHEN 4 THEN 'x' || CAST(doc_id % 4 AS VARCHAR) || '.foo.ck'
          WHEN 5 THEN 'sub.www.ck'
          WHEN 6 THEN 'w' || CAST(doc_id % 6 AS VARCHAR) || '.city.kawasaki.jp'
          ELSE 'www.example' || CAST(doc_id % 9 AS VARCHAR) || '.com'
        END AS host
      FROM documents
    ),
    lab AS (
      SELECT doc_id, host, string_split(host, '.') AS labels,
             len(string_split(host, '.')) AS n
      FROM synth
    ),
    cand AS (
      SELECT l.doc_id, d.k,
             array_to_string(l.labels[l.n - d.k + 1 : l.n], '.') AS exact_k,
             CASE WHEN d.k >= 2 THEN
               '*.' || array_to_string(l.labels[l.n - d.k + 2 : l.n], '.')
             END AS wild_k
      FROM lab l CROSS JOIN (SELECT unnest(generate_series(1, 3)) AS k) d
      WHERE d.k <= l.n
    ),
    m AS (
      SELECT c.doc_id, r.k, r.exc
      FROM cand c JOIN r
        ON (NOT r.wild AND r.key = c.exact_k)
        OR (r.wild AND r.key = c.wild_k)
    ),
    agg AS (
      SELECT doc_id,
             MAX(CASE WHEN exc THEN k - 1 END) AS eps,
             MAX(CASE WHEN NOT exc THEN k END) AS nps
      FROM m GROUP BY doc_id
    ),
    fin AS (
      SELECT l.doc_id, l.host, l.labels, l.n,
             COALESCE(a.eps, a.nps, 1) AS ps
      FROM lab l LEFT JOIN agg a USING (doc_id)
    ),
    dom AS (
      SELECT doc_id, host,
        CASE WHEN n > ps
             THEN array_to_string(labels[n - ps : n], '.') END AS psl_domain,
        CASE WHEN regexp_matches(host,
               '[^.]+\\.(co|com|net|org|gov|ac|edu)\\.[a-z]{{2}}$')
             THEN regexp_extract(host, '([^.]+\\.[^.]+\\.[^.]+)$', 1)
             ELSE regexp_extract(host, '([^.]+\\.[^.]+)$', 1)
        END AS heuristic_domain
      FROM fin
    )
    SELECT doc_id, psl_domain, heuristic_domain,
           COALESCE(psl_domain = heuristic_domain, FALSE) AS agree
    FROM dom ORDER BY doc_id
"""


_Q315_NOTES = (
    "PSL REGISTERED DOMAIN (functions/psl.psl_registered_domain — the "
    "real Public-Suffix-List algorithm replacing the ccTLD heuristic, "
    "VERDICT r8 item 6: longest-match, wildcard *.ck, exception "
    "!www.ck / !city.kawasaki.jp, private-section github.io; vendored "
    "snapshot, full PSL drops into the same rules contract): D exact + "
    "D-1 wildcard BROADCAST left joins on computed suffix keys — zero "
    "shuffles, zero UDFs. Fixture covers every rule class; the oracle "
    "rebuilds its rules CTE from the SAME Python constants and replays "
    "prevailing-rule selection in SQL; agree=false rows pin exactly "
    "where the heuristic mis-keys (x.gob.mx, u.github.io, *.ck)"
)


ROADMAP7.update(
    {
        "q315_psl_domain": (q315_psl_domain, _q315_oracle(), _Q315_NOTES),
    }
)


# Round-9 queue additions live in their own module (roadmap9.py imports
# nothing from this one, so the merge is cycle-free); they share this
# queue dict and the same pre-verification sweep / landing mechanism.
from .roadmap9 import ROADMAP9 as _ROADMAP9  # noqa: E402

ROADMAP7.update(_ROADMAP9)

# Round-10 queue additions (same pattern).
from .roadmap10 import ROADMAP10 as _ROADMAP10  # noqa: E402

ROADMAP7.update(_ROADMAP10)

# Round-11 queue additions (same pattern).
from .roadmap11 import ROADMAP11 as _ROADMAP11  # noqa: E402

ROADMAP7.update(_ROADMAP11)

# Round-12 queue additions (same pattern).
from .roadmap12 import ROADMAP12 as _ROADMAP12  # noqa: E402

ROADMAP7.update(_ROADMAP12)

# Round-13 queue additions (same pattern).
from .roadmap13 import ROADMAP13 as _ROADMAP13  # noqa: E402

ROADMAP7.update(_ROADMAP13)

# Round-14 queue additions (same pattern).
from .roadmap14 import ROADMAP14 as _ROADMAP14  # noqa: E402

ROADMAP7.update(_ROADMAP14)

# Round-15 queue additions (same pattern).
from .roadmap15 import ROADMAP15 as _ROADMAP15  # noqa: E402

ROADMAP7.update(_ROADMAP15)
