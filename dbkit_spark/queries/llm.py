"""LLM-data-pipeline queries (SURVEY.md §2.11, BASELINE.md B6/B7):
dedup family, embedding similarity, text analysis, multimodal plumbing.

Every pipeline here is mirrored in generated ANSI SQL with the SAME
md5-based hash constructions and constants, so the DuckDB oracle
reproduces signatures, buckets, candidates, and scores bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..functions.text import (
    STOPWORDS,
    avg_word_len,
    fingerprint,
    lang_id,
    normalized_hash,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
)
from ..llm.dedup import (
    BAND_ROWS,
    MINHASH_A,
    MINHASH_B,
    MINHASH_K,
    MINHASH_PRIME,
    NUM_BANDS,
    SIMHASH_BITS,
    exact_dedup,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash_candidate_pairs,
    simhash_signatures,
)
from ..llm.multimodal import decode_features, with_binary_payload
from ..llm.similarity import ANN_BITS, ann_bucketed, cosine_topk, embedding_near_dup
from ..sources import read_table

# Shared SQL fragments (constants interpolated so Spark and SQL can never
# drift apart).
_TOKS_SQL = """
  SELECT doc_id, text, lang, source, n_chars,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS t
  FROM documents
"""

_SHINGLES_SQL = f"""
  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t)-2),
         i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS shingles
  FROM ({_TOKS_SQL}) WHERE len(t) >= 3
"""

_JACCARD_SQL = (
    "CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) / "
    "(len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles)))"
)


# --- B6: exact dedup -------------------------------------------------------
@register(
    "q39_dedup_exact",
    oracle="""
    SELECT doc_id, dedup_key FROM (
      SELECT doc_id,
             sha256(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS dedup_key,
             row_number() OVER (PARTITION BY sha256(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
                                ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn = 1
    """,
    notes="exact dedup: sha256(normalized text), deterministic min-id survivor",
)
def q39_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return exact_dedup(docs).select(
        "doc_id", normalized_hash("text").alias("dedup_key")
    )


# MinHash-LSH pipeline as a reusable CTE chain ending in `mh_pairs`
# (doc_a < doc_b, jaccard >= 0.5) — shared by q40, q87, q88 so the
# clustering oracles are built on the bit-identical pair set.
_MINHASH_CTES = f"""
    sh AS ({_SHINGLES_SQL}),
    shx AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    hx AS (
      SELECT doc_id,
             CAST(list_sum(list_transform(generate_series(1, 12),
                  i -> CAST((strpos('0123456789abcdef', substr(md5(shingle), i, 1)) - 1) AS BIGINT)
                       * CAST(pow(16, 12 - i) AS BIGINT))) AS BIGINT) AS x
      FROM shx
    ),
    sig AS (
      SELECT doc_id, list_value({", ".join(f"min(({MINHASH_A[i]}*x + {MINHASH_B[i]}) % {MINHASH_PRIME})" for i in range(MINHASH_K))}) AS sig
      FROM hx GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, unnest(list_transform(generate_series(0, {NUM_BANDS - 1}),
             b -> md5(concat_ws('#', CAST(b AS VARCHAR),
                      {", ".join(f"CAST(sig[{BAND_ROWS}*b+{i + 1}] AS VARCHAR)" for i in range(BAND_ROWS))}))))
             AS band_key
      FROM sig
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    mh_pairs AS (
      SELECT c.doc_a, c.doc_b, {_JACCARD_SQL} AS jaccard
      FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a JOIN sh sb ON sb.doc_id = c.doc_b
      WHERE {_JACCARD_SQL} >= 0.5
    )
"""


# --- B6: MinHash-LSH near-dup ----------------------------------------------
@register(
    "q40_dedup_minhash",
    oracle=f"""
    WITH {_MINHASH_CTES}
    SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard FROM mh_pairs
    """,
    notes="MinHash(K=16) + LSH(8 bands x 2 rows) candidates + exact Jaccard "
    "verify at 0.5; md5-portable so the oracle reproduces the bucketing",
)
def q40_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # split=True: tokenize+shingle+minhash all run map-side before the
    # first exchange — the adaptive scan split parallelizes that CPU
    # (A/B at sf0.1: 1.53 s -> 0.71 s).
    # persist_shingles=True (OPTIMIZATION_r15 re-measurement): the
    # round-8 recompute preference was measured when the cache
    # materialized on the raw scan's ONE task; with the split the cache
    # fills in parallel and saves the verify pass's two extra
    # scan+tokenize executions (in-process A/B x3 blocks at sf0.1:
    # persist 1.06/1.09/1.06 s vs recompute 1.52/1.24/1.15 — persist
    # won every block). Same trade at scale: one shingle-table
    # write+read beats two more full-corpus scans plus 2x tokenize CPU.
    docs = read_table(spark, sf_dir, "documents", split=True)
    out = minhash_near_dup_pairs(docs, threshold=0.5, persist_shingles=True)
    return out.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


# --- B6: SimHash signatures ------------------------------------------------
# (doc_id, simhash) as a reusable fragment: q41 emits it, q83 pairs on it.
_SIMHASH_SIG_SQL = f"""
    SELECT doc_id,
           string_agg(CASE WHEN s >= 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS simhash
    FROM (
      SELECT doc_id, j,
             SUM(2 * ((CAST(strpos('0123456789abcdef',
                       substr(md5(token), CAST(floor(j / 4) AS INT) + 1, 1)) AS INT) - 1)
                      >> (3 - (j % 4)) & 1) - 1) AS s
      FROM (SELECT DISTINCT doc_id, unnest(t) AS token FROM ({_TOKS_SQL})) tok,
           range({SIMHASH_BITS}) r(j)
      GROUP BY doc_id, j
    ) votes
    GROUP BY doc_id
"""


@register(
    "q41_simhash",
    oracle=_SIMHASH_SIG_SQL,
    notes="60-bit portable SimHash from per-token md5 bit votes",
)
def q41_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return simhash_signatures(docs)


_SIMHASH_D = 3  # max Hamming distance for q83
_SIMHASH_BAND_W = SIMHASH_BITS // (_SIMHASH_D + 1)


@register(
    "q83_simhash_pairs",
    oracle=f"""
    WITH sig AS ({_SIMHASH_SIG_SQL}),
    bands AS (
      SELECT doc_id, simhash, b,
             substr(simhash, 1 + b * {_SIMHASH_BAND_W}, {_SIMHASH_BAND_W}) AS v
      FROM sig, range({_SIMHASH_D + 1}) r(b)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS sig_a,
                      b.doc_id AS doc_b, b.simhash AS sig_b
      FROM bands a JOIN bands b ON a.b = b.b AND a.v = b.v
                                AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, hamming FROM (
      SELECT doc_a, doc_b,
             CAST(bit_count(xor(CAST(sig_a AS BIT), CAST(sig_b AS BIT)))
                  AS BIGINT) AS hamming
      FROM cand
    ) t WHERE hamming <= {_SIMHASH_D}
    """,
    notes="SimHash near-dup pairing: pigeonhole banding (d+1 blocks; a pair "
    "within Hamming d agrees exactly on >= 1 block) replaces n² compare with "
    "a band-key equi-join; popcount verify on bucket collisions only — the "
    "oracle uses DuckDB BITSTRING xor+bit_count, Spark uses 30-bit chunk "
    "conv+bitwiseXOR+bit_count",
)
def q83_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    sigs = simhash_signatures(docs)
    return simhash_candidate_pairs(sigs, max_distance=_SIMHASH_D)


# --- B6: exact n-gram Jaccard pairs ----------------------------------------
@register(
    "q42_ngram_jaccard",
    oracle=f"""
    WITH sh AS ({_SHINGLES_SQL}),
    shx AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM shx a JOIN shx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b, round({_JACCARD_SQL}, 6) AS jaccard
    FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a JOIN sh sb ON sb.doc_id = c.doc_b
    WHERE {_JACCARD_SQL} >= 0.5
    """,
    notes="exact near-dup baseline: shingle inverted-index candidates",
)
def q42_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    out = ngram_jaccard_pairs(docs, threshold=0.5)
    return out.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


# --- B7: cosine top-k ------------------------------------------------------
@register(
    "q43_cosine_topk",
    oracle="""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings)
    SELECT query_id, cand_id, cos_sim, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             round(list_cosine_similarity(q.v, c.v), 6) AS cos_sim,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY round(list_cosine_similarity(q.v, c.v), 6) DESC,
                                         c.vec_id) AS rank
      FROM e q JOIN e c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < 5
    ) WHERE rank <= 5
    """,
    notes="brute-force exact top-5 neighbors for 5 query vectors; "
    "broadcast queries, corpus never shuffles",
)
def q43_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # split=True: the dot products against the broadcast probe set are
    # map-side CPU before the top-k exchange (A/B: 0.61 s -> 0.34 s)
    emb = read_table(spark, sf_dir, "embeddings", split=True)
    return cosine_topk(emb.filter(F.col("vec_id") < 5), emb, k=5)


# --- B7: embedding near-dup pairs ------------------------------------------
@register(
    "q44_embedding_near_dup",
    oracle="""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.45
    """,
    notes="exact all-pairs cosine threshold (verify baseline)",
)
def q44_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    return embedding_near_dup(emb, threshold=0.45)


# --- B7: LSH-bucketed ANN (the scale path) ---------------------------------
def _plane_dot_sql(p: int, dim: int = 64) -> str:
    return (
        f"list_sum(list_transform(generate_series(0, {dim - 1}), d -> "
        f"CAST(v[d + 1] AS DOUBLE) * "
        f"CASE WHEN (strpos('0123456789abcdef', substr(md5(concat('{p}', ':', CAST(d AS VARCHAR))), 1, 1)) - 1) % 2 = 1 "
        f"THEN 1.0 ELSE -1.0 END))"
    )


@register(
    "q45_ann_lsh_bucketed",
    oracle=f"""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    bucketed AS (
      SELECT vec_id, v,
             concat({", ".join(f"CASE WHEN {_plane_dot_sql(p)} >= 0 THEN '1' ELSE '0' END" for p in range(ANN_BITS))})
               AS bucket
      FROM e
    )
    SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
    FROM bucketed a JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.3
    """,
    notes="random-hyperplane LSH (8 md5-derived sign bits) -> bucket "
    "equi-join -> cosine verify; semantics are bucket-restricted by design",
)
def q45_ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    return ann_bucketed(emb, threshold=0.3)


# --- text analysis ---------------------------------------------------------
_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"


@register(
    "q46_text_stats",
    oracle=f"""
    SELECT doc_id,
           len(t) AS n_tokens,
           CASE WHEN len(t) = 0 THEN 0.0
                ELSE CAST(len(list_filter(t, x -> list_contains({_STOP_SQL}, x))) AS DOUBLE) / len(t)
           END AS stop_ratio,
           CASE WHEN length(text) = 0 THEN 0.0
                ELSE CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE) / length(text)
           END AS punct_ratio,
           CASE WHEN len(t) = 0 THEN 0.0
                ELSE CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t)
           END AS avg_wlen
    FROM ({_TOKS_SQL})
    """,
    notes="token counting + stopword/punct ratios + avg word length",
)
def q46_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    from ..functions.text import tokens

    with_toks = docs.select("doc_id", "text", tokens("text").alias("__toks"))
    tk = F.col("__toks")
    return with_toks.select(
        "doc_id",
        F.size(tk).cast("long").alias("n_tokens"),
        stopword_ratio("text", tk).alias("stop_ratio"),
        punct_ratio("text").alias("punct_ratio"),
        avg_word_len("text", tk).alias("avg_wlen"),
    )


@register(
    "q47_lang_quality",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, text, lang,
             CASE WHEN len(t) = 0 THEN 0.0
                  ELSE CAST(len(list_filter(t, x -> list_contains({_STOP_SQL}, x))) AS DOUBLE) / len(t)
             END AS stop_ratio,
             CASE WHEN length(text) = 0 THEN 0.0
                  ELSE CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE) / length(text)
             END AS punct_ratio,
             CASE WHEN len(t) = 0 THEN 0.0
                  ELSE CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t)
             END AS avg_wlen
      FROM ({_TOKS_SQL})
    )
    SELECT doc_id, lang,
           CASE WHEN stop_ratio >= 0.05 THEN 'en' ELSE 'unk' END AS pred_lang,
           CAST(CASE WHEN length(text) BETWEEN 100 AND 20000 THEN 0.25 ELSE 0.0 END
            + CASE WHEN punct_ratio <= 0.1 THEN 0.25 ELSE 0.0 END
            + CASE WHEN stop_ratio BETWEEN 0.02 AND 0.6 THEN 0.25 ELSE 0.0 END
            + CASE WHEN avg_wlen BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0.0 END AS DOUBLE) AS quality
    FROM s
    """,
    notes="stopword-heuristic language ID + composite quality score",
)
def q47_lang_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    from ..functions.text import tokens

    with_toks = docs.select("doc_id", "lang", "text", tokens("text").alias("__toks"))
    tk = F.col("__toks")
    return with_toks.select(
        "doc_id",
        "lang",
        lang_id("text", tk).alias("pred_lang"),
        quality_score("text", tk).alias("quality"),
    )


@register(
    "q48_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(t)), ' ')) AS fp
    FROM ({_TOKS_SQL})
    """,
    notes="order/repetition-invariant document fingerprint (sorted token set)",
)
def q48_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint("text").alias("fp"))


# --- multimodal plumbing ---------------------------------------------------
@register(
    "q49_multimodal_features",
    oracle="""
    SELECT doc_id, 'text/plain' AS media_type,
           octet_length(encode(text)) AS payload_len,
           round(CASE WHEN length(text) = 0 THEN 0.0
                 ELSE CAST(list_sum(list_transform(range(1, length(text) + 1),
                      i -> ascii(substr(text, CAST(i AS INT), 1)))) AS DOUBLE) / length(text)
                 END, 6) AS feat_mean,
           CAST(octet_length(encode(text)) AS INT) AS feat_dim
    FROM documents
    """,
    notes="binary payload + mapInPandas feature extraction (decode stubbed "
    "deterministically; oracle uses codepoints == bytes for ASCII corpus)",
)
def q49_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    feats = decode_features(with_binary_payload(docs))
    return feats.select(
        "doc_id",
        "media_type",
        "payload_len",
        F.round("feat_mean", 6).alias("feat_mean"),
        "feat_dim",
    )


@register(
    "q85_image_decode",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'ppm' END AS img_format,
           CAST(4 + doc_id % 13 AS INT) AS width,
           CAST(3 + doc_id % 7 AS INT) AS height,
           CAST(24 AS INT) AS bpp,
           round(CAST(4 + doc_id % 13 AS DOUBLE) / (3 + doc_id % 7), 6)
             AS aspect,
           CAST(CASE WHEN doc_id % 2 = 0
             THEN 54 + (3 * (4 + doc_id % 13)
                        + (4 - (3 * (4 + doc_id % 13)) % 4) % 4)
                       * (3 + doc_id % 7)
             ELSE length('P6' || chr(10) || CAST(4 + doc_id % 13 AS VARCHAR)
                         || ' ' || CAST(3 + doc_id % 7 AS VARCHAR)
                         || chr(10) || '255' || chr(10))
                  + 3 * (4 + doc_id % 13) * (3 + doc_id % 7)
           END AS BIGINT) AS payload_len
    FROM documents
    """,
    notes="REAL image decode (llm/multimodal.parse_image_meta): BMP/PPM "
    "payloads are synthesized per row (dims derived from doc_id), then "
    "width/height/bpp are parsed back from the actual bytes in mapInPandas "
    "— the oracle derives the expected metadata independently from the "
    "same id formula, so a writer OR parser bug mismatches; the stub "
    "remains only for codec formats needing external libs",
)
def q85_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.multimodal import decode_image_meta, with_image_payload

    docs = read_table(spark, sf_dir, "documents")
    meta = decode_image_meta(with_image_payload(docs))
    return meta.select(
        "doc_id",
        "img_format",
        "width",
        "height",
        "bpp",
        # JVM-side rounding of the parsed dims (engine-parity with the
        # oracle's round); the operator's python-side aspect is equivalent
        F.round(F.col("width") / F.col("height"), 6).alias("aspect"),
        "payload_len",
    )


# --- B6: dedup clustering (pairs → connected components → survivors) -------
# The oracle closes the same pair graph with a recursive CTE: reach(id, r)
# holds "r reaches id"; min(r) per id is the component min-id label —
# independent of Spark's iteration order, so a propagation bug mismatches.
_REACH_CTES = f"""
    {_MINHASH_CTES},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM mh_pairs
      UNION
      SELECT doc_b, doc_a FROM mh_pairs
    ),
    reach(id, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
    )
"""


@register(
    "q87_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_REACH_CTES}
    SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id
    """,
    notes="near-dup transitive closure (llm/cluster.connected_components): "
    "min-label propagation over the q40 pair graph, one join + one min-agg "
    "shuffle per round, rounds = graph diameter (2-4 for near-dup cliques), "
    "decimal-summed convergence action; singletons keep their own id. The "
    "oracle computes the same labels order-independently via recursive-CTE "
    "reachability",
)
def q87_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.cluster import assign_clusters

    # split=True: same map-side tokenize/shingle front end as q40
    docs = read_table(spark, sf_dir, "documents", split=True)
    # persist_shingles: the component pipeline materializes the pair
    # set once into its own edge persist — the shingle cache pays here
    # (see minhash_near_dup_pairs docstring), unlike the one-shot q40
    pairs = minhash_near_dup_pairs(docs, threshold=0.5, persist_shingles=True)
    # LSH pairs are distinct (doc_a < doc_b) by construction: skip the
    # edge-dedup shuffle (OPTIMIZATION_r15; fixpoint identical)
    return assign_clusters(docs, pairs, dedupe_edges=False).select(
        "doc_id", "cluster_id"
    )


@register(
    "q88_dedup_survivors",
    oracle=f"""
    WITH RECURSIVE {_REACH_CTES}
    SELECT doc_id, lang, source, n_chars FROM documents
    WHERE doc_id IN (SELECT id FROM reach GROUP BY id HAVING min(r) = id)
    """,
    notes="deduplicated corpus (llm/cluster.dedup_survivors): deterministic "
    "min-id survivor per duplicate cluster, singletons kept — the step that "
    "actually shrinks a training corpus; shares one component computation "
    "with the cluster assignment",
)
def q88_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.cluster import dedup_survivors

    # split=True: same map-side tokenize/shingle front end as q40
    docs = read_table(spark, sf_dir, "documents", split=True)
    pairs = minhash_near_dup_pairs(docs, threshold=0.5, persist_shingles=True)
    return dedup_survivors(docs, pairs, dedupe_edges=False).select(
        "doc_id", "lang", "source", "n_chars"
    )


# --- benchmark decontamination ---------------------------------------------
def _shingles_sql_n(n: int) -> str:
    """n-word shingle SQL, the parametric version of ``_SHINGLES_SQL``."""
    terms = ", ".join(f"t[i+{j}]" for j in range(n))
    return f"""
  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t)-{n - 1}),
         i -> concat_ws(' ', {terms}))) AS shingles
  FROM ({_TOKS_SQL}) WHERE len(t) >= {n}
"""


@register(
    "q89_decontaminate",
    oracle=f"""
    WITH sh8 AS ({_shingles_sql_n(8)}),
    bg AS (SELECT DISTINCT unnest(shingles) AS shingle FROM sh8
           WHERE doc_id % 20 = 0),
    cg AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh8
           WHERE doc_id % 20 <> 0),
    hits AS (SELECT cg.doc_id, COUNT(DISTINCT cg.shingle) AS n_hit_ngrams
             FROM cg JOIN bg USING (shingle) GROUP BY cg.doc_id)
    SELECT d.doc_id,
           COALESCE(h.n_hit_ngrams, 0) AS n_hit_ngrams,
           COALESCE(h.n_hit_ngrams, 0) >= 1 AS contaminated
    FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
    WHERE d.doc_id % 20 <> 0
    """,
    notes="benchmark decontamination (llm/decontaminate): corpus docs "
    "sharing >= 1 word-8-gram with the eval set (doc_id % 20 = 0 stands in "
    "for a benchmark) are flagged; benchmark n-gram set broadcasts — the "
    "corpus never shuffles for the probe, one agg shuffle total at any "
    "corpus size",
)
def q89_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.decontaminate import decontaminate

    docs = read_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    benchmark = docs.filter(F.col("doc_id") % 20 == 0)
    return decontaminate(corpus, benchmark, n=8).select(
        "doc_id", "n_hit_ngrams", "contaminated"
    )


# --- intra-doc repetition quality ------------------------------------------
@register(
    "q90_repetition_scores",
    oracle=f"""
    WITH toks AS ({_TOKS_SQL}),
    perrow AS (
      SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
             round(1 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 6)
               AS dup_token_frac,
             round(1 - CAST(len(list_distinct(g)) AS DOUBLE) / len(g), 6)
               AS dup_ngram_frac
      FROM (SELECT doc_id, t,
                   list_transform(generate_series(1, len(t)-2),
                                  i -> concat_ws(' ', t[i], t[i+1], t[i+2])) AS g
            FROM toks WHERE len(t) >= 3)
    )
    SELECT p.doc_id, p.n_tokens, p.dup_token_frac, p.dup_ngram_frac,
           t2.top_token_share
    FROM perrow p
    JOIN (SELECT doc_id, round(CAST(max(c) AS DOUBLE) / sum(c), 6)
                   AS top_token_share
          FROM (SELECT doc_id, tok, count(*) AS c
                FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
                GROUP BY doc_id, tok)
          GROUP BY doc_id) t2 ON t2.doc_id = p.doc_id
    """,
    notes="repetition quality filters (llm/quality.repetition_scores), the "
    "C4/Gopher-style dup-ngram and top-token-share rules: dup fractions are "
    "map-only array ops (no shuffle, whole-stage codegen); top-token share "
    "is (doc,token)-count -> per-doc max, doc-keyed shuffles only",
)
def q90_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.quality import repetition_scores

    docs = read_table(spark, sf_dir, "documents")
    return repetition_scores(docs, ngram=3)


# --- embedding int8 quantization -------------------------------------------
@register(
    "q92_quantize_embeddings",
    oracle="""
    SELECT vec_id,
           round(m / 127.0, 6) AS scale,
           CASE WHEN m = 0
                THEN array_to_string(list_transform(embedding, x -> 0), ',')
                ELSE array_to_string(list_transform(embedding,
                     x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / m + 0.5) AS INT)), ',')
           END AS qvec_csv,
           CAST(CASE WHEN m = 0 THEN 0
                ELSE list_sum(list_transform(embedding,
                     x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / m + 0.5) AS BIGINT)
                          * CAST(floor(CAST(x AS DOUBLE) * 127.0 / m + 0.5) AS BIGINT)))
           END AS BIGINT) AS qnorm2
    FROM (SELECT vec_id, embedding,
                 list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS m
          FROM embeddings)
    """,
    notes="symmetric int8 scalar quantization "
    "(llm/similarity.quantize_embeddings): 4x-smaller vectors, all "
    "map-side codegen'd array ops; rounding written as floor(x+0.5) so "
    "both engines reproduce codes bit-for-bit (engine round() half-cases "
    "differ); arrays projected as csv + squared-norm scalars because the "
    "driver's pandas canonicalizer cannot sort list cells (q57 lesson)",
)
def q92_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.similarity import quantize_embeddings

    emb = read_table(spark, sf_dir, "embeddings")
    quant = quantize_embeddings(emb)
    return quant.select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        F.concat_ws(",", F.transform("qvec", lambda v: v.cast("string"))).alias(
            "qvec_csv"
        ),
        F.aggregate(
            "qvec",
            F.lit(0).cast("long"),
            lambda a, v: a + v.cast("long") * v.cast("long"),
        ).alias("qnorm2"),
    )


# --- corpus heavy hitters ---------------------------------------------------
@register(
    "q96_heavy_hitters",
    oracle=f"""
    SELECT token, df, total_tf
    FROM (
      SELECT tok AS token, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS total_tf
      FROM (SELECT doc_id, unnest(t) AS tok FROM ({_TOKS_SQL}))
      GROUP BY tok
    )
    ORDER BY df DESC, token ASC
    LIMIT 20
    """,
    notes="exact corpus heavy hitters: top-20 tokens by document frequency "
    "with deterministic (df DESC, token) tiebreak — vocabulary/stopword "
    "discovery over a corpus; one (token)-keyed agg then TakeOrderedAndProject "
    "(top-k never materializes a global sort)",
)
def q96_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokens("text")).alias("token")
    )
    counts = toks.groupBy("token").agg(
        F.count_distinct("doc_id").alias("df"),
        F.count("*").alias("total_tf"),
    )
    return counts.orderBy(F.col("df").desc(), F.col("token").asc()).limit(20)


# --- PII redaction ----------------------------------------------------------
@register(
    "q98_redact_pii",
    oracle="""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(synth,
                 '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '[EMAIL]', 'g'),
               '\\+[0-9]{1,2} [0-9]{3}-[0-9]{4}', '[PHONE]', 'g'),
             '([0-9]{1,3}\\.){3}[0-9]{1,3}', '[IP]', 'g') AS redacted
    FROM (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@mail.example ip 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                  || '.1 tel +1 555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS synth
      FROM documents
    )
    """,
    notes="PII redaction (functions/text.redact_pii): email/phone/IPv4 "
    "scrubbing as chained regexp_replace — map-only, whole-stage codegen, "
    "patterns restricted to the Java-regex/RE2 common subset; deterministic "
    "PII is synthesized per doc_id so both engines redact identical text",
)
def q98_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import redact_pii

    docs = read_table(spark, sf_dir, "documents")
    synth = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example ip 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".1 tel +1 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    return docs.select("doc_id", redact_pii(synth).alias("redacted"))


# --- prefix-filtered exact Jaccard (scale path for q42) ---------------------
@register(
    "q112_jaccard_prefix_filter",
    oracle=f"""
    WITH sh AS ({_SHINGLES_SQL}),
    shx AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM shx a JOIN shx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b, round({_JACCARD_SQL}, 6) AS jaccard
    FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a JOIN sh sb ON sb.doc_id = c.doc_b
    WHERE {_JACCARD_SQL} >= 0.5
    """,
    notes="prefix-filtered exact Jaccard (llm/dedup."
    "jaccard_prefix_filter_pairs, AllPairs/ppjoin family): only each "
    "doc's |x|-ceil(t|x|)+1 rarest shingles (global df order) enter the "
    "inverted index, so candidate generation joins on selective "
    "shingles instead of stop-shingle buckets; the oracle is q42's "
    "BRUTE-FORCE exact join — a hash match proves the filter dropped "
    "no true pair (completeness), not just that survivors verify",
)
def q112_jaccard_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.dedup import jaccard_prefix_filter_pairs

    # split=True: re-measured AFTER the hashed-intersect verify landed —
    # with the verify stage no longer dominant, parallelizing the
    # tokenize/shingle front end pays here too (in-process A/B at
    # sf0.1, 2 clean blocks: split 1.94/1.65 s vs raw 2.87/1.91)
    docs = read_table(spark, sf_dir, "documents", split=True)
    out = jaccard_prefix_filter_pairs(docs, threshold=0.5)
    return out.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


# --- B7: persisted ANN index round-trip ------------------------------------
@register(
    "q127_ann_index_query",
    oracle=f"""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    bucketed AS (
      SELECT vec_id, v,
             concat({", ".join(f"CASE WHEN {_plane_dot_sql(p)} >= 0 THEN '1' ELSE '0' END" for p in range(ANN_BITS))})
               AS bucket
      FROM e
    )
    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
           round(list_cosine_similarity(q.v, c.v), 6) AS cos_sim
    FROM bucketed c JOIN bucketed q ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
    WHERE q.vec_id < 50
      AND round(list_cosine_similarity(q.v, c.v), 6) >= 0.1
    """,
    notes="index PERSISTENCE round-trip (llm/similarity.save_hyperplane_"
    "index -> load_hyperplane_index -> ann_query_index): the corpus is "
    "hashed once and written to parquet partitioned by integer bucket "
    "id; the query batch alone is hashed at query time and broadcast "
    "against the loaded index. The oracle recomputes buckets from "
    "scratch, so a hash match proves the save/load round-trip preserves "
    "bucket assignments and vectors exactly. Fit-once/no-rehash is "
    "plan-asserted in tests/test_llm.py",
)
def q127_ann_index_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from ..llm.similarity import (
        ann_query_index,
        load_hyperplane_index,
        save_hyperplane_index,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    path = os.path.join(tempfile.gettempdir(), f"dbkit_ann_index_{sf_tag}")
    save_hyperplane_index(emb, path)
    index = load_hyperplane_index(spark, path)
    return ann_query_index(emb.filter(F.col("vec_id") < 50), index, threshold=0.1)


# --- multimodal: four-format header decode ---------------------------------
@register(
    "q130_image_formats",
    oracle="""
    SELECT doc_id,
           CASE doc_id % 4 WHEN 0 THEN 'bmp' WHEN 1 THEN 'ppm'
                           WHEN 2 THEN 'png' ELSE 'jpeg' END AS img_format,
           CAST(4 + doc_id % 13 AS INT) AS width,
           CAST(3 + doc_id % 7 AS INT) AS height,
           CAST(24 AS INT) AS bpp,
           round(CAST(4 + doc_id % 13 AS DOUBLE) / (3 + doc_id % 7), 6)
             AS aspect
    FROM documents
    """,
    notes="four-container image header decode (llm/multimodal."
    "parse_image_meta over mapInPandas): BMP + PPM (full real codecs), "
    "PNG (real spec-conforming file: IHDR/zlib-IDAT/IEND with CRCs, "
    "stdlib-only), JPEG (structurally valid JFIF/SOF0 marker stream — "
    "real dimension scan path, entropy data stubbed since true JPEG "
    "encoding needs DCT+Huffman). Dims derive from doc_id so the oracle "
    "checks writer AND parser independently; all four report 24 bpp "
    "(8-bit RGB / 3 components)",
)
def q130_image_formats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.multimodal import decode_image_meta, with_multiformat_image_payload

    docs = read_table(spark, sf_dir, "documents")
    meta = decode_image_meta(with_multiformat_image_payload(docs))
    return meta.select(
        "doc_id",
        "img_format",
        "width",
        "height",
        "bpp",
        F.round(F.col("width") / F.col("height"), 6).alias("aspect"),
    )


@register(
    "q198_dedup_survivors_best",
    oracle=f"""
    WITH RECURSIVE {_REACH_CTES},
    clusters AS (
      SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id
    ),
    ranked AS (
      SELECT d.doc_id, d.n_chars, c.cluster_id,
             ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                ORDER BY d.n_chars DESC, d.doc_id ASC) AS rk
      FROM documents d JOIN clusters c ON d.doc_id = c.doc_id
    )
    SELECT doc_id, cluster_id, n_chars
    FROM ranked WHERE rk = 1
    ORDER BY cluster_id
    """,
    notes="KEEP-BEST dedup survivors (llm/cluster.dedup_survivors_best "
    "— the policy production dedup actually wants: per duplicate "
    "cluster keep the LONGEST member, by (n_chars DESC, id ASC), "
    "because the min-id row of a near-dup cluster is often the "
    "truncated or boilerplate-wrapped copy; q88's min-id policy is "
    "the deterministic baseline): same connected-component labels as "
    "q87/q88, plus ONE cluster-keyed window rank — the policy swap "
    "costs a single extra shuffle over the already-clustered frame",
)
def q198_dedup_survivors_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.cluster import dedup_survivors_best

    docs = read_table(spark, sf_dir, "documents")
    pairs = minhash_near_dup_pairs(docs, threshold=0.5)
    return dedup_survivors_best(docs, pairs, "n_chars").select(
        "doc_id", "cluster_id", "n_chars"
    ).orderBy("cluster_id")
