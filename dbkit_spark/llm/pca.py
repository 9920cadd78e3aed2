"""Distributed second-moment statistics and PCA over embedding columns.

The curation questions "which embedding dimensions carry signal?",
"can we store 64-d vectors in 8 components?", and "is this embedding
space degenerate (collapsed dims)?" all reduce to the corpus covariance
matrix — a d x d object that is METADATA-SIZED no matter how large the
corpus is (64-d -> 2,080 upper-triangle entries). The scale design
exploits exactly that asymmetry:

- **Covariance**: every row expands its d-vector into the d(d+1)/2
  upper-triangle products MAP-SIDE (one nested ``transform`` over a
  ``sequence`` literal — whole-stage codegen, no joins, no Python), and
  a single hash aggregation with map-side combine reduces them. The
  shuffle carries O(d^2) rows PER TASK, not per input row — at 100 TB
  the exchange is thousands of rows while the O(N*d^2) multiply work
  (irreducible: that is what covariance costs) stays data-parallel.
  Products ride 9dp decimals so the sums are order-independent and a
  DuckDB oracle replays them digit-for-digit.

- **PCA**: the eigendecomposition runs DRIVER-SIDE on the collected
  d x d matrix (the bounded-scalar collect class — same as a
  convergence check; d^2 doubles, never rows), and the projection is a
  map-only JVM fold of each vector against the broadcast eigenvector
  literals. No corpus shuffle at any point: one pass for covariance,
  one map-only pass to project.

Eigenvector SIGN is canonicalized (the coordinate of largest absolute
value is made positive) so projections are deterministic across numpy
builds; eigen order is descending eigenvalue. Cross-engine: covariance
is fully oracle-portable; projections are pinned by property tests
(component variance == eigenvalue, cross-component covariance == 0)
rather than a SQL oracle — no SQL engine eigendecomposes.

Reference trace: none — dbkit stops at ToStr (`expression/convert.rs`);
this is north-star embedding analysis for the LLM pipeline
(BASELINE.json), same family as `llm/similarity.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_covariance(
    df: DataFrame,
    vec_col: str = "embedding",
    d: int | None = None,
    scale: int = 9,
    with_moments: bool = False,
) -> DataFrame:
    """Upper-triangle covariance entries ``(i, j, n, cov)`` for i <= j,
    cov_ij = (S_xy - S_x*S_y/n) / n (population covariance).

    One corpus pass: the nested-transform expansion emits
    struct(i, j, xy) for the d(d+1)/2 upper-triangle pairs plus the d
    first-moment terms, all map-side; one hash agg (map-side combined)
    reduces. Per-product rounding to ``scale`` dp + decimal sums keep
    the reduction order-independent (the q241 decimal-carry rule).

    ``with_moments=True`` appends the decimal first-moment sum ``sx_i``
    to each row, so a caller that also needs the corpus mean (PCA
    centering) derives mu_i = sx_i/n from the SAME collected result
    instead of a second corpus scan — the round-7 advice fix. Default
    off to keep the q243 oracle schema unchanged.
    """
    if d is None:
        d = len(df.select(vec_col).first()[0])
    dec = f"decimal(38,{scale})"
    # d(d+1)/2 struct(i, j, xy) entries, built entirely in codegen
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(d - 1)),
            lambda i: F.transform(
                F.sequence(i, F.lit(d - 1)),
                lambda j: F.struct(
                    i.alias("i"),
                    j.alias("j"),
                    F.round(
                        F.element_at(F.col(vec_col), i + 1).cast("double")
                        * F.element_at(F.col(vec_col), j + 1).cast("double"),
                        scale,
                    )
                    .cast(dec)
                    .alias("xy"),
                ),
            ),
        )
    )
    sxy = (
        df.select(F.explode(pairs).alias("p"))
        .select("p.i", "p.j", "p.xy")
        .groupBy("i", "j")
        .agg(F.count("*").cast("long").alias("n"), F.sum("xy").alias("sxy"))
    )
    # first moments: d rows, from a posexplode of the same vectors
    sx = (
        df.select(F.posexplode(F.col(vec_col)).alias("k", "x"))
        .select(
            "k", F.round(F.col("x").cast("double"), scale).cast(dec).alias("x")
        )
        .groupBy("k")
        .agg(F.sum("x").alias("sx"))
    )
    mi = sx.select(F.col("k").alias("i"), F.col("sx").alias("sx_i"))
    mj = sx.select(F.col("k").alias("j"), F.col("sx").alias("sx_j"))
    cov = (
        F.round(
            (
                F.col("sxy").cast("double")
                - F.col("sx_i").cast("double")
                * F.col("sx_j").cast("double")
                / F.col("n")
            )
            / F.col("n"),
            6,
        )
        + F.lit(0.0)  # -0.0 -> 0.0 (cross-engine canonical zero)
    ).alias("cov")
    joined = sxy.join(F.broadcast(mi), "i").join(F.broadcast(mj), "j")
    if with_moments:
        return joined.select("i", "j", "n", cov, "sx_i")
    return joined.select("i", "j", "n", cov)


def embedding_covariance_fast(
    df: DataFrame,
    vec_col: str = "embedding",
    d: int | None = None,
    with_moments: bool = False,
) -> DataFrame:
    """Performance twin of :func:`embedding_covariance` for large d —
    same output schema ``(i, j, n, cov[, sx_i])``, different physical
    strategy: a ``mapInArrow`` pass accumulates ONE numpy Gram partial
    per partition (``X.T @ X`` — BLAS, so the O(N*d^2) multiply work
    runs at native matrix-multiply speed instead of d(d+1)/2 codegen'd
    expressions per row) and emits d(d+1)/2 partial rows per PARTITION
    (not per input row or per Arrow batch); one hash agg reduces the
    partials. Shuffle volume: d(d+1)/2 x num_partitions rows — still
    metadata-sized at 100 TB.

    Trade-off (why the exploded-struct form stays the default): partials
    accumulate in float64, so the final sums are partitioning-dependent
    in the last bits — no DuckDB oracle can replay them digit-for-digit.
    The decimal path is the oracle-portable correctness baseline; this
    is the opt-in throughput path for d >= ~64, pinned against the
    baseline by tolerance parity tests (SCALE.md records the A/B).
    ``sx_i`` (with_moments) is likewise a double here, not a decimal.
    """
    import numpy as np
    import pyarrow as pa

    if d is None:
        d = len(df.select(vec_col).first()[0])
    dd = d
    iu0, iu1 = np.triu_indices(dd)

    def gram_partials(batches):
        g = np.zeros((dd, dd), dtype=np.float64)
        sx = np.zeros(dd, dtype=np.float64)
        n = 0
        for batch in batches:
            la = batch.column(0)
            off = la.offsets.to_numpy()
            if len(off) < 2:
                continue
            flat = la.values.to_numpy(zero_copy_only=False)
            X = np.asarray(
                flat[off[0] : off[-1]], dtype=np.float64
            ).reshape(-1, dd)
            g += X.T @ X
            sx += X.sum(axis=0)
            n += X.shape[0]
        if n == 0:
            return
        yield pa.RecordBatch.from_pydict(
            {
                "i": pa.array(iu0, type=pa.int32()),
                "j": pa.array(iu1, type=pa.int32()),
                "pn": pa.array(np.full(len(iu0), n), type=pa.int64()),
                "pxy": pa.array(g[iu0, iu1], type=pa.float64()),
                "px_i": pa.array(sx[iu0], type=pa.float64()),
                "px_j": pa.array(sx[iu1], type=pa.float64()),
            }
        )

    partials = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(vec_col).cast("array<double>").alias(vec_col)
    ).mapInArrow(
        gram_partials,
        "i int, j int, pn long, pxy double, px_i double, px_j double",
    )
    agg = partials.groupBy("i", "j").agg(
        F.sum("pn").alias("n"),
        F.sum("pxy").alias("sxy"),
        F.sum("px_i").alias("sx_i"),
        F.sum("px_j").alias("sx_j"),
    )
    cov = (
        F.round(
            (
                F.col("sxy")
                - F.col("sx_i") * F.col("sx_j") / F.col("n")
            )
            / F.col("n"),
            6,
        )
        + F.lit(0.0)
    ).alias("cov")
    if with_moments:
        return agg.select("i", "j", "n", cov, "sx_i")
    return agg.select("i", "j", "n", cov)


def _canonical_eigh(cov_rows, d: int, k: int):
    """Driver-side eigendecomposition of the collected upper triangle.

    Returns (eigvals desc, eigvecs as list-of-lists) with each vector's
    largest-|coordinate| entry made positive — deterministic across
    LAPACK builds up to degenerate (tied-eigenvalue) spectra.
    """
    import numpy as np

    m = np.zeros((d, d))
    for r in cov_rows:
        m[r["i"], r["j"]] = r["cov"]
        m[r["j"], r["i"]] = r["cov"]
    vals, vecs = np.linalg.eigh(m)  # ascending
    order = np.argsort(vals)[::-1][:k]
    out_vals, out_vecs = [], []
    for idx in order:
        v = vecs[:, idx]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        out_vals.append(float(vals[idx]))
        out_vecs.append([float(x) for x in v])
    return out_vals, out_vecs


def pca_project(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 4,
    d: int | None = None,
    fast: bool = False,
) -> DataFrame:
    """(id, pc1..pck) — corpus projected onto its top-k principal
    components.

    Plan: covariance (one pass, see above, with first moments riding
    along) -> driver eigh on the d x d matrix (bounded collect:
    d(d+1)/2 rows) -> map-only projection, a JVM ``aggregate`` fold per
    component against eigenvector literals. Centering means derive from
    the SAME collected covariance rows (mu_i = decimal sx_i / n —
    order-independent, no second corpus aggregation): exactly two
    corpus passes total, covariance + projection. The corpus is never
    shuffled.

    ``fast=True`` swaps in :func:`embedding_covariance_fast` (numpy
    Gram partials over mapInArrow — the d >= ~64 throughput path;
    float64 last-bit nondeterminism is absorbed by the 6dp rounding of
    both cov and the pc outputs in all but adversarial spectra).
    """
    if d is None:
        d = len(df.select(vec_col).first()[0])
    cov_fn = embedding_covariance_fast if fast else embedding_covariance
    cov = cov_fn(df, vec_col, d=d, with_moments=True)
    rows = cov.collect()  # d(d+1)/2 — metadata-sized
    n = rows[0]["n"]
    _, vecs = _canonical_eigh(rows, d, k)
    # corpus mean per dim from the diagonal rows' decimal first moments
    mu = [0.0] * d
    for r in rows:
        if r["i"] == r["j"]:
            mu[r["i"]] = float(r["sx_i"]) / n
    out = df.select(F.col(id_col), F.col(vec_col))
    for c, vec in enumerate(vecs, start=1):
        centered_dot = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(float(x)) for x in vec]),
                lambda x, v: x.cast("double") * v,
            ),
            F.lit(-sum(m * v for m, v in zip(mu, vec))),
            lambda acc, t: acc + t,
        )
        out = out.withColumn(f"pc{c}", F.round(centered_dot, 6))
    return out.drop(vec_col)
