"""Similarity search over embedding columns.

Two tiers (north-star extension; the reference has no vector ops):

- **Brute-force top-k** — broadcast the (small) query set against the
  corpus, score every pair, rank per query. Exact; the baseline. At
  100 TB this is one corpus scan per query batch: scan-bound and
  embarrassingly parallel, with a per-partition top-k
  (``row_number`` window) so only k rows per query leave each
  partition.
- **SRP-LSH ANN** — signed-random-projection buckets: P fixed ±1
  hyperplanes (derived from md5 so any engine can reproduce them),
  bucket = sign-bit pattern of the P projections. Search only the
  query's bucket: candidate set shrinks ~2^P×, trading recall for a
  bucket-local join. The production recall lever is multi-probe
  (flip low-margin bits) or repeated tables — both compose from this
  same operator.

All scoring is float64 higher-order expressions (functions/vectors.py)
— no UDFs, fully codegen'd.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.vectors import as_double_array, cosine, l2_norm


def srp_planes(num_planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 hyperplanes: sign(p,d) = parity of the
    md5-derived h60 of "p:d". Pure parameters (computed driver-side,
    embedded as literals in both the Spark plan and any oracle SQL)."""
    planes = []
    for p in range(num_planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:15], 16)
            row.append(1.0 if h & 1 == 1 else -1.0)
        planes.append(row)
    return planes


def with_vector_norm(
    df: DataFrame, vec_col: str = "embedding", out_vec: str = "v", out_norm: str = "norm"
) -> DataFrame:
    """Double-cast vector + L2 norm, with zero-norm vectors DROPPED:
    they have no defined cosine, and under ANSI mode the division
    would raise rather than return NULL. Real embedding models emit
    unit-norm vectors, so this is a no-op on healthy data (the SQL
    oracles assume a zero-norm-free corpus on that basis); on a dirty
    corpus it is the difference between a skipped row and a crashed
    1000-executor scoring job."""
    return (
        df.withColumn(out_vec, as_double_array(vec_col))
        .withColumn(out_norm, l2_norm(F.col(out_vec)))
        .filter(F.col(out_norm) > 0)
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine. ``queries`` is
    broadcast (query batches are small by construction); ties break on
    corpus id for full determinism."""
    c = with_vector_norm(corpus, vec_col).select(
        F.col(id_col).alias("corpus_id"), "v", "norm"
    )
    q = with_vector_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    scored = c.join(F.broadcast(q), F.col("corpus_id") != F.col("query_id")).select(
        "query_id",
        "corpus_id",
        cosine(F.col("qv"), F.col("v"), F.col("qnorm"), F.col("norm")).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("corpus_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def with_srp_bucket(
    df: DataFrame,
    planes: list[list[float]],
    vec_col: str = "v",
    out_col: str = "bucket",
) -> DataFrame:
    """Attach the SRP bucket id: bit p set iff plane_p · v > 0."""
    bucket = None
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(s) for s in plane])
        proj = F.aggregate(
            F.zip_with(F.col(vec_col), lit_plane, lambda x, s: x * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(proj > 0, F.lit(2**p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return df.withColumn(out_col, bucket.cast("int"))


def ann_topk_srp(
    corpus: DataFrame,
    queries: DataFrame,
    num_planes: int = 8,
    dim: int = 64,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's SRP
    bucket. The bucket equi-join replaces the cross join — candidate
    work drops ~2^P× at the cost of recall (multi-probe extends this
    operator without changing its shape)."""
    planes = srp_planes(num_planes, dim)
    c = with_srp_bucket(with_vector_norm(corpus, vec_col), planes).select(
        F.col(id_col).alias("corpus_id"), "v", "norm", "bucket"
    )
    q = with_srp_bucket(with_vector_norm(queries, vec_col), planes).select(
        F.col(id_col).alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
        F.col("bucket").alias("qbucket"),
    )
    scored = c.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("qbucket"))
        & (F.col("corpus_id") != F.col("query_id")),
    ).select(
        "query_id",
        "corpus_id",
        cosine(F.col("qv"), F.col("v"), F.col("qnorm"), F.col("norm")).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("corpus_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def brute_force_topk_pandas(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_query_rows: int = 100_000,
) -> DataFrame:
    """BLAS-backed twin of :func:`brute_force_topk`: the query matrix is
    collected driver-side (query batches are small by contract —
    enforced by ``max_query_rows``) and the corpus is scored per Arrow
    batch with one numpy matmul.

    Use over the expression form when vectors are wide (≥ ~256 dims) or
    query batches are large — one GEMM per batch beats per-element
    codegen. Results match the expression form up to last-ulp
    (cosines are rounded to 6 decimals in both).
    """
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    # the driver-side collect is safe ONLY for small query batches; a
    # miswired caller (e.g. the full corpus as `queries`) must fail
    # loudly, not OOM the driver — limit(cap+1) bounds the fetch itself
    q_rows = (
        queries.select(id_col, vec_col)
        .limit(max_query_rows + 1)
        .collect()
    )
    if len(q_rows) > max_query_rows:
        raise ValueError(
            f"brute_force_topk_pandas collects the query batch driver-side; "
            f"got more than max_query_rows={max_query_rows} rows — "
            f"use brute_force_topk (distributed) or raise the cap explicitly"
        )
    q_ids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType(), True),
            T.StructField("corpus_id", T.LongType(), True),
            T.StructField("cosine", T.DoubleType(), True),
        ]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            c_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            c_norm = np.linalg.norm(c_mat, axis=1)
            sims = (c_mat @ q_mat.T) / np.outer(c_norm, q_norm)
            n_c, n_q = sims.shape
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids[np.newaxis, :], n_c, 0).ravel(),
                    "corpus_id": np.repeat(c_ids, n_q),
                    "cosine": np.round(sims.ravel(), 6),
                }
            )

    scored = (
        corpus.select(id_col, vec_col)
        .mapInPandas(score, schema=out_schema)
        .filter(F.col("corpus_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def ann_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    num_centroids: int = 16,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_table: DataFrame | None = None,
) -> DataFrame:
    """IVF-flat approximate top-k: partition the corpus into inverted
    lists by nearest centroid, search only the query's ``n_probe``
    closest lists.

    Default centroids are the first ``num_centroids`` corpus vectors
    (deterministic shortcut; the oracle replicates it). Pass
    ``centroid_table`` — (cid, c: array<double>), e.g. the output of
    :func:`kmeans_fit_predict`'s trained centroids — for production-
    quality lists; the plan shape is identical either way. Assignment
    is a broadcast-centroid argmax of cosine; the search joins
    query→probed lists, so scoring work drops to
    ~n_probe/num_centroids of brute force.
    """
    c = with_vector_norm(corpus, vec_col).select(
        F.col(id_col).alias("corpus_id"), "v", "norm"
    )
    if centroid_table is not None:
        centroids = centroid_table.select(
            F.col("cid").alias("centroid_id"),
            F.col("c").alias("cv"),
            l2_norm(F.col("c")).alias("cnorm"),
        )
    else:
        centroids = (
            with_vector_norm(
                corpus.filter(F.col(id_col) < num_centroids), vec_col
            )
            .select(
                F.col(id_col).alias("centroid_id"),
                F.col("v").alias("cv"),
                F.col("norm").alias("cnorm"),
            )
        )

    def nearest_lists(side: DataFrame, side_id: str, n_lists: int) -> DataFrame:
        """Attach the n_lists nearest centroid ids to each vector."""
        scored = side.join(F.broadcast(centroids), F.lit(True)).select(
            side_id,
            "centroid_id",
            cosine(F.col("v"), F.col("cv"), F.col("norm"), F.col("cnorm")).alias(
                "c_sim"
            ),
        )
        w = Window.partitionBy(side_id).orderBy(
            F.desc("c_sim"), F.asc("centroid_id")
        )
        return (
            scored.withColumn("crank", F.row_number().over(w))
            .filter(F.col("crank") <= n_lists)
            .select(side_id, "centroid_id")
        )

    assignment = nearest_lists(c, "corpus_id", 1)
    c_listed = c.join(assignment, "corpus_id")
    q = with_vector_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    q_probes = nearest_lists(
        q.select(F.col("query_id"), F.col("qv").alias("v"), F.col("qnorm").alias("norm")),
        "query_id",
        n_probe,
    )
    q_listed = q.join(
        q_probes.withColumnRenamed("centroid_id", "qcentroid_id"), "query_id"
    )
    scored = c_listed.join(
        F.broadcast(q_listed),
        (F.col("centroid_id") == F.col("qcentroid_id"))
        & (F.col("corpus_id") != F.col("query_id")),
    ).select(
        "query_id",
        "corpus_id",
        cosine(F.col("qv"), F.col("v"), F.col("qnorm"), F.col("norm")).alias(
            "cosine"
        ),
    ).distinct()
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


# --- k-means (Lloyd iterations, cross-engine exact) -------------------------

# 2^48 fixed-point scale: embedding components rescale losslessly (see
# queries/functions_breadth.py note), so per-dim centroid sums are
# exact integers — order-independent and engine-independent.
KM_SCALE = float(2**48)


def _km_assign(
    v: DataFrame, centroids: DataFrame, id_col: str, dim: int | None = None
) -> DataFrame:
    """(id, x, cid, dist): nearest centroid per vector, ties broken by
    centroid id. dist is a left-to-right fold over dims — both engines
    produce bit-identical doubles, so the argmin agrees.

    When ``dim`` is known the fold is UNROLLED into a plain
    ``(((0.0 + d0²) + d1²) + ...)`` expression chain: identical
    addition order (hence identical doubles) to the
    zip_with/aggregate lambda, but whole-stage-codegen'd instead of
    interpreted per element — on the O(n·k) assignment stage, the
    engine's hottest loop, that is roughly an order of magnitude per
    row. The lambda fold remains as the unknown-length fallback.

    The unrolled path carries a FIXED-DIM CONTRACT: ``x[i]`` on a
    ragged/short vector throws an opaque INVALID_ARRAY_INDEX under
    ANSI mode, so the expression guards with a per-row size check
    (O(1) — arrays store their length) and raises a named error
    instead. Silent truncation (the lambda fold's behavior on ragged
    input) is NOT a fallback here: a 100 TB clustering job that
    quietly scores half-vectors is worse than one that stops."""
    if dim is not None:
        expr = "CAST(0.0 AS DOUBLE)"
        for i in range(dim):
            expr = f"({expr} + (x[{i}] - c[{i}]) * (x[{i}] - c[{i}]))"
        expr = (
            f"CASE WHEN size(x) = {dim} THEN {expr} ELSE "
            f"CAST(raise_error('k-means fixed-dim contract violated: "
            f"size(x) <> {dim}') AS DOUBLE) END"
        )
        dist = F.expr(expr)
    else:
        dist = F.aggregate(
            F.zip_with(
                F.col("x"), F.col("c"), lambda a, b: (a - b) * (a - b)
            ),
            F.lit(0.0),
            lambda acc, y: acc + y,
        )
    scored = v.crossJoin(F.broadcast(centroids)).select(
        id_col, "x", "cid", dist.alias("dist")
    )
    w = Window.partitionBy(id_col).orderBy("dist", "cid")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def _km_update(assigned: DataFrame, dim: int) -> DataFrame:
    """New centroids: exact fixed-point per-dim means of each cluster
    (empty clusters drop out — deterministically on both engines)."""
    dims = assigned.select(
        "cid", F.posexplode("x").alias("d", "xd")
    ).select(
        "cid", "d", (F.col("xd") * F.lit(KM_SCALE)).cast("bigint").alias("xs")
    )
    means = dims.groupBy("cid", "d").agg(
        (
            F.sum("xs").cast("double") / F.lit(KM_SCALE) / F.count(F.lit(1))
        ).alias("m")
    )
    return (
        means.groupBy("cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("d", "m"))),
                lambda s: s.m,
            ).alias("c")
        )
        .localCheckpoint(eager=False)
    )


def _km_prep(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """(id, x) vector table, hash-repartitioned on id and materialized
    once for the whole Lloyd loop. The repartition matters: the O(n·k)
    assignment projection runs in whatever stage precedes the argmin
    window's hash(id) exchange, and a single-file parquet input would
    otherwise pin that entire distance computation to ONE task.
    Pre-partitioning on id spreads it across the cluster AND is
    exactly the distribution the window needs, so no extra shuffle is
    added; the lazy checkpoint keeps iterations 2..N from re-scanning
    and re-shuffling the input. The partition count is EXPLICIT
    (defaultParallelism) because AQE sizes coalescing by shuffle
    BYTES — a few MB of vectors looks tiny to it, but each row fans
    out k distance folds downstream, so letting AQE collapse this
    exchange re-serializes the O(n·k) stage onto a handful of cores
    (measured: 5.1M folds on 1 task). Explicit repartition counts are
    exempt from AQE coalescing."""
    return (
        df.select(
            F.col(id_col),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(
                "x"
            ),
        )
        .repartition(
            df.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
        )
        .localCheckpoint(eager=False)
    )


def _km_loop(
    v: DataFrame, k: int, dim: int, iters: int, id_col: str
) -> DataFrame:
    centroids = (
        v.filter(F.col(id_col) < k)
        .select(F.col(id_col).cast("int").alias("cid"), F.col("x").alias("c"))
        .localCheckpoint(eager=False)
    )
    for _ in range(iters):
        assigned = _km_assign(v, centroids, id_col, dim=dim)
        centroids = _km_update(assigned, dim)
    return centroids


def kmeans_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    dim: int = 64,
    iters: int = 2,
) -> DataFrame:
    """Trained (cid, c) centroid table after ``iters`` Lloyd
    iterations — feed to :func:`ann_topk_ivf` as ``centroid_table``."""
    return _km_loop(_km_prep(df, vec_col, id_col), k, dim, iters, id_col)


def kmeans_fit_predict(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    dim: int = 64,
    iters: int = 2,
) -> DataFrame:
    """Lloyd's k-means over the corpus, fully distributed and
    cross-engine exact: deterministic init (the k smallest ids),
    assignment = broadcast-centroids cross join + per-vector argmin
    (shuffle ∝ corpus × k distance rows, never corpus²), update =
    one explode + two aggregations (per-dim fixed-point means).

    Each iteration is 2 jobs over the once-materialized,
    id-partitioned vector table (see :func:`_km_prep`); centroids
    (k rows) sit behind a lazy checkpoint barrier so the iterative
    lineage stays shallow. This is the production-quality centroid
    source for IVF (`ann_topk_ivf` documents its first-N init as the
    shortcut this replaces).

    Returns the final assignment (id, cid, dist).
    """
    v = _km_prep(df, vec_col, id_col)
    centroids = _km_loop(v, k, dim, iters, id_col)
    return _km_assign(v, centroids, id_col, dim=dim).select(
        id_col, "cid", F.round("dist", 6).alias("dist")
    )


# 2^30 fixed-point scale for k-means|| D² masses: quantized BEFORE the
# corpus-wide sum so the sampling denominator is an exact integer on
# any engine/partitioning (a raw double Σd² is order-sensitive).
KMPP_SCALE = float(2**30)
# 2^60: h60's value range — h60(x)/2^60 is the uniform [0,1) coin.
KMPP_H60_RANGE = float(2**60)


def kmeans_parallel_init(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    rounds: int = 3,
    oversample: int = 4,
    dim: int = 64,
) -> DataFrame:
    """k-means|| initialization (Bahmani et al., "Scalable k-means++")
    — THE distributed seeding algorithm: instead of k-means++'s k
    strictly sequential corpus scans, each of O(log n) rounds samples
    ~l points in PARALLEL with probability l·d²(x, C)/φ, then the
    oversampled set is weighted by how many points it attracts (the
    weights feed the final small weighted clustering). Deterministic
    cross-engine: the coin is h60('kmpp<r>:'||id)/2^60, d² masses are
    2^30 fixed-point ints summed exactly, and the accept test compares
    doubles derived from exact integers by identical expression trees.
    A point already in C has d² = 0 and can never re-sample, so no
    dedup pass is needed.

    Per round: one broadcast-centers assignment scan (shuffle ∝
    corpus argmin rows), one 1-row φ aggregate broadcast back, one
    filter — all corpus-linear; C stays behind barriers and is
    O(l·rounds) rows.

    Returns (cid, added_round, weight): the sampled centers, the round
    that added each, and its attracted-point count under the final C.
    """
    from ..functions.hashing import h60

    v = _km_prep(df, vec_col, id_col)
    centers = (
        v.filter(F.col(id_col) == 0)
        .select(
            F.col(id_col).cast("bigint").alias("cid"),
            F.col("x").alias("c"),
            F.lit(0).alias("added_round"),
        )
        .localCheckpoint(eager=False)
    )
    for r in range(1, rounds + 1):
        a = _km_assign(v, centers.select("cid", "c"), id_col, dim=dim)
        aq = a.select(
            id_col,
            "x",
            F.floor(F.col("dist") * F.lit(KMPP_SCALE))
            .cast("bigint")
            .alias("d2q"),
        ).localCheckpoint(eager=False)
        phi = aq.agg(
            F.sum(F.col("d2q").cast("decimal(38,0)")).alias("phiq")
        )
        coin = h60(
            F.concat(F.lit(f"kmpp{r}:"), F.col(id_col).cast("string"))
        ).cast("double")
        sampled = (
            aq.crossJoin(F.broadcast(phi))
            .filter(
                coin
                < F.lit(float(oversample))
                * F.col("d2q").cast("double")
                / F.col("phiq").cast("double")
                * F.lit(KMPP_H60_RANGE)
            )
            .select(
                F.col(id_col).cast("bigint").alias("cid"),
                F.col("x").alias("c"),
                F.lit(r).alias("added_round"),
            )
        )
        centers = centers.unionByName(sampled).localCheckpoint(
            eager=False
        )
    final = _km_assign(v, centers.select("cid", "c"), id_col, dim=dim)
    w = final.groupBy("cid").agg(F.count(F.lit(1)).alias("weight"))
    return centers.join(w, "cid", "left").select(
        "cid",
        F.col("added_round").cast("bigint").alias("added_round"),
        F.coalesce("weight", F.lit(0)).cast("bigint").alias("weight"),
    )


# --- multi-probe SRP ---------------------------------------------------------


def srp_projections(
    df: DataFrame, planes: list[list[float]], vec_col: str = "v"
) -> list:
    """One projection Column per plane (left-to-right fold — the same
    arithmetic the bucketing and any SQL oracle must reproduce)."""
    projs = []
    for plane in planes:
        lit_plane = F.array(*[F.lit(s) for s in plane])
        projs.append(
            F.aggregate(
                F.zip_with(F.col(vec_col), lit_plane, lambda x, s: x * s),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    return projs


def with_srp_probes(
    df: DataFrame,
    planes: list[list[float]],
    vec_col: str = "v",
    out_col: str = "probe",
) -> DataFrame:
    """Attach TWO probe bucket ids per row: the home bucket and the
    home bucket with its lowest-margin bit flipped (the plane the
    vector is closest to — the most likely single-bit hash error for
    a true near neighbor). This is multi-probe LSH: recall of ~2
    hash tables for the storage of one. The argmin is resolved with a
    least + first-match CASE chain (not a sort) so a SQL oracle can
    reproduce the tie-break bit-for-bit. Output has one row per
    (vector, probe) — callers explode-join on the probe column.
    """
    projs = srp_projections(df, planes, vec_col)
    bucket = None
    for p, proj in enumerate(projs):
        bit = F.when(proj > 0, F.lit(2**p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    min_margin = F.least(*[F.abs(p) for p in projs])
    flip = None
    for p, proj in enumerate(projs):
        cond = F.abs(proj) == min_margin
        flip = (
            F.when(cond, F.lit(2**p))
            if flip is None
            else flip.when(cond, F.lit(2**p))
        )
    probes = F.array(
        bucket.cast("int"), bucket.cast("int").bitwiseXOR(flip.cast("int"))
    )
    return df.withColumn(out_col, F.explode(probes))


# --- int8 scalar quantization (SQ8) ------------------------------------------


def sq8_scale(v: DataFrame, vec_col: str = "u") -> DataFrame:
    """Global symmetric quantization scale as ONE row: step =
    max(|component|)/127 over the whole (normalized) corpus. A single
    double regardless of corpus size — cross-joining it onto the scan
    broadcasts one row."""
    return v.select(F.explode(vec_col).alias("xd")).agg(
        (F.max(F.abs(F.col("xd"))) / F.lit(127.0)).alias("step")
    )


def with_sq8_codes(
    v: DataFrame, scale: DataFrame, vec_col: str = "u", out_col: str = "q"
) -> DataFrame:
    """Attach the symmetric int8 code array over UNIT vectors:
    code_i = clamp(floor(u_i/step + 0.5), -127, 127). Because the
    inputs are normalized and the scale is global, the integer dot
    product of two code arrays is proportional to cosine up to
    quantization error — which is what makes the candidate ranking
    work. Row-local transform over the broadcast scale row; fixed-order
    IEEE float ops, so codes are bit-identical across engines."""
    step = F.col("step")
    codes = F.transform(
        F.col(vec_col),
        lambda x: F.when(step == 0, F.lit(0))
        .otherwise(
            F.least(
                F.lit(127),
                F.greatest(F.lit(-127), F.floor(x / step + F.lit(0.5))),
            )
        )
        .cast("int"),
    )
    return v.crossJoin(F.broadcast(scale)).withColumn(out_col, codes).drop(
        "step"
    )


def ann_topk_sq8(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    rerank: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scalar-quantized top-k with exact rerank: score every pair on
    the int8 codes (integer dot product — exact, engine-independent),
    keep the top ``rerank`` candidates per query, then rerank those by
    exact float cosine and return the top ``k``.

    This is the memory-bandwidth lever for 100 TB vector search: the
    hot scan reads 1 byte/dim instead of 4 (float32) — a 4× smaller
    corpus image — and the exact vectors are touched only for
    ``rerank`` rows per query. The candidate stage is still a full
    scan (compose with IVF lists or SRP buckets to also cut the scan);
    output quality is governed by ``rerank``, not the 8-bit error.
    """
    unit = F.transform(
        F.col("v"), lambda x: x / F.col("norm")
    )
    v = with_vector_norm(corpus, vec_col).select(
        F.col(id_col).alias("corpus_id"), "v", "norm"
    ).withColumn("u", unit)
    scale = sq8_scale(v, "u").localCheckpoint(eager=False)
    c = with_sq8_codes(v, scale, "u").drop("u")
    q = with_sq8_codes(
        with_vector_norm(queries, vec_col)
        .select(
            F.col(id_col).alias("query_id"),
            F.col("v").alias("qv"),
            F.col("norm").alias("qnorm"),
        )
        .withColumn(
            "u", F.transform(F.col("qv"), lambda x: x / F.col("qnorm"))
        ),
        scale,
        "u",
        out_col="qq",
    ).drop("u")
    iscore = F.aggregate(
        F.zip_with(F.col("q"), F.col("qq"), lambda a, b: (a * b).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    scored = c.join(
        F.broadcast(q), F.col("corpus_id") != F.col("query_id")
    ).select(
        "query_id",
        "corpus_id",
        iscore.alias("approx_score"),
        "v",
        "norm",
        "qv",
        "qnorm",
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.desc("approx_score"), F.asc("corpus_id")
    )
    cand = scored.withColumn("crank", F.row_number().over(wc)).filter(
        F.col("crank") <= rerank
    )
    exact = cand.select(
        "query_id",
        "corpus_id",
        "approx_score",
        cosine(F.col("qv"), F.col("v"), F.col("qnorm"), F.col("norm")).alias(
            "cosine"
        ),
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("corpus_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "approx_score", "cosine", "rank")
    )


# --- product quantization (PQ) ANN ------------------------------------------

# 2^30 fixed-point scale for ADC lookup-table entries: per-subspace
# squared distances are O(subspace-dim · value-range²); quantizing each
# LUT entry to an int makes the per-candidate ADC sum (the ONLY
# order-sensitive reduction in the ADC stage) exact int64 arithmetic.
PQ_ADC_SCALE = float(2**30)


def _sq_dist_expr(dim: int, a: str = "x", b: str = "c") -> "F.Column":
    """Unrolled left-to-right squared-L2 fold (the _km_assign codegen
    discipline): identical addition order on every engine."""
    expr = "CAST(0.0 AS DOUBLE)"
    for i in range(dim):
        expr = f"({expr} + ({a}[{i}] - {b}[{i}]) * ({a}[{i}] - {b}[{i}]))"
    return F.expr(expr)


def pq_subvectors(
    df: DataFrame,
    m: int,
    sub_dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, m, x): each vector split into ``m`` contiguous
    ``sub_dim``-dim subvectors — subspace as a COLUMN, so one keyed
    dataflow trains/encodes all codebooks at once instead of m
    separate jobs."""
    x = F.transform(F.col(vec_col), lambda e: e.cast("double"))
    structs = F.array(
        *[
            F.struct(
                F.lit(j).alias("m"),
                F.slice(x, j * sub_dim + 1, sub_dim).alias("x"),
            )
            for j in range(m)
        ]
    )
    return df.select(F.col(id_col), F.explode(structs).alias("s")).select(
        F.col(id_col), F.col("s.m").alias("m"), F.col("s.x").alias("x")
    )


def _pq_assign(
    sub: DataFrame, cents: DataFrame, sub_dim: int, id_col: str
) -> DataFrame:
    """Nearest codebook entry per (vector, subspace); the centroid
    table is (m, cid, c) and tiny (m·k rows) — always broadcast."""
    scored = sub.join(F.broadcast(cents), "m").select(
        id_col, "m", "x", "cid", _sq_dist_expr(sub_dim).alias("dist")
    )
    w = Window.partitionBy(id_col, "m").orderBy("dist", "cid")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def pq_train(
    df: DataFrame,
    m: int = 8,
    sub_dim: int = 8,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-subspace codebooks (m, cid, c) via Lloyd iterations with
    deterministic first-k init — the kmeans_centroids fixed-point
    discipline (exact scaled-integer means, unrolled distance folds)
    applied across all m subspaces in ONE keyed dataflow."""
    sub = (
        pq_subvectors(df, m, sub_dim, id_col, vec_col)
        .repartition(
            df.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
        )
        .localCheckpoint(eager=False)
    )
    cents = (
        sub.filter(F.col(id_col) < k)
        .select(
            "m", F.col(id_col).cast("int").alias("cid"), F.col("x").alias("c")
        )
        .localCheckpoint(eager=False)
    )
    for _ in range(iters):
        assigned = _pq_assign(sub, cents, sub_dim, id_col)
        dims = assigned.select(
            "m", "cid", F.posexplode("x").alias("d", "xd")
        ).select(
            "m",
            "cid",
            "d",
            (F.col("xd") * F.lit(KM_SCALE)).cast("bigint").alias("xs"),
        )
        means = dims.groupBy("m", "cid", "d").agg(
            (
                F.sum("xs").cast("double") / F.lit(KM_SCALE) / F.count(F.lit(1))
            ).alias("mu")
        )
        cents = (
            means.groupBy("m", "cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("d", "mu"))),
                    lambda s: s.mu,
                ).alias("c")
            )
            .localCheckpoint(eager=False)
        )
    return cents


def ann_topk_pq(
    corpus: DataFrame,
    queries: DataFrame,
    m: int = 8,
    sub_dim: int = 8,
    n_codes: int = 16,
    k: int = 5,
    rerank: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation
    (ADC) and exact rerank — the Jégou-style memory lever for 100 TB
    vector search: the hot corpus image is m small ints per vector
    (4 bits/subspace here — a 32× reduction vs float32·64) plus a
    broadcast codebook; exact vectors are touched only for ``rerank``
    rows per query.

    Stages: (1) train per-subspace codebooks (``pq_train``), (2)
    encode the corpus — one broadcast join + per-(vector,subspace)
    argmin, (3) per query, build the m×n_codes ADC lookup table
    (tiny, broadcast) with entries floor-quantized at 2^30 so each
    candidate's approximate distance is an EXACT int64 sum — the only
    order-sensitive reduction — then (4) rerank the top candidates by
    the exact unrolled 64-dim distance. Self-matches are kept (dist
    0), mirroring the kmeans family's conventions."""
    dim = m * sub_dim
    cents = pq_train(
        corpus, m=m, sub_dim=sub_dim, k=n_codes, iters=2,
        id_col=id_col, vec_col=vec_col,
    )
    sub = pq_subvectors(corpus, m, sub_dim, id_col, vec_col)
    codes = _pq_assign(sub, cents, sub_dim, id_col).select(
        F.col(id_col).alias("corpus_id"), "m", F.col("cid").alias("code")
    )
    qsub = pq_subvectors(queries, m, sub_dim, id_col, vec_col)
    lut = (
        qsub.join(F.broadcast(cents), "m")
        .select(
            F.col(id_col).alias("query_id"),
            "m",
            F.col("cid").alias("code"),
            F.floor(F.lit(PQ_ADC_SCALE) * _sq_dist_expr(sub_dim))
            .cast("bigint")
            .alias("dq"),
        )
    )
    adc = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .groupBy("query_id", "corpus_id")
        .agg(F.sum("dq").alias("adc_q"))
    )
    wc = Window.partitionBy("query_id").orderBy("adc_q", "corpus_id")
    cand = adc.withColumn("crank", F.row_number().over(wc)).filter(
        F.col("crank") <= rerank
    )
    xv = F.transform(F.col(vec_col), lambda e: e.cast("double"))
    cv = corpus.select(F.col(id_col).alias("corpus_id"), xv.alias("x"))
    qv = queries.select(F.col(id_col).alias("query_id"), xv.alias("c"))
    exact = (
        cand.join(cv, "corpus_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "corpus_id",
            "adc_q",
            _sq_dist_expr(dim).alias("dist"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy("dist", "corpus_id")
    return (
        exact.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "corpus_id",
            F.col("rank").cast("bigint").alias("rank"),
            F.round("dist", 6).alias("dist"),
            "adc_q",
        )
    )


def ann_topk_ivfpq(
    corpus: DataFrame,
    queries: DataFrame,
    num_centroids: int = 16,
    n_probe: int = 2,
    m: int = 8,
    sub_dim: int = 8,
    n_codes: int = 16,
    k: int = 5,
    rerank: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ: the two ANN levers COMPOSED, which is the canonical
    billion-vector index layout (FAISS IVFPQ) — IVF routing cuts the
    SCAN (only ~n_probe/num_centroids of the corpus is considered per
    query) while PQ codes cut the MEMORY (4-bit codes instead of
    float32), and the exact rerank restores precision on the
    surviving candidates. Routing is the ann_topk_ivf cosine argmax
    against broadcast centroids; candidate ADC is the ann_topk_pq
    exact-int64 sum restricted to the probed lists' members; both
    levers' artifacts (centroid table, codebook, LUT) are broadcast,
    so the only corpus-sized relations are the code table and the
    list assignment — each a few ints per vector."""
    c = with_vector_norm(corpus, vec_col).select(
        F.col(id_col).alias("corpus_id"), "v", "norm"
    )
    centroids = with_vector_norm(
        corpus.filter(F.col(id_col) < num_centroids), vec_col
    ).select(
        F.col(id_col).alias("centroid_id"),
        F.col("v").alias("cv"),
        F.col("norm").alias("cnorm"),
    )

    def nearest_lists(side, side_id, n_lists):
        scored = side.join(F.broadcast(centroids), F.lit(True)).select(
            side_id,
            "centroid_id",
            cosine(
                F.col("v"), F.col("cv"), F.col("norm"), F.col("cnorm")
            ).alias("c_sim"),
        )
        w = Window.partitionBy(side_id).orderBy(
            F.desc("c_sim"), F.asc("centroid_id")
        )
        return (
            scored.withColumn("crank", F.row_number().over(w))
            .filter(F.col("crank") <= n_lists)
            .select(side_id, "centroid_id")
        )

    assignment = nearest_lists(c, "corpus_id", 1)
    q = with_vector_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("v"),
        F.col("norm"),
    )
    q_probes = nearest_lists(q, "query_id", n_probe)
    cand = (
        assignment.join(F.broadcast(q_probes), "centroid_id")
        .filter(F.col("corpus_id") != F.col("query_id"))
        .select("query_id", "corpus_id")
        .distinct()
    )

    cents_pq = pq_train(
        corpus, m=m, sub_dim=sub_dim, k=n_codes, iters=2,
        id_col=id_col, vec_col=vec_col,
    )
    sub = pq_subvectors(corpus, m, sub_dim, id_col, vec_col)
    codes = _pq_assign(sub, cents_pq, sub_dim, id_col).select(
        F.col(id_col).alias("corpus_id"), "m", F.col("cid").alias("code")
    )
    qsub = pq_subvectors(queries, m, sub_dim, id_col, vec_col)
    lut = qsub.join(F.broadcast(cents_pq), "m").select(
        F.col(id_col).alias("query_id"),
        "m",
        F.col("cid").alias("code"),
        F.floor(F.lit(PQ_ADC_SCALE) * _sq_dist_expr(sub_dim))
        .cast("bigint")
        .alias("dq"),
    )
    adc = (
        cand.join(codes, "corpus_id")
        .join(F.broadcast(lut), ["query_id", "m", "code"])
        .groupBy("query_id", "corpus_id")
        .agg(F.sum("dq").alias("adc_q"))
    )
    wc = Window.partitionBy("query_id").orderBy("adc_q", "corpus_id")
    shortlist = adc.withColumn("crank", F.row_number().over(wc)).filter(
        F.col("crank") <= rerank
    )
    xv = F.transform(F.col(vec_col), lambda e: e.cast("double"))
    cv = corpus.select(F.col(id_col).alias("corpus_id"), xv.alias("x"))
    qv = queries.select(F.col(id_col).alias("query_id"), xv.alias("c"))
    exact = (
        shortlist.join(cv, "corpus_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "corpus_id",
            "adc_q",
            _sq_dist_expr(m * sub_dim).alias("dist"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy("dist", "corpus_id")
    return (
        exact.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "corpus_id",
            F.col("rank").cast("bigint").alias("rank"),
            F.round("dist", 6).alias("dist"),
            "adc_q",
        )
    )
