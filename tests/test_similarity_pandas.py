"""The BLAS (mapInPandas) top-k twin must agree with the pure-expression
form (both round cosines to 6 decimals and tie-break on corpus_id)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_spark_streaming_app_spark.operators.similarity import (
    brute_force_topk,
    brute_force_topk_pandas,
)
from kafka_spark_streaming_app_spark.sources.batch import load_table


def test_pandas_topk_matches_expression_topk(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    expr_rows = {
        (r["query_id"], r["rank"]): (r["corpus_id"], r["cosine"])
        for r in brute_force_topk(emb, queries, k=10).collect()
    }
    blas_rows = {
        (r["query_id"], r["rank"]): (r["corpus_id"], r["cosine"])
        for r in brute_force_topk_pandas(emb, queries, k=10).collect()
    }
    assert expr_rows == blas_rows


def test_ivf_with_kmeans_centroids_recall(spark, sf_smoke):
    """IVF over TRAINED k-means lists must retain high recall against
    the exact brute-force top-5 (absolute floor — at a fixed n_probe
    on tiny data, k-means and first-N lists trade individual hits;
    measured 22/25 vs 24/25 here)."""
    from kafka_spark_streaming_app_spark.operators.similarity import (
        ann_topk_ivf,
        brute_force_topk,
        kmeans_centroids,
    )
    from kafka_spark_streaming_app_spark.sources.batch import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)

    def hits(result):
        return {(r.query_id, r.corpus_id) for r in result.collect()}

    exact = hits(brute_force_topk(emb, queries, k=5))
    cents = kmeans_centroids(emb, k=8, iters=2)
    km = hits(
        ann_topk_ivf(emb, queries, k=5, n_probe=2, centroid_table=cents)
    )
    assert len(km & exact) >= 0.8 * len(exact), (
        f"k-means IVF recall too low: {len(km & exact)}/{len(exact)}"
    )


def test_multiprobe_recall_is_superset_of_single_probe(spark, sf_smoke):
    """Multi-probe searches the home bucket PLUS one flipped-bit
    bucket, so its candidate set per query strictly contains the
    single-probe set — recall can only go up."""
    from kafka_spark_streaming_app_spark import registry

    registry.load_all()
    single = {
        (r.query_id, r.corpus_id)
        for r in registry.QUERIES["similarity_ann_srp_lsh"](
            spark, sf_smoke
        ).collect()
    }
    multi = {
        (r.query_id, r.corpus_id)
        for r in registry.QUERIES["similarity_ann_srp_multiprobe"](
            spark, sf_smoke
        ).collect()
    }
    # top-5 per query from a superset candidate pool: every single-probe
    # hit either survives or is displaced by a BETTER neighbor, so the
    # multi set is at least as large
    assert len(multi) >= len(single)


def test_brute_force_pandas_query_cap(spark, sf_smoke):
    """The driver-side collect of the query batch is bounded: over-cap
    callers fail loudly instead of materializing on the driver."""
    import pytest

    from kafka_spark_streaming_app_spark.sources.batch import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    with pytest.raises(ValueError, match="max_query_rows"):
        brute_force_topk_pandas(emb, emb, k=3, max_query_rows=10).collect()


def test_kmeans_ragged_vector_raises_named_error(spark):
    """The unrolled codegen distance path indexes x[0..dim-1]; a
    ragged vector must surface the FIXED-DIM CONTRACT as a named
    error, not an opaque ANSI INVALID_ARRAY_INDEX (and never silent
    truncation)."""
    import pytest
    from pyspark.sql import functions as F

    from kafka_spark_streaming_app_spark.operators.similarity import (
        kmeans_fit_predict,
    )

    rows = [(i, [float(i + d) for d in range(4)]) for i in range(8)]
    rows.append((8, [1.0, 2.0]))  # ragged
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    with pytest.raises(Exception, match="fixed-dim contract"):
        kmeans_fit_predict(df, k=2, dim=4, iters=1).collect()


def test_ranking_metrics_match_independent_recompute(spark, sf_smoke):
    """Recompute MRR/NDCG@5 in plain Python from the two underlying
    pipelines' outputs — catches a formula slip that a same-formula
    cross-engine oracle cannot (the Welch-t test discipline)."""
    import math

    from kafka_spark_streaming_app_spark import registry

    registry.load_all()
    sf = sf_smoke
    truth = {
        (r.query_id, r.corpus_id)
        for r in registry.QUERIES["similarity_topk_brute"](spark, sf)
        .filter("rank <= 5")
        .collect()
    }
    n_truth = {}
    for q, _ in truth:
        n_truth[q] = n_truth.get(q, 0) + 1
    retrieved = {}
    for idx, qname in (("srp_lsh", "similarity_ann_srp_lsh"), ("ivf", "similarity_ann_ivf")):
        for r in registry.QUERIES[qname](spark, sf).collect():
            retrieved.setdefault((idx, r.query_id), []).append(
                (r.rank, r.corpus_id)
            )
    got = {
        (r.idx, r.query_id): (r.mrr, r.ndcg_at_5)
        for r in registry.QUERIES["ranking_metrics_eval"](spark, sf).collect()
    }
    disc = [1000000000, 630929753, 500000000, 430676558, 386852807]
    for key, (mrr, ndcg) in got.items():
        idx, q = key
        ranked = sorted(retrieved.get(key, []))
        rels = [(q, c) in truth for _, c in ranked]
        exp_mrr = 0.0
        for i, rel in enumerate(rels):
            if rel:
                exp_mrr = round(1.0 / (i + 1), 6)
                break
        dcg = sum(d for d, rel in zip(disc, rels) if rel)
        idcg = sum(disc[: min(5, n_truth[q])])
        assert mrr == exp_mrr
        assert ndcg == round(dcg / idcg, 6)


def test_binary_hamming_matches_numpy_and_measures_recall(spark, sf_smoke):
    """similarity_binary_hamming recomputed with numpy (sign packing,
    xor+popcount, top-32 Hamming, exact-cosine rerank) — exact match —
    and its recall vs the brute-force top-5 must be non-trivial (the
    1-bit funnel keeps most true neighbors at 64 dims)."""
    import numpy as np
    import pandas as pd

    from kafka_spark_streaming_app_spark import registry

    registry.load_all()
    emb = pd.read_parquet(f"{sf_smoke}/embeddings.parquet")
    V = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    norms = np.sqrt((V * V).sum(axis=1))
    keep = norms > 0
    V, ids, norms = V[keep], ids[keep], norms[keep]
    sig = np.zeros(len(V), dtype=np.uint64)
    for d in range(64):
        sig |= (V[:, d] > 0).astype(np.uint64) << np.uint64(d)

    expected = {}
    for qi in np.where(ids < 5)[0]:
        mask = ids != ids[qi]
        ham = np.array(
            [bin(int(sig[qi] ^ s)).count("1") for s in sig[mask]]
        )
        cid = ids[mask]
        order = np.lexsort((cid, ham))[:32]
        cos = np.round(
            (V[mask][order] @ V[qi]) / (norms[mask][order] * norms[qi]),
            6,
        )
        rer = np.lexsort((cid[order], -cos))[:5]
        expected[int(ids[qi])] = [
            (int(cid[order][r]), float(cos[r])) for r in rer
        ]

    got = {}
    for r in (
        registry.QUERIES["similarity_binary_hamming"](spark, sf_smoke)
        .orderBy("query_id", "rank")
        .collect()
    ):
        got.setdefault(r.query_id, []).append((r.corpus_id, r.cosine))
    assert set(got) == set(expected)
    for k in got:
        assert [c for c, _ in got[k]] == [c for c, _ in expected[k]]
        for (_, a), (_, b) in zip(got[k], expected[k]):
            assert abs(a - b) < 2e-6  # numpy fsum order vs engine
    # recall vs exact top-5
    brute = {}
    for r in (
        registry.QUERIES["similarity_topk_brute"](spark, sf_smoke)
        .filter("rank <= 5")
        .collect()
    ):
        brute.setdefault(r.query_id, set()).add(r.corpus_id)
    hits = sum(
        len(brute[q] & {c for c, _ in got[q]}) for q in brute
    )
    assert hits / (5 * len(brute)) >= 0.5


def test_kmeans_parallel_init_matches_pure_python(spark, sf_smoke):
    """kmeans|| recomputed sequentially in pure Python (same h60
    coins, same 2^30 D² quantization): identical center set, rounds,
    and attraction weights; weights must partition the corpus."""
    import hashlib
    import math

    import numpy as np
    import pandas as pd

    from kafka_spark_streaming_app_spark import registry

    registry.load_all()
    emb = pd.read_parquet(f"{sf_smoke}/embeddings.parquet")
    ids = emb["vec_id"].to_numpy()
    V = np.stack(emb["embedding"].to_numpy()).astype(np.float64)

    def d2(a, b):
        # left-to-right fold like the engines' unrolled chain
        acc = 0.0
        for i in range(64):
            acc += (a[i] - b[i]) * (a[i] - b[i])
        return acc

    def h60py(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    centers = {0: 0}  # vec_id -> round added
    for r in (1, 2, 3):
        cids = sorted(centers)
        d2q = {}
        for j, vid in enumerate(ids):
            dists = [(d2(V[j], V[np.where(ids == c)[0][0]]), c) for c in cids]
            dmin = min(dists)[0]
            d2q[vid] = math.floor(dmin * (2**30))
        phi = sum(d2q.values())
        for vid in ids:
            coin = float(h60py(f"kmpp{r}:{vid}"))
            if coin < 4.0 * d2q[vid] / phi * float(2**60):
                if vid not in centers:
                    centers[int(vid)] = r
    cids = sorted(centers)
    weights = {c: 0 for c in cids}
    for j, vid in enumerate(ids):
        dists = sorted(
            (d2(V[j], V[np.where(ids == c)[0][0]]), c) for c in cids
        )
        weights[dists[0][1]] += 1

    got = {
        r.cid: (r.added_round, r.weight)
        for r in registry.QUERIES["kmeans_parallel_init"](
            spark, sf_smoke
        ).collect()
    }
    assert got == {c: (centers[c], weights[c]) for c in cids}
    assert sum(w for _, w in got.values()) == len(ids)
