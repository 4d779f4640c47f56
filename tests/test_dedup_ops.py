"""Dedup operator units that the oracle queries don't pin: the LSH
hot-bucket cap and candidate-restricted Jaccard verification."""

from __future__ import annotations

from kafka_spark_streaming_app_spark.operators.dedup import (
    jaccard_verify_candidates,
    lsh_candidate_pairs,
    minhash_signatures,
)


def _boilerplate_corpus(spark, n_dups: int):
    """n_dups identical docs (one hot LSH bucket) + one distinct pair."""
    text = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, text) for i in range(n_dups)]
    rows += [
        (100, "completely different content about distributed query engines"),
        (101, "completely different content about distributed query engines"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_lsh_hot_bucket_cap_drops_boilerplate(spark):
    docs = _boilerplate_corpus(spark, n_dups=8)
    sigs = minhash_signatures(docs, num_hashes=12, shingle_n=3)

    uncapped = lsh_candidate_pairs(sigs, num_hashes=12, band_size=2)
    # 8 identical docs pair quadratically: C(8,2)=28, plus the planted pair
    assert uncapped.count() == 29

    capped = lsh_candidate_pairs(
        sigs, num_hashes=12, band_size=2, max_bucket_size=4
    )
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    # the 8-doc boilerplate bucket exceeds the cap and is dropped whole;
    # the 2-doc bucket survives
    assert got == {(100, 101)}


def test_jaccard_verify_restricted_to_candidates(spark):
    docs = _boilerplate_corpus(spark, n_dups=3)
    candidates = spark.createDataFrame([(0, 1), (100, 101)], ["id_a", "id_b"])
    verified = jaccard_verify_candidates(docs, candidates, threshold=0.5)
    got = {(r.id_a, r.id_b): r.jaccard for r in verified.collect()}
    # only candidate pairs are scored — (0,2)/(1,2) are true dups but
    # were never candidates, so they must not appear
    assert set(got) == {(0, 1), (100, 101)}
    assert got[(0, 1)] == 1.0
    assert got[(100, 101)] == 1.0


def test_connected_components_merges_chains(spark):
    """a~b and b~c without a~c must land in ONE cluster — the case
    pairwise drop-higher-id policies get wrong."""
    from kafka_spark_streaming_app_spark.operators.graph import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)],
        ["id_a", "id_b"],
    )
    got = {
        r.node: r.cluster_id for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_connected_components_raises_when_not_converged(spark):
    import pytest

    from kafka_spark_streaming_app_spark.operators.graph import (
        connected_components,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], ["id_a", "id_b"]
    )
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(chain, max_iter=1)


def test_lsh_candidate_count_bounded_under_planted_skew(spark, sf_smoke):
    """Regression for the documented LSH hazard (operators/dedup.py:
    skewed buckets from boilerplate docs): plant a 200-copy boilerplate
    cluster on top of the real sf corpus and assert the bucket-cap
    semi-join keeps the candidate count bounded by N*cap instead of
    exploding quadratically (C(200,2)=19900 pairs from one bucket)."""
    from pyspark.sql import functions as F

    from kafka_spark_streaming_app_spark.sources.batch import load_table

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    boiler = spark.range(200).select(
        (F.col("id") + 1_000_000).alias("doc_id"),
        F.lit(
            "subscribe to our newsletter for updates terms of service "
            "privacy policy all rights reserved contact us about us"
        ).alias("text"),
    )
    corpus = docs.unionByName(boiler)
    n = corpus.count()
    cap = 8
    sigs = minhash_signatures(corpus, num_hashes=12, shingle_n=3)
    capped = lsh_candidate_pairs(
        sigs, num_hashes=12, band_size=2, max_bucket_size=cap
    )
    n_pairs = capped.count()
    # every surviving bucket has <= cap members, and each doc appears in
    # at most n_bands=6 buckets, so pairs <= N * n_bands * cap/2 — far
    # below the quadratic blowup of the uncapped hot bucket
    assert n_pairs <= n * 6 * cap // 2
    # the boilerplate cluster (bucket size 200 > cap) contributes none
    planted = capped.filter(
        (F.col("id_a") >= 1_000_000) & (F.col("id_b") >= 1_000_000)
    )
    assert planted.count() == 0


def test_semantic_dedup_drops_planted_near_dups(spark, sf_smoke):
    """SemDeDup pipeline: k-means blocks + within-cluster cosine prune.
    The fixture plants near-dup embedding pairs; they must cluster
    together and the larger id of each pair must be dropped."""
    from pyspark.sql import functions as F

    from kafka_spark_streaming_app_spark.operators.dedup import (
        embedding_near_dup_pairs,
        semantic_dedup,
    )
    from kafka_spark_streaming_app_spark.sources.batch import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    out = semantic_dedup(emb, k=8, dim=64, iters=2, threshold=0.4)
    rows = out.collect()
    assert len(rows) == emb.count()          # every vector classified
    dropped = {r.vec_id for r in rows if not r.keep}
    assert dropped                            # non-vacuous
    # every label-blocked near-dup pair (the planted ground truth) has
    # its larger id dropped whenever the pair shares a k-means cluster
    cid = {r.vec_id: r.cid for r in rows}
    pairs = embedding_near_dup_pairs(emb, threshold=0.4).collect()
    same_cluster = [p for p in pairs if cid[p.id_a] == cid[p.id_b]]
    assert same_cluster                       # clustering kept dups together
    for p in same_cluster:
        assert p.id_b in dropped


def test_label_propagation_forms_multimember_communities(spark, sf_smoke):
    """LPA must actually group nodes: >1 community and at least one
    community with >1 member, else the voting is vacuous."""
    from kafka_spark_streaming_app_spark import registry

    registry.load_all()
    rows = registry.QUERIES["label_propagation_communities"](
        spark, sf_smoke
    ).collect()
    from collections import Counter

    sizes = Counter(r["community"] for r in rows)
    assert len(sizes) > 1
    assert max(sizes.values()) > 1


def test_kcore_peel_semantics_on_crafted_graph(spark, sf_smoke):
    """On a triangle with a pendant chain, the 2-core is exactly the
    triangle: the chain peels away even though its inner node starts
    at degree 2 (degree within the SURVIVING set is what counts —
    the property a single degree-filter pass gets wrong)."""
    from pyspark.sql import functions as F

    from kafka_spark_streaming_app_spark import registry

    registry.load_all()
    # reuse the query's peel by monkey-free construction: run the same
    # rounds inline on a toy edge set
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], ["u", "v"]
    )
    sym = edges.unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    cur = None
    for _ in range(4):
        e = sym
        if cur is not None:
            e = e.join(
                cur.select(F.col("u").alias("_a")),
                F.col("u") == F.col("_a"),
                "left_semi",
            ).join(
                cur.select(F.col("u").alias("_b")),
                F.col("v") == F.col("_b"),
                "left_semi",
            )
        deg = (
            e.groupBy("u")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= 2)
        )
        cur = deg.select("u")
    assert {r.u for r in cur.collect()} == {1, 2, 3}

    # and the registered query's converged flag is TRUE at this SF
    rows = registry.QUERIES["kcore_membership"](spark, sf_smoke).collect()
    assert rows and all(r.converged for r in rows)
    assert all(r.core_deg >= 2 for r in rows)


def test_span_dedup_merges_overlapping_windows(spark, tmp_path):
    """Two docs sharing one contiguous 30-word paragraph: every
    20-word window inside it is duplicated, and the island merge must
    collapse the 11 overlapping windows into ONE span of exactly the
    paragraph's extent in each doc."""
    from pyspark.sql import functions as F

    from kafka_spark_streaming_app_spark import registry

    registry.load_all()
    para = " ".join(f"shared{i}" for i in range(30))
    uniq_a = " ".join(f"lead{i}" for i in range(10))
    uniq_b = " ".join(f"tail{i}" for i in range(7))
    docs = spark.createDataFrame(
        [
            (1, uniq_a + " " + para),
            (2, para + " " + uniq_b),
            (3, " ".join(f"only{i}" for i in range(40))),
        ],
        "doc_id bigint, text string",
    )
    out_dir = str(tmp_path / "docs")
    docs.selectExpr(
        "doc_id", "text", "'en' AS lang", "'t' AS source",
        "length(text) AS n_chars",
    ).write.parquet(out_dir + "/documents.parquet")
    rows = registry.QUERIES["span_dedup_exact"](spark, out_dir).collect()
    spans = {(r.doc_id, r.span_start, r.span_end, r.n_windows) for r in rows}
    # doc 1: paragraph occupies words 11..40 -> one span, 11 windows
    assert (1, 11, 40, 11) in spans
    # doc 2: paragraph occupies words 1..30
    assert (2, 1, 30, 11) in spans
    assert not any(r.doc_id == 3 for r in rows)


def test_sssp_weighted_prefers_cheap_long_path(spark):
    """The property separating weighted SSSP from BFS: a 3-edge path
    of cost 1 each must beat a direct edge of cost 9. Runs the same
    relaxation rounds as the registered query on a crafted graph."""
    from pyspark.sql import functions as F

    edges = spark.createDataFrame(
        # (u, v, cost): direct 1->5 costs 9; 1->2->3->5 costs 3
        [(1, 5, 9), (1, 2, 1), (2, 3, 1), (3, 5, 1)],
        "u bigint, v bigint, cost bigint",
    )
    wsym = edges.unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"), "cost")
    ).localCheckpoint(eager=False)
    d = spark.createDataFrame([(1, 0)], "node bigint, dist bigint")
    for _ in range(4):
        relaxed = d.join(wsym, d.node == wsym.u).select(
            F.col("v").alias("node"),
            (F.col("dist") + F.col("cost")).alias("dist"),
        )
        d = (
            d.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=False)
        )
    dist = {r.node: r.dist for r in d.collect()}
    assert dist[5] == 3  # via the cheap long path, not the direct 9
    assert dist == {1: 0, 2: 1, 3: 2, 5: 3}


def test_fastss_ed1_matches_pure_python(spark, sf_smoke):
    """dedup_fastss_ed1 recomputed in pure Python: same md5 fixture,
    deletion neighborhoods, candidate join, and a textbook DP
    Levenshtein — pair sets must match exactly, and every planted
    (2m, 2m+1) pair must be recovered (recall completeness of the
    deletion-neighborhood scheme)."""
    import hashlib

    import pandas as pd

    from kafka_spark_streaming_app_spark import registry

    registry.load_all()
    doc_ids = pd.read_parquet(f"{sf_smoke}/documents.parquet")[
        "doc_id"
    ].tolist()

    def fixture(doc_id: int) -> str:
        base = hashlib.md5(str(doc_id // 2).encode()).hexdigest()[:24]
        m, p = doc_id % 6, (doc_id % 11) + 1
        if m == 1:
            return base[: p - 1] + "z" + base[p:]
        if m == 3:
            return base[: p - 1] + base[p:]
        if m == 5:
            return base[: p - 1] + "z" + base[p - 1:]
        return base

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(
                        prev[j] + 1,
                        cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb),
                    )
                )
            prev = cur
        return prev[-1]

    strs = {d: fixture(d) for d in doc_ids}
    index: dict[str, set[int]] = {}
    for d, s in strs.items():
        variants = {s} | {s[:i] + s[i + 1:] for i in range(len(s))}
        for v in variants:
            index.setdefault(v, set()).add(d)
    cand = set()
    for members in index.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                cand.add((ms[i], ms[j]))
    expected = {
        (a, b) for a, b in cand if lev(strs[a], strs[b]) == 1
    }

    got = {
        (r.id_a, r.id_b)
        for r in registry.QUERIES["dedup_fastss_ed1"](
            spark, sf_smoke
        ).collect()
    }
    assert got == expected
    planted = {
        (d, d + 1) for d in doc_ids if d % 2 == 0 and d + 1 in strs
    }
    assert planted <= got  # recall-complete on the planted edits


def test_kmv_set_difference_estimator_sane(spark, sf_smoke):
    """kmv_set_difference: the estimate must be non-negative, bounded
    by the union estimate, and within a loose KMV error band of the
    exact difference on the real corpus (k=64 → rsd ≈ 1/√63 ≈ 13%;
    allow 4σ plus small-count slack)."""
    from kafka_spark_streaming_app_spark import registry

    registry.load_all()
    rows = registry.QUERIES["kmv_set_difference"](
        spark, sf_smoke
    ).collect()
    assert rows
    for r in rows:
        assert r.n_a_only >= 0 and r.n_a_only <= r.k_union
        assert r.diff_est >= 0
        if r.diff_exact >= 200:  # enough mass for the error band
            assert abs(r.diff_est - r.diff_exact) <= max(
                0.55 * r.diff_exact, 50
            ), (r.src_a, r.src_b, r.diff_est, r.diff_exact)
