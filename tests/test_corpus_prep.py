"""Unit tests for the corpus-preparation operators: line dedup,
per-key caps, global shuffle/sharding, quality scoring, SQ8 ANN.
(The registered queries are oracle-checked in test_oracle_parity;
these tests pin operator semantics on hand-built inputs.)"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from kafka_spark_streaming_app_spark.operators.corpus import line_dedup
from kafka_spark_streaming_app_spark.operators.llmprep import (
    global_shuffle,
    per_key_cap,
)
from kafka_spark_streaming_app_spark.operators.similarity import ann_topk_sq8
from kafka_spark_streaming_app_spark.operators.text import quality_score


def test_line_dedup_removes_corpus_frequent_lines(spark):
    boiler = "click here to accept cookies"
    rows = [
        (i, f"{boiler}\nunique content line {i}\nsecond line {i}")
        for i in range(6)
    ] + [(100, "a loner document")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in line_dedup(df, max_docs=5).collect()
    }
    for i in range(6):
        assert out[i]["n_lines"] == 3
        assert out[i]["n_kept"] == 2
        assert out[i]["cleaned_text"] == (
            f"unique content line {i}\nsecond line {i}"
        )
    assert out[100]["cleaned_text"] == "a loner document"


def test_line_dedup_all_boiler_doc_empties(spark):
    rows = [(i, "same line everywhere") for i in range(5)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = line_dedup(df, max_docs=5).collect()
    assert all(r["n_kept"] == 0 and r["cleaned_text"] == "" for r in out)


def test_per_key_cap_exact_and_repartition_stable(spark):
    rows = [(k * 10 + i, f"src{k}") for k in range(3) for i in range(5)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    kept = per_key_cap(df, key_col="source", cap=2).collect()
    by_key: dict[str, list] = {}
    for r in kept:
        by_key.setdefault(r["source"], []).append(r)
    assert all(len(v) == 2 for v in by_key.values())
    assert all(
        sorted(r["sample_rank"] for r in v) == [1, 2] for v in by_key.values()
    )
    again = per_key_cap(df.repartition(7), key_col="source", cap=2).collect()
    assert sorted(r["doc_id"] for r in kept) == sorted(
        r["doc_id"] for r in again
    )


def test_global_shuffle_is_permutation_with_even_shards(spark):
    df = spark.createDataFrame([(i,) for i in range(130)], ["doc_id"])
    out = global_shuffle(df, shard_size=64).collect()
    assert sorted(r["pos"] for r in out) == list(range(1, 131))
    sizes: dict[int, int] = {}
    for r in out:
        sizes[r["shard"]] = sizes.get(r["shard"], 0) + 1
    assert sizes == {0: 64, 1: 64, 2: 2}
    # position is a pure function of doc_id: re-run identical
    again = global_shuffle(df, shard_size=64).collect()
    assert {r["doc_id"]: r["pos"] for r in out} == {
        r["doc_id"]: r["pos"] for r in again
    }


def test_quality_score_separates_diverse_from_degenerate(spark):
    good = (
        "the quick brown fox jumps over a lazy dog and that is "
        "widely seen in typing practice across many decades of use "
        "which makes it a fine sample of ordinary english prose"
    )
    spam = "buy buy buy " * 20
    df = spark.createDataFrame([(1, good), (2, spam)], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in quality_score(df).collect()}
    assert out[1]["keep"] is True
    assert out[2]["keep"] is False
    assert out[1]["quality_logit"] > out[2]["quality_logit"]


def test_sq8_rerank_recalls_exact_topk(spark, sf_smoke):
    """With rerank=50 of a 500-vector corpus, the quantized candidate
    set recovers the exact top-5 for every query on this fixture
    (deterministic data, deterministic assertion)."""
    from kafka_spark_streaming_app_spark.operators.similarity import (
        brute_force_topk,
    )
    from kafka_spark_streaming_app_spark.sources.batch import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = brute_force_topk(emb, queries, k=5).collect()
    sq8 = ann_topk_sq8(emb, queries, k=5, rerank=50).collect()
    exact_pairs = {(r["query_id"], r["corpus_id"]) for r in exact}
    sq8_pairs = {(r["query_id"], r["corpus_id"]) for r in sq8}
    overlap = len(exact_pairs & sq8_pairs) / len(exact_pairs)
    assert overlap >= 0.8, f"SQ8 recall collapsed: {overlap}"
    # approx scores are exact integers — every |code| <= 127, 64 dims
    assert all(abs(r["approx_score"]) <= 127 * 127 * 64 for r in sq8)


def test_hits_mutual_reinforcement_beats_raw_degree(spark):
    """HITS must rank an authority endorsed by GOOD hubs above one
    with the same in-degree from weak hubs — the property raw counts
    can't express. Hubs 0,1 each point at authorities 10 and 11
    (strong hubs: they cite the co-cited pair); hubs 2,3,4 each point
    at a single obscure authority (12,13,14) AND at authority 11.
    Authority 11 has in-degree 5 vs 10's in-degree 2, but 10's
    endorsers are reinforced; after convergence 11 still wins on
    degree — so pin the finer property: obscure authorities cited
    once by weak hubs score BELOW 10, which is cited twice by strong
    hubs."""
    from kafka_spark_streaming_app_spark.operators.graph import hits

    edges = spark.createDataFrame(
        [(0, 10), (1, 10), (0, 11), (1, 11),
         (2, 11), (3, 11), (4, 11),
         (2, 12), (3, 13), (4, 14)],
        ["src", "dst"],
    )
    out = {r["node"]: r["auth"] for r in hits(edges, iters=3).collect()}
    assert set(out) == {10, 11, 12, 13, 14}
    assert out[11] == 1.0  # top authority is max-normalized to exactly 1
    assert out[10] > out[12] == out[13] == out[14]  # reinforcement
    assert all(0 < v <= 1.0 for v in out.values())

    import pytest as _pytest

    with _pytest.raises(ValueError, match="iters >= 1"):
        hits(edges, iters=0)


def test_pagerank_star_graph_ranks_hub_highest(spark):
    from kafka_spark_streaming_app_spark.operators.graph import pagerank

    spokes = list(range(1, 6))
    pairs = [(0, s) for s in spokes]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], ["src", "dst"]
    )
    out = {r["node"]: r["pr"] for r in pagerank(edges, iters=3).collect()}
    assert set(out) == {0, *spokes}
    hub = out[0]
    assert all(hub > out[s] for s in spokes), out
    # floor truncation loses at most |nodes| * 2^-40 mass per iteration
    assert abs(sum(out.values()) - 1.0) < 1e-6
    assert len({out[s] for s in spokes}) == 1  # symmetric spokes tie


def test_personalized_pagerank_matches_pure_python(spark):
    """personalized_pagerank recomputed with the exact fixed-point
    arithmetic in pure Python on a barbell graph (two triangles
    bridged); seeds in one triangle keep the mass there."""
    import math

    from kafka_spark_streaming_app_spark.operators.graph import (
        PR_SCALE,
        personalized_pagerank,
    )

    pairs = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (3, 5)]
    sym = pairs + [(b, a) for a, b in pairs]
    edges = spark.createDataFrame(sym, ["src", "dst"])
    seeds = spark.createDataFrame([(0,), (1,)], ["node"])
    out = {
        r["node"]: r["ppr"]
        for r in personalized_pagerank(edges, seeds, iters=3).collect()
    }

    adj = {}
    for a, b in sym:
        adj.setdefault(a, []).append(b)
    seed_set = {0, 1}
    prs = {
        n: int(PR_SCALE) // len(seed_set) if n in seed_set else 0
        for n in adj
    }
    for _ in range(3):
        sc = {n: 0 for n in adj}
        for a, nbrs in adj.items():
            c = prs[a] // len(nbrs)
            for b in nbrs:
                sc[b] += c
        prs = {
            n: (
                int(math.floor(PR_SCALE * (1.0 - 0.85) / len(seed_set)))
                if n in seed_set
                else 0
            )
            + int(math.floor(0.85 * float(sc[n])))
            for n in adj
        }
    expected = {n: v / PR_SCALE for n, v in prs.items()}
    assert out == expected
    # mass concentrates around the seeded triangle
    assert min(out[0], out[1], out[2]) > max(out[4], out[5])


def test_quality_score_runs_unchanged_on_a_stream(spark):
    """The engine's design rule — every transform is a pure
    DataFrame→DataFrame function usable in batch AND streaming — holds
    for the new corpus-prep family: the stateless quality classifier
    runs unchanged on a streaming source with identical per-row
    results."""
    import json as _json
    import os
    import tempfile

    from kafka_spark_streaming_app_spark.streaming.pipeline import (
        write_memory_stream,
    )

    src = tempfile.mkdtemp(prefix="qs_stream_")
    rows = [
        {"doc_id": 1, "text": "the quick brown fox jumps over a lazy dog"},
        {"doc_id": 2, "text": "buy buy buy buy buy buy buy buy buy buy"},
    ]
    with open(os.path.join(src, "b1.json"), "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
    schema = "doc_id long, text string"
    stream = spark.readStream.schema(schema).json(src)
    q = write_memory_stream(
        quality_score(stream), "qs_stream_out", available_now=True
    )
    try:
        q.awaitTermination(60)
    finally:
        if q.isActive:
            q.stop()
    got = {
        r["doc_id"]: r for r in spark.table("qs_stream_out").collect()
    }
    batch = {
        r["doc_id"]: r
        for r in quality_score(
            spark.createDataFrame(
                [(r["doc_id"], r["text"]) for r in rows], ["doc_id", "text"]
            )
        ).collect()
    }
    assert set(got) == {1, 2}
    for k in got:
        assert got[k]["quality_logit"] == batch[k]["quality_logit"]
        assert got[k]["keep"] == batch[k]["keep"]


def test_cms_estimate_never_undercounts(spark, sf_smoke):
    """The count-min guarantee: estimate >= true count for every
    queried item (hash collisions only ever ADD mass)."""
    from kafka_spark_streaming_app_spark.queries.analytics import (
        cms_heavy_hitters,
    )

    rows = cms_heavy_hitters(spark, sf_smoke).collect()
    assert len(rows) > 0
    assert all(r["cms_estimate"] >= r["true_n"] for r in rows)


def test_bloom_membership_no_false_negatives_low_fp(spark, sf_correctness):
    """Bloom guarantees, asserted on the real ledger: membership is
    never missed (n_false_neg = 0 — bits only ever get SET), and at
    ~0.15 load with k=3 the false-positive rate stays well under 2%."""
    from kafka_spark_streaming_app_spark.queries.relational import (
        bloom_membership_audit,
    )

    row = bloom_membership_audit(spark, sf_correctness).collect()[0]
    assert row["n_false_neg"] == 0
    assert row["n_members"] > 0
    non_members = row["n_probed"] - row["n_members"]
    assert row["n_false_pos"] / non_members < 0.02


def test_quality_oracle_null_text_parity(spark, tmp_path):
    """NULL-text parity: the engine treats NULL text as empty
    (coalesce in the normalize path); the SQL oracle must agree or a
    NULL doc in production data silently breaks the driver hash. The
    fixtures have no NULL docs, so pin it with a planted one."""
    import duckdb

    from kafka_spark_streaming_app_spark.queries.corpus_prep import (
        _QUALITY_ORACLE,
    )

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["the quick brown fox jumps", None, "   "],
            "lang": ["en"] * 3,
            "source": ["web"] * 3,
            "n_chars": [25, 0, 3],
        }
    )
    doc_path = str(tmp_path / "documents.parquet")
    pdf.to_parquet(doc_path)

    got = (
        quality_score(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{doc_path}')"
    )
    want = (
        con.execute(_QUALITY_ORACLE)
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for col in ("n_tokens", "quality_logit", "keep"):
        assert list(got[col]) == list(want[col]), col


def test_trigram_perplexity_matches_pure_python(spark, sf_smoke):
    """trigram_perplexity recomputed with an independent pure-Python
    JM-interpolated trigram LM (same normalization, dict counts, no
    SQL) — pins the model spec the shared ln-fragment can't
    self-check. Quantization keeps sums within 1e-9·n of the float
    reference, so round-6 perplexities must agree to 1e-5."""
    import math
    import re
    from collections import Counter

    import pandas as pd

    from kafka_spark_streaming_app_spark import registry

    registry.load_all()
    docs = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    tris = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        ws = re.sub(r"\s+", " ", (text or "").lower().strip()).split(" ")
        tris[doc_id] = [tuple(ws[i : i + 3]) for i in range(len(ws) - 2)]
    c123, c12, c23, c2, c3w = (Counter() for _ in range(5))
    tt = 0
    for ts in tris.values():
        for w1, w2, w3 in ts:
            c123[(w1, w2, w3)] += 1
            c12[(w1, w2)] += 1
            c23[(w2, w3)] += 1
            c2[w2] += 1
            c3w[w3] += 1
            tt += 1
    want = {}
    for doc_id, ts in tris.items():
        if not ts:
            continue
        s = sum(
            math.floor(
                1e9
                * math.log(
                    0.6 * c123[(w1, w2, w3)] / c12[(w1, w2)]
                    + 0.3 * c23[(w2, w3)] / c2[w2]
                    + 0.1 * c3w[w3] / tt
                )
            )
            for w1, w2, w3 in ts
        )
        want[doc_id] = (len(ts), math.exp(-(s / 1e9) / len(ts)))
    rows = registry.QUERIES["trigram_perplexity"](spark, sf_smoke).collect()
    got = {r.doc_id: (r.n_trigrams, r.perplexity) for r in rows}
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0]
        assert abs(got[d][1] - want[d][1]) < 1e-5, (d, got[d], want[d])
    # sanity: a language model separates documents (non-degenerate)
    ppls = [v for _, v in got.values()]
    assert max(ppls) > 2 * min(ppls)


def test_pq_adc_rerank_recalls_exact_topk(spark, sf_smoke):
    """PQ with rerank=50 over a 500-vector corpus must recover most
    of the exact top-5 per query (deterministic fixture, deterministic
    assertion) and its output distances must equal the exact L2."""
    import numpy as np

    from kafka_spark_streaming_app_spark.operators.similarity import (
        ann_topk_pq,
    )
    from kafka_spark_streaming_app_spark.sources.batch import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    exact = {}
    for q in range(5):
        d = {
            cid: float(((vecs[q] - v) ** 2).sum())
            for cid, v in vecs.items()
        }
        exact[q] = (d, set(sorted(d, key=lambda c: (d[c], c))[:5]))

    def recall(rerank):
        got = ann_topk_pq(emb, queries, k=5, rerank=rerank).collect()
        hits = 0
        for q in range(5):
            d, exact5 = exact[q]
            mine = {r.corpus_id for r in got if r.query_id == q}
            assert len(mine) == 5
            hits += len(exact5 & mine)
            for r in got:
                if r.query_id == q:
                    assert abs(r.dist - d[r.corpus_id]) < 1e-4
        return hits

    # i.i.d. random embeddings are PQ's adversarial case (no cluster
    # structure for the codebooks to exploit); recall is governed by
    # the rerank width, and widening it must recover the exact set —
    # measured 19/24/25 at rerank 50/100/150 on this fixture.
    assert recall(50) >= 18
    assert recall(150) >= 24


def test_rrf_fusion_scores_are_consistent_with_leg_ranks(spark, sf_smoke):
    """Every fused row's RRF score must equal 1/(60+bm25_rank) +
    1/(60+cos_rank) with absent legs contributing 0; output must be
    rank-ordered per query; and a document retrieved by BOTH legs must
    outscore one retrieved at the same single-leg rank."""
    from kafka_spark_streaming_app_spark import registry

    registry.load_all()
    rows = registry.QUERIES["rrf_hybrid_retrieval"](
        spark, sf_smoke
    ).collect()
    assert rows
    byq = {}
    for r in rows:
        want = (1.0 / (60 + r.bm25_rank) if r.bm25_rank else 0.0) + (
            1.0 / (60 + r.cos_rank) if r.cos_rank else 0.0
        )
        assert abs(r.rrf - want) < 1e-6
        byq.setdefault(r.query_id, []).append(r)
    for q, rs in byq.items():
        rs.sort(key=lambda r: r.rank)
        scores = [r.rrf for r in rs]
        assert scores == sorted(scores, reverse=True)
        both = [r for r in rs if r.bm25_rank and r.cos_rank]
        single = [r for r in rs if (r.bm25_rank is None) != (r.cos_rank is None)]
        for b in both:
            worst_leg = max(b.bm25_rank, b.cos_rank)
            for s in single:
                lone = s.bm25_rank or s.cos_rank
                if lone >= worst_leg:
                    assert b.rrf > s.rrf


def test_quantile_normalize_handles_uneven_sources(spark):
    """Regression: with UNEVEN source sizes the midpoint-quantile
    target index is fractional before the floor — a bare integer `/`
    (DOUBLE in both engines) silently dropped those rows from the
    index equi-join. Every doc must survive, every source must end up
    with pooled values, and within each source the mapping must be
    monotone in n_chars."""
    import duckdb
    import pandas as pd

    from kafka_spark_streaming_app_spark.queries.corpus_prep import (
        _QNORM_SQL,
    )

    rows = [(i, "big", 100 + i) for i in range(7)] + [
        (100 + i, "small", 500 + 7 * i) for i in range(3)
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "source", "n_chars"])
    spark.createDataFrame(pdf).createOrReplaceTempView("documents")
    got = spark.sql(_QNORM_SQL).collect()
    assert len(got) == len(rows)  # nothing dropped
    by_src = {}
    for r in got:
        by_src.setdefault(r.source, []).append(r)
    assert set(by_src) == {"big", "small"}
    pooled = sorted(pdf["n_chars"])
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.n_chars)
        vals = [r.normalized_chars for r in rs]
        assert vals == sorted(vals)  # monotone mapping
        assert all(v in pooled for v in vals)
    # the same text produces the same rows on DuckDB (the oracle engine)
    con = duckdb.connect()
    con.register("documents", pdf)
    oracle = con.execute(_QNORM_SQL).fetchdf()
    assert len(oracle) == len(rows)
    want = {(r.doc_id, r.normalized_chars) for r in got}
    have = set(
        zip(oracle["doc_id"], oracle["normalized_chars"])
    )
    assert want == have


def test_ivfpq_candidates_respect_probed_lists(spark, sf_smoke):
    """IVF-PQ: every returned neighbor must belong to one of the
    query's probed IVF lists (the scan-cut contract), and the exact
    reranked distances must equal the true L2."""
    import numpy as np

    from kafka_spark_streaming_app_spark.operators.similarity import (
        ann_topk_ivfpq,
    )
    from kafka_spark_streaming_app_spark.sources.batch import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    got = ann_topk_ivfpq(emb, queries, k=5, rerank=50).collect()
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }

    def unit(v):
        return v / np.linalg.norm(v)

    cents = {i: unit(vecs[i]) for i in range(16)}

    def probe_lists(v, n):
        sims = {
            ci: round(float(unit(v) @ cv), 6) for ci, cv in cents.items()
        }
        return [
            ci
            for ci, _ in sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))
        ][:n]

    member = {cid: probe_lists(v, 1)[0] for cid, v in vecs.items()}
    for r in got:
        probed = set(probe_lists(vecs[r.query_id], 2))
        assert member[r.corpus_id] in probed, r
        true_d = float(((vecs[r.query_id] - vecs[r.corpus_id]) ** 2).sum())
        assert abs(r.dist - true_d) < 1e-4
    # per-query result sizes: k unless the probed lists run dry
    for q in range(5):
        assert 1 <= sum(1 for r in got if r.query_id == q) <= 5


def test_pmi_ranks_fixed_collocation_above_frequent_pairs(spark):
    """PMI spec pin on a crafted corpus (via the oracle text, to
    which the Spark side is hash-locked): 'neural network' always
    co-occurs and must out-PMI 'the cat'/'the dog' pairs whose parts
    are frequent but independent."""
    import duckdb
    import pandas as pd

    from kafka_spark_streaming_app_spark.queries.text import _PMI_ORACLE

    docs = []
    for i in range(30):
        docs.append((i, "neural network models need data"))
        docs.append((100 + i, "the cat sat and the dog ran quickly"))
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    con = duckdb.connect()
    con.register("documents", pdf)
    out = con.execute(_PMI_ORACLE).fetchdf()
    assert len(out) > 0
    top = (out.iloc[0]["w1"], out.iloc[0]["w2"])
    pairs = list(zip(out["w1"], out["w2"]))
    assert ("neural", "network") in pairs
    nn_pmi = out[(out["w1"] == "neural") & (out["w2"] == "network")][
        "pmi"
    ].iloc[0]
    the_rows = out[out["w1"] == "the"]
    assert (the_rows["pmi"] < nn_pmi).all()
    assert top != ("the", "cat") and top != ("the", "dog")


def test_t5_span_corruption_reconstructs_original(spark, sf_smoke):
    """The denoising pair must be LOSSLESS: substituting each
    <extra_id_k> in the input with target span k's tokens
    reconstructs the original normalized token sequence exactly, for
    every document; and the mask rate lands near the designed ~14%
    start rate."""
    import re

    import pandas as pd

    from kafka_spark_streaming_app_spark import registry

    registry.load_all()
    rows = registry.QUERIES["t5_span_corruption"](spark, sf_smoke).collect()
    docs = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    orig = {
        d: re.sub(r"\s+", " ", (t or "").lower().strip())
        for d, t in zip(docs["doc_id"], docs["text"])
    }
    total = masked = 0
    for r in rows:
        spans = {}
        cur = None
        for tokn in r.target_text.split(" ") if r.target_text else []:
            mm = re.fullmatch(r"<extra_id_(\d+)>", tokn)
            if mm:
                cur = int(mm.group(1))
                spans[cur] = []
            else:
                spans[cur].append(tokn)
        out = []
        for tokn in r.input_text.split(" ") if r.input_text else []:
            mm = re.fullmatch(r"<extra_id_(\d+)>", tokn)
            if mm:
                out.extend(spans.pop(int(mm.group(1))))
            else:
                out.append(tokn)
        assert not spans  # every target span consumed exactly once
        assert " ".join(out) == orig[r.doc_id], r.doc_id
        total += r.n_tokens
        masked += r.n_masked
    rate = masked / total
    assert 0.08 <= rate <= 0.35, rate  # ~14% starts x 1-3 token spans


def test_preference_pairs_semantics(spark, sf_smoke):
    """Every source yields one pair of DISTINCT docs; chosen/rejected
    must be the true per-source quality argmax/argmin (verified
    against a pandas recompute of the same fixed-weight logit), and
    margins are non-negative."""
    import pandas as pd

    from kafka_spark_streaming_app_spark import registry
    from kafka_spark_streaming_app_spark.operators.text import quality_score
    from kafka_spark_streaming_app_spark.sources.batch import load_table

    registry.load_all()
    rows = registry.QUERIES["preference_pairs"](spark, sf_smoke).collect()
    docs = load_table(spark, sf_smoke, "documents")
    scored = (
        quality_score(docs)
        .select("doc_id", "quality_logit")
        .toPandas()
        .merge(
            pd.read_parquet(f"{sf_smoke}/documents.parquet")[
                ["doc_id", "source"]
            ],
            on="doc_id",
        )
    )
    for r in rows:
        g = scored[scored["source"] == r.source].sort_values(
            ["quality_logit", "doc_id"], ascending=[False, True]
        )
        assert r.chosen_doc == g.iloc[0]["doc_id"]
        g2 = g.sort_values(["quality_logit", "doc_id"], ascending=[True, True])
        assert r.rejected_doc == g2.iloc[0]["doc_id"]
        assert r.chosen_doc != r.rejected_doc
        assert r.margin >= 0


def test_personalized_pagerank_ignores_dangling_seeds(spark):
    """A seed with no out-edges cannot hold rank state; the teleport
    denominator must count only seeds present in the out-degree table,
    so adding a dangling seed changes NOTHING (round-7 advice: the old
    n_seeds counted it, evaporating its teleport mass)."""
    from kafka_spark_streaming_app_spark.operators.graph import (
        personalized_pagerank,
    )

    pairs = [(0, 1), (1, 2), (0, 2), (2, 3)]
    sym = pairs + [(b, a) for a, b in pairs]
    # node 9 is a pure sink: appears only as dst, has no out-edges
    edges = spark.createDataFrame(sym + [(3, 9)], ["src", "dst"])
    base = {
        r["node"]: r["ppr"]
        for r in personalized_pagerank(
            edges, spark.createDataFrame([(0,)], ["node"]), iters=3
        ).collect()
    }
    with_dangling = {
        r["node"]: r["ppr"]
        for r in personalized_pagerank(
            edges, spark.createDataFrame([(0,), (9,)], ["node"]), iters=3
        ).collect()
    }
    assert with_dangling == base


def test_star_components_match_min_label_and_log_rounds(spark):
    """connected_components_star equals connected_components on a
    mixed fixture (chain + triangle + singletons-by-absence), and on a
    255-node PATH graph it converges within the O(log^2 n) budget
    where min-label propagation would need ~255 supersteps (the
    round-bound claim that justifies the twin)."""
    from kafka_spark_streaming_app_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    mixed = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)]
    pairs = spark.createDataFrame(mixed, ["id_a", "id_b"])
    a = {
        r.node: r.cluster_id
        for r in connected_components(pairs).collect()
    }
    b = {
        r.node: r.cluster_id
        for r in connected_components_star(pairs).collect()
    }
    assert a == b
    assert b[4] == 1 and b[12] == 10 and b[21] == 20

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(255)], ["id_a", "id_b"]
    )
    got = {
        r.node: r.cluster_id
        for r in connected_components_star(chain, max_iter=14).collect()
    }
    assert set(got.values()) == {0}
    assert len(got) == 256
