"""Deduplication operators for training-data pipelines.

Four strategies, cheapest to most expressive (BASELINE.json north-star
scope; the reference itself has no dedup at all, SURVEY.md §2.8):

1. **Exact** — hash-groupBy on normalized text; one shuffle on the
   hash, perfectly parallel at 100 TB (this is how web-scale exact
   dedup actually runs).
2. **MinHash + LSH** — k md5-derived min-hashes per document via
   explode + map-side-combined min aggregates (the shuffle carries one
   signature row per doc, never the shingles), banded into b buckets;
   the band-bucket equi-join shuffles signatures (tiny), not
   documents. Candidates are then exact-verified by Jaccard on the
   (much smaller) candidate set.
3. **SimHash** — bit-wise majority vote over token hashes; one
   explode + groupBy(doc) shuffle; signatures join/group for buckets.
4. **Embedding cosine** — near-dup by vector similarity, blocked by a
   partition key to avoid the full cross join.

Scale notes: the LSH band join is the canonical web-dedup plan
(shuffle ∝ corpus size × k, not corpus²). Skewed buckets (boilerplate
docs) are the classic hazard — AQE skew-join handles moderate skew;
pathological buckets should be capped upstream (drop buckets with
> N members before pairing, they are boilerplate by definition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h60, normalize_text, word_shingles

# Prime just below 2^56: keeps i*h2 (i < 16) far below int64 overflow.
DH_PRIME = (1 << 56) - 5


def dedup_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup on normalized text: one row per distinct content,
    keeping the smallest id as canonical plus the duplicate count.

    GroupBy the full 128-bit md5 of the content (32-char hex), not the
    text itself, so the shuffle carries ~40 bytes/row instead of the
    document body. 128 bits keeps the collision probability negligible
    even at web scale (~2^-68 for 10^9 docs) — a 60-bit hash would
    expect birthday collisions past ~2^30 documents and silently merge
    distinct content.
    """
    return (
        df.select(
            F.col(id_col), F.md5(normalize_text(text_col)).alias("content_hash")
        )
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 12,
    shingle_n: int = 3,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """(id, mh0..mh{k-1}) MinHash signature table.

    Plan shape: explode shingle positions → (h1, h2) in a codegen'd
    projection → groupBy(id) with k ``min`` aggregates. Partial
    (map-side) aggregation collapses the shuffle to one signature row
    per document per partition, so the exploded shingle relation never
    crosses the network.

    Documents with fewer than ``shingle_n`` tokens have no shingles and
    therefore no signature row (they can't LSH-collide anyway).

    Permutations use Kirsch-Mitzenmacher double hashing: TWO
    independent base hashes per shingle (h1, h2), permutation i =
    (h1 + i·h2) mod p. This is ~k/2× cheaper than k independent hash
    calls and, unlike an affine family over a SINGLE hash (whose argmins
    correlate across permutations — measured recall loss: 251/256
    planted pairs at sf0.1), preserves min-wise behavior: verified
    25/25 and 256/256 recall on the planted near-dup pairs. Values are
    capped below 2^56 so ``i·h2`` stays far from int64 overflow (ANSI).

    ``hash_family``:

    - "xxhash64" (default): the shingle is never materialized as a
      string — the multi-argument native ``xxhash64(tok_i, …,
      tok_{i+n-1})`` hashes the token window directly, and the only
      array built per row is the token split. Measured ~17× faster
      than the string-shingle form at sf0.1 (the cost was the
      transform/slice/concat_ws array materialization, not the hash
      itself). Signature VALUES are not cross-engine reproducible —
      fine for the LSH queries, whose oracles check the output pair
      set, which is hash-family-independent.
    - "md5": cross-engine-reproducible :func:`h60` over the joined
      shingle string; only needed when an oracle must recompute the
      signature values. No ``array_distinct`` in either path: min
      over a multiset equals min over its support, so deduplicating
      shingles first is pure cost.
    """
    from .skew import spread_if_narrow

    if hash_family == "xxhash64":
        from ..functions.hashing import tokens

        toks = tokens(text_col)
        n_shingles = F.size("toks") - F.lit(shingle_n - 1)
        positions = F.when(
            n_shingles >= 1, F.sequence(F.lit(1), n_shingles)
        ).otherwise(F.array().cast("array<int>"))
        # per-row tokenize+shingle+hash is compute-dense: spread a
        # narrow scan first (no-op at scale)
        base = spread_if_narrow(
            df.select(F.col(id_col), toks.alias("toks")), id_col
        ).select(id_col, "toks", F.explode(positions).alias("i"))
        window = [
            F.element_at("toks", F.col("i") + F.lit(k))
            for k in range(shingle_n)
        ]
        exploded = base.select(
            id_col,
            F.pmod(F.xxhash64(*window), F.lit(DH_PRIME)).alias("_h1"),
            F.pmod(F.xxhash64(F.lit("x|"), *window), F.lit(DH_PRIME)).alias(
                "_h2"
            ),
        )
    elif hash_family == "md5":
        exploded = spread_if_narrow(
            df.select(id_col, text_col), id_col
        ).select(
            F.col(id_col),
            F.explode(word_shingles(text_col, shingle_n)).alias("shingle"),
        ).select(
            id_col,
            (h60(F.col("shingle")) % F.lit(DH_PRIME)).alias("_h1"),
            (
                h60(F.concat(F.lit("x|"), F.col("shingle"))) % F.lit(DH_PRIME)
            ).alias("_h2"),
        )
    else:
        raise ValueError(f"unknown hash_family: {hash_family!r}")
    return exploded.groupBy(id_col).agg(
        *[
            F.min(
                (F.col("_h1") + F.lit(i) * F.col("_h2")) % F.lit(DH_PRIME)
            ).alias(f"mh{i}")
            for i in range(num_hashes)
        ]
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 12,
    band_size: int = 2,
    max_bucket_size: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Banded LSH: documents sharing any band signature become a
    candidate pair. Returns distinct (id_a, id_b) with id_a < id_b.

    The band table is (id, band_idx, band_sig) — a self equi-join on
    (band_idx, band_sig) whose shuffle is k/band_size rows per doc of
    ~28 bytes each.

    ``max_bucket_size`` is the hot-bucket cap for web-scale corpora:
    buckets with more members than the cap are boilerplate by
    definition (a random 120-bit band signature collides ~never), and
    pairing inside one is quadratic — so they are dropped *before* the
    self-join via a semi-join against the small-bucket list. The cap
    costs one extra aggregation over the band table (tiny: one row per
    bucket) and bounds the worst-case pair count at N·cap instead of
    N².

    ``materialize`` (default True) puts a lazy ``localCheckpoint``
    barrier on the band table before the self-join: a DataFrame used
    on both sides of a join is otherwise duplicated as a subtree, so
    the ENTIRE signature computation (scan + explode + minhash agg)
    runs once per reference — measured 22 scans of the corpus in the
    un-barriered LSH plan. The band table is k/band_size small rows
    per doc; persisting it is cheap at any scale. (localCheckpoint is
    executor-local and not fault-tolerant — on a real cluster an
    engine would use ``setCheckpointDir`` + ``checkpoint`` or a
    persisted staging table; pass False to keep the pure-lineage plan,
    e.g. for plan inspection.)
    """
    if num_hashes % band_size != 0:
        raise ValueError(
            f"num_hashes={num_hashes} must be divisible by band_size="
            f"{band_size}; trailing hashes would be silently ignored"
        )
    n_bands = num_hashes // band_size
    bands = []
    for b in range(n_bands):
        sig = F.concat_ws(
            ":",
            *[
                F.col(f"mh{b * band_size + j}").cast("string")
                for j in range(band_size)
            ],
        )
        bands.append(
            F.struct(F.lit(b).alias("band_idx"), sig.alias("band_sig"))
        )
    exploded = signatures.select(
        F.col(id_col), F.explode(F.array(*bands)).alias("band")
    ).select(id_col, "band.band_idx", "band.band_sig")
    if materialize:
        exploded = exploded.localCheckpoint(eager=False)
    if max_bucket_size is not None:
        small = (
            exploded.groupBy("band_idx", "band_sig")
            .agg(F.count(F.lit(1)).alias("_bsz"))
            .filter(F.col("_bsz") <= max_bucket_size)
            .select("band_idx", "band_sig")
        )
        exploded = exploded.join(small, ["band_idx", "band_sig"], "left_semi")
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def shingle_sets(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Exploded DISTINCT (id, shingle) pairs — the exact-Jaccard input."""
    from .skew import spread_if_narrow

    return (
        spread_if_narrow(df.select(id_col, text_col), id_col)
        .select(
            F.col(id_col), F.explode(word_shingles(text_col, n)).alias("shingle")
        )
        .distinct()
    )


def hashed_shingle_sets(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """DISTINCT (id, shingle-hash) pairs with the shingle identity
    carried as a full-width ``xxhash64`` of the token window instead of
    the joined string. Jaccard over these equals Jaccard over string
    shingles up to hash collisions (~2⁻⁶⁴ per pair of distinct
    shingles — negligible against any corpus size); the win is that no
    shingle string is ever materialized, same ~17× projection saving
    as the signature path. Column name stays ``shingle`` so the
    set-arithmetic consumers are interchangeable."""
    from ..functions.hashing import tokens
    from .skew import spread_if_narrow

    toks = tokens(text_col)
    n_shingles = F.size("toks") - F.lit(n - 1)
    positions = F.when(
        n_shingles >= 1, F.sequence(F.lit(1), n_shingles)
    ).otherwise(F.array().cast("array<int>"))
    # per-row tokenize+shingle is compute-dense: spread a narrow scan
    # before the explode (no-op at scale — see skew.spread_if_narrow)
    base = spread_if_narrow(
        df.select(F.col(id_col), toks.alias("toks")), id_col
    ).select(id_col, "toks", F.explode(positions).alias("i"))
    window = [F.element_at("toks", F.col("i") + F.lit(k)) for k in range(n)]
    return base.select(
        F.col(id_col), F.xxhash64(*window).alias("shingle")
    ).distinct()


def jaccard_pairs(
    shingle_df: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.5,
    containment_threshold: float | None = None,
) -> DataFrame:
    """Exact n-gram set similarity for every pair sharing ≥1 shingle:
    |A∩B| via shingle self-join, |A|,|B| via group sizes.

    Default: (id_a, id_b, jaccard) with jaccard ≥ threshold. With
    ``containment_threshold`` set, returns
    (id_a, id_b, containment, jaccard) filtered on CONTAINMENT
    |A∩B| / min(|A|,|B|) instead — the asymmetric measure that
    catches one document mostly contained in another.

    O(pairs sharing a shingle) — fine when shingle frequencies are
    bounded; at 100 TB, hot shingles (boilerplate) must be dropped
    first (same cap as LSH buckets). Used standalone as ground truth
    and as the verify stage after LSH candidate generation.
    """
    sizes = shingle_df.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = shingle_df.alias("a")
    b = shingle_df.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jaccard = (
        F.col("n_common").cast("double")
        / (F.col("sa.sz") + F.col("sb.sz") - F.col("n_common"))
    ).alias("jaccard")
    scored = common.join(sa, F.col("id_a") == F.col(f"sa.{id_col}")).join(
        sb, F.col("id_b") == F.col(f"sb.{id_col}")
    )
    if containment_threshold is not None:
        containment = (
            F.col("n_common").cast("double")
            / F.least(F.col("sa.sz"), F.col("sb.sz"))
        ).alias("containment")
        return scored.select("id_a", "id_b", containment, jaccard).filter(
            F.col("containment") >= containment_threshold
        )
    return scored.select("id_a", "id_b", jaccard).filter(
        F.col("jaccard") >= threshold
    )


def jaccard_verify_candidates(
    docs: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
    materialize: bool = True,
) -> DataFrame:
    """Exact Jaccard restricted to LSH candidate pairs — the verify
    stage of MinHash+LSH dedup.

    The corpus is semi-joined to the candidate id set BEFORE shingles
    are exploded or deduplicated, so the distinct() shuffle and the
    set-size aggregation carry only candidate docs' shingles — at web
    scale the candidate set is a sliver of the corpus, and this is the
    difference between re-shuffling every shingle in the corpus (what
    a naive `shingle_sets(docs)` input would do) and an essentially
    free verify. The semi-join is unhinted: AQE broadcasts the id set
    when it is small and degrades to a shuffle join when a pathological
    corpus makes it large. Returns (id_a, id_b, jaccard ≥ threshold).

    ``materialize`` puts lazy localCheckpoint barriers on the
    candidate pair set (referenced by both halves of the id union and
    by the intersection join) and on the candidate shingle table
    (referenced by the intersection join and both size lookups) — both
    are candidate-proportional, and without the barriers every
    reference re-runs its whole upstream pipeline (see
    lsh_candidate_pairs).
    """
    if materialize:
        candidates = candidates.localCheckpoint(eager=False)
    cand_ids = (
        candidates.select(F.col("id_a").alias(id_col))
        .unionAll(candidates.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    cand_docs = docs.join(cand_ids, id_col, "left_semi")
    shingle_df = hashed_shingle_sets(cand_docs, text_col, id_col, shingle_n)
    if materialize:
        shingle_df = shingle_df.localCheckpoint(eager=False)
    sizes = shingle_df.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = shingle_df.alias("a")
    b = shingle_df.alias("b")
    common = (
        candidates.join(a, F.col("id_a") == F.col(f"a.{id_col}"))
        .join(
            b,
            (F.col("id_b") == F.col(f"b.{id_col}"))
            & (F.col("a.shingle") == F.col("b.shingle")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        common.join(sa, F.col("id_a") == F.col(f"sa.{id_col}"))
        .join(sb, F.col("id_b") == F.col(f"sb.{id_col}"))
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_common").cast("double")
                / (F.col("sa.sz") + F.col("sb.sz") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
) -> DataFrame:
    """(id, simhash) — bit-wise majority vote over token hashes,
    term-frequency weighted (duplicate tokens vote repeatedly).

    One explode + one groupBy(id) with ``bits`` conditional-sum
    aggregates; the final signature is reassembled with shiftleft/sum.
    All JVM expressions — at scale this is a single shuffle on id.
    """
    from ..functions.hashing import tokens
    from .skew import spread_if_narrow

    # per-row tokenize + per-token md5 is compute-dense: spread a
    # narrow scan first (no-op at scale)
    tok = spread_if_narrow(df.select(id_col, text_col), id_col).select(
        F.col(id_col), F.explode(tokens(text_col)).alias("token")
    ).withColumn("th", h60("token"))
    votes = tok.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("th"), b).bitwiseAND(1) == 1, 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(bits)
        ]
    )
    sig = None
    for b in range(bits):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(2**b).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        sig = bit if sig is None else sig + bit
    return votes.select(F.col(id_col), sig.alias("simhash"))


def semantic_dedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int | None = None,
    dim: int = 64,
    iters: int = 2,
    threshold: float = 0.4,
    cluster_budget: int = 4096,
) -> DataFrame:
    """SemDeDup-shaped semantic deduplication: cluster the embedding
    corpus with distributed k-means, then prune near-duplicates by
    pairwise cosine WITHIN each cluster only.

    This is the canonical embedding-dedup plan for web-scale corpora
    (SemDeDup, Abbas et al. 2023): clustering replaces the quadratic
    all-pairs cosine with per-cluster blocks, and the cluster count is
    the scale lever. **By default k is sized FROM the corpus**:
    k = max(2, ceil(n / cluster_budget)), so expected cluster size —
    and therefore per-cluster pairwise cost — stays bounded at
    ~cluster_budget² regardless of corpus size, and total pair cost
    grows LINEARLY (n · cluster_budget), never corpus². At 100 TB that
    yields the SemDeDup-paper regime of k ~ 10^4-10^5 automatically;
    pass an explicit ``k`` only to pin a cluster count. The sizing
    count is one metadata-cheap ``df.count()`` action. Keep rule:
    within a cluster, a vector is dropped iff it has cosine ≥
    threshold with a SMALLER-id vector — a greedy, deterministic,
    SQL-expressible representative choice (the transitive-closure
    variant is ``dedup_clusters``).

    Returns (id, cid, keep) for every input vector.
    """
    from .similarity import kmeans_fit_predict

    if k is None:
        n = df.count()
        k = max(2, -(-n // cluster_budget))
    assign = kmeans_fit_predict(
        df, vec_col=vec_col, id_col=id_col, k=k, dim=dim, iters=iters
    ).select(id_col, "cid")
    clustered = (
        df.select(id_col, vec_col)
        .join(assign, id_col)
        .localCheckpoint(eager=False)
    )
    # §2.5: k is tiny on a small corpus (k = 2 at a few thousand
    # vectors), and a pair join keyed on k distinct cids runs the
    # whole quadratic stage on k tasks; salt it up to the cluster
    # width. At corpus scale k >> parallelism and the salt is 1 —
    # zero replication cost exactly when it isn't needed.
    par = df.sparkSession.sparkContext.defaultParallelism
    pairs = embedding_near_dup_pairs(
        clustered,
        vec_col=vec_col,
        id_col=id_col,
        block_col="cid",
        threshold=threshold,
        salt_partitions=max(1, -(-par // k)),
    )
    dropped = (
        pairs.select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("_dup", F.lit(True))
    )
    return (
        clustered.select(id_col, "cid")
        .join(dropped, id_col, "left")
        .select(id_col, "cid", F.col("_dup").isNull().alias("keep"))
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str = "label",
    threshold: float = 0.4,
    salt_partitions: int = 1,
) -> DataFrame:
    """Near-duplicate vectors by cosine similarity within blocks.

    Blocking on ``block_col`` turns the quadratic cross join into
    per-block joins (at 100 TB the block key would be an LSH bucket —
    see operators/similarity.py). Cosine is computed with higher-order
    functions in float64 (cast first: float32 arithmetic orders
    differently across engines).

    ``salt_partitions`` > 1 splits each block's pair enumeration
    across that many shuffle partitions: the left side is salted by a
    deterministic hash of its id and the right side replicated per
    salt, so every pair still meets exactly once. This is the §2.5
    low-distinct-join-key fix — a join keyed on a handful of block
    values otherwise runs the whole quadratic pair stage on that many
    tasks. Callers that KNOW the block count pass
    ``ceil(parallelism / n_blocks)`` (1 when blocks already exceed
    the cluster width, i.e. no replication cost at scale).
    """
    withnorm = df.select(
        F.col(id_col),
        F.col(block_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).withColumn(
        "norm",
        F.sqrt(
            F.aggregate(
                F.col("v"), F.lit(0.0), lambda acc, x: acc + x * x
            )
        ),
    ).filter(
        # a zero-norm vector (empty doc under some embedding models)
        # has no defined cosine and can never be a near-dup; excluding
        # it up front keeps the division ANSI-safe on both engines
        F.col("norm") > 0
    )
    salt = max(1, int(salt_partitions))
    a_side = withnorm.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt))
    )
    b_side = withnorm.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    a = a_side.alias("a")
    b = b_side.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(
            b,
            (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
            & (F.col("a._salt") == F.col("b._salt"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{block_col}").alias(block_col),
            F.round(dot / (F.col("a.norm") * F.col("b.norm")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def prefix_filter_candidates(
    shingle_df: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """PPJoin-style prefix filtering: candidate pairs for Jaccard ≥ t
    with ZERO false negatives — the exact-threshold alternative to
    LSH's probabilistic bands.

    Every document orders its shingles by a GLOBAL canonical order
    (ascending corpus frequency, then shingle — rare-first), and only
    its PREFIX of the first ``|d| − ceil(t·|d|) + 1`` shingles is
    indexed: two sets with Jaccard ≥ t must share a prefix shingle
    under any common total order (the pigeonhole bound), so joining
    prefixes finds every qualifying pair. Rare-first ordering makes
    prefixes meet on the rarest shingles — hot boilerplate shingles
    fall OUT of prefixes instead of exploding the join, which is the
    scale story (LSH needed an explicit bucket cap for the same
    hazard).
    """
    from pyspark.sql import Window

    sizes = shingle_df.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    freq = shingle_df.groupBy("shingle").agg(F.count(F.lit(1)).alias("freq"))
    ranked = (
        shingle_df.join(freq, "shingle")
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(
                    F.asc("freq"), F.asc("shingle")
                )
            ),
        )
        .join(sizes, id_col)
    )
    prefix = ranked.filter(
        F.col("r")
        <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
    ).select(id_col, "shingle", "r")
    # Candidate-volume note (sf0.1, shared-vocabulary fixture): the
    # bare prefix join generates ~500x more candidates than banded LSH
    # (409k vs 766) because uniform shingle frequencies defeat the
    # rare-first heuristic. The PPJoin POSITIONAL filter below closes
    # most of that gap while staying exactly complete: a pair with
    # J >= t needs overlap alpha = ceil(t/(1+t) * (|A|+|B|)), and at
    # the pair's FIRST common prefix shingle (positions r_a, r_b under
    # the global order) no common shingle precedes either position, so
    # overlap <= 1 + min(|A| - r_a, |B| - r_b). Filtering each matched
    # occurrence by that bound keeps the first match of every true
    # pair (OR-over-matches), so no false negatives; late-position
    # collisions — the bulk of the uniform-frequency blowup — drop
    # before the exact verify. The epsilon loosens alpha by <1e-9 so
    # float roundoff can only relax the bound, never tighten it.
    prefix = prefix.join(sizes, id_col)
    a = prefix.alias("a")
    b = prefix.alias("b")
    sz_a, sz_b = F.col("a.sz"), F.col("b.sz")
    alpha = F.ceil(
        F.lit(threshold / (1.0 + threshold)) * (sz_a + sz_b) - F.lit(1e-9)
    )
    # sound length filter: J ≥ t ⇒ min(|A|,|B|)/max(|A|,|B|) ≥ t
    return (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & (
                F.least(sz_a, sz_b)
                >= threshold * F.greatest(sz_a, sz_b)
            )
            & (
                F.lit(1)
                + F.least(sz_a - F.col("a.r"), sz_b - F.col("b.r"))
                >= alpha
            ),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
