"""Iterative graph operators: connected components over a pair graph.

The one operator family Spark's DataFrame API genuinely lacks a
primitive for (SURVEY.md §2.8 extension scope): grouping near-dup
PAIRS into CLUSTERS so a curation pipeline can keep exactly one
canonical document per component — pairwise drop-the-higher-id keeps
too many docs when dups form chains (a~b, b~c: pairwise drops b and c
from pairs but a chain policy must drop b,c together under canonical
a even when (a,c) was never a direct pair).

Algorithm: Pregel-style min-label propagation — each superstep every
node adopts the minimum label among itself and its neighbors;
converges in O(graph diameter) supersteps. Each superstep is one
self-contained Spark job (join + groupBy on the edge list); the
driver only coordinates supersteps and checks the convergence count,
which is the standard distributed-iteration pattern (GraphX/Pregel do
exactly this) — the per-node work is fully distributed, the
driver-side value is a single long per superstep.

Scale notes: shuffle per superstep ∝ |edges|; labels are
``localCheckpoint``ed each superstep to cut the exponentially growing
lineage (on a cluster, ``spark.sparkContext.setCheckpointDir`` +
``checkpoint()`` is the fault-tolerant swap). Near-dup graphs are
sparse forests of small components, so diameters are tiny; the
``max_iter`` guard raises instead of silently emitting half-merged
clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, cluster_id) for every node in ``pairs``; cluster_id is
    the minimum node id in the component (deterministic canonical)."""
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = (
        edges.unionAll(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        # carry the did-this-node-improve flag THROUGH the update (the
        # label can only decrease, so improved == nlabel < label):
        # convergence is then a filter+count over the already
        # materialized checkpoint instead of a per-superstep join of
        # new labels against old — one fewer shuffle per superstep,
        # same labels
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nlabel", "label")
                ).alias("label"),
                (F.coalesce("nlabel", "label") < F.col("label")).alias(
                    "_chg"
                ),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("_chg")).count()
        labels = new_labels.select("node", "label")
        if changed == 0:
            return labels.select("node", F.col("label").alias("cluster_id"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} supersteps "
        "(graph diameter exceeds the guard — raise max_iter)"
    )


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components via alternating LARGE-STAR / SMALL-STAR
    rounds (Kiveris et al., "Connected Components in MapReduce and
    Beyond") — the 100 TB algorithm: converges in O(log² n) rounds on
    ANY graph, where :func:`connected_components`'s min-label
    propagation needs O(diameter) rounds (a path graph of chained
    near-dups makes that linear). Both emit the identical
    (node, cluster_id = component min) labeling, so they share the
    transitive-closure oracle.

    large-star(u): point every LARGER neighbor at min(N(u) ∪ {u}) —
    strictly height-reducing. small-star(u): re-point every smaller
    neighbor (and u) at the minimum smaller neighbor — flattens local
    chains. Each half-round is one symmetrize/orient projection + one
    keyed min + one join, all shuffling the CURRENT edge set only;
    edges sit behind eager barriers so the iterative lineage never
    re-expands. Convergence = exact edge-set fixpoint (two
    ``exceptAll`` probes on edge-sized state per round).
    """
    e = (
        pairs.select(
            F.greatest(F.col(id_a), F.col(id_b)).alias("u"),
            F.least(F.col(id_a), F.col(id_b)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # LARGE-STAR over the symmetrized edges: m(u) = min(N(u)∪{u});
        # emit (v, m) for neighbors v > u.
        sym = e.unionAll(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = sym.groupBy("u").agg(
            F.least(F.min("v"), F.min("u")).alias("m")
        )
        large = (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # SMALL-STAR: edges already oriented (u > v). m2(u) = min of
        # the smaller neighborhood; re-point each smaller neighbor
        # (except m2 itself) and u at m2.
        m2 = large.groupBy("u").agg(F.min("v").alias("m2"))
        small = (
            large.join(m2, "u")
            .select(
                F.when(F.col("v") == F.col("m2"), F.col("u"))
                .otherwise(F.col("v"))
                .alias("u"),
                F.col("m2").alias("v"),
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        # exact fixpoint probe in ONE job: both edge sets are DISTINCT
        # by construction, so a row landing in exactly one of them is
        # precisely the symmetric difference — one union+groupBy
        # instead of the two exceptAll jobs per round this replaces
        changed = (
            small.unionAll(e)
            .groupBy("u", "v")
            .agg(F.count(F.lit(1)).alias("k"))
            .filter(F.col("k") == 1)
            .limit(1)
            .count()
        )
        e = small
        if changed == 0:
            return (
                e.select(F.col("u").alias("node"), F.col("v").alias("l"))
                .unionAll(
                    e.select(
                        F.col("v").alias("node"), F.col("v").alias("l")
                    )
                )
                .groupBy("node")
                .agg(F.min("l").alias("cluster_id"))
            )
    raise RuntimeError(
        f"connected_components_star did not converge in {max_iter} "
        "rounds (expected O(log^2 n) — raise max_iter)"
    )


# 2^40 fixed-point scale for PageRank contributions: floor-truncated
# scaled integers sum exactly (order- and engine-independent), the
# same discipline as similarity.KM_SCALE. floor() — not a bare bigint
# cast — because Spark's double→bigint cast truncates while DuckDB's
# rounds; floor is identical in both.
PR_SCALE = float(2**40)


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Distributed PageRank over a symmetrized edge list, cross-engine
    exact: per-iteration contributions ``floor(pr/deg · 2^40)`` are
    exact integers, so the per-node sums (the only order-sensitive
    reduction) agree bit-for-bit on any engine/partitioning; the
    teleport step is fixed-order double arithmetic.

    Each iteration is one equi-join (edges ⋈ ranks, shuffle ∝ |edges|
    carrying (dst, int64)) plus one aggregation; ranks sit behind a
    lazy checkpoint barrier to keep iterative lineage shallow. Every
    node in ``edges`` has degree ≥ 1 by construction (isolated
    vertices carry teleport mass only and are excluded — callers union
    them back if needed), so there is no dangling-mass term.

    Returns (node, pr).
    """
    deg = edges.groupBy(src_col).agg(F.count(F.lit(1)).alias("deg"))
    n_nodes = deg.groupBy().agg(F.count(F.lit(1)).alias("n"))
    # rank mass lives in the scaled-INTEGER domain end-to-end: every
    # float op below is a lone mult/div immediately floored, never an
    # a + b*c chain — C++ engines contract those into FMA (no
    # intermediate rounding) while the JVM does not, which costs a
    # last-ulp divergence. Integer adds/divs are exact everywhere.
    pr = (
        deg.select(F.col(src_col).alias("node"), "deg")
        .crossJoin(F.broadcast(n_nodes))
        .select(
            "node",
            "deg",
            "n",
            F.floor(F.lit(PR_SCALE) / F.col("n")).cast("bigint").alias("prs"),
        )
        .localCheckpoint(eager=False)
    )
    for _ in range(iters):
        contrib = edges.join(pr, edges[src_col] == pr.node).select(
            F.col(dst_col).alias("cnode"),
            F.expr("prs div deg").alias("c"),
        )
        sums = contrib.groupBy("cnode").agg(F.sum("c").alias("sc"))
        teleport = F.floor(
            F.lit(PR_SCALE) * F.lit(1.0 - damping) / F.col("n")
        ).cast("bigint")
        spread = F.floor(
            F.lit(damping) * F.coalesce(F.col("sc"), F.lit(0)).cast("double")
        ).cast("bigint")
        pr = (
            pr.join(sums, pr.node == sums.cnode, "left")
            .select("node", "deg", "n", (teleport + spread).alias("prs"))
            .localCheckpoint(eager=False)
        )
    return pr.select(
        "node", (F.col("prs").cast("double") / F.lit(PR_SCALE)).alias("pr")
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    damping: float = 0.85,
    iters: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Personalized PageRank: identical fixed-point machinery to
    :func:`pagerank` (floor-scaled 2^40 integer rank mass, one
    edge⋈rank equi-join + aggregation per iteration, lazy-checkpoint
    barriers), except the teleport term restarts to the SEED set only
    — ``floor(SCALE·(1−d)/|seeds|)`` on seed nodes, zero elsewhere —
    so mass concentrates around the seeds' neighborhoods (the
    recommendation / related-items primitive). ``seeds`` is a
    one-column (``node``) DataFrame, broadcast onto the rank state as
    a flag; nodes unreachable from any seed legitimately decay to 0.

    Seeds with NO out-edges cannot hold rank state (the state table
    is keyed by out-degree nodes, the same isolated-vertex contract
    as :func:`pagerank`), so the teleport denominator counts only
    seeds that exist in the out-degree table — a dangling seed is
    ignored rather than silently evaporating its share of the
    teleport mass and under-summing the returned distribution.

    Returns (node, ppr).
    """
    deg = edges.groupBy(src_col).agg(F.count(F.lit(1)).alias("deg"))
    n_seeds = (
        seeds.join(
            deg.select(F.col(src_col).alias("node")).distinct(), "node"
        )
        .groupBy()
        .agg(F.count(F.lit(1)).alias("ns"))
    )
    seed_flag = seeds.select(
        F.col("node").alias("snode"), F.lit(1).alias("iseed")
    )
    pr = (
        deg.select(F.col(src_col).alias("node"), "deg")
        .join(
            F.broadcast(seed_flag), F.col("node") == F.col("snode"), "left"
        )
        .crossJoin(F.broadcast(n_seeds))
        .select(
            "node",
            "deg",
            "ns",
            F.coalesce("iseed", F.lit(0)).alias("iseed"),
            F.when(
                F.coalesce("iseed", F.lit(0)) == 1,
                F.floor(F.lit(PR_SCALE) / F.col("ns")).cast("bigint"),
            )
            .otherwise(F.lit(0).cast("bigint"))
            .alias("prs"),
        )
        .localCheckpoint(eager=False)
    )
    for _ in range(iters):
        contrib = edges.join(pr, edges[src_col] == pr.node).select(
            F.col(dst_col).alias("cnode"),
            F.expr("prs div deg").alias("c"),
        )
        sums = contrib.groupBy("cnode").agg(F.sum("c").alias("sc"))
        teleport = F.when(
            F.col("iseed") == 1,
            F.floor(
                F.lit(PR_SCALE) * F.lit(1.0 - damping) / F.col("ns")
            ).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint"))
        spread = F.floor(
            F.lit(damping) * F.coalesce(F.col("sc"), F.lit(0)).cast("double")
        ).cast("bigint")
        pr = (
            pr.join(sums, pr.node == sums.cnode, "left")
            .select(
                "node", "deg", "ns", "iseed", (teleport + spread).alias("prs")
            )
            .localCheckpoint(eager=False)
        )
    return pr.select(
        "node", (F.col("prs").cast("double") / F.lit(PR_SCALE)).alias("ppr")
    )


def label_propagation(
    edges: DataFrame,
    iterations: int = 2,
    u_col: str = "u",
    v_col: str = "v",
) -> DataFrame:
    """Synchronous label-propagation community detection (LPA):
    every node starts in its own community, then each superstep
    reassigns it to the most frequent label among its neighbors
    (ties break toward the SMALLER label — fully deterministic, so
    an oracle can unroll the same supersteps).

    Unlike min-label connected components, LPA splits a connected
    graph into densely-linked groups. Synchronous update + fixed
    iteration count keeps it engine-reproducible; production LPA runs
    until <1%% of nodes change. Each superstep is one edge⋈label
    equi-join + a (node, label) count + an argmax window — all keyed
    shuffles, barriered per iteration so the plan never re-expands
    (the iterative-algorithm discipline shared with
    ``connected_components`` / ``pagerank``).
    """
    from pyspark.sql import Window

    und = edges.select(F.col(u_col).alias("src"), F.col(v_col).alias("dst"))
    und = (
        und.unionAll(
            und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy("src").orderBy(F.desc("n_votes"), F.asc("label"))
    for _ in range(iterations):
        votes = (
            und.join(labels, und.dst == labels.node)
            .groupBy("src", "label")
            .agg(F.count(F.lit(1)).alias("n_votes"))
        )
        labels = (
            votes.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") == 1)
            .select(F.col("src").alias("node"), "label")
            .localCheckpoint(eager=False)
        )
    return labels


# 2^30 fixed-point scale for HITS scores: smaller than PR_SCALE because
# raw authority sums are bounded by (#in-neighbors · scale) — 2^30
# leaves 2^33 of int64 headroom for the in-degree even at web scale,
# where 2^40 would overflow past ~8M in-neighbors.
HITS_SCALE = float(2**30)


def hits(
    edges: DataFrame,
    iters: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """HITS (Kleinberg hubs & authorities) over a DIRECTED edge list,
    cross-engine exact: auth(p) = Σ hub(u) over in-edges, hub(u) =
    Σ auth(p) over out-edges, max-normalized each half-step in the
    floor-scaled integer domain (the ``pagerank`` discipline — the
    only order-sensitive sums are over exact int64, and the
    normalization is one IEEE division followed by an exact
    power-of-two multiply, so any engine/partitioning reproduces the
    bits).

    Max-normalization replaces the textbook L2 norm: an L2 norm is an
    order-sensitive float sum of squares, while max over int64 is
    exact and yields the same ranking (HITS scores are defined up to
    scale). Per half-step: one equi-join (edges ⋈ scores, shuffle ∝
    |edges| carrying one int64) + one aggregation + one single-row
    max broadcast — scores sit behind lazy-checkpoint barriers so the
    iterative lineage never re-expands.

    Returns (node, auth) for every distinct ``dst_col`` node, with
    auth ∈ (0, 1] (1 = the top authority); hubs are the symmetric
    half-step and can be read off the same run by swapping the edge
    direction.
    """
    if iters < 1:
        raise ValueError(f"hits() requires iters >= 1, got {iters}")
    edges = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=False)
    hub = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.lit(int(HITS_SCALE)).alias("s"))
        .localCheckpoint(eager=False)
    )
    auth = None
    for _ in range(iters):
        auth = _hits_half_step(edges, hub, "src", "dst")
        hub = _hits_half_step(edges, auth, "dst", "src")
    return auth.select(
        "node",
        (F.col("s").cast("double") / F.lit(HITS_SCALE)).alias("auth"),
    )


def _hits_half_step(
    edges: DataFrame, scores: DataFrame, from_col: str, to_col: str
) -> DataFrame:
    """Sum the neighbors' scaled scores onto ``to_col`` nodes, then
    max-normalize back to the 2^30 integer grid."""
    raw = (
        edges.join(scores, edges[from_col] == scores.node)
        .groupBy(F.col(to_col).alias("nnode"))
        .agg(F.sum("s").alias("raw"))
        # referenced twice (normalizing max + the rescale itself):
        # barrier so the join+agg runs once per half-step, not twice
        .localCheckpoint(eager=False)
    )
    mx = raw.groupBy().agg(F.max("raw").alias("m"))
    return (
        raw.crossJoin(F.broadcast(mx))
        .select(
            F.col("nnode").alias("node"),
            # one IEEE division (the single rounding), then an exact
            # exponent-shift multiply and floor — never an a+b*c chain
            F.floor(
                F.lit(HITS_SCALE)
                * (F.col("raw").cast("double") / F.col("m"))
            )
            .cast("bigint")
            .alias("s"),
        )
        .localCheckpoint(eager=False)
    )
