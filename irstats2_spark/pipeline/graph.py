"""Graph analytics over corpus-derived edge lists.

The curation pipeline keeps producing graphs — mutual-kNN edges from
embeddings (``similarity.knn_mutual_graph``), near-dup pair graphs from
MinHash/SimHash banding, co-citation from link extraction — and the
standard questions over them (centrality for sampling priors, community
labels for stratified mixing, local clustering for hub/boilerplate
detection) are graph algorithms. The reference engine has no graph tier
(its closest analog is the subject ancestor closure,
``EPrints/Plugin/Stats/Processor.pm``'s set expansions); this module is
beyond-reference surface for the LLM-data pipeline.

Every algorithm here is deliberately the BOUNDED-ROUND, INTEGER-EXACT
variant so that a SQL oracle can replay it bit-for-bit:

- ranks are fixed-point BIGINTs updated with floor division (no float
  accumulation, so sum order cannot change a single bit);
- label propagation is synchronous min-label (deterministic, converges
  toward connected components), not mode-of-neighbors (tie-broken);
- iteration counts are fixed and small, and each round is one keyed
  shuffle — the shape GraphX/Pregel would execute, expressed as
  DataFrame joins so Catalyst/AQE handle skew and reuse.

Scale shape: the input edge list is k-bounded (k*|V| rows for kNN
graphs) and every round shuffles only (id, int) pairs — never vectors
or text. At a real 100-TB corpus you would persist the directed edge
list once, co-partition it with the rank/label table on node id, and
let each round reuse that partitioning; the per-round plan below is
exactly that join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["degree_table", "pagerank_integer", "triangle_counts",
           "label_propagation_min"]


def _directed(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected (u, v) edge list -> both directed arcs (src, dst)."""
    fwd = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    rev = edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    return fwd.unionAll(rev)


def degree_table(edges: DataFrame, src: str = "u", dst: str = "v") -> DataFrame:
    """(node_id, degree) from an undirected u<v edge list."""
    return (
        _directed(edges, src, dst)
        .groupBy(F.col("src").alias("node_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )


def pagerank_integer(
    edges: DataFrame,
    iterations: int = 3,
    scale: int = 10**9,
    src: str = "u",
    dst: str = "v",
) -> DataFrame:
    """Fixed-point PageRank over an undirected edge list, in pure BIGINT
    arithmetic so every engine computes the identical result.

    Per node, rank starts at ``scale`` (i.e. 1.0 in fixed point) and
    each synchronous round applies

        r'(v) = (15 * scale) // 100
                + (85 * SUM over in-neighbors u of r(u) // deg(u)) // 100

    — the damping-0.85 update with the two float divisions replaced by
    floor divisions. Integer sums are associative-exact, so shuffle
    order cannot perturb the result and the DuckDB oracle unrolls the
    same rounds as CTEs and matches bit-for-bit. (The classic float
    formulation would differ across engines in the last ulp per round
    and diverge after normalization.) Teleport mass is per-node
    (un-normalized total mass ~ |V| * scale, as in the "personalized
    constant" formulation); dangling nodes cannot occur because every
    node in an undirected edge list has degree >= 1.

    Scale shape: per round, one join of the rank table to the directed
    edge list on src (both keyed by node id — co-partitionable once at
    real scale) and one groupBy dst; shuffles carry (id, BIGINT) only.
    ``iterations`` is a fixed small constant: bounded-round PageRank is
    the sampling-prior variant (rank separates hubs from rim within 2-3
    rounds), not a convergence loop.
    """
    assert iterations >= 1
    # Materialize the edge list once: every round references it (and the
    # degree table derived from it), and without truncation the upstream
    # edge derivation (e.g. the whole kNN-graph build) would be replayed
    # in every round of the unrolled plan — same lesson as
    # ``dedup.connected_components``'s per-round checkpoint.
    edges = edges.localCheckpoint()
    arcs = _directed(edges, src, dst)
    deg = degree_table(edges, src, dst)
    tele = (15 * scale) // 100
    ranks = deg.withColumn("r", F.lit(scale).cast("long"))
    for _ in range(iterations):
        inflow = (
            arcs.join(ranks, arcs.src == ranks.node_id)
            .select("dst", F.expr("r DIV degree").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inflow"))
        )
        ranks = deg.join(inflow, deg.node_id == inflow.dst, "left").select(
            "node_id",
            "degree",
            (
                F.lit(tele)
                + F.expr("(85 * coalesce(inflow, 0)) DIV 100")
            ).cast("long").alias("r"),
        )
    return ranks.select(
        "node_id",
        "degree",
        F.col("r").alias("rank_scaled"),
        F.round(F.col("r") / F.lit(float(scale)), 6).alias("rank"),
    )


def triangle_counts(
    edges: DataFrame, src: str = "u", dst: str = "v"
) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over an
    undirected u<v edge list.

    Uses the a<b<c orientation: a triangle {a,b,c} is found exactly once
    as E(a,b) |><| E(b,c) closed by E(a,c), so no post-hoc dedup of
    permutations is needed. Each found triangle credits all three
    corners; clustering coefficient is 2*T / (d*(d-1)) (0.0 where
    degree < 2), rounded to 6 — the only float op, over exact integers.

    Scale shape: the classic two-join triangle enumeration — one
    self-join on the shared middle vertex, one semi-join-shaped closure
    check — all keyed shuffles over (id, id) rows. On heavy-tailed
    degree distributions the standard refinement is degree-based
    orientation (low-degree vertex first) so hub vertices don't anchor
    the 2-path explosion; the id orientation here is the deterministic
    variant the oracle can replay, and AQE's skew-join split handles
    moderate hubs. The k-bounded mutual-kNN input caps degree at k by
    construction, which bounds 2-paths at k^2 per node.
    """
    # One materialization, four references (three join legs + degrees).
    edges = edges.localCheckpoint()
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    e1 = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    paths = e1.join(e2, "b")  # a<b, b<c => a<b<c
    tris = paths.join(e3, ["a", "c"])  # closure edge
    corners = (
        tris.select(F.col("a").alias("node_id"))
        .unionAll(tris.select(F.col("b").alias("node_id")))
        .unionAll(tris.select(F.col("c").alias("node_id")))
        .groupBy("node_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    deg = degree_table(edges, src, dst)
    out = deg.join(corners, "node_id", "left").select(
        "node_id",
        "degree",
        F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
    )
    coeff = F.when(
        F.col("degree") >= 2,
        F.round(
            2.0 * F.col("n_triangles")
            / (F.col("degree") * (F.col("degree") - 1)),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return out.withColumn("clustering_coeff", coeff)


def label_propagation_min(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "u",
    dst: str = "v",
) -> DataFrame:
    """Synchronous min-label propagation: every node starts labeled with
    its own id and each round takes the min of its label and its
    neighbors' labels.

    This is the deterministic member of the label-propagation family —
    mode-of-neighbors LPA needs tie-breaking and iteration-order
    conventions that no two engines share, while min-label is exact,
    order-free, and converges to connected components (label = min node
    id of the component) within diameter rounds. Bounded ``iterations``
    makes it the "community sketch" variant: after r rounds, nodes
    within graph distance r of a component's minimum share its label.
    The full-convergence alternating-halving variant lives in
    ``dedup.connected_components``; this one is the fixed-round,
    oracle-replayable form.

    Output: (node_id, community, community_size) after the fixed
    rounds. Scale shape per round: one join of the label table to the
    directed edge list + one min-agg — identical partitioning to
    ``pagerank_integer``, shuffles carry (id, id) only.
    """
    assert iterations >= 1
    edges = edges.localCheckpoint()  # see pagerank_integer's rationale
    arcs = _directed(edges, src, dst)
    labels = degree_table(edges, src, dst).select(
        "node_id", F.col("node_id").cast("long").alias("label")
    )
    for _ in range(iterations):
        neigh = (
            arcs.join(labels, arcs.src == labels.node_id)
            .select("dst", "label")
            .groupBy("dst")
            .agg(F.min("label").alias("neigh_min"))
        )
        labels = labels.join(neigh, labels.node_id == neigh.dst, "left").select(
            "node_id",
            F.least(
                F.col("label"), F.coalesce("neigh_min", F.col("label"))
            ).cast("long").alias("label"),
        )
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("community_size")
    )
    return labels.join(sizes, "label").select(
        "node_id",
        F.col("label").alias("community"),
        "community_size",
    )
