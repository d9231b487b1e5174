"""Graph analytics over the materialized KG — iterative PageRank as
DataFrame joins, in EXACT integer arithmetic.

Float PageRank cannot pass an exact cross-engine value hash: partial
sums merge in shuffle order, and last-ulp drift flips any rounding.
This variant keeps every quantity a BIGINT so both engines (and any
partitioning) produce bit-identical ranks:

    r0(v)   = SCALE                      (1e12)
    contrib = r div out_deg              (integer floor division)
    r'(v)   = (SCALE * 3) div 20  +  (sum(contrib) * 17) div 20
              -- i.e. 0.15 + 0.85 * S, both terms floored

Self-loop rows with weight 0 are appended to the edge list so every
node — including ones with no in-edges — receives a group row each
round; that keeps the iteration a single join + groupBy over ONE
edge-shaped table (and makes the DuckDB recursive-CTE oracle legal:
the recursive term references the rank table exactly once).

Scale shape per iteration: one broadcast-able join (ranks are
node-sized, edges corpus-sized) + one groupBy(dst) shuffle with
map-side partial sums. Fixed iteration count — rank deltas, not
convergence detection, so no driver action inside the loop.
Overflow headroom: the update computes sum(contrib) * 17 BEFORE the
div 20, and sum(contrib) over one node's in-edges is bounded by the
total rank mass SCALE * n_nodes, so BIGINT requires
17 * SCALE * n_nodes < 2^63 — i.e. ~5.4e5 nodes at the default
SCALE=1e12. Pass a smaller `scale` for larger graphs (each factor of
1000 off SCALE buys 1000x the nodes at 3 fewer exact digits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000  # 1e12: rank fixed-point scale
BASE = SCALE * 3 // 20  # floor(0.15 * SCALE)


def pagerank_int(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    n_iter: int = 3,
    scale: int = SCALE,
    n_nodes_hint: int | None = None,
) -> DataFrame:
    """(node, rank) after `n_iter` exact-integer PageRank rounds.

    `edges` is DIRECTED input (pass both directions for an undirected
    graph). Node set = all endpoints. Duplicate edges count double by
    design; `weight_col` (integer) generalizes that to weighted edges:
    contrib = (rank div sum-of-weights) * w, still exact-integer.

    `scale` is the fixed-point scale; exactness requires
    17 * scale * n_nodes < 2^63 (see module docstring). Pass
    `n_nodes_hint` (known node count — cheap for a materialized KG)
    to fail loudly instead of silently wrapping past that bound; the
    guard is driver-side arithmetic only, no extra job.
    """
    if n_nodes_hint is not None and 17 * scale * n_nodes_hint >= 2**63:
        raise ValueError(
            f"BIGINT overflow: 17 * scale({scale}) * n_nodes({n_nodes_hint})"
            f" >= 2^63; lower `scale` (each 1000x off buys 1000x nodes)"
        )
    base = scale * 3 // 20
    wexpr = (
        F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    )
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst"), wexpr.alias("w")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.sum("w").alias("deg"))
    real = e.join(deg, "src")
    selfs = nodes.select(
        F.col("node").alias("src"),
        F.col("node").alias("dst"),
        F.lit(1).cast("long").alias("deg"),  # never divides anything (w=0)
        F.lit(0).cast("long").alias("w"),
    )
    ew = real.unionByName(selfs)

    ranks = nodes.select("node", F.lit(scale).cast("long").alias("rank"))
    for _ in range(n_iter):
        contrib = ew.join(ranks, ew.src == ranks.node).select(
            "dst", (F.expr("rank div deg") * F.col("w")).alias("c")
        )
        ranks = contrib.groupBy("dst").agg(
            (F.lit(base) + F.expr("sum(c) * 17 div 20")).alias("rank")
        ).withColumnRenamed("dst", "node")
    return ranks


def triangle_counts(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """(node, n_triangles) per node of an undirected graph — the
    clustering-cohesion primitive of KG analytics (a node in many
    triangles sits inside a tight entity community; bridge nodes sit
    in none).

    Input edges may be directed/duplicated; they are canonicalized to
    a simple undirected edge set (least, greatest, distinct) first.
    Each triangle {x < y < z} is enumerated exactly once via the
    oriented two-hop join — e(x,y) ⋈ e(y,z) ⋈ e(x,z) with x < y < z —
    the standard compact-forward shape: orienting edges low->high
    bounds each node's join fan-out by its *outgoing* (higher-id)
    degree, which is what keeps the self-join from exploding on hub
    nodes at scale (a hub's triangles are found from its lower-id
    neighbors, not enumerated hub-side). Nodes in no triangle are kept
    with n_triangles = 0 so the output is node-complete.
    """
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e1.a") == F.col("e3.a")) & (F.col("e2.b") == F.col("e3.b")),
        )
        .select(
            F.col("e1.a").alias("x"), F.col("e1.b").alias("y"),
            F.col("e2.b").alias("z"),
        )
    )
    per_node = (
        tri.select(F.col("x").alias("node"))
        .unionByName(tri.select(F.col("y").alias("node")))
        .unionByName(tri.select(F.col("z").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    nodes = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .distinct()
    )
    return nodes.join(per_node, "node", "left").select(
        "node", F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles")
    )


def clustering_coefficients(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """(node, degree, n_triangles, clustering_e6): local clustering
    coefficient per node of an undirected graph, as the exact integer
    ratio 2·T(v)·1e6 div (deg·(deg−1)) (0 for degree < 2 — no float
    division, so the value is partition- and engine-invariant).

    Triangles come from `triangle_counts` (oriented two-hop join, hub
    fan-out bounded by higher-id degree); the degree table is one
    groupBy over the canonical edge set. Both sides are node-sized
    after their aggregations, so the final join is broadcast-able at
    any corpus scale.
    """
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    tri = triangle_counts(e, "a", "b")
    return deg.join(tri, "node").select(
        "node",
        "degree",
        "n_triangles",
        F.when(
            F.col("degree") >= 2,
            F.expr("n_triangles * 2 * 1000000 div (degree * (degree - 1))"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("clustering_e6"),
    )


INF = 1_000_000_000  # "unreached" sentinel during BFS iteration


def bfs_distances(
    edges: DataFrame,
    source: str,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 3,
) -> DataFrame:
    """(node, dist): exact hop distance from `source` over the
    undirected graph, computed with `n_iter` label-relaxation rounds
    (so dist is exact for nodes within n_iter hops; farther nodes
    report -1). All-integer — bit-identical across engines and
    partitionings, like pagerank_int above.

    Per round: one join of the edge list against the (node-sized)
    distance table + one groupBy(node) min — the same broadcast-able
    join + map-side-combinable agg shape as a PageRank round. Fixed
    iteration count, no driver action in the loop; on a real cluster
    n_iter = graph diameter bound, and the distance table stays
    node-sized (tiny next to edges) throughout.
    """
    e = edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("t"))
    und = e.unionByName(
        e.select(F.col("t").alias("s"), F.col("s").alias("t"))
    ).distinct()
    nodes = und.select(F.col("s").alias("node")).distinct()
    dist = nodes.select(
        "node",
        F.when(F.col("node") == source, F.lit(0))
        .otherwise(F.lit(INF))
        .cast("long")
        .alias("d"),
    )
    for _ in range(n_iter):
        relaxed = und.join(dist, und.s == dist.node).select(
            F.col("t").alias("node"), (F.col("d") + 1).alias("d")
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("d").alias("d"))
        )
    return dist.select(
        "node",
        F.when(F.col("d") >= INF, F.lit(-1)).otherwise(F.col("d"))
        .cast("long")
        .alias("dist"),
    )


def kcore_flags(
    edges: DataFrame,
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 3,
) -> DataFrame:
    """(node, in_core): survivors of `n_iter` rounds of iterative
    degree-< k pruning over the undirected simple graph — the k-core
    peel, the KG-analytics step that separates the dense entity
    nucleus from peripheral mentions. Fixed rounds bound the cascade
    depth (exact k-core once pruning reaches a fixed point; report
    in_core = 0/1 as of round n_iter either way — deterministic and
    engine-mirrorable via iterated CTEs).

    Per round: filter the edge list to alive endpoints (two node-sized
    semi-joins, broadcast-able), one groupBy(degree) shuffle. Edges
    are corpus-sized but the alive/degree state stays node-sized
    throughout — same scale shape as pagerank_int/bfs_distances above.
    """
    e = edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("t"))
    und = (
        e.unionByName(e.select(F.col("t").alias("s"), F.col("s").alias("t")))
        .filter(F.col("s") != F.col("t"))
        .distinct()
    )
    nodes = und.select(F.col("s").alias("node")).distinct()
    alive = nodes
    for _ in range(n_iter):
        e_alive = und.join(
            alive.select(F.col("node").alias("s")), "s"
        ).join(alive.select(F.col("node").alias("t")), "t")
        deg = e_alive.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
        alive = deg.filter(F.col("d") >= k).select(F.col("s").alias("node"))
    return nodes.join(
        alive.withColumn("_in", F.lit(1)), "node", "left"
    ).select("node", F.coalesce("_in", F.lit(0)).cast("long").alias("in_core"))
