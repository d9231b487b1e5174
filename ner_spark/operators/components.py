"""Connected components as iterative DataFrame joins — the
canonicalization backbone (north_star: "canonicalize mentions via
GraphFrames-style connected components over a salted similarity
join"), with no GraphFrames dependency.

Algorithm: min-label propagation (hash-min). Each node starts with
label = itself; every round each node takes the min of its own label
and its neighbors' labels; fixpoint when no label changes. Rounds are
O(graph diameter); alias/near-dup graphs are shallow (stars and short
chains), so 3-5 rounds in practice.

Scale notes:
  - every round is one shuffle on `node` (the groupBy-min); AQE
    coalesces the small tail.
  - `localCheckpoint(eager=True)` truncates the lineage each round —
    without it the plan doubles per iteration and the driver OOMs
    planning round ~15 (the Spark analog of the reference's
    checkpoint-every-5-epochs, my_ner.py:1604-1605).
  - labels are the *node keys themselves* (content-derived strings or
    stable ids), never monotonically_increasing_id, so component ids
    are identical at any parallelism (SURVEY §4 determinism rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    nodes: DataFrame | None = None,
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) — component = min node key reachable.

    `edges` is undirected input (one row per edge, either direction).
    Optional `nodes` (single column named like src_col) adds isolated
    nodes, which come back as their own singleton components.
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .unionByName(
            edges.select(
                F.col(dst_col).alias("src"), F.col(src_col).alias("dst")
            )
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    labels = e.select(F.col("src").alias("node")).distinct()
    if nodes is not None:
        labels = labels.unionByName(
            nodes.select(F.col(nodes.columns[0]).alias("node"))
        ).distinct()
    labels = labels.withColumn("label", F.col("node")).localCheckpoint(eager=True)

    for _ in range(max_iter):
        nbr_min = (
            e.join(
                labels.select(
                    F.col("node").alias("src"), F.col("label").alias("src_label")
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("src_label").alias("nbr_label"))
        )
        updated = labels.join(nbr_min, "node", "left").select(
            "node",
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
            ).alias("label"),
        )
        updated = updated.localCheckpoint(eager=True)
        changed = (
            updated.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = updated
        if changed == 0:
            break

    return labels.select("node", F.col("label").alias("component"))


def canonicalize_aliases(
    gazetteer: DataFrame,
    min_sim: float = 0.5,
    n: int = 3,
    max_gram_df: int | None = 256,
) -> DataFrame:
    """Canonical alias groups: CC over the alias char-ngram similarity
    self-join. Returns (alias, canonical) where canonical = the
    lexicographically smallest alias in the component.

    The self-join is blocked on shared n-grams with stop-grams above
    `max_gram_df` dropped (linking.blocking_grams): a hot gram ('ing')
    at millions of aliases otherwise makes ONE join key quadratic —
    the exact skew AQE splitting cannot fix, because the blowup is the
    candidate count itself, not task imbalance. Jaccard still scores
    FULL gram sets.
    """
    from ner_spark.operators.linking import blocking_grams, char_ngrams, ngram_jaccard

    g = gazetteer.select("alias").distinct().select(
        "alias", char_ngrams("alias", n).alias("grams")
    )
    bg = blocking_grams(g, "alias", "grams", max_gram_df)
    blocked = (
        bg.select(F.col("alias").alias("a"), F.col("gram").alias("gram"))
        .join(bg.select(F.col("alias").alias("b"), F.col("gram").alias("gram")), "gram")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
        .join(g.select(F.col("alias").alias("a"), F.col("grams").alias("ga")), "a")
        .join(g.select(F.col("alias").alias("b"), F.col("grams").alias("gb")), "b")
    )
    edges = blocked.select(
        F.col("a").alias("src"),
        F.col("b").alias("dst"),
        ngram_jaccard(F.col("ga"), F.col("gb")).alias("sim"),
    ).filter(F.col("sim") >= min_sim)

    cc = connected_components(
        edges, nodes=gazetteer.select("alias").distinct()
    )
    return cc.select(F.col("node").alias("alias"), F.col("component").alias("canonical"))
