"""Data-selection operators: DSIR-style hashed importance weights.

DSIR (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling") scores every raw document by how much more
likely its hashed n-gram features are under a small TARGET corpus than
under the RAW corpus, then keeps the top-weighted docs. The whole
method is two aggregations over a fixed feature space:

  bucket(tok)  = md5(tok) mod n_buckets          (feature hashing)
  w(bucket)    = ln p_target(bucket) - ln p_raw(bucket)   (+1 smoothing)
  weight(doc)  = sum over the doc's tokens of w(bucket(tok))

Scale shape: the bucket-count state is `n_buckets` rows total (1024
here) regardless of corpus size — one groupBy with map-side partials —
and scoring is a broadcast join of that tiny table against the token
stream. Two content scans, nothing else. Per-token weights are
e6-quantized to BIGINT *before* the per-doc sum so the sum is exact
integer arithmetic (order-independent across engines and partitions).

The reference has no data selection; this is the corpus-level analog
of its frequency-ordered vocab pruning (my_ner.py build_map min-count
semantics) done distributionally instead of per-token.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ner_spark.functions.vectors import dot, norm

N_BUCKETS = 1024


def dsir_bucket(tok: Column, n_buckets: int = N_BUCKETS) -> Column:
    """Feature-hash a token into [0, n_buckets): first 3 md5 hex chars
    as an integer, mod n_buckets — bit-identical in DuckDB."""
    return F.conv(F.substring(F.md5(tok), 1, 3), 16, 10).cast("long") % n_buckets


def dsir_logweights(
    token_stream: DataFrame,
    is_target: Column,
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """(doc_id, n_tokens, logweight_e6) from a (doc_id, tok) stream.

    `is_target` marks the rows belonging to the target distribution
    (e.g. lang == 'en'). Both distributions are counted in ONE pass
    (count + conditional count per bucket); totals ride along as
    broadcast one-row crossJoins — no driver collect().
    """
    b = token_stream.select(
        "doc_id",
        dsir_bucket(F.col("tok"), n_buckets).alias("bucket"),
        is_target.alias("_t"),
    )
    counts = b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("r_cnt"),
        F.sum(F.when(F.col("_t"), 1).otherwise(0)).alias("t_cnt"),
    )
    totals = counts.agg(
        F.sum("r_cnt").alias("_R"), F.sum("t_cnt").alias("_T")
    )
    nb = float(n_buckets)
    weights = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.round(
                (
                    F.log((F.col("t_cnt") + 1) / (F.col("_T") + F.lit(nb)))
                    - F.log((F.col("r_cnt") + 1) / (F.col("_R") + F.lit(nb)))
                )
                * 1e6
            )
            .cast("long")
            .alias("w_e6"),
        )
    )
    return (
        b.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("w_e6").alias("logweight_e6"),
        )
    )


def semdedup(
    corpus: DataFrame,
    k: int = 8,
    tau: float = 0.7,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): (id, cluster_id, kept) — semantic
    dedup over an embedding column. Cluster with the exact-integer
    k-means assignment (similarity.kmeans_assign, argmin bit-identical
    across engines), then within each cluster drop every vector that
    has an EARLIER member (smaller id) with cosine >= tau; the earliest
    member of each semantic near-dup group survives.

    Scale shape: the pairwise stage is confined within clusters — at
    100 TB, k scales with n (k ~ n / target_cluster_size, the paper
    uses ~0.1% of n) so per-cluster candidate sets stay bounded and the
    self-join key (cluster_id) has high cardinality, not 8 hot keys.
    Norms are computed once per row, not per pair; cosine is the
    sequential float64 fold that matches DuckDB's list_dot_product
    bit-for-bit, rounded e6 before the threshold on both engines.
    """
    from ner_spark.operators.similarity import kmeans_assign

    assigned = kmeans_assign(corpus, k, scale, id_col, vec_col).select(
        F.col("_id").alias(id_col), F.col("cid").alias("cluster_id")
    )
    m = assigned.join(
        corpus.select(id_col, vec_col), id_col
    ).select(
        id_col,
        "cluster_id",
        F.col(vec_col).cast("array<double>").alias("_dv"),
        norm(vec_col).alias("_nrm"),
    # both self-join sides and the keep-list anti-join consume `m`;
    # unpinned, each branch replays the k-means assignment lineage
    # (Lloyd rounds included) — pin the assignment+vector frame once
    ).localCheckpoint(eager=True)
    a = m.select(
        F.col(id_col).alias("_ida"), "cluster_id",
        F.col("_dv").alias("_va"), F.col("_nrm").alias("_na"),
    )
    b = m.select(
        F.col(id_col).alias("_idb"), "cluster_id",
        F.col("_dv").alias("_vb"), F.col("_nrm").alias("_nb"),
    )
    sim = F.round(
        dot(F.col("_va"), F.col("_vb"))
        / F.greatest(F.col("_na") * F.col("_nb"), F.lit(1e-12)),
        6,
    )
    dropped = (
        a.join(b, "cluster_id")
        .where(F.col("_ida") < F.col("_idb"))
        .select(F.col("_idb").alias(id_col), sim.alias("_sim"))
        .where(F.col("_sim") >= tau)
        .select(id_col)
        .distinct()
        .withColumn("_drop", F.lit(True))
    )
    return (
        m.select(id_col, "cluster_id")
        .join(dropped, id_col, "left")
        .select(
            id_col,
            "cluster_id",
            F.coalesce(~F.col("_drop"), F.lit(True)).alias("kept"),
        )
    )
