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
