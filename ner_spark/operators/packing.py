"""Training-batch shaping ops: sequence packing and domain mixing.

Sequence packing = the GPT-style "concatenate and chunk" layout: all
documents in a deterministic order are conceptually concatenated into
one token stream, then cut into fixed-size context windows. For each
document this is pure running-sum arithmetic — no token is ever
materialized, no UDF:

    start_offset = cumulative tokens before the doc
    first_chunk  = start_offset div chunk
    last_chunk   = (start_offset + n_tokens - 1) div chunk

The window is partitioned by a corpus partition column (`source`):
packing is independent per source shard, so the plan is one shuffle on
source + a within-partition sort — embarrassingly parallel across
shards at 100 TB, and the per-shard window never sees more rows than
the shard holds. (A single global ORDER BY would serialize; per-shard
packing is also what production pipelines do, since shards are the
unit of data loading.)

Domain mixing = per-domain sampling weights toward a target mixture
(uniform here): weight(d) = target_share / natural_share(d). One
groupBy + a broadcast one-row total — the classic "how much do I
upsample each domain" table that precedes every pretraining run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    n_tokens_col: str = "n_tokens",
    chunk: int = 256,
    part_col: str = "source",
    order_col: str = "doc_id",
) -> DataFrame:
    """(doc id, shard, n_tokens, start_offset, first_chunk, last_chunk,
    n_chunks_spanned, is_split) per document (empty docs excluded —
    they occupy no tokens in the stream)."""
    d = docs.filter(F.col(n_tokens_col) > 0)
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    end = F.sum(n_tokens_col).over(w)
    out = d.select(
        order_col,
        part_col,
        F.col(n_tokens_col).cast("long").alias("n_tokens"),
        (end - F.col(n_tokens_col)).cast("long").alias("start_offset"),
    )
    # integer `div`, not float `/`: exact at any offset magnitude
    first_chunk = F.expr(f"start_offset div {int(chunk)}")
    last_chunk = F.expr(f"(start_offset + n_tokens - 1) div {int(chunk)}")
    return out.select(
        order_col,
        part_col,
        "n_tokens",
        "start_offset",
        first_chunk.alias("first_chunk"),
        last_chunk.alias("last_chunk"),
        (last_chunk - first_chunk + 1).alias("n_chunks_spanned"),
        (last_chunk > first_chunk).alias("is_split"),
    )


def domain_mix_weights(
    docs: DataFrame,
    domain_col: str = "source",
    n_tokens_col: str = "n_tokens",
) -> DataFrame:
    """(domain, n_docs, n_tokens, natural_share_e6, weight_e6) —
    weight = uniform target share / natural token share, e6-quantized
    so the driver's exact value hash is stable across engines."""
    per = docs.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tokens_col).cast("long").alias("n_tokens"),
    )
    tot = per.agg(
        F.sum("n_tokens").alias("_total"),
        F.count(F.lit(1)).alias("_n_domains"),
    )
    share = F.col("n_tokens") / F.col("_total")
    target = 1.0 / F.col("_n_domains")
    return per.crossJoin(F.broadcast(tot)).select(
        F.col(domain_col).alias("domain"),
        "n_docs",
        "n_tokens",
        F.round(share * 1_000_000, 0).cast("long").alias("natural_share_e6"),
        F.round(target / share * 1_000_000, 0).cast("long").alias("weight_e6"),
    )
