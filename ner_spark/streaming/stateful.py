"""Custom stateful streaming operators via applyInPandasWithState —
the engine's arbitrary-state path (the brief's
"applyInPandasWithState for custom stateful operators").

`streaming_dedupe`: exactly-once emission per key across micro-batches.
State per key = count of occurrences seen; only a key's first arrival
is emitted. This is the streaming counterpart of the batch
`exact_dedup` query — the operator a continuous ingestion pipeline
uses to drop re-crawled/re-delivered payloads before they reach
training storage.

Scale shape: state lives in the state store partitioned by key (same
hash partitioning as a batch groupBy); an idle-timeout variant would
bound state for unbounded key spaces (fingerprints seen once and never
again) — kept NoTimeout here because the parity test drains a finite
backlog.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedupe(
    stream: DataFrame,
    key_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """Emit only the first-seen row per `key_col` across the stream.

    Output schema: (key_col, *payload_cols, n_duplicates_so_far) where
    the duplicate count at emission time is always 0 (first arrival) —
    the column documents the state contract and simplifies debugging
    when the operator is extended to late re-emission.
    """
    out_fields = [f"{key_col} string"] + [f"{c} string" for c in payload_cols] + [
        "n_duplicates_so_far bigint"
    ]
    out_schema = ", ".join(out_fields)
    state_schema = "seen bigint"

    def fn(
        key: tuple[Any, ...],
        batches: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        seen = state.get[0] if state.exists else 0
        first_row = None
        n_new = 0
        for pdf in batches:
            if seen == 0 and first_row is None and len(pdf) > 0:
                first_row = pdf.iloc[0]
            n_new += len(pdf)
        state.update((seen + n_new,))
        if seen == 0 and first_row is not None:
            out = {key_col: [str(key[0])]}
            for c in payload_cols:
                out[c] = [str(first_row[c])]
            out["n_duplicates_so_far"] = [0]
            yield pd.DataFrame(out)

    return (
        stream.selectExpr(f"cast({key_col} as string) as {key_col}", *payload_cols)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_append_available_now(
    stream_df: DataFrame, query_name: str, checkpoint_dir: str, timeout_s: int = 300
) -> None:
    """Drain the backlog through an append-mode memory sink."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    q.stop()
