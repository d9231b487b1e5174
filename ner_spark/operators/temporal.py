"""Temporal joins Spark lacks natively — as-of join and bounded range
join — as compositions of built-in operators (the brief's "custom
operators" clause: composition first, UDFs never needed here).

As-of join (backward): for each left row, the single latest right row
with ``right.ts <= left.ts`` on the same key, optionally within a
tolerance. The classic distributed plan is ONE union + ONE window:

    union(left tagged 1, right tagged 0)
      -> window per key ordered by (ts, side, tiebreak)
      -> last(right payload, ignorenulls) carries the most recent
         right row forward onto every left row
      -> filter side = 1

One shuffle on the key, one sort within partitions — same cost as a
regular sort-merge join, no per-row Python, no driver loop. Ties
(right.ts == left.ts) match because right rows sort BEFORE left rows
at equal ts; among equal-ts right rows the max tiebreak wins, making
the result deterministic at any parallelism.

Range join: all (left, right) pairs on the same key within ±window
seconds. The naive plan is an inequality join (cross product per key);
the scale-safe plan buckets time at the window width and joins on
(key, bucket) with the right side exploded to {b-1, b, b+1} — every
qualifying pair meets in exactly one bucket (the left row's), so no
distinct is needed, and the join is a plain equi-join AQE can split
on skew.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def micros(col) -> F.Column:
    """Epoch microseconds as an exact long. `unix_micros` rejects
    TIMESTAMP_NTZ, so cast first — the session pins UTC, making the
    NTZ->instant interpretation the identity (and in any gap
    subtraction the offset cancels regardless)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    right_cols: Sequence[str] = (),
    tiebreak: str | None = None,
    tolerance_sec: int | None = None,
) -> DataFrame:
    """Backward as-of join: left rows + the latest right row at or
    before each left ts (same key), payload columns prefixed ``asof_``.

    `tiebreak` orders equal-ts right rows (max wins); required for a
    deterministic result when right can carry duplicate timestamps.
    With `tolerance_sec`, matches older than the tolerance are nulled
    out (the match columns stay null, the left row survives).
    """
    payload = list(right_cols)
    r = right.select(
        key,
        ts,
        F.col(ts).alias("_asof_ts"),
        *[F.col(c).alias(f"asof_{c}") for c in payload],
    ).withColumn("_side", F.lit(0))
    if tiebreak is not None:
        r = r.withColumn("_tie", F.col(f"asof_{tiebreak}") if tiebreak in payload else F.col(tiebreak))
    l = left.withColumn("_side", F.lit(1))
    if tiebreak is not None:
        l = l.withColumn("_tie", F.lit(None).cast(r.schema["_tie"].dataType))

    merged = l.unionByName(r, allowMissingColumns=True)
    order = [F.col(ts).asc(), F.col("_side").asc()]
    if tiebreak is not None:
        order.append(F.col("_tie").asc_nulls_first())
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fill_cols = ["_asof_ts"] + [f"asof_{c}" for c in payload]
    for c in fill_cols:
        merged = merged.withColumn(c, F.last(c, ignorenulls=True).over(w))
    out = merged.filter(F.col("_side") == 1).drop("_side", "_tie")

    if tolerance_sec is not None:
        in_tol = F.col("_asof_ts") >= F.col(ts) - F.expr(
            f"INTERVAL {int(tolerance_sec)} SECONDS"
        )
        for c in fill_cols:
            out = out.withColumn(c, F.when(in_tol, F.col(c)))
    return out.withColumnRenamed("_asof_ts", "asof_ts")


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    window_sec: int = 1800,
    left_cols: Sequence[str] = (),
    right_cols: Sequence[str] = (),
) -> DataFrame:
    """All (left, right) pairs on `key` with |left.ts - right.ts| <=
    window_sec, via bucket-and-expand (see module docstring).

    Output: key, left payload as-is, right payload prefixed ``r_``,
    plus gap_us = left.ts - right.ts in MICROSECONDS (signed). The gap
    and the window predicate are exact long arithmetic on unix_micros —
    no second-truncation, so sub-second timestamps compare identically
    on any engine (DuckDB epoch_us mirrors it bit-for-bit).
    """
    bucket = lambda c: F.floor(F.unix_timestamp(c) / window_sec)  # noqa: E731
    l = left.select(
        key, F.col(ts).alias("_lts"), *left_cols
    ).withColumn("_b", bucket(F.col("_lts")))
    r = right.select(
        key,
        F.col(ts).alias("_rts"),
        *[F.col(c).alias(f"r_{c}") for c in right_cols],
    ).withColumn("_b", F.explode(F.array(*[bucket(F.col("_rts")) + d for d in (-1, 0, 1)])))
    gap = micros("_lts") - micros("_rts")
    return (
        l.join(r, [key, "_b"])
        .filter(F.abs(gap) <= window_sec * 1_000_000)
        .drop("_b")
        .withColumn("gap_us", gap.cast("long"))
        .withColumnRenamed("_lts", f"l_{ts}")
        .withColumnRenamed("_rts", f"r_{ts}")
    )
