"""Similarity search over an embedding column (array<float>).

Two physical strategies:

1. ``brute_force_topk`` — broadcast the (small) query set against the
   full corpus, score with native float64 fold expressions
   (functions/vectors.py), rank with a per-query window. Exact; the
   oracle-checkable baseline. At 100 TB this is the pattern for "score
   every row against K query centroids" (K small, broadcast).

2. ``lsh_topk`` — random-hyperplane sign-LSH: a seeded numpy matrix of
   hyperplanes is broadcast; a vectorized pandas UDF computes each
   vector's bucket signature with one matmul per Arrow batch; top-k
   runs *within* bucket joins only. Approximate; the scale path when
   the query set is also huge. Deterministic given (seed, n_planes) —
   but not ANSI-SQL-expressible, so its driver check is rows-only.

Both rank by (rounded cosine desc, candidate id) so results are
partitioning- and engine-stable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ner_spark.functions.vectors import cosine

ROUND = 6


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cosine_sim, rank).

    `queries` must be small (broadcast). Self-matches are excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), ROUND).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# sign-LSH (random hyperplanes)
# ---------------------------------------------------------------------------

_SIG_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("table", T.IntegerType(), False),
        T.StructField("bucket", T.LongType(), False),
    ]
)


def lsh_buckets(
    vectors: DataFrame,
    dim: int | None = None,
    n_planes: int = 8,
    n_tables: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, table, bucket): sign pattern under `n_planes` seeded
    hyperplanes, independently for `n_tables` tables (OR-construction —
    a close pair is a candidate if it shares a bucket in ANY table,
    which is what keeps recall high for near-parallel vectors that one
    unlucky hyperplane would split).

    One numpy matmul per Arrow batch — the vectorized scale path; the
    hyperplane tensor is regenerated per worker from the seed (tiny),
    so nothing non-deterministic is shipped. `dim` may be omitted: it
    is read from the first vector of the first Arrow batch on each
    worker (every worker derives the SAME planes from (seed, dim), so
    no driver-side `.first()` action is needed in the query path).
    """
    def run(batches):
        planes = None
        weights = 1 << np.arange(n_planes, dtype=np.int64)
        for pdf in batches:
            mat = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            if len(mat) == 0:
                yield pd.DataFrame({"vec_id": [], "table": [], "bucket": []})
                continue
            if planes is None:
                d = dim if dim is not None else mat.shape[1]
                planes = np.random.default_rng(seed).standard_normal(
                    (n_tables, d, n_planes)
                )
            ids = pdf[id_col].astype("int64").to_numpy()
            frames = []
            for t in range(n_tables):
                signs = (mat @ planes[t]) > 0
                frames.append(
                    pd.DataFrame(
                        {"vec_id": ids, "table": t, "bucket": signs @ weights}
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    return vectors.select(F.col(id_col), F.col(vec_col)).mapInPandas(run, _SIG_SCHEMA)


def _bucketed_pairs(
    corpus: DataFrame,
    dim: int | None,
    n_planes: int,
    n_tables: int,
    seed: int,
    id_col: str,
    vec_col: str,
    pair_filter,
) -> DataFrame:
    """Distinct candidate pairs sharing a (table, bucket), scored with
    exact cosine. Shuffle key is (table, bucket) — 2^n_planes * n_tables
    keys spread the self-join; AQE splits a hot bucket."""
    b = lsh_buckets(corpus, dim, n_planes, n_tables, seed, id_col, vec_col)
    a, c = b.alias("a"), b.alias("c")
    cand = (
        a.join(
            c,
            (F.col("a.table") == F.col("c.table"))
            & (F.col("a.bucket") == F.col("c.bucket"))
            & pair_filter(F.col("a.vec_id"), F.col("c.vec_id")),
        )
        .select(F.col("a.vec_id").alias("qid"), F.col("c.vec_id").alias("cid"))
        .distinct()
    )
    vecs = corpus.select(F.col(id_col).alias("_vid"), F.col(vec_col).alias("_vec"))
    return (
        cand.join(vecs.withColumnRenamed("_vid", "qid").withColumnRenamed("_vec", "q_vec"), "qid")
        .join(vecs.withColumnRenamed("_vid", "cid").withColumnRenamed("_vec", "c_vec"), "cid")
        .select(
            "qid",
            "cid",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), ROUND).alias("cosine_sim"),
        )
    )


def lsh_topk(
    corpus: DataFrame,
    dim: int | None = None,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate all-pairs top-k: candidates restricted to shared
    LSH buckets (any table) — the O(n^2 / buckets) ANN shape."""
    scored = _bucketed_pairs(
        corpus, dim, n_planes, n_tables, seed, id_col, vec_col,
        lambda a, b: a != b,
    ).select(
        F.col("qid").alias("query_id"),
        F.col("cid").alias("neighbor_id"),
        "cosine_sim",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def exact_near_pairs(
    corpus: DataFrame,
    threshold: float = 0.35,
    n_blocks: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rows_per_block: int = 8192,
) -> DataFrame:
    """All (id_a < id_b) pairs with cosine >= threshold — exact.

    Weak-threshold near-pair search is the regime where LSH stops
    helping: at cos ~0.35 the collision probabilities of similar and
    dissimilar pairs nearly coincide (LSH exponent rho -> 1), so any
    bucketed plan degenerates to all-pairs WITH the hashing, distinct
    and re-join overhead stacked on top (round 2 measured the
    3-plane/12-table LSH at 8.3 s, and a naive codegen-fold cross join
    at 42 s). O(n^2) *work* is inherent to the semantics here; what is
    NOT inherent is doing it slowly or unscalably:

    filter — deterministic block tiling (block = vec_id % n_blocks;
      each unordered pair lands in exactly one of the B(B+1)/2 tiles),
      one Arrow-batched GEMM per tile (numpy float64, ~100x the fold's
      throughput). No driver collect, no broadcast of a full side: a
      tile holds 2n/B vectors, so memory per task is bounded. B is
      DERIVED from the corpus size when not supplied —
      B = max(16, ceil(n / rows_per_block)) via one count() — so a
      block row (one collect_list of n/B vectors) stays ~rows_per_block
      vectors (8192 x dim-768 float64 ~= 50 MB), far from the 2 GB
      array/Arrow ceiling at ANY n; pass n_blocks explicitly to skip
      the count when n is already known.
    verify — survivors (a ~1e-4 fraction at the p99.9 threshold) are
      re-scored with the sequential float64 fold, which matches
      DuckDB's list_dot_product bit-for-bit — the GEMM's summation
      order never touches the reported value, it only prunes, with a
      2e-6 margin (>> 1e-12 float divergence) so it cannot drop a true
      pair.

    The sublinear paths for thresholds where pruning IS possible are
    embedding_near_dups (sign-LSH, >= 0.9) and ivf_topk (IVF).
    """
    import math

    import numpy as np
    import pandas as pd

    if n_blocks is None:
        n_blocks = max(16, math.ceil(corpus.count() / rows_per_block))

    margin = 2.0 / (10**ROUND)
    v = corpus.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
        F.pmod(F.col(id_col), F.lit(n_blocks)).cast("int").alias("_blk"),
    )
    blocks = v.groupBy("_blk").agg(F.collect_list(F.struct("_id", "_v")).alias("_rows"))
    tiles = (
        blocks.select(F.col("_blk").alias("blk_a"), F.col("_rows").alias("rows_a"))
        .join(
            blocks.select(F.col("_blk").alias("blk_b"), F.col("_rows").alias("rows_b")),
            F.col("blk_a") <= F.col("blk_b"),
        )
        .repartition(n_blocks * (n_blocks + 1) // 2)
    )

    def score(batches):
        for pdf in batches:
            outs_a, outs_b = [], []
            for rows_a, rows_b, same in zip(
                pdf["rows_a"], pdf["rows_b"], pdf["blk_a"] == pdf["blk_b"]
            ):
                ids_a = np.array([r["_id"] for r in rows_a], dtype=np.int64)
                A = np.array([r["_v"] for r in rows_a], dtype=np.float64)
                ids_b = np.array([r["_id"] for r in rows_b], dtype=np.int64)
                B = np.array([r["_v"] for r in rows_b], dtype=np.float64)
                na = np.maximum(np.linalg.norm(A, axis=1), 1e-12)
                nb = np.maximum(np.linalg.norm(B, axis=1), 1e-12)
                sims = (A @ B.T) / np.outer(na, nb)
                ia, ib = np.nonzero(sims >= threshold - margin)
                if same:
                    keep = ia < ib  # each unordered pair once, no self-pairs
                    ia, ib = ia[keep], ib[keep]
                ga, gb = ids_a[ia], ids_b[ib]
                outs_a.append(np.minimum(ga, gb))
                outs_b.append(np.maximum(ga, gb))
            yield pd.DataFrame(
                {
                    "id_a": np.concatenate(outs_a) if outs_a else np.array([], dtype=np.int64),
                    "id_b": np.concatenate(outs_b) if outs_b else np.array([], dtype=np.int64),
                }
            )

    cand = tiles.mapInPandas(score, "id_a bigint, id_b bigint")
    vecs = corpus.select(F.col(id_col).alias("_vid"), F.col(vec_col).alias("_vec"))
    return (
        cand.join(
            vecs.select(F.col("_vid").alias("id_a"), F.col("_vec").alias("_va")), "id_a"
        )
        .join(vecs.select(F.col("_vid").alias("id_b"), F.col("_vec").alias("_vb")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("_va"), F.col("_vb")), ROUND).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def exact_eps_pairs(
    corpus: DataFrame,
    eps2: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quant: float = 1000.0,
    n_blocks: int | None = None,
    rows_per_block: int = 8192,
) -> DataFrame:
    """All (id_a < id_b) pairs with EXACT integer squared distance
    <= eps2 over floor(v * quant) vectors — the epsilon-ball edge
    builder behind DBSCAN-style density queries and clique mining.

    Same deterministic block tiling as exact_near_pairs (every
    unordered pair lands in exactly one tile; B derived from the
    corpus size so a tile stays far from the Arrow 2 GB ceiling),
    but the tile kernel is INTEGER GEMM: components are e3-floored
    int64 (identical to the SQL floor(x*1000) both engines run), and
    d2 = |a|^2 + |b|^2 - 2 a.b in int64 is EXACT (|component| <=
    ~quant * |x|, dot <= dims * quant^2 * max|x|^2 — orders of
    magnitude inside int64), so unlike the cosine kernel there is no
    float pruning margin and no re-verify pass: the emitted (id_a,
    id_b, d2) rows are bit-identical to the per-row zip_with fold,
    ~100x faster. Output: id_a, id_b, d2 (BIGINT)."""
    import math

    import numpy as np
    import pandas as pd

    if n_blocks is None:
        n_blocks = max(16, math.ceil(corpus.count() / rows_per_block))

    v = corpus.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
        F.pmod(F.col(id_col), F.lit(n_blocks)).cast("int").alias("_blk"),
    )
    blocks = v.groupBy("_blk").agg(F.collect_list(F.struct("_id", "_v")).alias("_rows"))
    tiles = (
        blocks.select(F.col("_blk").alias("blk_a"), F.col("_rows").alias("rows_a"))
        .join(
            blocks.select(F.col("_blk").alias("blk_b"), F.col("_rows").alias("rows_b")),
            F.col("blk_a") <= F.col("blk_b"),
        )
        .repartition(n_blocks * (n_blocks + 1) // 2)
    )
    q = float(quant)
    e2 = int(eps2)

    def score(batches):
        for pdf in batches:
            oa, ob, od = [], [], []
            for rows_a, rows_b, same in zip(
                pdf["rows_a"], pdf["rows_b"], pdf["blk_a"] == pdf["blk_b"]
            ):
                ids_a = np.array([r["_id"] for r in rows_a], dtype=np.int64)
                A = np.floor(
                    np.array([r["_v"] for r in rows_a], dtype=np.float64) * q
                ).astype(np.int64)
                ids_b = np.array([r["_id"] for r in rows_b], dtype=np.int64)
                B = np.floor(
                    np.array([r["_v"] for r in rows_b], dtype=np.float64) * q
                ).astype(np.int64)
                a2 = (A * A).sum(axis=1)
                b2 = (B * B).sum(axis=1)
                d2 = a2[:, None] + b2[None, :] - 2 * (A @ B.T)
                ia, ib = np.nonzero(d2 <= e2)
                ga, gb = ids_a[ia], ids_b[ib]
                keep = ga != gb
                if same:
                    keep = ga < gb  # each unordered pair once
                ia, ib, ga, gb = ia[keep], ib[keep], ga[keep], gb[keep]
                lo, hi = np.minimum(ga, gb), np.maximum(ga, gb)
                oa.append(lo)
                ob.append(hi)
                od.append(d2[ia, ib])
            empty = np.array([], dtype=np.int64)
            yield pd.DataFrame(
                {
                    "id_a": np.concatenate(oa) if oa else empty,
                    "id_b": np.concatenate(ob) if ob else empty,
                    "d2": np.concatenate(od) if od else empty,
                }
            )

    return tiles.mapInPandas(score, "id_a bigint, id_b bigint, d2 bigint")


def pairwise_label_moments(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    quant: float = 1000.0,
    n_blocks: int | None = None,
    rows_per_block: int = 8192,
) -> DataFrame:
    """Per-(point, other-point's-label) EXACT distance moments:
    (id, olabel, sum_d2, cnt) over all ordered pairs id != other —
    the reduction silhouette/medoid quality metrics need, computed
    as tiled integer GEMM instead of an O(n^2) interpreted HOF join.

    Same tiling and int64 exactness as exact_eps_pairs; each tile
    emits PARTIAL sums grouped by the other side's label (tile
    output is rows x labels, not rows x rows), and a final
    (id, olabel) groupBy folds tiles — so the full n^2 distance
    matrix never materializes anywhere. Off-diagonal tiles
    contribute in BOTH directions; the diagonal tile excludes
    self-pairs. Integer sums commute, so the result is bit-identical
    to the per-row fold at any tiling."""
    import math

    import numpy as np
    import pandas as pd

    if n_blocks is None:
        n_blocks = max(16, math.ceil(corpus.count() / rows_per_block))

    v = corpus.select(
        F.col(id_col).alias("_id"),
        F.col(label_col).cast("long").alias("_lbl"),
        F.col(vec_col).cast("array<double>").alias("_v"),
        F.pmod(F.col(id_col), F.lit(n_blocks)).cast("int").alias("_blk"),
    )
    blocks = v.groupBy("_blk").agg(
        F.collect_list(F.struct("_id", "_lbl", "_v")).alias("_rows")
    )
    tiles = (
        blocks.select(F.col("_blk").alias("blk_a"), F.col("_rows").alias("rows_a"))
        .join(
            blocks.select(F.col("_blk").alias("blk_b"), F.col("_rows").alias("rows_b")),
            F.col("blk_a") <= F.col("blk_b"),
        )
        .repartition(n_blocks * (n_blocks + 1) // 2)
    )
    q = float(quant)

    def score(batches):
        for pdf in batches:
            out_id, out_lbl, out_s, out_c = [], [], [], []

            def unpack(rows):
                ids = np.array([r["_id"] for r in rows], dtype=np.int64)
                lbl = np.array([r["_lbl"] for r in rows], dtype=np.int64)
                M = np.floor(
                    np.array([r["_v"] for r in rows], dtype=np.float64) * q
                ).astype(np.int64)
                return ids, lbl, M

            def emit(ids, olbl, d2, self_mask=None):
                # d2: rows(ids) x cols(olbl); sum/count per (id, olabel)
                if self_mask is not None:
                    d2 = d2.copy()
                    d2[self_mask] = 0
                for lab in np.unique(olbl):
                    cols = olbl == lab
                    s = d2[:, cols].sum(axis=1)
                    c = np.full(len(ids), int(cols.sum()), dtype=np.int64)
                    if self_mask is not None:
                        self_in_lab = self_mask[:, cols].any(axis=1)
                        c = c - self_in_lab.astype(np.int64)
                    out_id.append(ids)
                    out_lbl.append(np.full(len(ids), lab, dtype=np.int64))
                    out_s.append(s)
                    out_c.append(c)

            for rows_a, rows_b, same in zip(
                pdf["rows_a"], pdf["rows_b"], pdf["blk_a"] == pdf["blk_b"]
            ):
                ia, la, A = unpack(rows_a)
                ib, lb, B = unpack(rows_b)
                a2 = (A * A).sum(axis=1)
                b2 = (B * B).sum(axis=1)
                d2 = a2[:, None] + b2[None, :] - 2 * (A @ B.T)
                if same:
                    emit(ia, lb, d2, self_mask=ia[:, None] == ib[None, :])
                else:
                    emit(ia, lb, d2)
                    emit(ib, la, d2.T)
            empty = np.array([], dtype=np.int64)
            yield pd.DataFrame(
                {
                    "vec_id": np.concatenate(out_id) if out_id else empty,
                    "olabel": np.concatenate(out_lbl) if out_lbl else empty,
                    "s_d2": np.concatenate(out_s) if out_s else empty,
                    "c_n": np.concatenate(out_c) if out_c else empty,
                }
            )

    part = tiles.mapInPandas(
        score, "vec_id bigint, olabel bigint, s_d2 bigint, c_n bigint"
    )
    return (
        part.groupBy("vec_id", "olabel")
        .agg(F.sum("s_d2").alias("sum_d2"), F.sum("c_n").alias("cnt"))
        .filter(F.col("cnt") > 0)
    )


def embedding_near_dups(
    corpus: DataFrame,
    dim: int | None = None,
    threshold: float = 0.95,
    n_planes: int = 6,
    n_tables: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, cosine_sim) pairs with cosine >= threshold,
    LSH-bucketed so only same-bucket pairs are scored."""
    return (
        _bucketed_pairs(
            corpus, dim, n_planes, n_tables, seed, id_col, vec_col,
            lambda a, b: a < b,
        )
        .select(
            F.col("qid").alias("id_a"),
            F.col("cid").alias("id_b"),
            "cosine_sim",
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def int_planes(dim: int, n_planes: int = 8, n_tables: int = 3) -> list[tuple[int, int, list[int]]]:
    """Deterministic integer hyperplanes for sign-LSH: component
    (t, p, d) = (first-8-hex of md5(f"plane:{t}:{p}:{d}") mod 2001)
    - 1000, i.e. a fixed pseudo-random integer in [-1000, 1000].
    Derived from md5 so ANY engine (including the DuckDB oracle, which
    embeds the same literals) reproduces the identical planes — and
    with e6-quantized vectors the plane dot products are EXACT 64-bit
    integers (|dot| <= dim * 1e6ish * 1000 << 2^63), so bucket
    assignment has no float sign ambiguity anywhere."""
    import hashlib

    out = []
    for t in range(n_tables):
        for p in range(n_planes):
            comps = [
                int(hashlib.md5(f"plane:{t}:{p}:{d}".encode()).hexdigest()[:8], 16)
                % 2001
                - 1000
                for d in range(dim)
            ]
            out.append((t, p, comps))
    return out


def lsh_buckets_int(
    vectors: DataFrame,
    dim: int,
    n_planes: int = 8,
    n_tables: int = 3,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, table, bucket): EXACT-integer sign-LSH — quantize the
    vector to e6 longs, dot it against the deterministic integer
    hyperplanes (int_planes), bucket bit p = (dot > 0). Same
    OR-construction semantics as `lsh_buckets`, but every arithmetic
    step is integer, so the bucket table is bit-identical across
    engines and partitionings — which is what makes the whole ANN
    index ORACLE-CHECKABLE (lsh_buckets' numpy float matmul is the
    Arrow-batched alternative with the same asymptotics; sign(float
    dot) near 0 is engine-dependent, so it checks rows-only).

    Plan shape: planes broadcast (n_tables x n_planes rows), dot folds
    in codegen, one (vec, table) agg packs bits into the bucket key.
    """
    spark = vectors.sparkSession
    planes = spark.createDataFrame(
        int_planes(dim, n_planes, n_tables),
        "table int, plane int, comps array<long>",
    )
    q = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.expr(
            f"transform({vec_col},"
            f" x -> cast(round(cast(x as double) * {scale}) as bigint))"
        ).alias("_v"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("_v"), F.col("comps"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    bits = (
        q.crossJoin(F.broadcast(planes))
        .select("vec_id", "table", "plane", (dot > 0).cast("long").alias("bit"))
        .select(
            "vec_id", "table",
            F.expr("shiftleft(bit, plane)").cast("long").alias("bitval"),
        )
    )
    return bits.groupBy("vec_id", "table").agg(
        F.sum("bitval").alias("bucket")
    )


def lsh_topk_int(
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate all-pairs top-k over exact-integer LSH buckets:
    candidates = pairs sharing a (table, bucket) in ANY table, scored
    with the float64 cosine fold, ranked per query. Deterministic end
    to end — fully oracle-checked."""
    b = lsh_buckets_int(corpus, dim, n_planes, n_tables, id_col=id_col, vec_col=vec_col)
    a, c = b.alias("a"), b.alias("c")
    cand = (
        a.join(
            c,
            (F.col("a.table") == F.col("c.table"))
            & (F.col("a.bucket") == F.col("c.bucket"))
            & (F.col("a.vec_id") != F.col("c.vec_id")),
        )
        .select(F.col("a.vec_id").alias("query_id"), F.col("c.vec_id").alias("neighbor_id"))
        .distinct()
    )
    vecs = corpus.select(F.col(id_col).alias("_vid"), F.col(vec_col).alias("_vec"))
    scored = (
        cand.join(
            vecs.select(F.col("_vid").alias("query_id"), F.col("_vec").alias("q_vec")),
            "query_id",
        )
        .join(
            vecs.select(F.col("_vid").alias("neighbor_id"), F.col("_vec").alias("c_vec")),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), ROUND).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def kmeans_assign(
    corpus: DataFrame,
    k: int = 8,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    carry_vec: bool = False,
) -> DataFrame:
    """Exact-integer nearest-centroid assignment: (_id, cid[, _v]).

    Centroids = the k lowest-id vectors (deterministic seeding), both
    sides e6-quantized to BIGINT so argmin is exact; ties break on
    centroid id. Centroids broadcast (k rows), the distance fold runs
    in whole-stage codegen, argmin is a map-side-combinable min(struct)
    keyed by vector id. Shared by kmeans_iteration (the update step)
    and selection.semdedup (the cluster-then-prune step)."""
    q = corpus.select(
        F.col(id_col).alias("_id"),
        # explicit float->double BEFORE the multiply: float32*int stays
        # single-precision in some engines, flipping last-ulp rounds
        F.expr(
            f"transform({vec_col},"
            f" x -> cast(round(cast(x as double) * {scale}) as bigint))"
        ).alias("_v"),
    )
    cent = q.filter(F.col("_id") < k).select(
        F.col("_id").alias("cid"), F.col("_v").alias("cv")
    )
    dist = F.aggregate(
        F.zip_with(F.col("_v"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    fields = [dist.alias("dist"), F.col("cid")] + (
        [F.col("_v")] if carry_vec else []
    )
    best = (
        q.crossJoin(F.broadcast(cent))
        .select("_id", F.struct(*fields).alias("_s"))
        .groupBy("_id")
        .agg(F.min("_s").alias("b"))  # (dist, cid) unique per group -> _v inert
    )
    cols = [F.col("_id"), F.col("b.cid").alias("cid")] + (
        [F.col("b._v").alias("_v")] if carry_vec else []
    )
    return best.select(*cols)


def kmeans_iteration(
    corpus: DataFrame,
    k: int = 8,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One exact-integer Lloyd k-means step (assign + centroid update):
    (centroid_id, pos, val, n_members) — the recomputed centroid
    unrolled one row per dimension.

    The codebook-training half of the IVF index (ivf_assign/ivf_topk
    are the serve half). Everything is BIGINT so the result is
    bit-identical across engines, partitionings and summation orders —
    which is what makes a *training* step oracle-checkable:

      quantize   v_q[i]  = round(v[i] * scale)            (per row)
      assign     argmin_c sum_i (v_q[i] - c_q[i])^2       (exact longs;
                 ties break on centroid id)
      update     c'[i]   = sum(v_q[i]) div n_members      (`div` =
                 truncate-toward-zero, same as DuckDB `//`)

    Initial centroids are the k lowest-id vectors (deterministic
    seeding, same role as kmeans|| seeding on a real run). Physical
    shape: centroids broadcast (k rows), distance folds run inside
    whole-stage codegen, argmin is a map-side-combinable min(struct)
    agg keyed by vector id, and the update is one posexplode +
    groupBy(centroid, pos) — dims * k output rows. No driver action,
    no Python UDF. Overflow headroom: per-dim squared deltas are
    <= (2 * scale * |x|max)^2; at scale=1e6 and unit-norm-ish inputs a
    64-dim fold stays ~1e15 << 2^63, and the update sum holds ~9e12
    members per (centroid, dim) before overflow.
    """
    best = kmeans_assign(corpus, k, scale, id_col, vec_col, carry_vec=True).select(
        "cid", "_v"
    )
    return (
        best.select("cid", F.posexplode("_v").alias("pos", "comp"))
        .groupBy("cid", "pos")
        .agg(F.sum("comp").alias("_s"), F.count(F.lit(1)).alias("n_members"))
        .select(
            F.col("cid").alias("centroid_id"),
            F.col("pos").cast("long").alias("pos"),
            F.expr("_s div n_members").alias("val"),
            "n_members",
        )
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse quantizer -> inverted lists -> probe
# ---------------------------------------------------------------------------


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, list_id, rank): each vector's `nprobe` nearest coarse
    centroids by cosine (rank 1 = the vector's home inverted list).

    `centroids` must be small (broadcast): sqrt(n)-ish coarse codebook.
    Ties break on centroid id, so assignment is deterministic — which
    is what makes the whole IVF index oracle-checkable in SQL. Scoring
    runs in the same float64 fold as the ANN queries (vectors.cosine).
    """
    cent = centroids.select(
        F.col(id_col).alias("list_id"), F.col(vec_col).alias("cent_vec")
    )
    scored = corpus.select(F.col(id_col), F.col(vec_col)).crossJoin(
        F.broadcast(cent)
    ).select(
        id_col,
        "list_id",
        F.round(cosine(F.col(vec_col), F.col("cent_vec")), ROUND).alias("cent_sim"),
    )
    if nprobe == 1:
        # home-list assignment is an argmax, not a ranking: a hash agg
        # with map-side partial combine (each vector's n_lists candidate
        # rows collapse BEFORE the exchange) replaces the window's full
        # sort-by-(vec, sim) shuffle. Same deterministic order — min of
        # struct(-sim, list_id) == (sim desc, list_id asc).
        return (
            scored.groupBy(id_col)
            .agg(
                F.min(
                    F.struct(
                        (-F.col("cent_sim")).alias("neg_sim"),
                        F.col("list_id").alias("lid"),
                    )
                ).alias("m")
            )
            .select(
                id_col,
                F.col("m.lid").alias("list_id"),
                F.lit(1).cast("long").alias("rank"),
            )
        )
    w = Window.partitionBy(id_col).orderBy(F.col("cent_sim").desc(), F.col("list_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= nprobe)
        .select(id_col, "list_id", F.col("rank").cast("long").alias("rank"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF top-k: score each query only against vectors whose home
    list is among the query's `nprobe` nearest lists.

    The scale path of ANN search when sign-LSH recall is not enough:
    the corpus is scanned ONCE to build (vec_id, list_id) — at 100 TB
    that table is the index, persisted/bucketed by list_id — and every
    query touches nprobe/n_lists of the corpus instead of all of it.
    The join key is list_id (a few thousand keys at scale), so the
    probe is a plain shuffle-on-list join Catalyst can plan; a hot
    list (skewed cluster) is split by AQE. Here the coarse codebook is
    a deterministic corpus subset; on a real cluster you'd fit it with
    pyspark.ml KMeans — the index/probe plan is identical either way.
    Exactness caveat (same as any IVF): recall < 1 when a true
    neighbor's home list is outside the query's probed lists; the
    planted-cluster test pins sibling recall at 1.0 and overall
    top-3 recall >= 0.8 on the fixture.
    """
    home = ivf_assign(corpus, centroids, nprobe=1, id_col=id_col, vec_col=vec_col)
    probes = ivf_assign(queries, centroids, nprobe=nprobe, id_col=id_col, vec_col=vec_col)
    cand = (
        probes.select(F.col(id_col).alias("query_id"), "list_id")
        .join(
            home.select(F.col(id_col).alias("neighbor_id"), "list_id"),
            "list_id",
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    vecs = corpus.select(F.col(id_col).alias("_vid"), F.col(vec_col).alias("_vec"))
    qvecs = queries.select(F.col(id_col).alias("_vid"), F.col(vec_col).alias("_vec"))
    scored = (
        cand.join(
            F.broadcast(qvecs.withColumnRenamed("_vid", "query_id").withColumnRenamed("_vec", "q_vec")),
            "query_id",
        )
        .join(
            vecs.withColumnRenamed("_vid", "neighbor_id").withColumnRenamed("_vec", "c_vec"),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), ROUND).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", F.col("rank").cast("long").alias("rank"))
    )
