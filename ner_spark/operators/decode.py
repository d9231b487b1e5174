"""Sequence decode operators — the reference's scoring/decode core
(SURVEY §2.5) re-expressed as numpy kernels inside Arrow-batched UDFs.

  - argmax_decode:  per-token argmax over a score tensor (M2,
    my_ner.py:493-497)
  - viterbi_decode: batched max-DP with backpointers over
    transition + emission scores (M7, my_ner.py:733-825) — sequential
    in t, vectorized across the batch dim, exactly the reference's
    batching trick (my_ner.py:767-783)
  - log_sum_exp:    numerically-stable lse (M9, my_ner.py:331-340)
  - bio_transitions: transition matrix hard-coding BIO validity — the
    engine's replacement for the learned constraint matrix
    (my_ner.py:550-556): I-X may only follow B-X or I-X.

`viterbi_tags` wraps the kernel as a DataFrame operator: input rows
carry an emissions matrix (array<array<double>>, one row per token),
output the decoded tag array. The emission source is pluggable —
gazetteer match scores here, any model's scores on a real cluster.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

NEG = -1e4  # the reference's forbidden-transition score (my_ner.py:552-555)


def log_sum_exp(x: np.ndarray, axis: int = -1) -> np.ndarray:
    """Numerically-stable logsumexp (my_ner.py:331-340)."""
    m = np.max(x, axis=axis, keepdims=True)
    return (m + np.log(np.sum(np.exp(x - m), axis=axis, keepdims=True))).squeeze(axis)


def bio_transitions(tags: list[str]) -> np.ndarray:
    """BIO-validity transition matrix over `tags` (includes 'O').

    trans[i, j] = 0 when tag j may follow tag i, NEG otherwise.
    I-X is only reachable from B-X or I-X — the hard-coded analog of
    the constraints the reference learns (my_ner.py:550-556).
    """
    n = len(tags)
    trans = np.zeros((n, n))
    for j, tj in enumerate(tags):
        if tj.startswith("I-"):
            ok_from = {"B-" + tj[2:], "I-" + tj[2:]}
            for i, ti in enumerate(tags):
                if ti not in ok_from:
                    trans[i, j] = NEG
    return trans


def viterbi(emissions: np.ndarray, trans: np.ndarray) -> np.ndarray:
    """Batched Viterbi: emissions [B, L, C], trans [C, C] -> [B, L] ids.

    max-DP with backpointers, vectorized across the batch dimension
    (loop only over L — the reference's exact shape, my_ner.py:767-783).
    """
    B, L, C = emissions.shape
    v = emissions[:, 0, :].copy()  # [B, C]
    ptr = np.zeros((B, L, C), dtype=np.int64)
    for t in range(1, L):
        # scores[b, i, j] = v[b, i] + trans[i, j]
        scores = v[:, :, None] + trans[None, :, :]
        ptr[:, t, :] = np.argmax(scores, axis=1)
        v = np.max(scores, axis=1) + emissions[:, t, :]
    out = np.zeros((B, L), dtype=np.int64)
    out[:, L - 1] = np.argmax(v, axis=1)
    for t in range(L - 1, 0, -1):
        out[:, t - 1] = ptr[np.arange(B), t, out[:, t]]
    return out


def argmax_decode(emissions: np.ndarray) -> np.ndarray:
    """Per-token argmax [B, L, C] -> [B, L] (M2)."""
    return np.argmax(emissions, axis=-1)


def argmax_tags(
    df: DataFrame,
    tags: list[str],
    emissions_col: str = "emissions",
    key_col: str = "file_key",
) -> DataFrame:
    """M2 as a DataFrame operator: per-token argmax decode
    (my_ner.py:493-497) over (key, emissions[L][C]) -> (key, tags[L]).

    Ties resolve to the lowest tag index (np.argmax first-max), exactly
    the reference's torch.argmax convention.
    """
    tag_arr = list(tags)
    schema = T.StructType(
        [
            T.StructField("file_key", T.StringType(), False),
            T.StructField("tags", T.ArrayType(T.StringType()), False),
        ]
    )

    def run(batches):
        for pdf in batches:
            keys_out, tags_out = [], []
            for key, em in zip(pdf[key_col], pdf[emissions_col]):
                if len(em) == 0:
                    keys_out.append(key)
                    tags_out.append([])
                    continue
                mat = np.asarray([list(tok) for tok in em], dtype=np.float64)
                ids = argmax_decode(mat[None, :, :])[0]
                keys_out.append(key)
                tags_out.append([tag_arr[i] for i in ids])
            yield pd.DataFrame({"file_key": keys_out, "tags": tags_out})

    return df.select(F.col(key_col), F.col(emissions_col)).mapInPandas(run, schema)


def viterbi_tags(
    df: DataFrame,
    tags: list[str],
    emissions_col: str = "emissions",
    key_col: str = "file_key",
    constrained: bool = True,
    trans: np.ndarray | None = None,
) -> DataFrame:
    """DataFrame operator: (key, emissions[L][C]) -> (key, tags[L]).

    Variable-length sequences are bucketed by length inside each Arrow
    batch so the batched kernel runs on rectangular tensors without
    padding waste — the relational analog of the reference's
    length-sorted batching (my_ner.py:100-101). An explicit `trans`
    matrix overrides the default BIO constraints (e.g. to make the
    forbidden-transition penalty absolute rather than the reference's
    soft -1e4).
    """
    tag_arr = list(tags)
    if trans is None:
        trans = bio_transitions(tag_arr) if constrained else np.zeros((len(tag_arr),) * 2)

    schema = T.StructType(
        [
            T.StructField("file_key", T.StringType(), False),
            T.StructField("tags", T.ArrayType(T.StringType()), False),
        ]
    )

    def run(batches):
        for pdf in batches:
            keys_out, tags_out = [], []
            by_len: dict[int, list[tuple[str, list]]] = {}
            for key, em in zip(pdf[key_col], pdf[emissions_col]):
                by_len.setdefault(len(em), []).append((key, em))
            for length, rows in by_len.items():
                if length == 0:
                    for key, _ in rows:
                        keys_out.append(key)
                        tags_out.append([])
                    continue
                # Arrow delivers nested lists as object arrays; rebuild
                # a dense [B, L, C] tensor explicitly
                em = np.asarray(
                    [[list(tok) for tok in r[1]] for r in rows], dtype=np.float64
                )
                ids = viterbi(em, trans)
                for (key, _), row_ids in zip(rows, ids):
                    keys_out.append(key)
                    tags_out.append([tag_arr[i] for i in row_ids])
            yield pd.DataFrame({"file_key": keys_out, "tags": tags_out})

    return df.select(F.col(key_col), F.col(emissions_col)).mapInPandas(run, schema)
