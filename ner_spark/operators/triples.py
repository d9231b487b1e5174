"""Triple materialization: (subj, pred, obj) — the pipeline's output
contract (BASELINE.json north_star):

  - repo   CONTAINS  entity      (repo-level entity inventory)
  - entity COOCCURS  entity      (within-file co-occurrence, e1 < e2)
  - file   DECLARES  symbol      (lang-aware declaration regexes)

All three are native DataFrame plans. COOCCURS is the one real
self-join; it joins *distinct per-file entity sets* (tiny vs the token
stream) on file_key — AQE skew-join handles a mega-file, and the
pair-count per file is bounded by (entities-per-file choose 2), not by
file size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# shared with synth.golden_triples_for_file and the DuckDB oracles
DECL_RE = r"(?m)^(?:def|class|func|void|public\s+\w+)\s+([A-Za-z_][A-Za-z0-9_]*)"


def contains_triples(mentions: DataFrame, files_meta: DataFrame) -> DataFrame:
    """repo CONTAINS entity (distinct). `files_meta` = (file_key, repo)."""
    return (
        mentions.select("file_key", "entity")
        .join(files_meta.select("file_key", "repo"), "file_key")
        .select(F.col("repo").alias("subj"), F.lit("CONTAINS").alias("pred"), F.col("entity").alias("obj"))
        .distinct()
    )


def cooccurs_triples(mentions: DataFrame) -> DataFrame:
    """entity COOCCURS entity within one file, ordered pairs e1 < e2."""
    fe = mentions.select("file_key", "entity").distinct()
    a = fe.alias("a")
    b = fe.alias("b")
    return (
        a.join(b, (F.col("a.file_key") == F.col("b.file_key")) & (F.col("a.entity") < F.col("b.entity")))
        .select(
            F.col("a.entity").alias("subj"),
            F.lit("COOCCURS").alias("pred"),
            F.col("b.entity").alias("obj"),
        )
        .distinct()
    )


def declares_triples(files: DataFrame, key_col: str = "file_key",
                     content_col: str = "content") -> DataFrame:
    """file DECLARES symbol — native regexp_extract_all + explode.

    Stays entirely in the JVM; the scan reads only (repo, path,
    content) and Catalyst prunes the rest.
    """
    return (
        files.select(
            F.concat_ws("/", "repo", "path").alias("subj"),
            F.explode(F.regexp_extract_all(F.col(content_col), F.lit(DECL_RE), 1)).alias("obj"),
        )
        .select("subj", F.lit("DECLARES").alias("pred"), "obj")
        .distinct()
    )


def all_triples(files: DataFrame, mentions: DataFrame) -> DataFrame:
    """Union of the three triple families, stable column order."""
    meta = files.select("file_key", "repo")
    return (
        contains_triples(mentions, meta)
        .unionByName(cooccurs_triples(mentions))
        .unionByName(declares_triples(files))
    )
