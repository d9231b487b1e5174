"""Gazetteer mention detection — the KG analog of the reference's
char-level tagger (SURVEY §2.5 M1–M8).

Two physical strategies, picked by gazetteer size:

1. ``detect_mentions_join`` — tokenize natively (regexp_extract_all),
   posexplode, **broadcast equi-join** against the alias dictionary.
   Pure DataFrame: Catalyst prunes columns, the join never shuffles the
   corpus side, and everything before the explode stays in whole-stage
   codegen. This is the 100 TB path for single-token aliases.

2. ``mention_spans`` — a compiled gazetteer automaton (regex
   alternation ≈ trie with word boundaries) run batch-at-a-time inside
   ``mapInPandas``; emits exact char spans (begin, end) per mention and
   supports multi-token aliases. The automaton is compiled once per
   Python worker (module-level cache), matching is C-speed
   `re.finditer` — no per-row Python-level loops over characters.

``bio_tags_for_files`` reproduces the reference's sentence->tag-list
shape (my_ner.py:88-96): per file, an array of tokens and an aligned
array of BIO tags, with BIO validity enforced by construction (B- on
the first token of a span, I- inside — the hard-coded analog of the
learned transition constraints at my_ner.py:550-556).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ner_spark.functions.text import TOKEN_RE, tokens

_AUTOMATON_CACHE: dict[int, tuple[re.Pattern, dict[str, tuple[str, str]]]] = {}


def _automaton(gaz_rows: tuple[tuple[str, str, str], ...]):
    """Compile (alias, entity, ent_type) rows into a boundary-anchored
    alternation, longest alias first (leftmost-longest match)."""
    key = hash(gaz_rows)
    hit = _AUTOMATON_CACHE.get(key)
    if hit is None:
        alias_map = {a: (e, t) for a, e, t in gaz_rows}
        pat = re.compile(
            r"(?<![A-Za-z0-9_])("
            + "|".join(re.escape(a) for a in sorted(alias_map, key=len, reverse=True))
            + r")(?![A-Za-z0-9_])"
        )
        hit = (pat, alias_map)
        _AUTOMATON_CACHE[key] = hit
    return hit


MENTION_SCHEMA = T.StructType(
    [
        T.StructField("file_key", T.StringType(), False),
        T.StructField("begin", T.IntegerType(), False),
        T.StructField("end", T.IntegerType(), False),
        T.StructField("surface", T.StringType(), False),
        T.StructField("entity", T.StringType(), False),
        T.StructField("ent_type", T.StringType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)


def mention_spans(
    files: DataFrame,
    gazetteer: list[tuple[str, str, str]],
    key_col: str = "file_key",
    content_col: str = "content",
) -> DataFrame:
    """Exact char-offset mentions via the gazetteer automaton.

    Input must carry a stable `key_col` (content-derived — never
    monotonically_increasing_id — so output is partitioning-invariant,
    SURVEY §4 determinism rule).
    """
    gaz = tuple(sorted(gazetteer))

    def run(batches):
        pat, alias_map = _automaton(gaz)
        for pdf in batches:
            out = {k: [] for k in ("file_key", "begin", "end", "surface", "entity", "ent_type", "score")}
            for key, text in zip(pdf[key_col], pdf[content_col]):
                for m in pat.finditer(text):
                    ent, etype = alias_map[m.group(1)]
                    out["file_key"].append(key)
                    out["begin"].append(m.start(1))
                    out["end"].append(m.end(1))
                    out["surface"].append(m.group(1))
                    out["entity"].append(ent)
                    out["ent_type"].append(etype)
                    out["score"].append(1.0)
            yield pd.DataFrame(out)

    return files.select(F.col(key_col), F.col(content_col)).mapInPandas(run, MENTION_SCHEMA)


def detect_mentions_join(
    files: DataFrame,
    gazetteer_df: DataFrame,
    key_col: str = "file_key",
    content_col: str = "content",
) -> DataFrame:
    """Token-grain mentions via posexplode + broadcast join.

    Returns (file_key, pos, surface, entity, ent_type). The scan reads
    only (key, content); the gazetteer side broadcasts; map-side the
    corpus never shuffles.
    """
    toks = files.select(
        F.col(key_col),
        F.posexplode(tokens(F.col(content_col))).alias("pos", "surface"),
    )
    return toks.join(
        F.broadcast(gazetteer_df.withColumnRenamed("alias", "surface")),
        "surface",
        "inner",
    ).select(key_col, "pos", "surface", "entity", "ent_type")


PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("file_key", T.StringType(), False),
        T.StructField("repo", T.StringType(), False),
        T.StructField("entities", T.ArrayType(T.StringType()), False),
        T.StructField("symbols", T.ArrayType(T.StringType()), False),
    ]
)


def file_profiles(
    files: DataFrame,
    gazetteer: list[tuple[str, str, str]],
    decl_re: str,
    key_col: str = "file_key",
    content_col: str = "content",
) -> DataFrame:
    """Single-pass per-file profile: (file_key, repo, entities, symbols).

    ONE pass over `content` extracts both the distinct entity set (the
    gazetteer automaton) and the declared symbols (decl regex) — the
    throughput kernel behind extract_triples. Downstream triple
    families are cheap array explodes over this small table, so the
    100 TB `content` column is read and regex-scanned exactly once
    (vs. once per triple family in the naive DAG). Arrays are sorted
    distinct — deterministic at any parallelism.
    """
    gaz = tuple(sorted(gazetteer))
    dre = re.compile(decl_re, re.M)

    def run(batches):
        pat, alias_map = _automaton(gaz)
        for pdf in batches:
            keys, repos, ents_col, syms_col = [], [], [], []
            for key, repo, text in zip(pdf[key_col], pdf["repo"], pdf[content_col]):
                ents = sorted({alias_map[m.group(1)][0] for m in pat.finditer(text)})
                syms = sorted({m.group(1) for m in dre.finditer(text)})
                keys.append(key)
                repos.append(repo)
                ents_col.append(ents)
                syms_col.append(syms)
            yield pd.DataFrame(
                {"file_key": keys, "repo": repos, "entities": ents_col, "symbols": syms_col}
            )

    return files.select(F.col(key_col), F.col("repo"), F.col(content_col)).mapInPandas(
        run, PROFILE_SCHEMA
    )


BIO_SCHEMA = T.StructType(
    [
        T.StructField("file_key", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.StringType()), False),
        T.StructField("bio_tags", T.ArrayType(T.StringType()), False),
    ]
)


def bio_tags_for_files(
    files: DataFrame,
    gazetteer: list[tuple[str, str, str]],
    key_col: str = "file_key",
    content_col: str = "content",
) -> DataFrame:
    """Per file: aligned (tokens, BIO tags) arrays — the reference's
    (char_list, tag_list) sentence shape at file grain.

    Multi-token aliases produce B-TYPE I-TYPE...; unmatched tokens 'O'.
    BIO validity holds by construction (no orphan I-).
    """
    gaz = tuple(sorted(gazetteer))
    token_pat = re.compile(TOKEN_RE)

    def run(batches):
        pat, alias_map = _automaton(gaz)
        for pdf in batches:
            keys, tok_col, tag_col = [], [], []
            for key, text in zip(pdf[key_col], pdf[content_col]):
                toks = [(m.start(), m.end(), m.group(0)) for m in token_pat.finditer(text)]
                tags = ["O"] * len(toks)
                spans = [(m.start(1), m.end(1), alias_map[m.group(1)][1]) for m in pat.finditer(text)]
                ti = 0
                for b, e, etype in spans:
                    while ti < len(toks) and toks[ti][1] <= b:
                        ti += 1
                    first = True
                    tj = ti
                    while tj < len(toks) and toks[tj][0] < e:
                        tags[tj] = ("B-" if first else "I-") + etype
                        first = False
                        tj += 1
                keys.append(key)
                tok_col.append([t[2] for t in toks])
                tag_col.append(tags)
            yield pd.DataFrame({"file_key": keys, "tokens": tok_col, "bio_tags": tag_col})

    return files.select(F.col(key_col), F.col(content_col)).mapInPandas(run, BIO_SCHEMA)
