"""Entity linking: score candidate surface->entity links against a
broadcast alias dictionary with char-ngram similarity (north_star:
"score candidate entity links against a broadcast alias dictionary
with TF-IDF/char-ngram similarity").

This is the KG generalization of the reference's dictionary lookup
with UNK fallback (my_ner.py:364-367): exact alias hits score 1.0;
near-miss surfaces (typos, morphological variants) link through
char-3-gram similarity; surfaces below threshold get the NIL link —
the UNK analog.

Physical shape at 100 TB: the alias dictionary is small -> broadcast;
blocking happens on shared 3-grams (explode on *distinct surfaces*,
not the token stream, so candidate volume is bounded by vocabulary
size); scoring is native array expressions; top-1 is one window over
(surface) partitions. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def char_ngrams(col, n: int = 3) -> Column:
    """Distinct, sorted char n-grams of lower(s); whole string when
    shorter than n (array<string>)."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.lower(c)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(s) - (n - 1), F.lit(1))),
        lambda i: F.substring(s, i, n),
    )
    return F.array_sort(F.array_distinct(grams))


def ngram_jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return (inter / F.greatest(union, F.lit(1))).cast("double")


def blocking_grams(
    alias_grams: DataFrame,
    key_col: str = "alias",
    grams_col: str = "a_grams",
    max_gram_df: int | None = 256,
) -> DataFrame:
    """Exploded (key, gram) blocking table with stop-grams removed.

    Prefix filtering: a gram carried by more than `max_gram_df` aliases
    (e.g. 'ing', '_er' at dictionary scale) is useless as a blocking
    key — it pairs everything with everything, making the blocked join
    quadratic on one shuffle key before AQE can react. Dropping it
    bounds per-gram candidate volume to max_gram_df x df_surface(gram),
    i.e. linear in the probe side. Pairs whose ONLY shared gram is a
    stop-gram are overwhelmingly below any useful similarity threshold
    (they share the one gram everyone shares) — the standard prefix-
    filtering trade. Scoring still uses FULL gram sets.
    """
    g = alias_grams.select(key_col, F.explode(grams_col).alias("gram"))
    if max_gram_df is None:
        return g
    df_ok = (
        g.groupBy("gram")
        .agg(F.countDistinct(key_col).alias("_df"))
        .filter(F.col("_df") <= max_gram_df)
        .select("gram")
    )
    return g.join(F.broadcast(df_ok), "gram")


def link_scored(
    surfaces: DataFrame,
    gazetteer: DataFrame,
    surface_col: str = "surface",
    min_sim: float = 0.34,
    n: int = 3,
    max_gram_df: int | None = 256,
) -> DataFrame:
    """All above-threshold link candidates per distinct surface:
    (surface, alias, entity, ent_type, sim) — the scored frame
    link_surfaces ranks; exposed so ambiguity/margin audits can see
    past the top-1 pick."""
    surf = surfaces.select(F.col(surface_col).alias("surface")).distinct()
    surf_g = surf.select("surface", char_ngrams("surface", n).alias("s_grams"))
    gaz_g = gazetteer.select(
        "alias", "entity", "ent_type", char_ngrams("alias", n).alias("a_grams")
    )

    blocked = (
        surf_g.select("surface", "s_grams", F.explode("s_grams").alias("gram"))
        .join(
            F.broadcast(blocking_grams(gaz_g, "alias", "a_grams", max_gram_df)),
            "gram",
        )
        .select("surface", "alias")
        .distinct()
    )
    return (
        blocked.join(surf_g, "surface")
        .join(F.broadcast(gaz_g), "alias")
        .select(
            "surface",
            "alias",
            "entity",
            "ent_type",
            F.round(
                F.when(F.col("surface") == F.col("alias"), F.lit(1.0)).otherwise(
                    ngram_jaccard(F.col("s_grams"), F.col("a_grams"))
                ),
                6,
            ).alias("sim"),
        )
        .filter(F.col("sim") >= min_sim)
    )


def link_surfaces(
    surfaces: DataFrame,
    gazetteer: DataFrame,
    surface_col: str = "surface",
    min_sim: float = 0.34,
    n: int = 3,
    max_gram_df: int | None = 256,
) -> DataFrame:
    """Top-1 entity link per distinct surface: (surface, entity,
    ent_type, sim, is_exact). Below-threshold surfaces -> NIL.

    gazetteer: (alias, entity, ent_type). Blocking = shared n-gram
    equi-join with stop-grams above `max_gram_df` removed (see
    blocking_grams); scoring = n-gram Jaccard over full gram sets;
    exact alias match pins 1.0.
    """
    surf = surfaces.select(F.col(surface_col).alias("surface")).distinct()
    scored = link_scored(
        surfaces, gazetteer, surface_col, min_sim, n, max_gram_df
    )
    w = Window.partitionBy("surface").orderBy(
        F.col("sim").desc(), F.col("entity"), F.col("alias")
    )
    top1 = scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") == 1)
    return surf.join(top1, "surface", "left").select(
        "surface",
        F.coalesce("entity", F.lit("NIL")).alias("entity"),
        F.coalesce("ent_type", F.lit("NIL")).alias("ent_type"),
        F.coalesce("sim", F.lit(0.0)).alias("sim"),
        F.coalesce(F.col("alias") == F.col("surface"), F.lit(False)).alias("is_exact"),
    )


def tfidf_cosine_links(
    surfaces: DataFrame,
    gazetteer: DataFrame,
    surface_col: str = "surface",
    n: int = 3,
    min_sim: float = 0.3,
) -> DataFrame:
    """Char-ngram TF-IDF cosine between surfaces and aliases.

    IDF comes from the alias dictionary: idf(g) = ln(N / df(g)) + 1.
    Candidate generation shares the n-gram blocking join; the cosine is
    a groupBy-sum over matched grams (relational, no UDF):
        cos = sum_g idf(g)^2 / (||surface|| * ||alias||).
    Returns all candidates >= min_sim: (surface, alias, entity, tfidf_cos).
    """
    gaz_g = gazetteer.select("alias", "entity", char_ngrams("alias", n).alias("a_grams"))
    n_alias = gazetteer.select("alias").distinct().count()

    idf = (
        gaz_g.select("alias", F.explode("a_grams").alias("gram"))
        .groupBy("gram")
        .agg(F.countDistinct("alias").alias("df"))
        .select("gram", (F.log(F.lit(float(n_alias)) / F.col("df")) + 1.0).alias("idf"))
    )

    surf = surfaces.select(F.col(surface_col).alias("surface")).distinct()
    s_grams = surf.select("surface", F.explode(char_ngrams("surface", n)).alias("gram"))
    a_grams = gaz_g.select("alias", "entity", F.explode("a_grams").alias("gram"))

    s_w = s_grams.join(F.broadcast(idf), "gram", "left").withColumn(
        "idf", F.coalesce("idf", F.lit(1.0))
    )
    a_w = a_grams.join(F.broadcast(idf), "gram")

    s_norm = s_w.groupBy("surface").agg(F.sqrt(F.sum(F.col("idf") ** 2)).alias("s_norm"))
    a_norm = a_w.groupBy("alias").agg(F.sqrt(F.sum(F.col("idf") ** 2)).alias("a_norm"))

    dots = (
        s_w.join(F.broadcast(a_w.withColumnRenamed("idf", "a_idf")), "gram")
        .groupBy("surface", "alias", "entity")
        .agg(F.sum(F.col("idf") * F.col("a_idf")).alias("dot"))
    )
    return (
        dots.join(s_norm, "surface")
        .join(F.broadcast(a_norm), "alias")
        .select(
            "surface",
            "alias",
            "entity",
            F.round(F.col("dot") / (F.col("s_norm") * F.col("a_norm")), 6).alias("tfidf_cos"),
        )
        .filter(F.col("tfidf_cos") >= min_sim)
    )
