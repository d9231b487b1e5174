"""Dictionary builders — reference operators D1–D9 (SURVEY §2.3).

The reference builds insert-order dicts driver-side (`build_map`,
my_ner.py:119-129). Here the same semantics — ids assigned in global
first-occurrence order — are one distributed aggregation:

    tokens -> groupBy(token).agg(min(occurrence_key)) -> row_number()

The final `row_number` over a global ORDER BY is a single-partition
window; that is fine because the *dictionary* (distinct tokens) is
orders of magnitude smaller than the corpus — the heavy lifting
(groupBy min) is fully parallel with map-side partial aggregation.
Applying a dictionary is always a broadcast left join + coalesce
(the UNK/default-fallback semantics of my_ner.py:364-367, 153).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

UNK, PAD, START, END = "<UNK>", "<PAD>", "<START>", "<END>"


def build_map(tokens_df: DataFrame, token_col: str = "token",
              order_cols: tuple[str, ...] = ("sent_id", "pos")) -> DataFrame:
    """D1: first-occurrence-ordered contiguous ids, starting at 0.

    `order_cols` define the global occurrence order (e.g. (sent_id, pos)
    at token grain). Matches reference id assignment exactly
    (my_ner.py:119-129): first distinct token seen -> id 0, etc.
    """
    # lexicographic first occurrence needs min over the *combined* key:
    # independent min(sent_id), min(pos) would mix positions from
    # different occurrences. Structs compare lexicographically.
    first = tokens_df.groupBy(token_col).agg(
        F.min(F.struct(*[F.col(c) for c in order_cols])).alias("_first")
    )
    w = Window.orderBy(F.col("_first"), F.col(token_col))
    return first.select(
        F.col(token_col).alias("token"),
        (F.row_number().over(w) - 1).cast("long").alias("id"),
    )


def with_sentinels(vocab: DataFrame, sentinels: tuple[str, ...] = (UNK, PAD, START)) -> DataFrame:
    """D2: append sentinel tokens after the vocabulary (my_ner.py:106-112)."""
    spark = vocab.sparkSession
    n = vocab.count()
    extra = spark.createDataFrame(
        [(s, n + i) for i, s in enumerate(sentinels)], schema="token string, id long"
    )
    return vocab.unionByName(extra)


def apply_map(df: DataFrame, vocab: DataFrame, token_col: str,
              out_col: str, default_token: str = UNK) -> DataFrame:
    """P9/B3: dictionary lookup with UNK fallback — broadcast left join.

    `coalesce(id, unk_id)` reproduces `d.get(tok, d['<UNK>'])`
    (my_ner.py:364-367). Broadcast keeps this shuffle-free at any corpus
    size; the dictionary side is the small one by construction. Fully
    lazy: the UNK id rides along as a broadcast one-row crossJoin (same
    pattern as `union_vocab`) instead of a driver `.collect()`, so the
    lookup composes into larger plans without triggering a job. A vocab
    with no `default_token` row yields a null `_unk_id`, which coalesce
    ignores — unmapped tokens then stay null, the pre-rewrite behavior.
    """
    unk_df = vocab.filter(F.col("token") == default_token).agg(
        F.max("id").alias("_unk_id")
    )
    return (
        df.join(
            F.broadcast(
                vocab.withColumnRenamed("token", token_col).withColumnRenamed("id", out_col)
            ),
            on=token_col,
            how="left",
        )
        .crossJoin(F.broadcast(unk_df))
        .withColumn(out_col, F.coalesce(F.col(out_col), F.col("_unk_id")))
        .drop("_unk_id")
    )


def union_vocab(old: DataFrame, new_tokens: DataFrame, token_col: str = "token") -> DataFrame:
    """D9: extend an existing vocab with unseen tokens, preserving old ids
    (gensim `build_vocab(update=True)`, withW2V.py:112-117).

    Fully lazy: the next-id offset rides along as a broadcast one-row
    crossJoin instead of a driver `.collect()`, so building the union
    triggers no job of its own and composes into larger plans."""
    # coalesce: on an EMPTY `old`, max(id) is null and every fresh token
    # would silently get id = null — fresh ids start at 0 instead
    start_df = old.agg(
        F.coalesce(F.max("id") + 1, F.lit(0).cast("long")).alias("_start")
    )
    fresh = (
        new_tokens.select(F.col(token_col).alias("token"))
        .distinct()
        .join(old.select("token"), "token", "left_anti")
    )
    w = Window.orderBy("token")
    fresh_ids = (
        fresh.crossJoin(F.broadcast(start_df))
        .select(
            "token",
            (F.row_number().over(w) - 1 + F.col("_start")).cast("long").alias("id"),
        )
    )
    return old.unionByName(fresh_ids)


def build_new_map(
    w2v_vocab: DataFrame,
    corpus_tokens: DataFrame,
    token_col: str = "token",
    sentinels: tuple[str, ...] = (UNK, PAD),
) -> DataFrame:
    """D3 (withW2V.py:110-141): char2id from a pretrained w2v vocabulary.

    The reference updates the gensim model vocab with the corpus chars,
    then the sentinel list, and maps every token to its ``index_to_key``
    position — pretrained tokens keep their original w2v ids, new
    corpus tokens get the next ids, sentinels come last
    (``build_new_map``, withW2V.py:133-141). Reproduced as two vocab
    unions over the (token, id) frame from ``read_w2v_text``; the only
    deliberate difference is that fresh tokens are appended in sorted
    token order (deterministic) instead of gensim's internal update
    order.
    """
    out = union_vocab(
        w2v_vocab.select("token", "id"), corpus_tokens, token_col=token_col
    )
    # sentinels keep their list order, not alphabetical: one union each
    # (<= 3 one-row frames; the whole thing stays a single lazy plan).
    spark = w2v_vocab.sparkSession
    for s in sentinels:
        out = union_vocab(out, spark.createDataFrame([(s,)], "token string"))
    return out


def build_radical_map(vocab: DataFrame, unihan: DataFrame, default_radical: int = 0) -> DataFrame:
    """D4: char-id -> radical index with default 0 fill (my_ner.py:132-183).

    The reference's O(n^2) dense re-sort loop (my_ner.py:169-176)
    collapses to one broadcast left join + coalesce; dedupe keeps the
    first Unihan row per char (row_number()=1), mirroring the dict
    overwrite-then-first-wins behavior at my_ner.py:150-160.
    """
    w = Window.partitionBy("char").orderBy("radical", "stroke")
    uni = (
        unihan.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("char", "radical")
    )
    return (
        vocab.withColumnRenamed("token", "char")
        .join(F.broadcast(uni), "char", "left")
        .select(
            "char",
            "id",
            F.coalesce(F.col("radical"), F.lit(default_radical)).cast("int").alias("radical"),
        )
        .orderBy("id")
    )


def radical_name_map(radindex: DataFrame, rad_vocab: DataFrame) -> DataFrame:
    """D7: chained lookup rad_index -> radical char -> vocab id
    (withW2V.py:289-294 `radindex_and_rad` + `ori_rad_id_2_w2v_rad_id`).

    `radindex` is the S5 frame (rad_index, radical); `rad_vocab` maps
    (token, id) — e.g. a w2v radical vocabulary. Returns
    (rad_index, radical, rad_vocab_id). The reference raises KeyError
    on a radical missing from the vocab; the inner join reproduces
    "only resolvable radicals survive".
    """
    return radindex.join(
        F.broadcast(rad_vocab.withColumnRenamed("token", "radical")),
        "radical",
    ).select("rad_index", "radical", F.col("id").alias("rad_vocab_id"))


def build_radical_map_w2v(
    vocab: DataFrame,
    unihan: DataFrame,
    radindex: DataFrame,
    rad_vocab: DataFrame,
    notzh: str = "<notZh>",
) -> DataFrame:
    """D8: the w2v-backed variant of D4 (withW2V.py:214-276
    `build_one_radical`): char-id -> the *radical-vocabulary id* of its
    KangXi radical, defaulting every unresolvable char (non-CJK chars,
    sentinels, chars outside Unihan) to the vocab id of ``<notZh>`` —
    the reference's explicit `w2v_rad_model.build_vocab([["<notZh>"]],
    update=True)` fallback.

    Output covers EVERY id in `vocab` exactly once (the reference's
    dense ordered_radical list), so downstream embedding lookup is a
    plain array index. All dictionary joins broadcast.
    """
    w = Window.partitionBy("char").orderBy("radical", "stroke")
    uni = (
        unihan.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("char", F.col("radical").alias("rad_index"))
    )
    names = radical_name_map(radindex, rad_vocab).select("rad_index", "rad_vocab_id")
    # lazy one-row broadcast for the <notZh> fallback id (no driver
    # collect — same pattern as union_vocab/apply_map); a rad_vocab
    # missing `notzh` leaves unresolvable chars null rather than raising
    notzh_df = rad_vocab.filter(F.col("token") == notzh).agg(
        F.max("id").alias("_notzh_id")
    )
    return (
        vocab.withColumnRenamed("token", "char")
        .join(F.broadcast(uni), "char", "left")
        .join(F.broadcast(names), "rad_index", "left")
        .crossJoin(F.broadcast(notzh_df))
        .select(
            "char",
            "id",
            F.coalesce(F.col("rad_vocab_id"), F.col("_notzh_id"))
            .cast("long")
            .alias("rad_vocab_id"),
        )
        .orderBy("id")
    )


def transliterate(
    df: DataFrame,
    mapping: DataFrame,
    text_col: str = "text",
    out_col: str = "radical_text",
    key_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """P6: rewrite a string char-by-char through a mapping table
    (word_to_radical.py:46-68 `C2R.convert`: char -> radindex ->
    radical char, composed into one (char, replacement) frame by the
    caller).

    Relational formulation: posexplode chars -> broadcast-join the
    mapping -> reassemble with collect_list(struct(pos, char)) +
    array_sort, so order is guaranteed by the expression rather than
    physical row order. The reference crashes (KeyError) on unmapped
    chars; here they pass through unchanged — the total-function
    generalization (documented deviation).
    """
    chars = df.select(
        *key_cols, F.posexplode(F.split(F.col(text_col), "")).alias("pos", "char")
    )
    mapped = chars.join(F.broadcast(mapping), "char", "left").select(
        *key_cols, "pos", F.coalesce(F.col("replacement"), F.col("char")).alias("out")
    )
    rebuilt = mapped.groupBy(*key_cols).agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "out"))),
                lambda s: s["out"],
            ),
        ).alias(out_col)
    )
    return df.join(rebuilt, list(key_cols), "left")


def char_to_radical_mapping(unihan: DataFrame, radindex: DataFrame) -> DataFrame:
    """Compose S3 x S5 into the P6 mapping frame (char, replacement):
    char -> its KangXi radical CHARACTER (word_to_radical.py:62-66)."""
    w = Window.partitionBy("char").orderBy("radical", "stroke")
    uni = (
        unihan.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("char", F.col("radical").alias("rad_index"))
    )
    return uni.join(F.broadcast(radindex), "rad_index").select(
        "char", F.col("radical").alias("replacement")
    )


def dummy_radical_map(vocab: DataFrame) -> DataFrame:
    """D6: all-zeros radical table (feature disabled; my_ner.py:186-191)."""
    return vocab.select(F.col("token").alias("char"), "id", F.lit(0).alias("radical"))


_IDC_RANGE = "[⿰-⿻]"  # U+2FF0..U+2FFB (my_ner.py:302-312)
_PAD_COMPONENT = "⬚"


def build_components_map(vocab: DataFrame, chise: DataFrame) -> DataFrame:
    """D5: char -> exactly [IDC, DC1, DC2] components (my_ner.py:194-299).

    Normalization rules, re-expressed as array expressions:
      - non-decomposable char (decomposition == itself or empty):
        self x 3                                  (my_ner.py:254-257)
      - else: first IDC + first two non-IDC components
                                                  (my_ner.py:262-272)
      - single DC duplicated, missing slots padded with ⬚
                                                  (my_ner.py:273-279)
    Returns (char, id, components array<string>[3]).
    """
    chars_arr = F.array_compact(F.split(F.col("decomposition"), ""))
    idcs = F.filter(chars_arr, lambda c: c.rlike(_IDC_RANGE))
    dcs = F.filter(chars_arr, lambda c: ~c.rlike(_IDC_RANGE))
    first_idc = F.coalesce(F.element_at(idcs, 1), F.lit(_PAD_COMPONENT))
    dc1 = F.coalesce(F.element_at(dcs, 1), F.lit(_PAD_COMPONENT))
    dc2 = F.coalesce(F.element_at(dcs, 2), F.element_at(dcs, 1), F.lit(_PAD_COMPONENT))
    decomposable = (F.length(F.col("decomposition")) > 1) & (F.col("decomposition") != F.col("char"))
    comp = F.when(decomposable, F.array(first_idc, dc1, dc2)).otherwise(
        F.array(F.col("char"), F.col("char"), F.col("char"))
    )
    chise_norm = chise.select("char", comp.alias("components"))
    return (
        vocab.withColumnRenamed("token", "char")
        .join(F.broadcast(chise_norm), "char", "left")
        .select(
            "char",
            "id",
            F.coalesce(
                F.col("components"),
                F.array(F.col("char"), F.col("char"), F.col("char")),
            ).alias("components"),
        )
    )
