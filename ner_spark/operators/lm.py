"""Corpus language-model ops for training-data curation: bigram-LM
fluency scoring, a BPE merge-step pair counter, and paragraph-grain
dedup (the CCNet trick of deduping sub-document units).

All three are pure relational plans — explode, aggregate, join — with
no Python in the hot path. The scored outputs are EXACT integers
(floor-divided micro-probabilities), so results are bit-identical
across engines, partitionings, and summation orders; the float
log-perplexity variant exists for users (`doc_perplexity`) but the
oracle-checked surface stays integer-only by design.

Scale notes (100 TB corpus):
- `bigram_counts` is one scan + one shuffled agg keyed by bigram; the
  LM table it emits is vocabulary-sized (tiny vs the corpus), so the
  scoring join broadcasts it.
- `score_docs` re-scans the corpus once; per-token work is an
  array transform inside codegen, the only shuffle is the final
  per-doc agg (keyed by doc_id — naturally well distributed).
- `paragraph_dedup` keys the shuffle on the paragraph hash; a
  pathological corpus where one paragraph dominates is exactly the
  boilerplate case the op exists to remove, and AQE skew-split
  handles the single hot key (it is an aggregate, not a join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ner_spark.functions import text as X

E6 = 1_000_000


def _div(df: DataFrame, out: str, a: Column, b: Column) -> DataFrame:
    """df + column `out` = a div b — exact long division (SQL `div`),
    identical to DuckDB `//` for the all-positive operands used here,
    and safe past 2^53 where a float round-trip would not be."""
    return (
        df.withColumn("_idiv_a", a.cast("long"))
        .withColumn("_idiv_b", b.cast("long"))
        .withColumn(out, F.expr("_idiv_a div _idiv_b"))
        .drop("_idiv_a", "_idiv_b")
    )


def _doc_bigrams(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(id, bigram) rows: adjacent token pairs of each document, in
    one exploded projection (order inside the array expression, so no
    window/sort is ever needed)."""
    # let-bound (text.let_bound / PLANS.md rule 7): element_at against
    # the raw tokens() expression would re-run the regex per position
    pairs = X.let_bound(
        X.tokens(text_col),
        lambda toks: F.transform(
            F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda _, i: F.concat_ws(" ", F.element_at(toks, i + 1),
                                     F.element_at(toks, i + 2)),
        ),
    )
    return docs.select(F.col(id_col), F.explode(pairs).alias("bigram"))


def bigram_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The LM: global bigram counts + left-context totals.

    One corpus scan, one agg shuffle keyed by bigram. The context
    totals come from a second agg over the (small) bigram table, not
    from another corpus scan.
    """
    bg = _doc_bigrams(docs, text_col).groupBy("bigram").agg(
        F.count(F.lit(1)).alias("n")
    )
    bg = bg.withColumn("ctx", F.split("bigram", " ")[0])
    totals = bg.groupBy("ctx").agg(F.sum("n").alias("ctx_n"))
    return bg.join(totals, "ctx").select("bigram", "ctx", "n", "ctx_n")


def score_docs(docs: DataFrame, lm: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Per-document fluency vs the corpus LM, in exact integers.

    For each adjacent token pair: p = n/ctx_n if the bigram is in the
    LM else 0, floor-quantized to micro-units (n * 1e6 div ctx_n —
    identical floor semantics in Spark `div` and DuckDB `//` for the
    all-positive counts involved). Output per doc:
      n_bigrams, n_oov (pairs unseen by the LM),
      sum_prob_e6 (exact long), avg_prob_e6 (floor mean).
    Integer sums are associative — the result is independent of
    partitioning and merge order, unlike a float log-prob sum.
    """
    joined = _doc_bigrams(docs, text_col, id_col).join(
        F.broadcast(lm.select("bigram", "n", "ctx_n")), "bigram", "left"
    )
    scored = _div(
        joined, "p_e6", F.coalesce(F.col("n") * E6, F.lit(0)),
        F.coalesce("ctx_n", F.lit(1)),
    ).select(
        id_col,
        F.col("n").isNull().cast("long").alias("oov"),
        "p_e6",
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("oov").alias("n_oov"),
        F.sum("p_e6").alias("sum_prob_e6"),
    )
    return _div(agg, "avg_prob_e6", F.col("sum_prob_e6"), F.col("n_bigrams"))


def doc_perplexity(docs: DataFrame, lm: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", alpha: float = 0.5) -> DataFrame:
    """Float add-alpha log-perplexity per doc — the user-facing variant
    (unit tested against numpy; kept OFF the exact-hash oracle surface
    because transcendental libm results are not bit-pinned across
    engines)."""
    vocab = lm.select(F.countDistinct("ctx").alias("v"))
    scored = (
        _doc_bigrams(docs, text_col, id_col)
        .join(F.broadcast(lm.select("bigram", "n", "ctx_n")), "bigram", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            (-F.log(
                (F.coalesce("n", F.lit(0)) + F.lit(alpha))
                / (F.coalesce("ctx_n", F.lit(0)) + F.lit(alpha) * F.col("v"))
            )).alias("nll"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg("nll").alias("avg_nll"),
        F.exp(F.avg("nll")).alias("perplexity"),
    )


# ---------------------------------------------------------------------------
# BPE merge step (tokenizer-training primitive)
# ---------------------------------------------------------------------------

def bpe_pair_counts(docs: DataFrame, text_col: str = "text",
                    top_k: int | None = None) -> DataFrame:
    """One BPE training step: global counts of adjacent SYMBOL pairs
    within words (symbols = characters on the first iteration).

    explode words -> per-word char-pair array (codegen transform) ->
    explode -> one agg. This is the inner loop of byte-pair-encoding
    tokenizer training; iterating it with a merge applied between
    rounds (`bpe_learn`) yields the merge table.
    """
    toks = docs.select(F.explode(X.tokens(text_col)).alias("w"))
    pairs = X.let_bound(
        F.split("w", ""),
        lambda chars: F.transform(
            F.slice(chars, 1, F.greatest(F.size(chars) - 1, F.lit(0))),
            lambda _, i: F.concat(F.element_at(chars, i + 1), F.lit(" "),
                                  F.element_at(chars, i + 2)),
        ),
    )
    out = (
        toks.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if top_k is not None:
        out = out.orderBy(F.desc("n"), "pair").limit(top_k)
    return out


def _pair_counts_from_syms(words: DataFrame) -> DataFrame:
    """Adjacent-pair counts over (syms: array<string>) word rows."""
    pairs = F.transform(
        F.slice("syms", 1, F.greatest(F.size("syms") - 1, F.lit(0))),
        lambda _, i: F.concat(F.element_at("syms", i + 1), F.lit(" "),
                              F.element_at("syms", i + 2)),
    )
    return (
        words.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _merge_pair(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) into a||b — the
    exact BPE apply step, as a codegen aggregate fold (no Python)."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_learn(docs: DataFrame, n_merges: int, text_col: str = "text") -> list[tuple[str, int]]:
    """Learn `n_merges` BPE merges by iterating the pair count with the
    winning pair merged greedily left-to-right each round.

    Each round is one scan over the (checkpointed) word/symbol table —
    inherent to exact BPE, whose merge order is sequential; production
    tokenizer training caps the input with `stratified_sample` first.
    Ties break lexicographically for a deterministic merge table.
    """
    merges: list[tuple[str, int]] = []
    words = docs.select(F.explode(X.tokens(text_col)).alias("w")).select(
        F.split("w", "").alias("syms")
    )
    words = words.localCheckpoint(eager=True)
    for _ in range(n_merges):
        top = (
            _pair_counts_from_syms(words)
            .orderBy(F.desc("n"), "pair")
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < 2:
            break
        pair, n = top[0]["pair"], int(top[0]["n"])
        merges.append((pair, n))
        a, b = pair.split(" ")
        words = words.select(_merge_pair(F.col("syms"), a, b).alias("syms"))
        # truncate lineage each round so the plan stays O(1) deep
        words = words.localCheckpoint(eager=True)
    return merges


# ---------------------------------------------------------------------------
# BPE encode (apply a learned merge list to the corpus)
# ---------------------------------------------------------------------------

# symbol delimiter for the string-rewrite encode; U+001F (unit
# separator) cannot appear in identifier tokens by construction
BPE_SEP = "\x1f"


def bpe_encode_word(word: Column, merges: list[str]) -> Column:
    """Encode ONE word through an ordered merge list -> array<string>.

    Representation trick: the word becomes a delimited symbol string
    ("\\x1fa\\x1f \\x1fb\\x1f ..."), and each merge ("a b" -> "ab") is a
    literal `replace` of "\\x1fa\\x1f \\x1fb\\x1f" with "\\x1fab\\x1f".
    Because `replace` substitutes non-overlapping occurrences LEFT TO
    RIGHT, one pass per merge reproduces greedy BPE exactly; the
    delimiters stop a pattern from straddling symbol boundaries (a
    symbol ending in "a" followed by symbol "b" contains "a b" but not
    "\\x1fa\\x1f \\x1fb\\x1f"). Applying merges in learned order is
    equivalent to rank-priority BPE: a merge can only create a symbol
    born at its own rank, never an operand of an earlier pair (the one
    degenerate exception — two different merges producing the same
    surface string — is indistinguishable in any string representation
    and documented out of contract).

    The whole encode is a chain of literal replaces inside whole-stage
    codegen — no Python, no shuffle, usable inside a higher-order
    lambda. For merge lists beyond a few hundred entries, checkpoint
    every ~200 merges to bound expression-tree depth.
    """
    s = F.rtrim(F.regexp_replace(word, "(.)", BPE_SEP + "$1" + BPE_SEP + " "))
    for pair in merges:
        a, b = pair.split(" ")
        s = F.replace(
            s,
            F.lit(f"{BPE_SEP}{a}{BPE_SEP} {BPE_SEP}{b}{BPE_SEP}"),
            F.lit(f"{BPE_SEP}{a}{b}{BPE_SEP}"),
        )
    return F.array_remove(F.split(F.replace(s, F.lit(BPE_SEP), F.lit("")), " "), "")


def bpe_encode(docs: DataFrame, merges: list[str], text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """(id, bpe_tokens): tokenize + BPE-encode every document with a
    learned merge list — the apply half of tokenizer training
    (`bpe_learn` is the learn half). Zero shuffle: one codegen
    projection per document, encode applied per token inside a
    higher-order transform (the lambda touches only its own variable,
    so no rule-7 re-evaluation)."""
    return docs.select(
        id_col,
        F.flatten(
            F.transform(X.tokens(text_col), lambda w: bpe_encode_word(w, merges))
        ).alias("bpe_tokens"),
    )


# ---------------------------------------------------------------------------
# Paragraph-grain dedup (CCNet-style sub-document dedup)
# ---------------------------------------------------------------------------

def paragraphs(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", chunk: int = 20) -> DataFrame:
    """Deterministic paragraph units: consecutive `chunk`-token slices
    of each document (the synthetic corpus has no newlines; on a real
    corpus pass the text pre-split on \\n\\n — the downstream dedup is
    unit-agnostic). Output: (id, para_idx, para, para_hash)."""
    def chunks(toks):
        n_chunks = F.ceil(F.size(toks) / F.lit(chunk)).cast("int")
        # guard the token-less doc: sequence(0, -1) would yield [0, -1]
        # (Spark auto-negates the step), i.e. two phantom paragraphs
        return F.when(
            F.size(toks) > 0,
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.concat_ws(" ", F.slice(toks, i * chunk + 1, chunk)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    slices = X.let_bound(X.tokens(text_col), chunks)
    return (
        docs.select(F.col(id_col), F.posexplode(slices).alias("para_idx", "para"))
        .withColumn("para_hash", F.md5("para"))
    )


def paragraph_dedup(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", chunk: int = 20) -> DataFrame:
    """Keep the FIRST occurrence of every paragraph corpus-wide
    (ordered by (doc id, paragraph index) — content-derived, stable at
    any parallelism); report per-document survival.

    One shuffle keyed by para_hash (window), one per-doc agg. Output:
    (id, n_paras, n_kept, kept_frac_e6) with kept_frac exact via floor
    micro-units.
    """
    p = paragraphs(docs, text_col, id_col, chunk)
    w = Window.partitionBy("para_hash").orderBy(id_col, "para_idx")
    first = p.withColumn(
        "kept", (F.row_number().over(w) == 1).cast("long")
    )
    agg = first.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_paras"),
        F.sum("kept").alias("n_kept"),
    )
    return _div(agg, "kept_frac_e6", F.col("n_kept") * E6, F.col("n_paras"))


# ---------------------------------------------------------------------------
# CCNet-style paragraph-grain quality bucketing (Wenzek et al. 2020)
# ---------------------------------------------------------------------------

def score_paragraphs(docs: DataFrame, lm: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", chunk: int = 20) -> DataFrame:
    """Paragraph-grain LM fluency — CCNet scores sub-document units,
    not whole documents, so one boilerplate paragraph can't sink (or
    carry) an otherwise-good page.

    Same exact-integer surface as `score_docs`: per adjacent token
    pair p_e6 = n * 1e6 div ctx_n (0 for OOV), floor-averaged per
    paragraph. Paragraphs too short to have a bigram come back with
    n_bigrams = 0 / avg 0 (kept via the left join below — posexplode
    drops them from the pair stream).

    Output: (doc_id, para_idx, n_bigrams, n_oov, avg_prob_e6).
    Shuffles: the paragraph-key agg (content-sized, well spread) plus
    the left join back on the same key; the LM join is broadcast.
    """
    p = paragraphs(docs, text_col, id_col, chunk)
    keyed = p.select(
        F.concat_ws(
            ":", F.col(id_col).cast("string"), F.col("para_idx").cast("string")
        ).alias("pid"),
        F.col(id_col),
        "para_idx",
        "para",
    )
    pairs = _doc_bigrams(keyed.select("pid", "para"), "para", "pid")
    joined = pairs.join(
        F.broadcast(lm.select("bigram", "n", "ctx_n")), "bigram", "left"
    )
    scored = _div(
        joined, "p_e6", F.coalesce(F.col("n") * E6, F.lit(0)),
        F.coalesce("ctx_n", F.lit(1)),
    ).select("pid", F.col("n").isNull().cast("long").alias("oov"), "p_e6")
    agg = scored.groupBy("pid").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("oov").alias("n_oov"),
        F.sum("p_e6").alias("sum_prob_e6"),
    )
    agg = _div(agg, "avg_prob_e6", F.col("sum_prob_e6"), F.col("n_bigrams"))
    return (
        keyed.select("pid", id_col, "para_idx")
        .join(agg, "pid", "left")
        .select(
            id_col,
            "para_idx",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
            F.coalesce("avg_prob_e6", F.lit(0)).alias("avg_prob_e6"),
        )
    )


def ccnet_paragraph_filter(docs: DataFrame, lm: DataFrame,
                           text_col: str = "text", id_col: str = "doc_id",
                           chunk: int = 20) -> DataFrame:
    """CCNet head/middle/tail bucketing at paragraph grain, with the
    keep/drop bit (CCNet keeps head+middle, drops tail).

    CCNet derives perplexity CUTOFFS and compares each unit against
    them — it does not rank every unit globally — and that is also the
    only shape that scales: the cutoffs here are exact tercile
    thresholds selected from the DISTINCT-score histogram
    (groupBy(score) -> cumulative count over distinct scores), so the
    global sort touches |distinct avg_prob_e6| rows (bounded by the e6
    quantization), never the corpus. Ties at a boundary all land on
    the higher bucket — deterministic, partitioning-invariant, and
    expressible identically in SQL for the oracle.

      t1 = max-cumulative-count-reaching ceil(n/3)   (head floor)
      t2 = same at ceil(2n/3)                        (middle floor)
      bucket = head  if avg_prob_e6 >= t1
               middle if avg_prob_e6 >= t2
               tail   otherwise            (kept = bucket != tail)

    Output: (doc_id, para_idx, n_bigrams, n_oov, avg_prob_e6, bucket,
    kept)."""
    s = score_paragraphs(docs, lm, text_col, id_col, chunk)
    dist = s.groupBy("avg_prob_e6").agg(F.count(F.lit(1)).alias("cnt"))
    wd = Window.orderBy(F.col("avg_prob_e6").desc())
    cum = dist.withColumn("cum", F.sum("cnt").over(wd))
    tot = s.agg(F.count(F.lit(1)).alias("n"))
    th = (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.max(
                F.when(F.col("cum") >= F.expr("(n + 2) div 3"),
                       F.col("avg_prob_e6"))
            ).alias("t1"),
            F.max(
                F.when(F.col("cum") >= F.expr("(2 * n + 2) div 3"),
                       F.col("avg_prob_e6"))
            ).alias("t2"),
        )
    )
    return s.crossJoin(F.broadcast(th)).select(
        id_col,
        "para_idx",
        "n_bigrams",
        "n_oov",
        "avg_prob_e6",
        F.when(F.col("avg_prob_e6") >= F.col("t1"), F.lit("head"))
        .when(F.col("avg_prob_e6") >= F.col("t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
        (F.col("avg_prob_e6") >= F.col("t2")).cast("long").alias("kept"),
    )
