"""Bigram LM scoring, BPE merge learning, paragraph dedup
(ner_spark/operators/lm.py)."""

import math

import pytest
from pyspark.sql import functions as F

from ner_spark.operators import lm


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bigram_counts_and_context_totals(spark):
    d = _docs(spark, [(1, "a b a b c"), (2, "a b x")])
    got = {r["bigram"]: (r["n"], r["ctx_n"]) for r in lm.bigram_counts(d).collect()}
    # bigrams: doc1: "a b","b a","a b","b c"; doc2: "a b","b x"
    assert got["a b"] == (3, 3)        # ctx 'a' total = 3
    assert got["b a"] == (1, 3)        # ctx 'b' total = 1+1+1
    assert got["b c"] == (1, 3)
    assert got["b x"] == (1, 3)


def test_score_docs_exact_integer_semantics(spark):
    d = _docs(spark, [(1, "a b a b c"), (2, "z z")])
    model = lm.bigram_counts(d)
    got = {r["doc_id"]: r.asDict() for r in lm.score_docs(d, model).collect()}
    # doc 1 pairs: a-b (2/2=1.0), b-a (1/2), a-b (1.0), b-c (1/2)
    assert got[1]["n_bigrams"] == 4 and got[1]["n_oov"] == 0
    assert got[1]["sum_prob_e6"] == 2 * 1_000_000 + 2 * 500_000
    assert got[1]["avg_prob_e6"] == 3_000_000 // 4
    # doc 2: bigram "z z" (count 1, ctx total 1) -> exactly 1.0
    assert got[2]["sum_prob_e6"] == 1_000_000 and got[2]["n_oov"] == 0


def test_score_docs_oov_against_foreign_lm(spark):
    train = _docs(spark, [(1, "a b")])
    test = _docs(spark, [(9, "q r s")])
    model = lm.bigram_counts(train)
    row = lm.score_docs(test, model).collect()[0]
    assert row["n_bigrams"] == 2 and row["n_oov"] == 2 and row["sum_prob_e6"] == 0


def test_doc_perplexity_matches_numpy(spark):
    d = _docs(spark, [(1, "a b a c")])
    model = lm.bigram_counts(d)
    row = lm.doc_perplexity(d, model, alpha=0.5).collect()[0]
    # bigrams: a-b (1, ctx 'a' total 2), b-a (1, ctx 'b' total 1),
    # a-c (1, ctx 'a' total 2); V = countDistinct(ctx) = 2
    nll = [-math.log((1 + 0.5) / (2 + 0.5 * 2)),
           -math.log((1 + 0.5) / (1 + 0.5 * 2)),
           -math.log((1 + 0.5) / (2 + 0.5 * 2))]
    want = sum(nll) / 3
    assert row["avg_nll"] == pytest.approx(want, rel=1e-12)
    assert row["perplexity"] == pytest.approx(math.exp(want), rel=1e-12)


def test_bpe_pair_counts_first_iteration(spark):
    d = _docs(spark, [(1, "low low lower")])
    got = {r["pair"]: r["n"] for r in lm.bpe_pair_counts(d).collect()}
    assert got["l o"] == 3 and got["o w"] == 3 and got["w e"] == 1 and got["e r"] == 1


def test_bpe_learn_merges_in_frequency_order(spark):
    d = _docs(spark, [(1, "low low low lower newer newer")])
    merges = lm.bpe_learn(d, n_merges=3)
    # 'l o' and 'o w' both appear 4x; lexicographic tie-break -> 'l o'
    # first, after which 'lo w' appears 4x and wins round 2.
    assert [m[0] for m in merges[:2]] == ["l o", "lo w"]
    assert merges[0][1] == 4 and merges[1][1] == 4


def test_bpe_merge_is_greedy_left_to_right(spark):
    # "aaa" = [a,a,a]: merging (a,a) greedily left-to-right gives
    # [aa, a], never [a, aa]
    d = spark.createDataFrame([(["a", "a", "a"],)], "syms array<string>")
    out = d.select(lm._merge_pair(F.col("syms"), "a", "a").alias("m")).collect()
    assert out[0]["m"] == ["aa", "a"]


def _py_bpe_encode(word: str, merges: list[str]) -> list[str]:
    """Pure-Python reference: apply each merge exhaustively, in order,
    greedy left-to-right (Sennrich apply-BPE semantics)."""
    syms = list(word)
    for pair in merges:
        a, b = pair.split(" ")
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_encode_matches_python_reference(spark):
    merges = ["t h", "th e", "e r", "a t", "a n", "o r", "s t"]
    words = ["the", "hash", "batch", "data", "order", "sort", "stream",
             "fast", "thth", "ererer", "x"]
    d = _docs(spark, [(i, w) for i, w in enumerate(words)])
    got = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in lm.bpe_encode(d, merges).collect()
    }
    for i, w in enumerate(words):
        assert got[i] == _py_bpe_encode(w, merges), w


def test_bpe_learn_then_encode_roundtrip(spark):
    """Integration: merges learned by bpe_learn, applied by bpe_encode,
    agree with the pure-Python apply over the training corpus itself."""
    corpus = "low low low lower newer newer new"
    d = _docs(spark, [(1, corpus)])
    merges = [m[0] for m in lm.bpe_learn(d, n_merges=4)]
    got = lm.bpe_encode(d, merges).collect()[0]["bpe_tokens"]
    want = [s for w in corpus.split() for s in _py_bpe_encode(w, merges)]
    assert list(got) == want


def test_paragraph_dedup_first_occurrence_wins(spark):
    # chunk=2 paragraphs; doc 2 repeats doc 1's first paragraph
    d = _docs(spark, [(1, "a b c d"), (2, "a b x y")])
    got = {r["doc_id"]: r.asDict() for r in lm.paragraph_dedup(d, chunk=2).collect()}
    assert got[1]["n_paras"] == 2 and got[1]["n_kept"] == 2
    assert got[2]["n_paras"] == 2 and got[2]["n_kept"] == 1
    assert got[2]["kept_frac_e6"] == 500_000


def test_paragraph_dedup_partitioning_invariant(spark):
    rows = [(i, f"w{i % 3} x{i % 3} common common") for i in range(30)]
    d = _docs(spark, rows)
    a = lm.paragraph_dedup(d, chunk=2).orderBy("doc_id").collect()
    b = lm.paragraph_dedup(d.repartition(7), chunk=2).orderBy("doc_id").collect()
    assert a == b


def test_exact_substring_dups_covers_maximal_span(spark, tmp_path):
    """Lee-et-al seed semantics: a duplicated 7-token run with k=5
    yields 3 duplicated grams whose union covers all 7 positions;
    unique docs report 0."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_mod", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    run = "alpha beta gamma delta eps zeta eta"  # 7 tokens, shared
    rows = [
        (0, f"{run} tail0 tail1", "en", "s", 1),
        (1, f"head0 {run}", "en", "s", 1),
        (2, "all unique tokens here nothing repeats", "en", "s", 1),
        # <k tokens: sequence(1, n-k+1) would run descending without
        # the size guard and emit phantom grams
        (3, "tiny doc", "en", "s", 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_positions"])
        for r in mod.q_exact_substring_dups(spark, str(tmp_path)).collect()
    }
    assert got[0] == (9, 7)   # the whole run covered, tails not
    assert got[1] == (8, 7)
    assert got[2] == (6, 0)
    assert got[3] == (2, 0)


def test_ccnet_paragraph_filter_buckets(spark):
    """Tercile cutoffs from the distinct-score histogram: head gets the
    top-scoring third (ties spill into the higher bucket), tail is
    dropped (kept=0), every paragraph is bucketed exactly once."""
    from ner_spark.operators import lm

    # 9 docs of 20 tokens -> 1 paragraph each; repetition makes the
    # high-fluency docs share bigrams with the LM half
    rows = []
    for d in range(9):
        tok = f"tok{d % 3}"
        rows.append((d, " ".join([tok] * 20)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    model = lm.bigram_counts(docs.filter(F.col("doc_id") % 2 == 0))
    out = lm.ccnet_paragraph_filter(docs, model).collect()
    assert len(out) == 9
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r)
        assert r["kept"] == (0 if r["bucket"] == "tail" else 1)
    # every paragraph scored, buckets partition the set
    assert sum(len(v) for v in by_bucket.values()) == 9
    # scores within head >= scores within middle >= tail
    lo = lambda b: min(r["avg_prob_e6"] for r in by_bucket.get(b, [{"avg_prob_e6": 10**9}]))
    hi = lambda b: max(r["avg_prob_e6"] for r in by_bucket.get(b, [{"avg_prob_e6": -1}]))
    if "middle" in by_bucket and "head" in by_bucket:
        assert lo("head") >= hi("middle")
    if "tail" in by_bucket and "middle" in by_bucket:
        assert lo("middle") >= hi("tail")


def test_score_paragraphs_keeps_short_paragraphs(spark):
    """A paragraph with < 2 tokens has no bigrams; it must still come
    back (n_bigrams = 0, avg 0) rather than vanish from the rollup."""
    from ner_spark.operators import lm

    docs = spark.createDataFrame(
        [(0, " ".join(f"w{i}" for i in range(21)))],  # 20-token + 1-token paras
        "doc_id long, text string",
    )
    model = lm.bigram_counts(docs)
    got = {r["para_idx"]: r for r in lm.score_paragraphs(docs, model).collect()}
    assert set(got) == {0, 1}
    assert got[1]["n_bigrams"] == 0 and got[1]["avg_prob_e6"] == 0


def test_ccnet_paragraph_filter_partitioning_invariant(spark):
    """Cutoffs from the distinct-score histogram and integer scoring
    make the bucketing independent of physical layout."""
    from ner_spark.operators import lm

    rows = [(d, " ".join(f"w{(d * 7 + i) % 13}" for i in range(25))) for d in range(12)]
    a = spark.createDataFrame(rows, "doc_id long, text string").repartition(7)
    b = spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)
    model_a = lm.bigram_counts(a.filter(F.col("doc_id") % 2 == 0))
    model_b = lm.bigram_counts(b.filter(F.col("doc_id") % 2 == 0))
    ra = sorted(map(tuple, lm.ccnet_paragraph_filter(a, model_a).collect()))
    rb = sorted(map(tuple, lm.ccnet_paragraph_filter(b, model_b).collect()))
    assert ra == rb
