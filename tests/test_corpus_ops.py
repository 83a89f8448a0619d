"""Planted-data tests for the corpus-hygiene operators
(collector_spark/operators/corpus.py): decontamination, duplicated-span
profiling, repetition filter, vocab top-k, deterministic hash split.

The sf0.01 gate (test_queries_vs_duckdb) checks these against DuckDB on
real tables; here we pin the SEMANTICS on tiny planted corpora where the
expected values are computable by hand."""

import pytest

from collector_spark.operators.corpus import (
    contamination_profile,
    dup_span_profile,
    hash_split,
    repetition_profile,
    vocab_top_k,
    word_ngrams_exploded,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_ngrams_short_and_empty_docs_yield_no_rows(spark):
    df = _docs(spark, [(1, "a b"), (2, ""), (3, "   "), (4, "a b c")])
    out = word_ngrams_exploded(df, n=3).collect()
    assert [(r._id, r._gram) for r in out] == [(4, "a b c")]


def test_word_ngrams_slides_and_distinct(spark):
    df = _docs(spark, [(1, "x y x y x")])
    plain = [r._gram for r in word_ngrams_exploded(df, n=2).collect()]
    assert plain == ["x y", "y x", "x y", "y x"]
    dis = sorted(
        r._gram for r in word_ngrams_exploded(df, n=2, distinct=True).collect()
    )
    assert dis == ["x y", "y x"]


def test_contamination_planted_overlap(spark):
    # train doc 1 shares its only 3-gram with the benchmark; doc 2 shares
    # one of two; doc 3 none; doc 4 is too short to have any 3-gram.
    train = _docs(
        spark,
        [
            (1, "the quick fox"),
            (2, "lazy dog sleeps here"),
            (3, "totally clean document text"),
            (4, "hi"),
        ],
    )
    bench = _docs(spark, [(100, "the quick fox jumps"), (101, "dog sleeps here now")])
    got = {
        r.doc_id: (r.n_grams, r.hit_grams, r.contamination_ratio)
        for r in contamination_profile(train, bench, n=3).collect()
    }
    assert got == {
        1: (1, 1, 1.0),
        2: (2, 1, 0.5),
        3: (2, 0, 0.0),
        4: (0, 0, 0.0),
    }


def test_dup_span_planted(spark):
    # docs 1 and 2 share the 2-gram "b c"; doc 3 is disjoint.
    df = _docs(spark, [(1, "a b c"), (2, "b c d"), (3, "x y z")])
    got = {
        r.doc_id: (r.n_grams, r.dup_grams, r.dup_ratio)
        for r in dup_span_profile(df, n=2).collect()
    }
    assert got == {1: (2, 1, 0.5), 2: (2, 1, 0.5), 3: (2, 0, 0.0)}


def test_repetition_profile_planted(spark):
    # "a b a b a b" → 2-grams: [a b, b a, a b, b a, a b] → top 'a b' 3/5
    df = _docs(spark, [(1, "a b a b a b"), (2, "u v w"), (3, "q")])
    got = {
        r.doc_id: (r.n_grams, r.top_count, r.top_share)
        for r in repetition_profile(df, n=2).collect()
    }
    assert got == {1: (5, 3, 0.6), 2: (2, 1, 0.5), 3: (0, 0, 0.0)}


def test_vocab_top_k_order_and_ties(spark):
    df = _docs(spark, [(1, "b a b c a b"), (2, "c a")])
    rows = vocab_top_k(df, k=2).collect()
    # counts: a=3, b=3, c=2 → ties broken by token asc
    assert [(r.token, r.cnt) for r in rows] == [("a", 3), ("b", 3)]


def test_hash_split_is_deterministic_and_partition_independent(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.split for r in hash_split(df).collect()}
    b = {
        r.doc_id: r.split
        for r in hash_split(df.repartition(13, "doc_id")).collect()
    }
    assert a == b
    # 80/10/10 within a loose binomial band at n=2000
    n = len(a)
    train = sum(v == "train" for v in a.values()) / n
    val = sum(v == "val" for v in a.values()) / n
    assert 0.75 < train < 0.85, train
    assert 0.07 < val < 0.13, val


def test_hash_split_rejects_nothing_and_covers_all_rows(spark):
    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    out = hash_split(df)
    assert out.count() == 500
    assert out.filter(out.split.isNull()).count() == 0
