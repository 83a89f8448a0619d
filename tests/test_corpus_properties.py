"""Property tests: the distributed corpus ops must agree with
straight-line pure-Python models on random corpora. Catches
partitioning/ordering bugs the planted-data tests can't (hypothesis
drives doc counts, token vocabularies, duplication patterns).

Random corpora are generated with hypothesis' own RNG (deterministic
per seed), then evaluated once on Spark and once in plain Python."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from collector_spark.operators.corpus import (
    pack_sequences,
    remove_duplicated_spans,
)

# small vocab → real cross-doc n-gram collisions
_WORD = st.sampled_from(["a", "b", "c", "d", "e"])
_DOC = st.lists(_WORD, min_size=0, max_size=12).map(" ".join)
_CORPUS = st.lists(_DOC, min_size=1, max_size=8)


def _py_span_removal(texts: list[str], n: int):
    toks = [t.split() if t.split() else [] for t in texts]
    from collections import defaultdict

    docs_per_gram = defaultdict(set)
    for i, ws in enumerate(toks):
        for p in range(len(ws) - n + 1):
            docs_per_gram[tuple(ws[p : p + n])].add(i)
    out = {}
    for i, ws in enumerate(toks):
        covered = set()
        for p in range(len(ws) - n + 1):
            if len(docs_per_gram[tuple(ws[p : p + n])]) >= 2:
                covered.update(range(p, p + n))
        kept = [w for j, w in enumerate(ws) if j not in covered]
        out[i] = (" ".join(kept), len(kept), len(ws) - len(kept))
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_CORPUS, n=st.integers(2, 3))
def test_span_removal_matches_python_model(spark, corpus, n):
    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.clean_text, r.kept_tokens, r.removed_tokens)
        for r in remove_duplicated_spans(df, n=n).collect()
    }
    assert got == _py_span_removal(corpus, n)


def _py_pack(sizes: list[tuple[int, int]], budget: int):
    # sizes: (doc_id, n_tokens) — packing follows ascending doc_id
    out = {}
    start = 0
    for doc_id, n_tok in sorted(sizes):
        out[doc_id] = (n_tok, start // budget)
        start += n_tok
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(st.integers(0, 9), min_size=1, max_size=30),
    budget=st.integers(1, 20),
    n_buckets=st.integers(1, 5),
)
def test_pack_sequences_matches_python_model(spark, sizes, budget, n_buckets):
    rows = [(i * 3, " ".join(["w"] * s)) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.bin_id)
        for r in pack_sequences(
            df, budget=budget, n_buckets=n_buckets
        ).collect()
    }
    expect = _py_pack([(i * 3, s) for i, s in enumerate(sizes)], budget)
    assert got == expect


# ---------------------------------------------------------------------------
# Curation ops vs pure-Python models on random corpora
# ---------------------------------------------------------------------------

def _py_budget_select(rows, budget):
    # rows: (doc_id, score, n_tokens); greedy by (score desc, id asc)
    out, cum = {}, 0
    for i, s, n in sorted(rows, key=lambda r: (-r[1], r[0])):
        cum += n
        if cum <= budget:
            out[i] = (s, n, cum)
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    corpus=st.lists(_DOC, min_size=1, max_size=12),
    budget=st.integers(1, 40),
    # coarse score grid → frequent ties exercise the id tiebreak
    scores=st.data(),
)
def test_token_budget_select_matches_python_model(spark, corpus, budget, scores):
    from pyspark.sql import functions as F

    from collector_spark.operators.curation import token_budget_select

    svals = [
        scores.draw(st.sampled_from([0.0, 0.25, 0.5, 0.75, 1.0]))
        for _ in corpus
    ]
    df = spark.createDataFrame(
        [(i, t, s) for i, (t, s) in enumerate(zip(corpus, svals))],
        "doc_id long, text string, s double",
    )
    got = {
        r.doc_id: (r.score, r.n_tokens, r.cum_tokens)
        for r in token_budget_select(
            df, budget, F.col("s"), n_buckets=4
        ).collect()
    }
    rows = [(i, s, len(t.split())) for i, (t, s) in enumerate(zip(corpus, svals))]
    assert got == _py_budget_select(rows, budget)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ids=st.lists(st.integers(0, 10**6), min_size=1, max_size=30, unique=True))
def test_deterministic_shuffle_rank_matches_python_model(spark, ids):
    import hashlib

    from collector_spark.operators.curation import deterministic_shuffle

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r.doc_id: r.position
        for r in deterministic_shuffle(df.repartition(5), "seed").collect()
    }
    keys = {i: hashlib.md5(f"seed|{i}".encode()).hexdigest() for i in ids}
    want = {
        i: rank + 1 for rank, i in enumerate(sorted(ids, key=lambda i: keys[i]))
    }
    assert got == want
