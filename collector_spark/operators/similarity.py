"""Similarity search over an embedding column (array<float>).

Two paths, per the scale playbook:

- ``brute_force_topk`` — exact cosine top-k: broadcast the (small) query
  set against the corpus; the dot product is a native ``F.zip_with`` +
  ``F.aggregate`` expression (JVM-side, codegen — no Python); top-k via
  window rank partitioned by query. Baseline + oracle-checkable.

- ``lsh_topk`` — random-hyperplane LSH: each vector gets a b-bit sign
  sketch (deterministic hyperplanes from a seeded hash, computed in a
  vectorized numpy pandas UDF); candidates are vectors sharing a sketch
  band with the query; exact cosine re-rank happens only within buckets.
  At 100 TB this turns an all-pairs O(N·Q) scan into bucket-local work
  with a uniformly-distributed (hash) join key — no skew, no full scan.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def cosine_col(a: Column, b: Column) -> Column:
    """Native cosine similarity between two array<float/double> columns.

    Elements are cast to double BEFORE accumulation so the result is
    reproducible (and matches DuckDB's list_cosine_similarity on the same
    float32 parquet inputs, which also promotes to double).
    """
    def dot(x: Column, y: Column) -> Column:
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """Exact top-k neighbors per query vector.

    Returns (query_id, neighbor_id, cosine, rank), self-match excluded.
    Ties broken by neighbor_id for full determinism; optional rounding
    keeps float totals comparable across engines.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    sim = cosine_col(F.col("_qv"), F.col("_cv"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# LSH (random hyperplanes / sign sketch)
# ---------------------------------------------------------------------------


def _hyperplanes(dim: int, bits: int, seed: int) -> np.ndarray:
    """Deterministic (bits, dim) hyperplane matrix from seeded md5 —
    identical on every executor and in tests without shipping state."""
    rows = []
    for i in range(bits * dim):
        d = hashlib.md5(f"hp:{seed}:{i}".encode()).digest()
        # uniform in [-1, 1)
        rows.append((int.from_bytes(d[:8], "big") / float(1 << 64)) * 2 - 1)
    return np.array(rows, dtype=np.float64).reshape(bits, dim)


def _make_sketch_udf(dim: int, bits: int, seed: int):
    planes = _hyperplanes(dim, bits, seed)

    def udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            mat = np.stack(s.map(lambda v: np.asarray(v, dtype=np.float64)).values)
            signs = (mat @ planes.T) >= 0  # (n, bits)
            weights = 1 << np.arange(bits, dtype=np.uint64)
            vals = (signs.astype(np.uint64) * weights).sum(axis=1)
            yield pd.Series(vals.astype(np.int64))

    return F.pandas_udf(udf, T.LongType())


def add_sketch(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    bits: int = 16,
    seed: int = 42,
    out_col: str = "sketch",
) -> DataFrame:
    return df.withColumn(out_col, _make_sketch_udf(dim, bits, seed)(F.col(vec_col)))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bits: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share ≥1 sketch band with the query,
    exact cosine re-rank within candidates. Recall rises with bands.
    """
    assert bits % bands == 0
    width = bits // bands
    mask = (1 << width) - 1

    def banded(df: DataFrame, side: str) -> DataFrame:
        sk = add_sketch(df, vec_col, dim, bits, seed)
        arr = F.array(
            *[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned(F.col("sketch"), i * width)
                    .bitwiseAND(F.lit(mask))
                    .alias("bv"),
                )
                for i in range(bands)
            ]
        )
        return sk.select(
            F.col(id_col).alias(f"{side}_id"),
            F.col(vec_col).alias(f"{side}_vec"),
            F.explode(arr).alias("b"),
        ).select(f"{side}_id", f"{side}_vec", F.col("b.band").alias("band"), F.col("b.bv").alias("bv"))

    qb = banded(queries, "query")
    cb = banded(corpus, "neighbor")
    cand = (
        qb.join(cb, ["band", "bv"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    sim = F.round(cosine_col(F.col("query_vec"), F.col("neighbor_vec")), 6)
    scored = cand.select("query_id", "neighbor_id", sim.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN
# ---------------------------------------------------------------------------


def _centroids(dim: int, n_centroids: int, seed: int) -> np.ndarray:
    """Deterministic L2-normalized pseudo-random centroids (md5-seeded,
    identical on every executor — same trick as _hyperplanes). A k-means
    refinement would sharpen recall; the partition/probe mechanics are
    identical either way."""
    raw = []
    for i in range(n_centroids * dim):
        d = hashlib.md5(f"ivf:{seed}:{i}".encode()).digest()
        raw.append((int.from_bytes(d[:8], "big") / float(1 << 64)) * 2 - 1)
    c = np.array(raw, dtype=np.float64).reshape(n_centroids, dim)
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def _make_assign_udf(dim: int, n_centroids: int, seed: int, n_probe: int):
    planes = _centroids(dim, n_centroids, seed)

    def udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            mat = np.stack(s.map(lambda v: np.asarray(v, dtype=np.float64)).values)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            sims = (mat / norms) @ planes.T  # (n, c)
            # top n_probe centroid ids per vector, best first
            top = np.argsort(-sims, axis=1)[:, :n_probe]
            yield pd.Series(list(top.astype(np.int32)))

    return F.pandas_udf(udf, T.ArrayType(T.IntegerType()))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in ONE inverted list
    (their nearest centroid); each query probes its ``n_probe`` nearest
    lists and re-ranks exactly within them.

    Scale shape: the corpus is partitioned by centroid id (a bounded-
    cardinality key — repartition once, reuse for every query batch);
    per-query work is |corpus|*(n_probe/n_centroids) instead of |corpus|.
    Recall tuning is n_probe (and centroid quality); n_probe=n_centroids
    degrades gracefully to exact brute force.
    """
    assign = _make_assign_udf(dim, n_centroids, seed, 1)
    probe = _make_assign_udf(dim, n_centroids, seed, n_probe)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        F.explode(assign(F.col(vec_col))).alias("list_id"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.explode(probe(F.col(vec_col))).alias("list_id"),
    )
    sim = F.round(cosine_col(F.col("_qv"), F.col("_cv")), 6)
    # each corpus vector is in exactly ONE list → a (query, neighbor)
    # pair can only arise once; no dedup shuffle needed
    scored = (
        q.join(c, "list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bits: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >=
    threshold) via the same banded sign-sketch candidate generation."""
    assert bits % bands == 0
    width = bits // bands
    mask = (1 << width) - 1
    sk = add_sketch(df, vec_col, dim, bits, seed)
    arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(F.col("sketch"), i * width)
                .bitwiseAND(F.lit(mask))
                .alias("bv"),
            )
            for i in range(bands)
        ]
    )
    banded = sk.select(
        F.col(id_col), F.col(vec_col), F.explode(arr).alias("b")
    ).select(id_col, vec_col, F.col("b.band").alias("band"), F.col("b.bv").alias("bv"))
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bv") == F.col("r.bv"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col(f"l.{vec_col}").alias("_va"),
            F.col(f"r.{vec_col}").alias("_vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    sim = F.round(cosine_col(F.col("_va"), F.col("_vb")), 6)
    return (
        cand.select("id_a", "id_b", sim.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
