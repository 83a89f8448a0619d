"""Data-curation operators: corpus-level statistical scoring and
selection passes that decide WHICH documents (and in what order) feed
an LM training run.

Beyond the reference (ThoronicLLC/collector routes rows; it never
selects or orders a corpus) — these are the selection half of a
training-data pipeline, complementing the hygiene half in corpus.py:

- ``unigram_logprob`` — per-document cross-entropy against the
  corpus's own Laplace-smoothed unigram distribution (the CCNet-style
  "LM perplexity" quality proxy, with the corpus itself as the LM).
  Low score = ordinary prose; high score = rare-token soup.
- ``token_budget_select`` — greedy curriculum selection: order docs by
  quality (desc, id-tiebreak) and keep the prefix whose cumulative
  token count fits a budget. The global running sum is distributed
  (score-grid buckets + tiny offset window), never a single-partition
  Window.orderBy funnel.
- ``deterministic_shuffle`` — a salt-keyed global shuffle order for
  training (position = rank of md5(salt|id)). Stable across runs,
  machines, and partitionings; re-salting gives a fresh epoch order.
- ``source_mix_weights`` — per-source sampling weights that reshape
  the corpus's actual token share into a target mixture
  (weight = target_share / actual_share).

Scale shapes (100 TB):
- ``unigram_logprob`` shuffles (id, token) pairs once to meet the
  vocab table (one row per distinct token — the join never explodes);
  hot tokens ("the") skew shuffle partitions, which AQE skew-split
  handles, and the T/V scalars ride a 1-row broadcast, not a driver
  collect.
- ``token_budget_select`` and ``deterministic_shuffle`` both use the
  two-phase distributed prefix pattern from corpus.pack_sequences:
  per-bucket partials in parallel, then only n_buckets tiny rows cross
  the single-partition offset window. Bucket keys are pure functions
  of the sort key (score grid / md5 hex prefix) so bucket order IS
  global order.
- ``source_mix_weights`` is a map-side-combinable agg to n_sources
  rows; the total-token window runs over that tiny aggregate only.

Every operator has an exact DuckDB replay in
``__spark_entry__.oracle_sql()`` (floats rounded identically on both
sides; md5 hex is identical in Spark and DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from collector_spark.operators.corpus import _words

__all__ = [
    "unigram_logprob",
    "token_budget_select",
    "deterministic_shuffle",
    "source_mix_weights",
]


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document mean negative log-probability (nats) under the
    corpus's Laplace-smoothed unigram model.

    p(w) = (count(w) + 1) / (T + V) with T = total tokens and
    V = distinct tokens, both over the whole corpus. Returns
    (id, n_tokens, nll) for documents with at least one token; ``nll``
    is rounded to 6 decimals so the double-precision sum order never
    shows in an equality check.

    Two shuffles total: one to build the vocab (token -> count, one
    row per distinct token) and one to bring (id, token) rows to their
    vocab row; the (T, V) scalars are a 1-row broadcast cross join, so
    the whole thing is a single job with no driver-side loop.
    """
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(_words(text_col)).alias("_tok"),
    )
    vocab = toks.groupBy("_tok").agg(F.count(F.lit(1)).alias("_cnt"))
    totals = vocab.agg(
        F.sum("_cnt").alias("_T"), F.count(F.lit(1)).alias("_V")
    )
    scored = (
        toks.join(vocab, "_tok")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "_nlp",
            -F.log(
                (F.col("_cnt") + F.lit(1)).cast("double")
                / (F.col("_T") + F.col("_V")).cast("double")
            ),
        )
    )
    return scored.groupBy("_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_tokens"),
        F.round(F.avg("_nlp"), 6).alias("nll"),
    ).select(F.col("_id").alias(id_col), "n_tokens", "nll")


def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document mean negative log-probability (nats) under the
    corpus's Laplace-smoothed CONDITIONAL bigram model — the next rung
    up from ``unigram_logprob`` on the CCNet quality-proxy ladder
    (repetitive or templated text scores low; token-soup scores high
    even when its unigrams are ordinary).

    p(w2 | w1) = (c(w1,w2) + 1) / (c(w1,·) + V) with V = distinct
    unigram tokens over the corpus and c(w1,·) summed over observed
    bigrams. Returns (id, n_bigrams, nll) for documents with ≥2
    tokens; ``nll`` rounded to 6 decimals (sum-order-proof equality).

    Scale shape: bigram pairs are built INSIDE the row via slice +
    zip_with on the projected token array (no positional self-join —
    at 100 TB a join on (doc, pos) would shuffle the whole corpus
    twice). Two aggregation shuffles (bigram counts; per-doc mean) plus
    one join of pairs→counts; context totals derive from the bigram
    count table (rows = distinct bigrams, far smaller than the pair
    stream), and the V scalar rides a 1-row broadcast.
    """
    d = (
        df.select(F.col(id_col).alias("_id"), _words(text_col).alias("_w"))
        .withColumn("_n", F.size("_w"))
        .filter(F.col("_n") >= 2)
    )
    pairs = d.select(
        "_id",
        F.explode(
            F.zip_with(
                F.slice("_w", 1, F.col("_n") - 1),
                F.slice("_w", 2, F.col("_n") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("_b"),
    ).select("_id", F.col("_b.w1").alias("_w1"), F.col("_b.w2").alias("_w2"))

    cb = pairs.groupBy("_w1", "_w2").agg(F.count(F.lit(1)).alias("_cb"))
    ctx = cb.groupBy("_w1").agg(F.sum("_cb").alias("_cw"))
    vocab = df.select(F.explode(_words(text_col)).alias("_t")).agg(
        F.count_distinct("_t").alias("_V")
    )
    scored = (
        pairs.join(cb, ["_w1", "_w2"])
        .join(ctx, "_w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "_nlp",
            -F.log(
                (F.col("_cb") + F.lit(1)).cast("double")
                / (F.col("_cw") + F.col("_V")).cast("double")
            ),
        )
    )
    return (
        scored.groupBy("_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_bigrams"),
            F.round(F.avg("_nlp"), 6).alias("nll"),
        )
        .select(F.col("_id").alias(id_col), "n_bigrams", "nll")
    )


def token_budget_select(
    df: DataFrame,
    budget: int,
    score_col: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> DataFrame:
    """Greedy quality-first curriculum selection: rank documents by
    ``score_col`` descending (ties broken by id ascending) and keep
    the prefix whose cumulative token count stays within ``budget``
    (a document is kept iff the running total INCLUDING it fits).
    Returns (id, score, n_tokens, cum_tokens) for the kept prefix.

    ``score_col`` must be deterministic and in [0, 1] (e.g.
    textstats.quality_score_col, already rounded to 4 decimals) — the
    score grid ``floor((1 - score) * n_buckets)`` buckets rows so that
    bucket ascending == score descending, making the global running
    sum a two-phase distributed scan (per-bucket partials, then an
    offset window over only n_buckets rows).
    """
    wc = df.select(
        F.col(id_col).alias("_id"),
        score_col.alias("score"),
        F.size(_words(text_col)).alias("n_tokens"),
    )
    # grid bucket: pure function of the sort key, so (bucket asc,
    # score desc, id asc) is the exact global order
    wc = wc.withColumn(
        "_b",
        F.least(
            F.floor((F.lit(1.0) - F.col("score")) * n_buckets),
            F.lit(n_buckets - 1),
        ).cast("bigint"),
    )
    per_bucket = wc.groupBy("_b").agg(F.sum("n_tokens").alias("_bt"))
    w_off = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_bucket.withColumn(
        "_off", F.coalesce(F.sum("_bt").over(w_off), F.lit(0))
    ).select("_b", "_off")
    w_doc = (
        Window.partitionBy("_b")
        .orderBy(F.desc("score"), F.asc("_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum("n_tokens").over(w_doc) + F.col("_off")
    return (
        wc.join(offsets, "_b")
        .withColumn("cum_tokens", cum)
        .filter(F.col("cum_tokens") <= budget)
        .select(F.col("_id").alias(id_col), "score", "n_tokens", "cum_tokens")
    )


def deterministic_shuffle(
    df: DataFrame,
    salt: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Salt-keyed deterministic global shuffle order for training:
    position = rank of md5(salt || '|' || id) (1-based, dense, total).
    Returns the input columns plus (shuffle_key, position).

    Stable across runs, machines, partition counts, and input order —
    the property an epoch-order shuffle needs at 100 TB, where RNG
    state or zipWithIndex would tie the order to the physical layout.
    Re-salting ("epoch1", "epoch2", ...) gives independent orders.

    Distributed rank: the bucket is the first two hex chars of the key
    (a PREFIX, so bucket order is key order), ranks are per-bucket
    row_numbers shifted by an exclusive prefix sum over the 256 bucket
    counts — only 256 tiny rows cross the single-partition window.
    """
    key = F.md5(F.concat(F.lit(salt), F.lit("|"), F.col(id_col).cast("string")))
    wc = df.withColumn("shuffle_key", key).withColumn(
        "_b", F.substring("shuffle_key", 1, 2)
    )
    per_bucket = wc.groupBy("_b").agg(F.count(F.lit(1)).alias("_bn"))
    w_off = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_bucket.withColumn(
        "_off", F.coalesce(F.sum("_bn").over(w_off), F.lit(0))
    ).select("_b", "_off")
    w_in = Window.partitionBy("_b").orderBy("shuffle_key")
    return (
        wc.join(offsets, "_b")
        .withColumn(
            "position", (F.row_number().over(w_in) + F.col("_off")).cast("bigint")
        )
        .drop("_b", "_off")
    )


def source_mix_weights(
    df: DataFrame,
    targets: dict,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source sampling weights that turn the corpus's actual token
    mixture into ``targets`` (source -> target share, summing to ~1).
    weight = target_share / actual_share: >1 upsample, <1 downsample —
    the mixture-reweighting step of LM data recipes (e.g. The Pile /
    DoReMi-style fixed mixtures). Returns
    (source, n_docs, n_tokens, actual_share, target_share, weight).

    One map-side-combinable agg to n_sources rows; the corpus-total
    window and the target lookup run over that tiny aggregate only.
    Sources absent from ``targets`` get target_share 0 (weight 0 —
    excluded from the mix).
    """
    per_src = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(_words(text_col))).alias("n_tokens"),
    )
    total = Window.partitionBy()
    expr = None
    for src, share in sorted(targets.items()):
        cond = F.col("source") == src
        expr = F.when(cond, F.lit(float(share))) if expr is None else expr.when(
            cond, F.lit(float(share))
        )
    target = expr.otherwise(F.lit(0.0)) if expr is not None else F.lit(0.0)
    actual = F.col("n_tokens").cast("double") / F.sum("n_tokens").over(total)
    return per_src.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(actual, 6).alias("actual_share"),
        F.round(target, 6).alias("target_share"),
        # try_divide: a zero-token source yields NULL weight (matches
        # DuckDB /0 → NULL) instead of an ANSI-mode runtime error
        F.round(F.try_divide(target, actual), 6).alias("weight"),
    )
