"""Hashed-feature linear scoring — fasttext-style quality classifiers at scale.

Production curation pipelines gate documents with small linear classifiers
(fastText / logistic models over hashed bag-of-words, as in the CCNet and
LLaMA data pipelines — public methodology).  Inference over 100 TB must not
leave the JVM: with the model small enough to inline (hashed weight buckets),
the whole forward pass is a native Column fold —

    score = sigmoid(bias + mean over tokens of weight[bucket(token)])

- ``bucket(token)`` hashes via md5's first 2 hex chars (0..255) mod
  ``n_buckets`` — engine-independent, so the duckdb oracle reproduces the
  EXACT forward pass (xxhash64 would be JVM-only).
- weights ride the plan as an array literal (a few KB); no join, no UDF,
  no shuffle — the scan's projection does inference at read speed.
- the fold binds the token array once (single-element-transform idiom) and
  runs one interpreted `aggregate`; for models beyond ~64k buckets or real
  fastText n-gram vocabularies, switch to an Arrow-batched numpy UDF — same
  stage shape, still shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from chat_data_pipeline_spark.functions import text as T


def token_bucket(tok: Column, n_buckets: int) -> Column:
    """md5-derived bucket in [0, n_buckets) — identical in the SQL oracle via
    try_cast('0x' || substr(md5(tok), 1, 2) AS INTEGER) % n."""
    return F.pmod(
        F.conv(F.substring(F.md5(tok), 1, 2), 16, 10).cast("int"), F.lit(n_buckets)
    )


def linear_score(
    col: Column,
    weights: list[float],
    bias: float = 0.0,
) -> Column:
    """sigmoid(bias + mean_t weight[bucket(t)]) over the doc's word tokens.

    Empty docs score sigmoid(bias).  ``len(weights)`` defines the bucket
    count.
    """
    n = len(weights)
    if n == 0:
        raise ValueError("weights must be non-empty")
    warr = F.lit([float(w) for w in weights])

    def fold(tokens: Column) -> Column:
        total = F.aggregate(
            tokens,
            F.lit(0.0),
            lambda acc, t: acc + F.element_at(warr, token_bucket(t, n) + 1),
        )
        cnt = F.size(tokens)
        mean = F.when(cnt > 0, total / cnt).otherwise(F.lit(0.0))
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.lit(float(bias)) + mean)))

    return F.get(F.transform(F.array(T.words(col)), fold), 0)


def classifier_keep(
    col: Column, weights: list[float], bias: float = 0.0, threshold: float = 0.5
) -> Column:
    """Keep predicate: linear score >= threshold."""
    return linear_score(col, weights, bias) >= F.lit(float(threshold))
