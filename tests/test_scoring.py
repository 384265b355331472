"""Hashed-feature linear scoring (functions/scoring.py)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from chat_data_pipeline_spark.functions import scoring as SC


def _bucket(tok: str, n: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:2], 16) % n


def test_linear_score_matches_python_forward_pass(spark):
    weights = [((i * 7) % 11 - 5) / 8.0 for i in range(16)]
    bias = 0.25
    texts = ["the cat sat", "one two three four five six", "", None]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    got = {
        r.id: r.s
        for r in df.select(
            "id", SC.linear_score(F.col("text"), weights, bias).alias("s")
        ).collect()
    }
    for i, t in enumerate(texts):
        import re

        toks = re.findall(r"[^\W]+", (t or "").lower(), re.UNICODE)
        mean = (
            sum(weights[_bucket(tok, 16)] for tok in toks) / len(toks) if toks else 0.0
        )
        want = 1.0 / (1.0 + math.exp(-(bias + mean)))
        # null text falls through to the empty-doc branch: sigmoid(bias)
        assert got[i] == pytest.approx(want, rel=1e-12), (i, t)


def test_classifier_keep_threshold(spark):
    # single bucket, weight +1: every non-empty doc scores sigmoid(1) ~ 0.73
    df = spark.createDataFrame([(1, "hello world"), (2, "")], "id long, text string")
    kept = {
        r.id
        for r in df.filter(
            SC.classifier_keep(F.col("text"), [1.0], threshold=0.6)
        ).collect()
    }
    assert kept == {1}  # empty doc scores sigmoid(0) = 0.5 < 0.6


def test_rejects_empty_weights(spark):
    with pytest.raises(ValueError):
        SC.linear_score(F.lit("x"), [])


def test_stratified_and_split_determinism(spark):
    from chat_data_pipeline_spark.operators.sampling import hash_split, sample_stratified

    df = spark.range(1000).selectExpr(
        "id AS doc_id", "CASE WHEN id % 2 = 0 THEN 'en' ELSE 'zh' END AS lang"
    )
    a = {r.doc_id for r in sample_stratified(df, "lang", {"en": 0.5, "zh": 0.1}, "doc_id").collect()}
    b = {r.doc_id for r in sample_stratified(df.repartition(7), "lang", {"en": 0.5, "zh": 0.1}, "doc_id").collect()}
    assert a == b  # layout-independent membership
    en = sum(1 for i in a if i % 2 == 0) / 500
    zh = sum(1 for i in a if i % 2 == 1) / 500
    assert 0.4 < en < 0.6 and zh < 0.2  # fractions roughly honored

    s = hash_split(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in s.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > 700
    # total assignment, no row lost
    assert sum(counts.values()) == 1000

    import pytest as _pytest

    with _pytest.raises(ValueError):
        hash_split(df, "doc_id", {"train": 0.5, "val": 0.1})
