"""Sketch scale-paths vs their exact twins: approx_count_distinct (HLL++)
and percentile_approx (t-digest-style) are the mergeable, map-side-combinable
replacements the 100 TB plan swaps in for countDistinct / percentile — this
guards that they stay within advertised error on the driver testdata."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("CDP_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def events(spark):
    from chat_data_pipeline_spark.queries import _read_events

    return _read_events(spark, SF_DIR)


def test_hll_distinct_within_rsd(events):
    row = events.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.05).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.15


def test_percentile_approx_near_exact(events):
    row = events.agg(
        F.expr("percentile(value, 0.5)").alias("exact"),
        F.percentile_approx("value", 0.5, 10_000).alias("approx"),
    ).collect()[0]
    assert row["exact"] > 0
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05


# ---------------------------------------------------------------------------
# Count-Min sketch (round 7)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_cms_never_undercounts_and_is_tight_here(spark, docs):
    """CMS guarantee: est(x) >= true count(x) for EVERY token; with this
    corpus's tiny vocab vs a 4x1024 table, collisions should cost nothing
    beyond the epsilon bound e/width of total mass."""
    import math

    from chat_data_pipeline_spark.functions import text as T
    from chat_data_pipeline_spark.operators import sketches as SK

    exact = {
        r.tok: r.c
        for r in docs.select(F.explode(T.words(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    total = sum(exact.values())
    sketch = SK.cms_table(docs, "text", depth=4, width=1024)
    cands = spark.createDataFrame([(t,) for t in exact], "tok string")
    est = {r.tok: r.est_count for r in SK.cms_estimate(sketch, cands).collect()}
    bound = math.e / 1024 * total
    for t, c in exact.items():
        assert est[t] >= c, t
        assert est[t] - c <= bound, t


def test_cms_merge_equals_whole_corpus_sketch(docs):
    """Cell-wise merge of two half-corpus sketches equals the one-pass
    sketch — the compositionality that makes per-shard / per-trigger
    sketches combine without rescans."""
    from chat_data_pipeline_spark.operators import sketches as SK

    a = SK.cms_table(docs.filter(F.col("doc_id") % 2 == 0), "text")
    b = SK.cms_table(docs.filter(F.col("doc_id") % 2 == 1), "text")
    merged = {
        (r.d, r.bucket): r.c for r in SK.cms_merge([a, b]).collect()
    }
    whole = {
        (r.d, r.bucket): r.c for r in SK.cms_table(docs, "text").collect()
    }
    assert merged == whole


def test_cms_heavy_hitters_no_false_negatives(docs):
    """Every token with true count >= the threshold appears in the output
    (overestimates can only ADD tokens, never drop one)."""
    from chat_data_pipeline_spark.functions import text as T
    from chat_data_pipeline_spark.operators import sketches as SK

    exact = {
        r.tok: r.c
        for r in docs.select(F.explode(T.words(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    hh = {r.tok for r in SK.cms_heavy_hitters(docs, "text", min_count=100).collect()}
    truly_heavy = {t for t, c in exact.items() if c >= 100}
    assert truly_heavy <= hh
