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
