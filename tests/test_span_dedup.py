"""Corpus-wide paragraph dedup (operators/span_dedup.py)."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from chat_data_pipeline_spark.operators import span_dedup as SD


def test_first_occurrence_wins_and_reassembly_order(spark):
    rows = [
        (1, "alpha\n\nshared\n\nbeta"),
        (2, "shared\n\ngamma"),  # 'shared' already seen in doc 1
        (3, "gamma\n\nalpha"),  # both already seen
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.text_dedup for r in SD.paragraph_dedup(df, "text", "doc_id").collect()}
    assert got[1] == "alpha\n\nshared\n\nbeta"
    assert got[2] == "gamma"
    assert 3 not in got  # every paragraph of doc 3 was claimed earlier


def test_within_doc_duplicates_collapse(spark):
    df = spark.createDataFrame([(7, "x\n\nx\n\ny")], "doc_id long, text string")
    got = SD.paragraph_dedup(df, "text", "doc_id").first()
    assert got.text_dedup == "x\n\ny"


def test_blank_and_whitespace_paragraphs_dropped(spark):
    df = spark.createDataFrame(
        [(1, "  a  \n\n   \n\nb")], "doc_id long, text string"
    )
    got = SD.paragraph_dedup(df, "text", "doc_id").first()
    assert got.text_dedup == "a\n\nb"  # trimmed, blank gone


def test_plan_uses_agg_join_not_paragraph_window(spark):
    df = spark.createDataFrame([(1, "a\n\nb")], "doc_id long, text string")
    out = SD.paragraph_dedup(df, "text", "doc_id")
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    # skew-safety contract: winner selection must be an aggregation feeding a
    # join — a Window over paragraph content would serialize hot keys
    assert "Window" not in plan
    assert re.search(r"\(\d+\) (SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan)


def test_within_doc_dedup_keeps_first_occurrence_order(spark):
    rows = [
        (1, "nav menu\n\nbody one\n\nnav menu\n\nbody two\n\nnav menu"),
        (2, "only\n\n\n\nonly\n\n  only  \n\nlast"),  # blanks + trim dupes
        (3, "unique a\n\nunique b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.text_dedup
        for r in SD.dedup_paragraphs_within_doc(df, "text").collect()
    }
    # repeated template block survives once, at its first position
    assert got[1] == "nav menu\n\nbody one\n\nbody two"
    # trimmed-equal paragraphs dedup; blank paragraphs drop
    assert got[2] == "only\n\nlast"
    # no-dup documents are reassembled unchanged
    assert got[3] == "unique a\n\nunique b"


def test_within_doc_dedup_is_narrow(spark):
    df = spark.createDataFrame([(1, "a\n\nb")], "doc_id long, text string")
    buf = io.StringIO()
    with redirect_stdout(buf):
        SD.dedup_paragraphs_within_doc(df, "text").explain("formatted")
    assert "Exchange" not in buf.getvalue()  # zero-shuffle projection


def test_dedup_paragraphs_registered_as_cleaner(spark):
    """The intra-doc dedup is reachable from the YAML/registry surface and
    stacks with reference cleaners inside one SparkPreprocessor run."""
    from chat_data_pipeline_spark.plans.pipeline import SparkPreprocessor

    # repeats are trim-equal (the cleaner trims before comparing);
    # normalize_whitespace stacks ahead of the dedup in the same projection
    df = spark.createDataFrame(
        [(1, "nav menu\n\nbody\n\n  nav menu  ")], "doc_id long, text string"
    )
    pre = SparkPreprocessor(
        column_name="text",
        cleaners=["normalize_whitespace", "dedup_paragraphs"],
        filters=[],
        deduplication_config={},
    )
    out = pre.run(df).collect()
    assert out[0].text == "nav menu\n\nbody"
