"""Benchmark n-gram decontamination (operators/decontamination.py)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from chat_data_pipeline_spark.operators import decontamination as DC


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _corpora(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # contains "quick brown fox jumps over the lazy dog" -> 8-gram hit
            (1, "she said the quick brown fox jumps over the lazy dog and left"),
            # shares words but no 8-gram
            (2, "the lazy dog sat alone while the quick cat watched the fox"),
            # too short for any 8-gram
            (3, "quick brown fox"),
        ],
        "doc_id long, text string",
    )
    return train, bench


def test_decontaminate_drops_overlapping_doc(spark):
    train, bench = _corpora(spark)
    kept = DC.ngram_decontaminate(train, bench, "text", "doc_id", ngram_size=8)
    assert sorted(r.doc_id for r in kept.collect()) == [2, 3]
    assert kept.columns == train.columns  # full schema preserved


def test_contamination_report_counts_distinct_doc_ngrams(spark):
    train, bench = _corpora(spark)
    rep = DC.contamination_report(train, bench, "text", "doc_id", ngram_size=8)
    rows = {r.doc_id: r.n_bench_ngrams for r in rep.collect()}
    # doc 1 embeds bench words 'the..dog' verbatim -> shares the two 8-grams
    # not involving the bench-only trailing 'today'
    assert rows == {1: 2}


def test_shuffled_fallback_matches_broadcast(spark):
    train, bench = _corpora(spark)
    a = DC.ngram_decontaminate(train, bench, "text", "doc_id", 8, broadcast_bench=True)
    b = DC.ngram_decontaminate(train, bench, "text", "doc_id", 8, broadcast_bench=False)
    assert sorted(r.doc_id for r in a.collect()) == sorted(r.doc_id for r in b.collect())


def test_probe_is_broadcast_no_train_shuffle(spark):
    train, bench = _corpora(spark)
    rep = DC.contamination_report(train, bench, "text", "doc_id", ngram_size=8)
    plan = _plan(rep)
    # bench probe must be a broadcast semi-join; shuffle exchanges are allowed
    # only for the bench-side distinct and the final per-doc count agg — the
    # train side must reach the probe unshuffled
    assert "BroadcastHashJoin" in plan
    import re

    shuffles = re.findall(r"\(\d+\) Exchange\b", plan)  # excludes BroadcastExchange
    assert len(shuffles) <= 2, plan
