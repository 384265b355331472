"""Corpus snapshot diff (operators/versioning.py)."""

from __future__ import annotations


def test_corpus_diff_statuses(spark):
    from chat_data_pipeline_spark.operators import versioning as V

    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "will vanish"), (4, None)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "changed!"), (4, None), (5, "brand new")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.status for r in V.corpus_diff(old, new).collect()}
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "removed",
        4: "unchanged",  # null == null content hashes equal (coalesce'd)
        5: "added",
    }
    summary = {
        r.status: r.n_docs for r in V.corpus_diff_summary(old, new).collect()
    }
    assert summary == {"unchanged": 2, "changed": 1, "removed": 1, "added": 1}
