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


def test_corpus_drift_hand_computed(spark):
    """r11 drift report: counts, token masses, integer-nano shares and
    deltas on a planted two-snapshot pair — including a group present in
    only one snapshot and a NULL group."""
    from chat_data_pipeline_spark.operators.versioning import corpus_drift_report

    old = spark.createDataFrame(
        [(1, "en", "one two three"), (2, "en", "four five"), (3, "de", "eins zwei")],
        "doc_id long, lang string, text string",
    )
    new = spark.createDataFrame(
        [(4, "en", "one two"), (5, None, "x y z w")],
        "doc_id long, lang string, text string",
    )
    got = {r["group"]: tuple(r)[1:] for r in corpus_drift_report(old, new).collect()}
    # old totals: en 5 tokens, de 2 (tot 7); new: en 2, null 4 (tot 6)
    assert got["en"] == (2, 1, -1, 5, 2, round(5e9 / 7), round(2e9 / 6), round(2e9 / 6) - round(5e9 / 7))
    assert got["de"] == (1, 0, -1, 2, 0, round(2e9 / 7), 0, -round(2e9 / 7))
    assert got["\x1f<null>"] == (0, 1, 1, 0, 4, 0, round(4e9 / 6), round(4e9 / 6))
    assert set(got) == {"en", "de", "\x1f<null>"}


def test_corpus_drift_identical_snapshots_zero_deltas(spark):
    from chat_data_pipeline_spark.operators.versioning import corpus_drift_report

    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "de", f"w{i} common text") for i in range(20)],
        "doc_id long, lang string, text string",
    )
    for r in corpus_drift_report(df, df).collect():
        assert r.delta_n == 0 and r.share_delta_nanos == 0
        assert r.n_old == r.n_new and r.tokens_old == r.tokens_new
