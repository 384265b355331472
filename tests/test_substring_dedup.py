"""ExactSubstr dedup (operators/substring_dedup.py)."""

from __future__ import annotations

from chat_data_pipeline_spark.operators import substring_dedup as SS


def _run(spark, rows, k):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r.doc_id: r.text_dedup
        for r in SS.exact_substring_dedup(df, "text", "doc_id", k=k).collect()
    }


def test_first_occurrence_keeps_span(spark):
    shared = "one two three four"
    rows = [
        (1, f"intro {shared} outro"),
        (2, f"start {shared} end"),
        (3, "totally different words here now"),
    ]
    got = _run(spark, rows, k=4)
    assert got[1] == f"intro {shared} outro"  # winner: doc 1 keeps the run
    assert got[2] == "start end"  # span cut, surroundings survive
    assert got[3] == rows[2][1]  # untouched doc passes through verbatim


def test_overlapping_duplicate_windows_union(spark):
    # 5-token duplicate run with k=4 -> two overlapping windows in each copy;
    # the union of their intervals must cut all 5 tokens from the loser
    run = "a b c d e"
    rows = [(1, f"{run} tail1"), (2, f"head2 {run}")]
    got = _run(spark, rows, k=4)
    assert got[1] == f"{run} tail1"
    assert got[2] == "head2"


def test_whole_doc_cut_yields_empty(spark):
    rows = [(1, "x y z w"), (2, "x y z w")]
    got = _run(spark, rows, k=4)
    assert got[1] == "x y z w"
    assert got[2] == ""


def test_in_document_repeats_also_cut(spark):
    # the same 4-gram twice in ONE doc: second occurrence cut
    rows = [(5, "p q r s filler p q r s")]
    got = _run(spark, rows, k=4)
    assert got[5] == "p q r s filler"


def test_short_docs_pass_through(spark):
    rows = [(1, "too short"), (2, "too short")]  # < k tokens -> no windows
    got = _run(spark, rows, k=4)
    assert got[1] == "too short" and got[2] == "too short"
