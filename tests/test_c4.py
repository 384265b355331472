"""C4 page cleaning (Raffel et al. 2020 §2.2) — rule-by-rule checks on
crafted pages."""

from __future__ import annotations

from pyspark.sql import functions as F

from chat_data_pipeline_spark.functions import c4 as C4


def _clean(spark, pages, **kw):
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pages)], "id long, page string"
    )
    rows = (
        df.select(
            "id",
            C4.c4_clean_lines(F.col("page"), **kw).alias("cleaned"),
        )
        .orderBy("id")
        .collect()
    )
    return [r.cleaned for r in rows]


def test_line_rules(spark):
    page = "\n".join(
        [
            "This sentence has enough words to stay.",  # kept
            "Too short.",  # dropped: <5 words
            "this line has no terminal punctuation at all",  # dropped
            "Ends with a question does it not?",  # kept
            "Enable JavaScript to view this content please.",  # dropped: js
            'He said "hello there my good friend"',  # kept: ends with quote
        ]
    )
    (cleaned,) = _clean(spark, [page])
    assert cleaned == (
        "This sentence has enough words to stay.\n"
        "Ends with a question does it not?\n"
        'He said "hello there my good friend"'
    )


def test_trailing_whitespace_ignored(spark):
    (cleaned,) = _clean(spark, ["Ends with period then trailing spaces.   "])
    assert cleaned.startswith("Ends with period")


def test_min_line_words_override(spark):
    (cleaned,) = _clean(spark, ["Short but sweet."], min_line_words=3)
    assert cleaned == "Short but sweet."


def test_no_qualifying_lines_yields_empty_string(spark):
    (cleaned,) = _clean(spark, ["no punct here\nalso not here"])
    assert cleaned == ""


def test_doc_keep_rules(spark):
    three = (
        "One full sentence right here now.\n"
        "Another complete sentence follows here too.\n"
        "And a third one to finish things off."
    )
    rows = spark.createDataFrame(
        [
            (0, three, three),  # keeps
            (1, three + " lorem ipsum", three),  # raw poison
            (2, three + " {", three),  # brace poison
            (3, three, "One full sentence right here now."),  # <3 sentences
        ],
        "id long, raw string, cleaned string",
    )
    out = {
        r.id: r.keep
        for r in rows.select(
            "id",
            C4.c4_doc_keep(F.col("raw"), F.col("cleaned")).alias("keep"),
        ).collect()
    }
    assert out == {0: True, 1: False, 2: False, 3: False}
