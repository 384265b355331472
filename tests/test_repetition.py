"""Gopher repetition signals (functions/repetition.py).

Hand-computed expectations on constructed documents; the sf0.01 oracle-parity
rows for docs_repetition_signals / filter_repetition live in
test_oracle_parity.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chat_data_pipeline_spark.functions import repetition as RP
from chat_data_pipeline_spark.functions import text as T


def _line_stats(spark, text):
    row = (
        spark.range(1)
        .select(RP.line_repetition_stats(F.lit(text)).alias("s"))
        .select("s.*")
        .first()
    )
    return row.asDict()


def test_line_stats_duplicate_lines(spark):
    # 4 lines, 'aa' three times: dup_line_frac = (4-2)/4, dup chars = 2*2 of 2*3+4
    s = _line_stats(spark, "aa\nbbbb\naa\naa")
    assert s["dup_line_frac"] == pytest.approx(0.5)
    assert s["dup_line_char_frac"] == pytest.approx(4 / 10)
    assert s["dup_para_frac"] == 0.0


def test_line_stats_duplicate_paragraph_and_blanks(spark):
    # blank / whitespace-only lines are excluded from LINE counting, but a
    # paragraph is the raw text between blank lines (whitespace kept)
    s = _line_stats(spark, "x\ny\n\nx\ny\n   ")
    assert s["dup_para_frac"] == 0.0  # "x\ny" vs "x\ny\n   " differ
    assert s["dup_line_frac"] == pytest.approx(0.5)  # x,y each twice
    assert s["dup_line_char_frac"] == pytest.approx(0.5)
    s2 = _line_stats(spark, "x\ny\n\nx\ny")
    assert s2["dup_para_frac"] == pytest.approx(0.5)  # "x\ny" twice


def test_line_stats_empty_doc(spark):
    s = _line_stats(spark, "   \n  \n")
    assert s == {"dup_line_frac": 0.0, "dup_line_char_frac": 0.0, "dup_para_frac": 0.0}


def test_gram_fracs_pure():
    # "a b a b a": joined len 9; top 2-gram 'a b' count 2 len 3 -> 6/9
    toks = ["a", "b", "a", "b", "a"]
    vals = dict(zip(RP._PROFILE_FIELDS, RP._gram_fracs(toks)))
    assert vals["top_2gram_char_frac"] == pytest.approx(6 / 9)
    # 'a b a' twice (len 5), 'b a b' once -> dup mass 10/9 — may exceed 1 by design
    assert vals["top_3gram_char_frac"] == pytest.approx(10 / 9)
    assert vals["dup_5gram_char_frac"] == 0.0
    assert RP._gram_fracs([]) == [0.0] * len(RP._PROFILE_FIELDS)


def test_profile_udf_matches_pure(spark):
    texts = ["the cat sat on the cat sat again", "unique words only here", ""]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    got = {
        r["id"]: r
        for r in df.select(
            "id", RP.ngram_repetition_profile(T.words(F.col("text"))).alias("p")
        )
        .select("id", "p.*")
        .collect()
    }
    import re

    for i, t in enumerate(texts):
        toks = re.findall(r"[^\W]+", t.lower(), re.UNICODE)
        expect = RP._gram_fracs(toks)
        for field, want in zip(RP._PROFILE_FIELDS, expect):
            assert got[i][field] == pytest.approx(want), (i, field)


def test_repetition_keep_signal_subset(spark):
    # doc fails dup_line_frac but the restricted predicate ignores line signals
    df = spark.createDataFrame([("aa\naa\nbb",)], "text string")
    ls = RP.line_repetition_stats(F.col("text")).alias("ls")
    prof = RP.ngram_repetition_profile(T.words(F.col("text"))).alias("prof")
    staged = df.select(ls, prof)
    full = staged.filter(RP.repetition_keep(F.col("ls"), F.col("prof"))).count()
    restricted = staged.filter(
        RP.repetition_keep(F.col("ls"), F.col("prof"), signals=["dup_5gram_char_frac"])
    ).count()
    assert full == 0 and restricted == 1


def test_repetition_filter_composes_in_pipeline(spark):
    """check_repetition / check_domain_blocklist resolve by name through
    SparkPreprocessor like any reference filter."""
    from chat_data_pipeline_spark.plans import SparkPreprocessor

    # Gopher top-ngram gates assume realistically long docs (a 10-token doc
    # has one bigram carrying >20% of its mass by accident) — the keeper doc
    # is corpus-length on purpose
    varied = " ".join(f"token{i} value{i * 7 % 23}" for i in range(40))
    rows = [
        (1, "spam spam spam spam spam spam spam spam"),
        (2, varied),
        (3, varied + " but see https://bad.example.com/x for more"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pre = SparkPreprocessor(
        column_name="text",
        cleaners=[],
        filters=[
            "check_repetition",
            ("check_domain_blocklist", {"blocked_domains": ["bad.example.com"]}),
        ],
    )
    kept = {r.doc_id for r in pre.run(df).collect()}
    assert kept == {2}
