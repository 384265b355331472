"""Corpus-trained bigram LM scoring (operators/language_model.py).

Semantics checks a cross-engine value hash can't express: fluency ordering
(seen bigrams score higher than unseen ones), the smoothing math against a
hand-computed oracle, and short-document edge rows.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from chat_data_pipeline_spark.operators import language_model as LMOD


def _scores(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = LMOD.bigram_lm_scores(df, "text", "doc_id", k=0.5)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_fluent_beats_gibberish(spark):
    # docs 1-3 repeat the same phrasing; doc 4 is made of bigrams that occur
    # exactly once in the corpus — its average log-probability must be lower
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the rug"),
        (3, "the cat sat on the floor"),
        (4, "zeta quux blorp wibble frob"),
    ]
    s = _scores(spark, rows)
    assert s[1]["avg_logprob"] > s[4]["avg_logprob"]
    assert s[1]["ppl"] < s[4]["ppl"]
    # ppl is derived from the rounded average on both engines
    assert s[4]["ppl"] == round(math.exp(-s[4]["avg_logprob"]), 4)


def test_hand_computed_smoothing(spark):
    # corpus = one doc "a b a b": bigrams (a,b) ×2, (b,a) ×1; V = 2
    # P(b|a) = (2 + .5) / (2 + .5·2) = 2.5/3  P(a|b) = (1 + .5) / (1 + .5·2) = .75
    rows = [(1, "a b a b")]
    s = _scores(spark, rows)
    lp = (
        round(math.log(2.5 / 3.0) * 1e9)
        + round(math.log(2.5 / 3.0) * 1e9)
        + round(math.log(0.75) * 1e9)
    )
    assert s[1]["n_bigrams"] == 3
    assert s[1]["avg_logprob"] == round(lp / 1e9 / 3, 6)


def test_short_docs_keep_null_rows(spark):
    rows = [(1, "hello"), (2, ""), (3, None), (4, "hello world")]
    s = _scores(spark, rows)
    assert set(s) == {1, 2, 3, 4}
    for d in (1, 2, 3):
        assert s[d]["n_bigrams"] == 0
        assert s[d]["avg_logprob"] is None and s[d]["ppl"] is None
    assert s[4]["n_bigrams"] == 1


def test_soft_weights_mass_per_group(spark):
    from chat_data_pipeline_spark.operators import dedup as D

    df = spark.createDataFrame(
        [(i, "dup" if i < 6 else f"unique {i}") for i in range(10)],
        "doc_id long, text string",
    )
    out = D.exact_dedup_soft_weights(
        df.select("doc_id", F.md5("text").alias("__k__")), "__k__", "doc_id"
    )
    rows = out.collect()
    assert len(rows) == 10  # nothing dropped
    dup = [r for r in rows if r["dup_count"] == 6]
    assert len(dup) == 6 and all(r["weight"] == round(1 / 6, 6) for r in dup)
    uniq = [r for r in rows if r["dup_count"] == 1]
    assert len(uniq) == 4 and all(r["weight"] == 1.0 for r in uniq)
