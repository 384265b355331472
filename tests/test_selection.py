"""DSIR importance resampling — featurization parity with a pure-Python
reimplementation, weight math, and selection determinism."""

from __future__ import annotations

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from chat_data_pipeline_spark.operators import selection as SEL

DOCS = [
    (0, "the cat sat on the mat", "en"),
    (1, "der hund lief durch den park", "de"),
    (2, "the dog ran to the park", "en"),
    (3, "el gato corrió al parque", "es"),
    (4, "cats and dogs run in the park", "en"),
    (5, "", "en"),
]


def _py_buckets(text: str, m: int = 256) -> list[int]:
    words = re.findall(r"[^\W]+", text.lower(), re.UNICODE)
    grams = words + [f"{a} {b}" for a, b in zip(words, words[1:])]
    return [
        int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % m for g in grams
    ]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, lang string")


def test_bucket_parity_with_python(spark):
    rows = (
        _df(spark)
        .select(
            "doc_id",
            SEL.hashed_ngram_buckets(F.col("text")).alias("fb"),
            "text",
        )
        .orderBy("doc_id")
        .collect()
    )
    for r in rows:
        assert list(r.fb) == _py_buckets(r.text), r.doc_id


def test_weights_match_python_reference(spark):
    m, alpha = 256, 1.0
    per_doc = {i: _py_buckets(t, m) for i, t, _ in DOCS}
    raw = [0] * m
    tgt = [0] * m
    for i, _, lang in DOCS:
        for b in per_doc[i]:
            raw[b] += 1
            if lang == "en":
                tgt[b] += 1
    nr, nt = sum(raw), sum(tgt)
    llr = [
        SEL._round_half_away_micros(
            math.log((tgt[b] + alpha) / (nt + alpha * m))
            - math.log((raw[b] + alpha) / (nr + alpha * m))
        )
        for b in range(m)
    ]
    expected = {i: sum(llr[b] for b in per_doc[i]) for i, _, _ in DOCS}

    got = {
        r.doc_id: r.log_weight_micros
        for r in SEL.dsir_weights(_df(spark), F.col("lang") == "en").collect()
    }
    assert got == expected
    assert got[5] == 0  # empty doc: no grams, weight 0


def test_target_docs_weigh_higher(spark):
    rows = SEL.dsir_weights(_df(spark), F.col("lang") == "en").collect()
    w = {r.doc_id: r.log_weight_micros for r in rows}
    en_avg = (w[0] + w[2] + w[4]) / 3
    other_avg = (w[1] + w[3]) / 2
    assert en_avg > other_avg


def test_select_is_deterministic_and_k_sized(spark):
    df = _df(spark)
    a = [r.doc_id for r in SEL.dsir_select(df, F.col("lang") == "en", k=3).collect()]
    b = [r.doc_id for r in SEL.dsir_select(df, F.col("lang") == "en", k=3).collect()]
    assert a == b and len(a) == 3
    c = [
        r.doc_id
        for r in SEL.dsir_select(df, F.col("lang") == "en", k=3, seed=7).collect()
    ]
    assert len(c) == 3  # different seed still returns k rows


def test_bucket_cap_guard(spark):
    with pytest.raises(ValueError, match="n_buckets"):
        SEL.dsir_weights(
            _df(spark), F.col("lang") == "en", n_buckets=SEL.MAX_BUCKETS + 1
        )


def test_dsir_null_text_gets_zero_weight(spark):
    """Null text featurizes to the empty bucket array -> weight 0 (matching
    the oracle's COALESCE), not a null-poisoned fold."""
    from pyspark.sql import functions as F

    from chat_data_pipeline_spark.operators import selection as SEL

    df = spark.createDataFrame(
        [(1, "english text here"), (2, None)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in SEL.dsir_weights(df, F.lit(True)).collect()}
    assert rows[2].log_weight_micros == 0
    assert rows[2].key_micros is not None  # gumbel noise still attaches
