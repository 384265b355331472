"""Gopher quality ruleset (Rae et al. 2021 A1.1) — hand-computed signals on
crafted docs, plus threshold-override plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chat_data_pipeline_spark.functions import gopher as GQ

GOOD = (
    "the quick brown fox jumped over the lazy dog and kept running to be "
    "free of that noisy farm with all its hens " * 3
)  # 69 words, all alphabetic, plenty of required stopwords


def _signals(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    rows = (
        df.select("id", GQ.gopher_signals(F.col("text")).alias("s"))
        .orderBy("id")
        .collect()
    )
    return [r.s.asDict() for r in rows]


def test_signal_values_hand_computed(spark):
    (s,) = _signals(spark, ["ab cde f"])
    assert s["n_words"] == 3
    assert s["mean_word_len"] == pytest.approx((2 + 3 + 1) / 3, abs=1e-6)
    assert s["hash_ratio"] == 0.0 and s["ellipsis_ratio"] == 0.0
    assert s["alpha_word_frac"] == 1.0
    assert s["stop_hits"] == 0


def test_symbol_ratios_count_hash_and_ellipsis_separately(spark):
    # 4 words, one '#' and one non-overlapping '...' (4 dots = one match)
    (s,) = _signals(spark, ["alpha # beta gamma...."])
    assert s["n_words"] == 4
    assert s["hash_ratio"] == pytest.approx(1 / 4, abs=1e-6)
    assert s["ellipsis_ratio"] == pytest.approx(1 / 4, abs=1e-6)
    # '…' counts as an ellipsis too; thresholds apply per symbol (A1.1)
    (s2,) = _signals(spark, ["alpha beta gamma delta…"])
    assert s2["ellipsis_ratio"] == pytest.approx(1 / 4, abs=1e-6)


def test_line_fractions(spark):
    text = "• bullet one\nplain line\n- bullet two\ntrailing dots...\n\n  \n"
    (s,) = _signals(spark, [text])
    # 4 non-blank lines: 2 bullets, 1 ellipsis-terminated
    assert s["bullet_line_frac"] == pytest.approx(2 / 4, abs=1e-6)
    assert s["ellipsis_line_frac"] == pytest.approx(1 / 4, abs=1e-6)


def test_alpha_word_frac_and_stop_hits(spark):
    (s,) = _signals(spark, ["the cat 123 45 sat with 9000"])
    # words: the cat 123 45 sat with 9000 -> 4/7 contain a letter
    assert s["alpha_word_frac"] == pytest.approx(4 / 7, abs=1e-6)
    # distinct required stopwords present: the, with
    assert s["stop_hits"] == 2


def test_stop_hits_distinct_not_total(spark):
    (s,) = _signals(spark, ["the the the the"])
    assert s["stop_hits"] == 1


def test_empty_and_blank_are_all_zero(spark):
    for s in _signals(spark, ["", "   \n  \n"]):
        assert s["n_words"] == 0
        assert s["mean_word_len"] == 0.0
        assert s["bullet_line_frac"] == 0.0
        assert s["alpha_word_frac"] == 0.0


def test_keep_paper_thresholds(spark):
    bulleted = "\n".join("• item" for _ in range(60)) + " the be to of"
    df = spark.createDataFrame(
        [(0, GOOD), (1, "too short to pass the word count"), (2, bulleted)],
        "id long, text string",
    )
    out = {
        r.id: r.keep
        for r in df.select(
            "id",
            GQ.gopher_quality_keep(GQ.gopher_signals(F.col("text"))).alias("keep"),
        ).collect()
    }
    assert out[0] is True
    assert out[1] is False  # fails 50-word minimum
    assert out[2] is False  # >=90% bullet lines


def test_keep_overrides(spark):
    df = spark.createDataFrame([(0, "the dog ran to town")], "id long, text string")
    sig = GQ.gopher_signals(F.col("text"))
    strict = df.select(GQ.gopher_quality_keep(sig).alias("k")).first().k
    loose = (
        df.select(GQ.gopher_quality_keep(sig, min_words=3).alias("k")).first().k
    )
    assert strict is False and loose is True
    with pytest.raises(ValueError, match="unknown gopher threshold"):
        GQ.gopher_quality_keep(sig, min_wordz=3)


def test_gopher_signals_null_text(spark):
    """Null text = empty signals (n_words 0, ratios 0), never F.size(null)'s
    -1 poisoning the ratios; the keep verdict is False."""
    from chat_data_pipeline_spark.functions import gopher as G

    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = df.select(G.gopher_signals(F.col("text")).alias("s")).first()["s"]
    assert r["n_words"] == 0 and r["mean_word_len"] == 0.0
    keep = df.select(
        G.gopher_quality_keep(G.gopher_signals(F.col("text"))).alias("k")
    ).first()["k"]
    assert keep is False or keep is None  # never True for null text
