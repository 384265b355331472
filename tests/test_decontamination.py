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


# --------------------------------------------------------------------------
# Bloom-bitset decontamination (round 5)
# --------------------------------------------------------------------------


def test_bloom_superset_of_exact_and_no_misses(spark):
    """Bloom contamination must contain EVERY exactly-contaminated doc (one-
    sided error: false positives allowed, false negatives never)."""
    train, bench = _corpora(spark)
    exact = {r.doc_id for r in DC.contamination_report(train, bench, "text", "doc_id", ngram_size=8).collect()}
    bloom = {r.doc_id for r in DC.bloom_contamination_report(train, bench, "text", "doc_id", ngram_size=8, m=1 << 20, k=4).collect()}
    assert exact <= bloom
    # at m=2^20 with a one-doc benchmark, false positives are ~impossible
    assert bloom == exact


def test_bloom_decontaminate_drops_contaminated(spark):
    train, bench = _corpora(spark)
    kept = DC.bloom_decontaminate(train, bench, "text", "doc_id", ngram_size=8, m=1 << 20, k=4)
    assert sorted(r.doc_id for r in kept.collect()) == [2, 3]
    assert kept.columns == train.columns


def test_bloom_empty_benchmark_keeps_everything(spark):
    train, bench = _corpora(spark)
    empty = bench.filter("doc_id < 0")
    rep = DC.bloom_contamination_report(train, empty, "text", "doc_id", ngram_size=8)
    assert rep.count() == 0


def test_bloom_probe_is_narrow_no_joins(spark):
    """The whole point of the bitset: the train probe plan has NO join and NO
    shuffle — contamination is decided in-task against the broadcast bits."""
    train, bench = _corpora(spark)
    rep = DC.bloom_contamination_report(train, bench, "text", "doc_id", ngram_size=8)
    plan = _plan(rep)
    import re

    assert not re.search(r"\(\d+\) (SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan)
    assert not re.search(r"\(\d+\) Exchange\b", plan)


def test_bloom_undersized_bitset_yields_false_positives(spark):
    """Force saturation (m tiny) to prove the operator really is a Bloom
    filter: extra docs appear, but the exact set is still fully covered."""
    train, bench = _corpora(spark)
    exact = {r.doc_id for r in DC.contamination_report(train, bench, "text", "doc_id", ngram_size=8).collect()}
    bloom = {r.doc_id for r in DC.bloom_contamination_report(train, bench, "text", "doc_id", ngram_size=8, m=16, k=2).collect()}
    assert exact <= bloom
    assert len(bloom) > len(exact)


# --------------------------------------------------------------------------
# Semantic (embedding) decontamination (round 5)
# --------------------------------------------------------------------------


def _vec_corpora(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    bench_vecs = rng.randn(3, 16)
    rows_b = [(100 + i, [float(x) for x in v]) for i, v in enumerate(bench_vecs)]
    rows_t = []
    # id 1: near-paraphrase of bench vector 0 (tiny perturbation)
    rows_t.append((1, [float(x) for x in bench_vecs[0] + 0.01 * rng.randn(16)]))
    # id 2: orthogonal-ish random vector
    rows_t.append((2, [float(x) for x in rng.randn(16)]))
    # id 3: exact copy of bench vector 2
    rows_t.append((3, [float(x) for x in bench_vecs[2]]))
    schema = "vec_id long, embedding array<double>"
    return (
        spark.createDataFrame(rows_t, schema),
        spark.createDataFrame(rows_b, schema),
    )


def test_semantic_contamination_flags_paraphrase_and_copy(spark):
    train, bench = _vec_corpora(spark)
    rep = {
        r.vec_id: r.max_bench_cosine
        for r in DC.semantic_contamination_report(train, bench, threshold=0.9).collect()
    }
    assert set(rep) == {1, 3}
    assert rep[3] == 1.0
    assert rep[1] >= 0.99


def test_semantic_decontaminate_keeps_clean_rows(spark):
    train, bench = _vec_corpora(spark)
    kept = DC.semantic_decontaminate(train, bench, threshold=0.9)
    assert [r.vec_id for r in kept.collect()] == [2]
    assert kept.columns == train.columns


def test_semantic_bench_guard_raises(spark):
    train, bench = _vec_corpora(spark)
    import pytest

    with pytest.raises(ValueError, match="max_bench_rows"):
        DC.semantic_contamination_report(train, bench, max_bench_rows=2)


def test_semantic_zero_norm_bench_vector_scores_zero_not_nan(spark):
    """One all-zero benchmark embedding must NOT poison the report: with a
    raw cosine the zero norm makes a NaN column, sims.max(axis=1) turns NaN
    for EVERY train row, and the report comes back empty — silent false
    negatives in a decontamination operator. The norm floor pins the zero
    vector's cosine to 0 so real leaks still surface."""
    train, bench = _vec_corpora(spark)
    zero = spark.createDataFrame([(999, [0.0] * 16)], "vec_id long, embedding array<double>")
    rep = {
        r.vec_id: r.max_bench_cosine
        for r in DC.semantic_contamination_report(train, bench.union(zero), threshold=0.9).collect()
    }
    assert set(rep) == {1, 3}
    assert rep[3] == 1.0


def test_semantic_zero_norm_train_vector_is_kept_not_nan(spark):
    """An all-zero TRAIN embedding scores cosine 0 against every benchmark
    vector (not NaN) and survives decontamination."""
    train, bench = _vec_corpora(spark)
    zero = spark.createDataFrame([(999, [0.0] * 16)], "vec_id long, embedding array<double>")
    kept = {r.vec_id for r in DC.semantic_decontaminate(train.union(zero), bench, threshold=0.9).collect()}
    assert kept == {2, 999}


def test_semantic_empty_bench_raises(spark):
    """Empty benchmark previously crashed with AxisError deep in numpy; now
    it's an explicit ValueError so the caller can't silently skip
    decontamination."""
    train, bench = _vec_corpora(spark)
    import pytest

    with pytest.raises(ValueError, match="empty"):
        DC.semantic_contamination_report(train, bench.filter("vec_id < 0"))
