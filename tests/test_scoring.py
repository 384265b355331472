"""Hashed-feature linear scoring (functions/scoring.py)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from chat_data_pipeline_spark.functions import scoring as SC


def _bucket(tok: str, n: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:2], 16) % n


def test_linear_score_matches_python_forward_pass(spark):
    weights = [((i * 7) % 11 - 5) / 8.0 for i in range(16)]
    bias = 0.25
    texts = ["the cat sat", "one two three four five six", "", None]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    got = {
        r.id: r.s
        for r in df.select(
            "id", SC.linear_score(F.col("text"), weights, bias).alias("s")
        ).collect()
    }
    for i, t in enumerate(texts):
        import re

        toks = re.findall(r"[^\W]+", (t or "").lower(), re.UNICODE)
        mean = (
            sum(weights[_bucket(tok, 16)] for tok in toks) / len(toks) if toks else 0.0
        )
        want = 1.0 / (1.0 + math.exp(-(bias + mean)))
        # null text falls through to the empty-doc branch: sigmoid(bias)
        assert got[i] == pytest.approx(want, rel=1e-12), (i, t)


def test_classifier_keep_threshold(spark):
    # single bucket, weight +1: every non-empty doc scores sigmoid(1) ~ 0.73
    df = spark.createDataFrame([(1, "hello world"), (2, "")], "id long, text string")
    kept = {
        r.id
        for r in df.filter(
            SC.classifier_keep(F.col("text"), [1.0], threshold=0.6)
        ).collect()
    }
    assert kept == {1}  # empty doc scores sigmoid(0) = 0.5 < 0.6


def test_rejects_empty_weights(spark):
    with pytest.raises(ValueError):
        SC.linear_score(F.lit("x"), [])


def test_stratified_and_split_determinism(spark):
    from chat_data_pipeline_spark.operators.sampling import hash_split, sample_stratified

    df = spark.range(1000).selectExpr(
        "id AS doc_id", "CASE WHEN id % 2 = 0 THEN 'en' ELSE 'zh' END AS lang"
    )
    a = {r.doc_id for r in sample_stratified(df, "lang", {"en": 0.5, "zh": 0.1}, "doc_id").collect()}
    b = {r.doc_id for r in sample_stratified(df.repartition(7), "lang", {"en": 0.5, "zh": 0.1}, "doc_id").collect()}
    assert a == b  # layout-independent membership
    en = sum(1 for i in a if i % 2 == 0) / 500
    zh = sum(1 for i in a if i % 2 == 1) / 500
    assert 0.4 < en < 0.6 and zh < 0.2  # fractions roughly honored

    s = hash_split(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in s.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > 700
    # total assignment, no row lost
    assert sum(counts.values()) == 1000

    import pytest as _pytest

    with _pytest.raises(ValueError):
        hash_split(df, "doc_id", {"train": 0.5, "val": 0.1})


# ---------------------------------------------------------------------------
# Token-budget selection (round 7)
# ---------------------------------------------------------------------------


def test_token_budget_prefix_semantics(spark):
    """Exactly the maximal (priority desc, id asc) prefix whose cumulative
    tokens fit; the first overflowing row cuts the selection (no
    back-fill), and a bigger budget only ever ADDS rows."""
    from chat_data_pipeline_spark.operators.sampling import token_budget_select

    rows = [  # (id, grp, tokens, priority)
        (1, "en", 50, 10),
        (2, "en", 40, 9),
        (3, "en", 30, 8),   # cum 120 > 100 -> cut here
        (4, "en", 5, 7),    # would fit, but prefix rule excludes it
        (5, "de", 80, 5),
        (6, "de", 30, 4),   # cum 110 > 100
    ]
    df = spark.createDataFrame(rows, "id long, grp string, tok long, prio long")
    got = {
        r.id: r.cum_tokens
        for r in token_budget_select(
            df, 100, "tok", "prio", "id", group_col="grp"
        ).collect()
    }
    assert got == {1: 50, 2: 90, 5: 80}
    bigger = {
        r.id
        for r in token_budget_select(
            df, 150, "tok", "prio", "id", group_col="grp"
        ).collect()
    }
    assert set(got) <= bigger


def test_token_budget_rejects_nonpositive_budget(spark):
    from chat_data_pipeline_spark.operators.sampling import token_budget_select

    df = spark.createDataFrame([(1, 5, 1)], "id long, tok long, prio long")
    with pytest.raises(ValueError, match="budget"):
        token_budget_select(df, 0, "tok", "prio", "id")


def _tb_rows(df):
    cols = ["id", "grp", "tok", "prio", "cum_tokens"]
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_token_budget_scalable_matches_exact(spark):
    """The quantile-bucketed two-phase execution is bit-identical to the
    single-window exact form — including inclusive cum_tokens — across
    bucket counts, heavy priority ties (values that SIT on quantile
    boundaries), zero-token rows, and null priorities."""
    import random

    from chat_data_pipeline_spark.operators.sampling import (
        token_budget_select,
        token_budget_select_scalable,
    )

    rng = random.Random(7)
    rows = []
    for i in range(400):
        prio = rng.choice([1.0, 2.0, 2.0, 2.0, 3.0, 5.0, 8.0, None])
        grp = rng.choice(["a", "b", None])  # NULL group must behave like any other
        rows.append((i, grp, rng.randint(0, 30), prio))
    df = spark.createDataFrame(rows, "id long, grp string, tok long, prio double")
    for nb in (2, 4, 64, 512):  # more buckets than distinct priorities too
        exact = token_budget_select(df, 300, "tok", "prio", "id", group_col="grp")
        scal = token_budget_select_scalable(
            df, 300, "tok", "prio", "id", group_col="grp", n_buckets=nb
        )
        assert _tb_rows(exact) == _tb_rows(scal), f"n_buckets={nb}"


def test_token_budget_scalable_boundary_bucket_ties(spark):
    """The budget cut lands INSIDE a run of equal-priority rows: the id
    tiebreak decides membership identically in both executions, and
    ungrouped mode (one global budget) agrees too."""
    from chat_data_pipeline_spark.operators.sampling import (
        token_budget_select,
        token_budget_select_scalable,
    )

    rows = [(i, "g", 10, 5.0 if i < 30 else 1.0) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, grp string, tok long, prio double")
    # budget 155 cuts at the 16th of 30 tied prio-5.0 rows (id asc order)
    exact = token_budget_select(df, 155, "tok", "prio", "id", group_col="grp")
    scal = token_budget_select_scalable(
        df, 155, "tok", "prio", "id", group_col="grp", n_buckets=8
    )
    assert _tb_rows(exact) == _tb_rows(scal)
    assert {r.id for r in scal.collect()} == set(range(15))
    # ungrouped
    exact_u = token_budget_select(df.drop("grp"), 155, "tok", "prio", "id")
    scal_u = token_budget_select_scalable(
        df.drop("grp"), 155, "tok", "prio", "id", n_buckets=8
    )
    key = lambda d: sorted((r.id, r.cum_tokens) for r in d.collect())
    assert key(exact_u) == key(scal_u)


def test_token_budget_scalable_rejects_bad_params(spark):
    from chat_data_pipeline_spark.operators.sampling import (
        token_budget_select_scalable,
    )

    df = spark.createDataFrame([(1, 5, 1)], "id long, tok long, prio long")
    with pytest.raises(ValueError, match="budget"):
        token_budget_select_scalable(df, 0, "tok", "prio", "id")
    with pytest.raises(ValueError, match="n_buckets"):
        token_budget_select_scalable(df, 10, "tok", "prio", "id", n_buckets=1)


def test_mix_manifest_invariants(spark):
    """Shares sum to <= total budget (integer division), each group's
    selection fits its share, zero-fit groups report honestly, and the
    prefix matches token_budget_select under the same per-group budget."""
    from chat_data_pipeline_spark.operators.sampling import (
        mix_manifest,
        token_budget_select,
    )

    rows = []
    rid = 0
    for g, n, tok in (("en", 40, 50), ("de", 10, 50), ("xx", 2, 10_000)):
        for i in range(n):
            rows.append((rid, g, tok, n - i))
            rid += 1
    df = spark.createDataFrame(rows, "id long, g string, tok long, prio long")
    total = 1500
    man = {r.g: r for r in mix_manifest(df, total, "tok", "prio", "id", "g").collect()}
    assert set(man) == {"en", "de", "xx"}
    assert sum(r.token_budget for r in man.values()) <= total
    for g, r in man.items():
        assert r.n_tokens_selected <= r.token_budget
        sel = token_budget_select(
            df.filter(F.col("g") == g), max(int(r.token_budget), 1),
            "tok", "prio", "id",
        )
        assert sel.count() == r.n_selected
    # xx's cheapest doc (10k tokens) can never fit a ~500-token share
    assert man["xx"].n_selected == 0 and man["xx"].n_tokens_selected == 0
    with pytest.raises(ValueError, match="budget"):
        mix_manifest(df, 0, "tok", "prio", "id", "g")


def test_mix_manifest_huge_budget_no_overflow(spark):
    """A trillion-token budget with 1e10-nano weights must not overflow the
    share arithmetic (DECIMAL path), and shares still sum <= budget."""
    from chat_data_pipeline_spark.operators.sampling import mix_manifest

    rows = [(i, "en" if i % 5 else "de", 100, i) for i in range(10_000)]
    df = spark.createDataFrame(rows, "id long, g string, tok long, prio long")
    total = 1_000_000_000_000
    man = {r.g: r for r in mix_manifest(df, total, "tok", "prio", "id", "g").collect()}
    assert sum(r.token_budget for r in man.values()) <= total
    assert all(r.token_budget > 0 for r in man.values())
    # budget dwarfs the corpus: everything is selected
    assert all(r.n_selected == r.n_docs for r in man.values())


def test_mix_manifest_null_group_excluded(spark):
    """NULL-group rows are excluded up front instead of receiving a share
    they can never claim through the NULL-dropping equi-joins."""
    from chat_data_pipeline_spark.operators.sampling import mix_manifest

    rows = [(1, "en", 10, 5), (2, "en", 10, 4), (3, None, 10, 5), (4, None, 10, 4)]
    df = spark.createDataFrame(rows, "id long, g string, tok long, prio long")
    man = mix_manifest(df, 100, "tok", "prio", "id", "g").collect()
    assert {r.g for r in man} == {"en"}
    assert man[0].token_budget == 100  # the whole budget, not a wasted half


# --- fixed-point trainer (r12) ----------------------------------------------


def test_trunc_div_matches_duckdb_semantics():
    import duckdb

    from chat_data_pipeline_spark.functions.scoring import _trunc_div

    cases = [(-7, 2), (7, 2), (-7, -2), (7, -2), (-1, 3), (0, 5), (10**12 + 7, 9)]
    got = [_trunc_div(a, b) for a, b in cases]
    want = [
        duckdb.sql(f"SELECT CAST({a} AS BIGINT) // CAST({b} AS BIGINT)").fetchone()[0]
        for a, b in cases
    ]
    assert got == want


def _sep_corpus(spark, n=120):
    # two disjoint vocabularies: class-1 docs speak aaa*, class-0 docs bbb*
    rows = [
        (i, i % 2, " ".join(f"{'aaa' if i % 2 else 'bbb'}{(i + j) % 9}" for j in range(12)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, label int, text string")


def test_trainer_learns_a_separable_corpus(spark):
    """On disjoint vocabularies the fixed-point GD must actually separate:
    class-1 docs score far above class-0 docs, and predictions move toward
    the label scale rather than oscillating (the stability bound at work)."""
    from pyspark.sql import functions as F

    from chat_data_pipeline_spark.functions import scoring as SC

    df = _sep_corpus(spark)
    w = SC.train_linear_classifier_fixed_point(
        df, "text", F.col("label"), n_buckets=64, rounds=12
    )
    scored = df.select(
        "label",
        SC.fixed_point_score(SC.doc_bucket_features(F.col("text"), 64), w).alias("p"),
    )
    avg = {r.label: r.a for r in scored.groupBy("label").agg(F.avg("p").alias("a")).collect()}
    assert avg[1] > 4 * max(avg[0], 1)  # clear separation
    assert 0 < avg[1] < 1_000_000  # converging toward scale, not past it
    assert abs(avg[0]) < 100_000


def test_trainer_deterministic_and_partition_invariant(spark):
    from pyspark.sql import functions as F

    from chat_data_pipeline_spark.functions import scoring as SC

    df = _sep_corpus(spark, n=60)
    w1 = SC.train_linear_classifier_fixed_point(
        df, "text", F.col("label"), n_buckets=32, rounds=4
    )
    w2 = SC.train_linear_classifier_fixed_point(
        df.repartition(7), "text", F.col("label"), n_buckets=32, rounds=4
    )
    assert w1 == w2
    assert any(w != 0 for w in w1)


def test_fixed_point_score_null_and_empty_text(spark):
    from pyspark.sql import functions as F

    from chat_data_pipeline_spark.functions import scoring as SC

    df = spark.createDataFrame([(1, None), (2, ""), (3, "hello")], "id long, text string")
    out = df.select(
        "id",
        SC.fixed_point_score(
            SC.doc_bucket_features(F.col("text"), 16), list(range(16))
        ).alias("p"),
    ).collect()
    by_id = {r.id: r.p for r in out}
    assert by_id[1] == 0 and by_id[2] == 0
    assert by_id[3] != 0


def test_check_quality_classifier_filter_gates_with_trained_weights(spark, tmp_path):
    """The full curation loop through the FILTER FRAMEWORK: train on the
    separable corpus, persist the (bucket, weight) table, then a
    SparkPreprocessor gating on check_quality_classifier(weights_path=...)
    keeps the class-1 vocabulary and drops the class-0 one — the trained
    model as a YAML-reachable filter."""
    from pyspark.sql import functions as F

    from chat_data_pipeline_spark.functions import scoring as SC
    from chat_data_pipeline_spark.plans.pipeline import SparkPreprocessor

    df = _sep_corpus(spark)
    w = SC.train_linear_classifier_fixed_point(
        df, "text", F.col("label"), n_buckets=64, rounds=12
    )
    wpath = str(tmp_path / "weights.parquet")
    spark.createDataFrame(
        [(b, int(x)) for b, x in enumerate(w)], "bucket int, weight long"
    ).write.parquet(wpath)

    # threshold between the two class means (hand-derived from the scores)
    scored = df.select(
        "label",
        SC.fixed_point_score(SC.doc_bucket_features(F.col("text"), 64), w).alias("p"),
    )
    means = {r.label: r.a for r in scored.groupBy("label").agg(F.avg("p").alias("a")).collect()}
    thr = int((means[0] + means[1]) / 2)

    pre = SparkPreprocessor(
        column_name="text",
        filters=[
            (
                "check_quality_classifier",
                {"weights_path": wpath, "n_buckets": 64, "min_score_threshold": thr},
            )
        ],
        verbose=True,
    )
    out = pre.run(df)
    labels = [r.label for r in out.collect()]
    assert labels and all(l == 1 for l in labels)
    (report,) = pre.reports
    assert report.rows_before == 120 and report.rows_after == len(labels)


def test_check_quality_classifier_requires_a_model(spark):
    import pytest

    from chat_data_pipeline_spark.plans.registry import get_filter

    spec = get_filter("check_quality_classifier")
    df = spark.createDataFrame([(1, "hello")], "id long, text string")
    from pyspark.sql import functions as F

    with pytest.raises(ValueError, match="weights"):
        df.select(spec.score_expr(F.col("text"))).collect()


def test_trainer_matches_pure_python_mirror_on_random_corpora(spark):
    """Three-way evidence for the trainer (the BPE discipline): beyond the
    DuckDB unrolled-CTE oracle, the Spark trainer must match a pure-Python
    integer-GD mirror EXACTLY (every quantity BIGINT, so there is no
    tolerance) on seeded random corpora whose vocabulary, doc lengths, and
    label balance vary."""
    import hashlib
    import random

    from pyspark.sql import functions as F

    from chat_data_pipeline_spark.functions import scoring as SC
    from tests.reference_semantics import get_words

    def py_train(rows, n_buckets, rounds, scale=1_000_000):
        feats = []
        for label, text in rows:
            buckets = sorted(
                {
                    int(hashlib.md5(w.encode()).hexdigest()[:2], 16) % n_buckets
                    for w in get_words(text)
                }
            )
            feats.append((label * scale, buckets))
        n_docs = len(feats)
        lr_den = max(1, n_docs) * 4 * n_buckets
        w = [0] * n_buckets
        for _ in range(rounds):
            grad = [0] * n_buckets
            for y, buckets in feats:
                err = sum(w[b] for b in buckets) - y
                for b in buckets:
                    grad[b] += err
            w = [
                wi - (abs(g) // lr_den if g >= 0 else -(abs(g) // lr_den))
                for wi, g in zip(w, grad)
            ]
        return w

    for seed in (3, 17, 202608):
        rng = random.Random(seed)
        vocab = [f"w{rng.randrange(200)}" for _ in range(60)]
        rows = [
            (
                rng.randrange(2),
                " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 25))),
            )
            for _ in range(rng.randrange(30, 80))
        ]
        df = spark.createDataFrame(rows, "label int, text string")
        got = SC.train_linear_classifier_fixed_point(
            df, "text", F.col("label"), n_buckets=32, rounds=5
        )
        want = py_train(rows, 32, 5)
        assert got == want, seed


def test_trained_gate_runs_on_a_stream_equal_to_batch(spark, tmp_path):
    """The trained fixed-point gate is a pure Column fold, so the SAME
    filter spec drives a streaming clean+filter stage — survivors on the
    stream equal the batch run over the same rows (train once, gate both
    the backfill and the live feed with one model)."""
    from pyspark.sql import functions as F

    from chat_data_pipeline_spark.functions import scoring as SC
    from chat_data_pipeline_spark.streaming.pipeline import streaming_clean_filter

    df = _sep_corpus(spark)
    w = SC.train_linear_classifier_fixed_point(
        df, "text", F.col("label"), n_buckets=64, rounds=12
    )
    scored = df.select(
        "label",
        SC.fixed_point_score(SC.doc_bucket_features(F.col("text"), 64), w).alias("p"),
    )
    means = {r.label: r.a for r in scored.groupBy("label").agg(F.avg("p").alias("a")).collect()}
    thr = int((means[0] + means[1]) / 2)
    flt = [
        (
            "check_quality_classifier",
            {"weights": w, "n_buckets": 64, "min_score_threshold": thr},
        )
    ]

    src = str(tmp_path / "stream_in")
    df.write.parquet(src)
    want = sorted(
        r.doc_id
        for r in streaming_clean_filter(
            spark.read.parquet(src), column="text", filters=flt
        ).collect()
    )
    stream = spark.readStream.schema("doc_id long, label int, text string").parquet(src)
    q = (
        streaming_clean_filter(stream, column="text", filters=flt)
        .writeStream.format("memory")
        .queryName("gate_live")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_gate"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(r.doc_id for r in spark.sql("select doc_id from gate_live").collect())
    finally:
        q.stop()
    assert got == want and len(got) > 0


def test_check_quality_classifier_rejects_bucket_modulus_mismatch(spark, tmp_path):
    """A trained table with buckets beyond the filter's n_buckets means the
    scoring modulus differs from the training modulus — every token would
    silently mis-hash.  The mismatch must raise with the trained size
    named, not IndexError or wrong scores."""
    import pytest

    from pyspark.sql import functions as F

    from chat_data_pipeline_spark.plans.registry import get_filter

    wpath = str(tmp_path / "w256.parquet")
    spark.createDataFrame(
        [(b, 1) for b in range(256)], "bucket int, weight long"
    ).write.parquet(wpath)
    spec = get_filter(
        "check_quality_classifier", weights_path=wpath, n_buckets=64
    )
    df = spark.createDataFrame([(1, "hello")], "id long, text string")
    with pytest.raises(ValueError, match="n_buckets=256"):
        df.select(spec.score_expr(F.col("text"))).collect()


def test_check_quality_classifier_rejects_smaller_trained_modulus(spark, tmp_path):
    """The reverse direction of the modulus guard: a model trained with a
    SMALLER modulus (64) served with a larger configured n_buckets (256)
    previously passed the one-sided top<n check and silently mis-hashed
    every token.  The trainer persists DENSE tables, so trained modulus =
    top+1 and must equal n_buckets exactly."""
    import pytest

    from pyspark.sql import functions as F

    from chat_data_pipeline_spark.plans.registry import get_filter

    wpath = str(tmp_path / "w64.parquet")
    spark.createDataFrame(
        [(b, 1) for b in range(64)], "bucket int, weight long"
    ).write.parquet(wpath)
    spec = get_filter(
        "check_quality_classifier", weights_path=wpath, n_buckets=256
    )
    df = spark.createDataFrame([(1, "hello")], "id long, text string")
    with pytest.raises(ValueError, match="n_buckets=64"):
        df.select(spec.score_expr(F.col("text"))).collect()


def test_check_quality_classifier_rejects_sparse_weight_table(spark, tmp_path):
    """Sparse (bucket, weight) tables make the trained modulus
    unrecoverable (top+1 underestimates it whenever the last buckets are
    zero-weight) — unsupported via weights_path, must raise even when
    top+1 happens to equal n_buckets."""
    import pytest

    from pyspark.sql import functions as F

    from chat_data_pipeline_spark.plans.registry import get_filter

    wpath = str(tmp_path / "sparse.parquet")
    spark.createDataFrame(
        [(0, 5), (63, 7)], "bucket int, weight long"
    ).write.parquet(wpath)
    spec = get_filter(
        "check_quality_classifier", weights_path=wpath, n_buckets=64
    )
    df = spark.createDataFrame([(1, "hello")], "id long, text string")
    with pytest.raises(ValueError, match="[Ss]parse"):
        df.select(spec.score_expr(F.col("text"))).collect()
