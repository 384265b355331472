"""key_skew_report: hand-computed shares, NULL-key sentinel, determinism."""

from __future__ import annotations

from chat_data_pipeline_spark.operators.diagnostics import (
    _NULL_KEY_SENTINEL,
    key_skew_report,
)


def test_key_skew_hand_computed(spark):
    # 10 rows: key a x5, b x3, c x1, NULL x1 -> 4 keys, total 10
    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] + [(None,)]
    df = spark.createDataFrame(rows, "k string")
    out = key_skew_report(df, "k", top_n=3).collect()
    assert [(r.rank, r.key, r.n) for r in out] == [
        (1, "a", 5),
        (2, "b", 3),
        # c and the NULL sentinel tie at n=1; chr(31) sorts before 'c'
        (3, _NULL_KEY_SENTINEL, 1),
    ]
    a = out[0]
    assert a.share_nanos == 500_000_000  # 5/10
    assert a.x_avg_nanos == 2_000_000_000  # 5 vs mean 2.5 -> 2x
    b = out[1]
    assert b.share_nanos == 300_000_000
    assert b.x_avg_nanos == 1_200_000_000  # 3/2.5


def test_key_skew_partition_invariant(spark):
    rows = [(i % 7,) for i in range(200)] + [(None,)] * 5
    df = spark.createDataFrame(rows, "k int")
    want = [tuple(r) for r in key_skew_report(df, "k", top_n=5).collect()]
    for n_parts in (1, 4, 17):
        got = [
            tuple(r)
            for r in key_skew_report(df.repartition(n_parts), "k", top_n=5).collect()
        ]
        assert got == want, n_parts


def test_key_skew_detects_planted_hot_key(spark):
    # 1 key with 80% of rows over a uniform background of 20 keys
    rows = [(999,)] * 800 + [(i,) for i in range(20) for _ in range(10)]
    df = spark.createDataFrame(rows, "k int")
    top = key_skew_report(df, "k", top_n=1).collect()[0]
    assert top.key == "999"
    assert top.share_nanos == 800_000_000
    # 800 rows vs mean 1000/21 ~ 47.6 -> ~16.8x the average key
    assert top.x_avg_nanos == round(1e9 * 800 * 21 / 1000)


# --- dedup banding calibration (operators/dedup.py) -------------------------


def _calib(spark, rows, **kw):
    from chat_data_pipeline_spark.operators.dedup import banding_calibration

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r.bucket: (r.n_pairs, r.sum_band_matches)
        for r in banding_calibration(df, "text", "doc_id", **kw).collect()
    }


def test_banding_calibration_exact_clones_fill_the_top_bucket(spark):
    base = " ".join(f"w{i}" for i in range(30))
    other = " ".join(f"x{i}" for i in range(30))
    rows = [(1, base), (2, base), (3, base), (4, other)]
    got = _calib(spark, rows)
    # 3 clones -> 3 pairs at J=1 (bucket 10), each colliding in ALL 4 bands;
    # the disjoint doc collides with nobody
    assert got == {10: (3, 12)}


def test_banding_calibration_near_dup_lands_in_its_exact_bucket(spark):
    # change word 20 of 40: a MIDDLE word rides 5 of the 36 shingles, so
    # i = 31, u = 41, true J = 31/41 ~ 0.756 -> bucket floor(310/41) = 7
    words = [f"w{i}" for i in range(40)]
    near = list(words)
    near[20] = "changed"
    rows = [(1, " ".join(words)), (2, " ".join(near))]
    got = _calib(spark, rows)
    if not got:  # the pair may miss every band at J~0.76 — then no candidates
        return
    (bucket,) = got
    assert bucket == 7
    assert got[bucket][0] == 1


def test_banding_calibration_last_word_change_is_bucket_nine(spark):
    # the LAST word rides exactly ONE shingle: i = 35, u = 37 -> bucket 9;
    # J ~ 0.946 collides in some band with near-certainty at (4, 4)
    words = [f"w{i}" for i in range(40)]
    rows = [(1, " ".join(words)), (2, " ".join(words[:-1] + ["changed"]))]
    got = _calib(spark, rows)
    assert got == {9: (1, got[9][1])}
    assert 1 <= got[9][1] <= 4


def test_banding_calibration_partition_invariant(spark):
    from chat_data_pipeline_spark.operators.dedup import banding_calibration

    base = " ".join(f"w{i}" for i in range(25))
    rows = [(i, base) for i in range(6)] + [
        (100 + i, " ".join(f"u{100 + i}x{j}" for j in range(20))) for i in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    want = sorted(
        tuple(r) for r in banding_calibration(df, "text", "doc_id").collect()
    )
    got = sorted(
        tuple(r)
        for r in banding_calibration(df.repartition(7), "text", "doc_id").collect()
    )
    assert got == want
    # 6 clones -> C(6,2)=15 exact pairs in bucket 10
    assert (10, 15, 60) in want


def test_banding_calibration_clone_blowup_is_combinatorial_not_enumerated(spark):
    """A 200-member clone group yields C(200,2) = 19900 exact pairs computed
    FROM THE MULTIPLICITY (one rep row), not by enumerating a quadratic
    banding self-join — plus one rep-level near-dup pair weighted by the
    group size."""
    from chat_data_pipeline_spark.operators.dedup import banding_calibration

    words = [f"w{i}" for i in range(40)]
    near = list(words)
    near[20] = "changed"
    rows = [(i, " ".join(words)) for i in range(200)] + [(500, " ".join(near))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.bucket: (r.n_pairs, r.sum_band_matches)
        for r in banding_calibration(df, "text", "doc_id").collect()
    }
    assert got[10] == (19900, 79600)  # C(200,2), x4 bands
    if 7 in got:  # the J=31/41 rep pair, weighted by the clone multiplicity
        n, sb = got[7]
        assert n == 200 and 200 <= sb <= 800
    assert set(got) <= {7, 10}


def test_banding_calibration_permissive_banding_caps_with_logged_truncation(
    spark, caplog
):
    """r12 (VERDICT What's-wrong #1): on a corpus where the banding is too
    permissive — DISTINCT near-dup docs piling into shared buckets, the
    exact miscalibration the audit detects — the candidate volume is
    bounded by max_bucket_size and the truncation is LOGGED, never silent.
    A non-binding cap must leave the histogram byte-identical to the
    uncapped run and stay quiet."""
    import logging

    from chat_data_pipeline_spark.operators.dedup import banding_calibration

    # 80 DISTINCT docs, pairwise J ~ 0.9 (only the last word differs), under
    # a deliberately permissive (num_perm=4, num_bands=4) => r=1 banding:
    # nearly every pair is a candidate, C(80,2) = 3160 pairs uncapped
    words = [f"w{i}" for i in range(40)]
    rows = [(i, " ".join(words[:-1] + [f"tail{i}"])) for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(num_perm=4, num_bands=4)

    uncapped = banding_calibration(
        df, "text", "doc_id", max_bucket_size=None, **kw
    ).collect()
    n_uncapped = sum(r.n_pairs for r in uncapped)
    assert n_uncapped > 500  # the blowup is real on this corpus

    with caplog.at_level(logging.WARNING, logger="chat_data_pipeline_spark"):
        capped = banding_calibration(
            df, "text", "doc_id", max_bucket_size=8, **kw
        ).collect()
    warns = [r for r in caplog.records if "max_bucket_size=8" in r.getMessage()]
    assert len(warns) == 1 and "truncated" in warns[0].getMessage()
    n_capped = sum(r.n_pairs for r in capped)
    # every (band, sig) bucket contributes at most C(8,2)=28 pairs; 4 bands
    # here share essentially one hot sig each => a few hundred pairs max
    assert 0 < n_capped <= 4 * 28
    assert n_capped < n_uncapped

    # deterministic sample: the capped histogram is repartition-invariant
    capped2 = banding_calibration(
        df.repartition(7), "text", "doc_id", max_bucket_size=8, **kw
    ).collect()
    assert sorted(map(tuple, capped2)) == sorted(map(tuple, capped))

    # a non-binding cap is a no-op and logs nothing
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="chat_data_pipeline_spark"):
        loose = banding_calibration(
            df, "text", "doc_id", max_bucket_size=10_000, **kw
        ).collect()
    assert sorted(map(tuple, loose)) == sorted(map(tuple, uncapped))
    assert not [r for r in caplog.records if "max_bucket_size" in r.getMessage()]


# --- ingest gate (data_quality_report / uniqueness_report) ------------------


def test_quality_gate_hand_computed(spark):
    from pyspark.sql import functions as F

    from chat_data_pipeline_spark.operators.diagnostics import (
        data_quality_report,
        uniqueness_report,
    )

    rows = [
        (1, "hello", 5),
        (1, "world", 5),      # duplicate id
        (None, "x", 1),       # null id
        (4, None, 0),         # null text
        (5, "", 0),           # empty text
        (6, "abc", 99),       # n_chars inconsistent
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    rules = {
        "doc_id_not_null": F.col("doc_id").isNotNull(),
        "text_nonempty": F.length("text") > 0,
        "n_chars_matches_text": F.col("n_chars") == F.length("text"),
    }
    got = {
        r.rule: (r.n_rows, r.n_violations, r.violation_nanos)
        for r in data_quality_report(df, rules).collect()
    }
    assert got["doc_id_not_null"] == (6, 1, round(1e9 / 6))
    # NULL text rows violate BOTH text rules (NULL predicate = violation)
    assert got["text_nonempty"] == (6, 2, round(2e9 / 6))
    assert got["n_chars_matches_text"] == (6, 2, round(2e9 / 6))
    u = uniqueness_report(df, "doc_id").collect()[0]
    # violations: the two id=1 rows + the NULL-id row
    assert (u.rule, u.n_rows, u.n_violations) == ("doc_id_unique", 6, 3)
    assert u.violation_nanos == 500_000_000


def test_quality_gate_empty_corpus_total(spark):
    from pyspark.sql import functions as F

    from chat_data_pipeline_spark.operators.diagnostics import (
        data_quality_report,
        uniqueness_report,
    )

    df = spark.createDataFrame([], "doc_id long, text string")
    out = data_quality_report(df, {"t": F.col("text").isNotNull()}).collect()
    assert [(r.n_rows, r.n_violations, r.violation_nanos) for r in out] == [(0, 0, 0)]
    u = uniqueness_report(df, "doc_id").collect()[0]
    assert (u.n_rows, u.n_violations, u.violation_nanos) == (0, 0, 0)


def test_quality_gate_single_scan(spark):
    """All per-row rules ride ONE aggregate over one pruned scan."""
    from pyspark.sql import functions as F

    from chat_data_pipeline_spark.operators.diagnostics import data_quality_report
    from chat_data_pipeline_spark.plans.audit import plan_report

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = data_quality_report(
        docs,
        {
            "id": F.col("doc_id").isNotNull(),
            "txt": F.length("text") > 0,
            "nc": F.col("n_chars") == F.length("text"),
        },
    )
    r = plan_report(out)
    assert r.n_scans == 1 and r.n_python_stages == 0
    assert r.n_exchanges <= 2  # the one-row final agg (+AQE coalesce at most)


# --- conversation structure QA (operators/conversation.py) ------------------


def test_conversation_structure_hand_computed(spark):
    from chat_data_pipeline_spark.operators.conversation import (
        conversation_structure_report,
    )

    rows = [
        # well-formed: alternating roles, one trainable
        (1, [("hi", False, "User"), ("hello!", True, "Assistant")]),
        # empty body + same-role adjacency + NO trainable turn
        (2, [("  ", False, "User"), ("x", False, "User"), (None, False, "Assistant")]),
        # single-turn conversation (adjacency fold must not fire)
        (3, [("solo", True, "User")]),
    ]
    df = spark.createDataFrame(
        rows,
        "user_id long, conversation array<struct<content string, do_train boolean, role string>>",
    )
    r = conversation_structure_report(df).collect()[0]
    assert r.n_convs == 3
    assert r.n_turns == 6
    assert r.n_empty_turns == 2  # the blank '  ' and the NULL content
    assert r.n_role_repeats == 1  # User followed by User
    assert r.n_convs_without_trainable == 1


def test_conversation_structure_null_and_empty_convs(spark):
    """r12 ADVICE fix: NULL / zero-length conversation arrays are corpus
    rows — they count in n_convs and n_convs_without_trainable and
    contribute 0 turns (size(NULL) = -1 under non-ANSI must never leak
    into the sums)."""
    from chat_data_pipeline_spark.operators.conversation import (
        conversation_structure_report,
    )

    rows = [
        (1, [("hi", False, "User"), ("hello!", True, "Assistant")]),
        (2, None),  # NULL conversation
        (3, []),  # empty conversation
    ]
    df = spark.createDataFrame(
        rows,
        "user_id long, conversation array<struct<content string, do_train boolean, role string>>",
    )
    r = conversation_structure_report(df).collect()[0]
    assert r.n_convs == 3
    assert r.n_turns == 2  # NULL and [] contribute 0, not -1
    assert r.n_empty_turns == 0
    assert r.n_role_repeats == 0
    assert r.n_convs_without_trainable == 2  # the NULL and the empty conv


def test_conversation_structure_empty_and_invariance(spark):
    from chat_data_pipeline_spark.operators.conversation import (
        conversation_structure_report,
    )

    empty = spark.createDataFrame(
        [],
        "user_id long, conversation array<struct<content string, do_train boolean, role string>>",
    )
    r = conversation_structure_report(empty).collect()[0]
    assert tuple(r) == (0, 0, 0, 0, 0)

    rows = [
        (i, [(f"m{j}", j % 2 == 1, "User" if (i + j) % 3 else "Assistant")
             for j in range(1 + i % 5)])
        for i in range(50)
    ]
    df = spark.createDataFrame(
        rows,
        "user_id long, conversation array<struct<content string, do_train boolean, role string>>",
    )
    want = tuple(conversation_structure_report(df).collect()[0])
    got = tuple(conversation_structure_report(df.repartition(9)).collect()[0])
    assert got == want
