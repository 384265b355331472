"""Golden tests for the conversation lifecycle P1→P2→P3 + D10 and the
pipeline executor contract (criteria naming, dry-run, reports, G4 split)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chat_data_pipeline_spark.operators import conversation as CV
from chat_data_pipeline_spark.operators import sampling as S
from chat_data_pipeline_spark.plans import SparkPreprocessor
from chat_data_pipeline_spark.plans.pipeline import (
    criteria_column_name,
    rename_dry_run_columns,
    split_dataset_by_filter,
)

CONV_SCHEMA = (
    "id long, source string, "
    "conversation array<struct<content string, do_train boolean, role string>>"
)


@pytest.fixture(scope="module")
def conv_df(spark):
    rows = [
        # multi-target conversation (2 do_train)
        (1, "s1", [("sys", False, "System"), (" hi ", False, "User"),
                   (" hello! ", True, "Assistant"), ("more?", False, "User"),
                   ("sure.", True, "Assistant")]),
        # first message is the do_train target → empty input, instruction ""
        (2, "s1", [("first!", True, "Assistant")]),
        # no do_train → contributes no rows
        (3, "s2", [("a", False, "User"), ("b", False, "Assistant")]),
        # whitespace-heavy contents exercise strip()
        (4, "s2", [("  q  ", False, "User"), ("  a  ", True, "Assistant")]),
    ]
    return spark.createDataFrame(rows, CONV_SCHEMA)


def test_explode_and_derive(conv_df):
    out = CV.add_content_columns(CV.explode_conversations(conv_df))
    rows = {(r.id, r.response): r for r in out.collect()}
    assert len(rows) == 4  # 2 + 1 + 0 + 1
    r = rows[(1, "hello!")]
    assert r.instruction == "hi"
    assert [m.content for m in r.input] == ["sys", " hi "]
    r = rows[(1, "sure.")]
    assert r.instruction == "more?"
    assert len(r.input) == 4
    r = rows[(2, "first!")]
    assert r.instruction == "" and r.input == []
    r = rows[(4, "a")]
    assert r.instruction == "q"


def test_chatml_roundtrip(conv_df):
    out = CV.to_chatml(CV.add_content_columns(CV.explode_conversations(conv_df)))
    rows = out.filter(F.col("id") == 1).collect()
    for r in rows:
        # prefix messages all do_train=False; last message True with stripped content
        *prefix, last = r.conversation
        assert all(not m.do_train for m in prefix)
        assert last.do_train and last.role == "Assistant"
        assert last.content == last.content.strip()


def test_dedup_key(conv_df):
    got = {
        r.id: r.key
        for r in conv_df.select(
            "id", CV.dedup_key_expr(F.col("conversation")).alias("key")
        ).collect()
    }
    # reference: concat do_train contents + "\n\n" each, then strip
    assert got[1] == " hello! \n\nsure."[0:].strip() or got[1] == "hello! \n\nsure."
    assert got[1] == ("" + " hello! " + "\n\n" + "sure." + "\n\n").strip()
    assert got[2] == "first!"
    assert got[3] == ""


def test_pipeline_criteria_naming():
    assert (
        criteria_column_name("response", "check_word_number")
        == "response_check_word_number_criteria"
    )


def test_pipeline_dry_run_and_rename(spark):
    df = spark.createDataFrame(
        [(1, "one two three four five six."), (2, "x")], "id long, text string"
    )
    pre = SparkPreprocessor(column_name="text", filters=["check_word_number", "check_completion"])
    dry = pre.run(df, dry_run=True)
    assert dry.count() == 2
    assert "text_check_word_number_criteria" in dry.columns
    assert "text_check_completion_criteria" in dry.columns
    renamed = rename_dry_run_columns(dry, "sweep1")
    assert "text_check_word_number_criteria_sweep1" in renamed.columns


def test_pipeline_filters_and_reports(spark):
    df = spark.createDataFrame(
        [(1, "one two three four five six."), (2, "too short")], "id long, text string"
    )
    pre = SparkPreprocessor(
        column_name="text",
        filters=[("check_word_number", {"min_word_threshold": 5, "max_word_threshold": 100})],
        verbose=True,
    )
    out = pre.run(df)
    assert [r.id for r in out.collect()] == [1]
    (report,) = pre.reports
    assert report.rows_before == 2 and report.rows_after == 1
    assert report.score_summary["count"] == 2


def test_wrong_splitter_token_warns_instead_of_silent_total_drop(spark, caplog):
    """r11 ADVICE fix: a wrong splitter_token makes EVERY doc malformed —
    the reference raises, this engine drops via NULL keep.  The drop must
    be diagnosable: a warning fires when most criteria are NULL, naming
    the NULL-keep drop and the splitter_token suspicion.  r12 ADVICE fix:
    the warn-once scope is the PREPROCESSOR INSTANCE, not the module — a
    later misconfigured pipeline in the same long-lived driver must warn
    again."""
    import logging

    df = spark.createDataFrame(
        [(i, f"plain doc {i} with no splitter token at all") for i in range(6)],
        "id long, text string",
    )
    pre = SparkPreprocessor(
        column_name="text",
        filters=[("check_truncation", {"splitter_token": "<|typo_splitter|>"})],
        verbose=True,
    )
    with caplog.at_level(logging.WARNING, logger="chat_data_pipeline_spark"):
        out = pre.run(df)
        assert out.count() == 0  # every doc malformed -> all dropped
    warns = [r for r in caplog.records if "NULL criteria" in r.getMessage()]
    assert len(warns) == 1
    assert "splitter_token" in warns[0].getMessage()
    # warn-once is per INSTANCE: a fresh preprocessor with the same filter
    # name is a new (possibly independently misconfigured) pipeline and
    # must warn again
    with caplog.at_level(logging.WARNING, logger="chat_data_pipeline_spark"):
        SparkPreprocessor(
            column_name="text",
            filters=[("check_truncation", {"splitter_token": "<|typo_splitter|>"})],
            verbose=True,
        ).run(df).count()
    warns = [r for r in caplog.records if "NULL criteria" in r.getMessage()]
    assert len(warns) == 2


def test_split_dataset_by_filter(spark):
    df = spark.createDataFrame(
        [(1, "one two three four five six."), (2, "x")], "id long, text string"
    )
    passed, failed = split_dataset_by_filter(df, "text", "check_word_number")
    assert {r.id for r in passed.collect()} == {1}
    assert {r.id for r in failed.collect()} == {2}


def test_sample_grouped_rules(spark):
    rows = [(i, "big") for i in range(20)] + [(100 + i, "small") for i in range(4)]
    df = spark.createDataFrame(rows, "id long, user_id string")
    out = S.sample_grouped(df, "user_id", 0.5, "id")
    by_user = {
        r.user_id: r.n
        for r in out.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert by_user["big"] == 10  # ceil(20 * 0.5)
    assert by_user["small"] == 4  # < 5 rows: kept whole
    # deterministic
    again = {r.id for r in S.sample_grouped(df, "user_id", 0.5, "id").collect()}
    assert again == {r.id for r in out.collect()}


def test_dataset_subtraction(spark):
    a = spark.createDataFrame([(1,), (2,), (3,)], "ids long")
    b = spark.createDataFrame([(2,), (9,)], "ids long")
    assert {r.ids for r in S.dataset_subtraction(a, b).collect()} == {1, 3}


def test_multimodal_plumbing(spark):
    from chat_data_pipeline_spark.operators import multimodal as MM

    df = spark.createDataFrame(
        [(1, bytearray(b"hello world")), (2, bytearray(b"")), (3, None)],
        "doc_id long, payload binary",
    )
    feats = {r.doc_id: r for r in MM.extract_features(df).collect()}
    assert feats[1].n_bytes == 11 and feats[1].first_cp == ord("h")
    assert feats[2].n_bytes == 0 and feats[3].n_bytes == 0

    with pytest.raises(NotImplementedError):
        MM.extract_features(df, codec="real")

    frames = MM.sample_frames(
        spark.createDataFrame(
            [(1, bytearray(bytes(range(256)) * 20))], "media_id long, payload binary"
        ),
        every_n_bytes=1024,
        max_frames=8,
    ).collect()
    assert len(frames) == 5  # 5120 bytes → 5 frames
    assert all(len(fr.frame) == 1024 for fr in frames)


def test_pipeline_dedup_method_exact_and_unknown(spark):
    df = spark.createDataFrame(
        [(1, "same text here"), (2, "same text here"), (3, "other text")],
        "doc_id long, text string",
    )
    pre = SparkPreprocessor(
        column_name="text",
        deduplication_config={"method": "exact", "id_col": "doc_id"},
    )
    assert sorted(r.doc_id for r in pre.run(df).collect()) == [1, 3]

    bad = SparkPreprocessor(
        column_name="text", deduplication_config={"method": "nope", "id_col": "doc_id"}
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown dedup method"):
        bad.run(df)


def test_stats_describe_single_row_group(spark, tmp_path):
    """A source group with exactly one document must yield std 0.0, not a
    Spark-4 ANSI DIVIDE_BY_ZERO (round-2 ADVICE medium)."""
    from chat_data_pipeline_spark.queries import REGISTRY

    docs = spark.createDataFrame(
        [
            (0, "one two three four", "en", "solo"),
            (1, "a b c", "en", "pair"),
            (2, "a b c d e f", "en", "pair"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = REGISTRY["filter_stats_describe"].fn(spark, str(tmp_path))
    rows = {r.source: r for r in out.collect()}
    assert rows["solo"].n == 1 and rows["solo"].std_wc == 0.0
    assert rows["pair"].n == 2 and rows["pair"].std_wc > 0.0


def test_pipeline_observed_stats_non_verbose(spark):
    """Non-verbose mode: per-filter describe() stats and row counts ride the
    caller's ONE action via df.observe — collect_reports() runs zero extra
    Spark jobs (round-2 verdict task #7; ref:pipeline.py:57 contract)."""
    df = spark.createDataFrame(
        [(1, "one two three four five six."), (2, "seven eight nine ten."), (3, "x")],
        "id long, text string",
    )
    pre = SparkPreprocessor(
        column_name="text",
        filters=[
            ("check_word_number", {"min_word_threshold": 4, "max_word_threshold": 100}),
            "check_completion",
        ],
    )
    out = pre.run(df)
    sc = spark.sparkContext
    sc.setJobGroup("obs-test", "observed stats")
    try:
        assert out.count() == 2
        jobs_after_action = len(sc.statusTracker().getJobIdsForGroup("obs-test"))
        reports = pre.collect_reports()
        jobs_after_collect = len(sc.statusTracker().getJobIdsForGroup("obs-test"))
    finally:
        sc.setJobGroup(None, None)
    assert jobs_after_collect == jobs_after_action  # stats cost no extra pass
    wc, comp = reports
    assert wc.rows_before == 3 and wc.rows_after == 2 and wc.removed == 1
    assert wc.score_summary["mean"] == pytest.approx((6 + 4 + 1) / 3)
    assert wc.score_summary["min"] == 1.0 and wc.score_summary["max"] == 6.0
    assert comp.rows_before == 2 and comp.rows_after == 2
    assert comp.score_summary["mean"] == 1.0  # both survivors end with '.'


def test_resize_raw_gray_nearest_neighbor(spark):
    """Hand-computed 4x4 -> 2x2 nearest-neighbor resize, plus short-payload drop."""
    import numpy as np

    from chat_data_pipeline_spark.operators.multimodal import resize_raw_gray

    img = bytes(range(16))  # 4x4 row-major: row i = [4i..4i+3]
    rows = [(1, img), (2, b"abc"), (3, img + b"XYZ")]  # 3: tail-cropped
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r.media_id: bytes(r.resized)
        for r in resize_raw_gray(
            df, src_width=4, out_w=2, out_h=2
        ).collect()
    }
    # rows/cols sampled at (0*4)//2=0 and (1*4)//2=2 -> pixels (0,0),(0,2),(2,0),(2,2)
    assert got[1] == bytes([0, 2, 8, 10])
    assert got[3] == got[1]  # extra tail bytes cropped before reshape
    assert 2 not in got  # shorter than one row -> dropped
    # cross-check against numpy's own fancy indexing
    arr = np.frombuffer(img, dtype=np.uint8).reshape(4, 4)
    assert got[1] == arr[np.ix_([0, 2], [0, 2])].tobytes()


def test_do_deduplication_false_skips_dedup_at_library_level(spark):
    """ref:preprocessor.py:24,34-36 — the reference-shaped config
    {'do_deduplication': False} must skip dedup for direct API users too,
    not only through the CLI's gate."""
    from chat_data_pipeline_spark.plans.pipeline import SparkPreprocessor

    df = spark.createDataFrame(
        [(i, "same text twice over") for i in range(6)], "doc_id long, text string"
    )
    out = SparkPreprocessor(
        column_name="text",
        deduplication_config={"do_deduplication": False},
    ).run(df)
    assert out.count() == 6  # exact clones survive: dedup skipped


def test_verbose_dedup_of_empty_frame_does_not_crash(spark):
    """An upstream filter chain can hand dedup an empty frame; the D9
    telemetry percentages must not divide by zero."""
    from chat_data_pipeline_spark.plans.pipeline import SparkPreprocessor

    df = spark.createDataFrame(
        [(1, "only one tiny row")], "doc_id long, text string"
    )
    out = SparkPreprocessor(
        column_name="text",
        filters=[("check_word_number", {"min_word_threshold": 10_000})],
        deduplication_config={},
        verbose=True,
    ).run(df)
    assert out.count() == 0


def test_published_rulesets_reachable_as_named_filters(spark):
    """check_gopher_quality / check_c4_quality run from the string registry
    (YAML path) with threshold overrides."""
    from chat_data_pipeline_spark.plans.pipeline import SparkPreprocessor

    good = (
        "This is a perfectly reasonable paragraph of english text that the "
        "quality rules should accept. It has enough words and sentences. "
        "And it even ends with terminal punctuation on every line."
    )
    df = spark.createDataFrame(
        [(1, good), (2, "too short { and broken")], "doc_id long, text string"
    )
    out = SparkPreprocessor(
        column_name="text",
        filters=[("check_gopher_quality", {"min_words": 10}), "check_c4_quality"],
        deduplication_config=None,
    ).run(df)
    assert [r.doc_id for r in out.collect()] == [1]


def test_web_page_preset(spark):
    """The round-6 web preset: strip_html -> normalize, then C4 + Gopher in
    paper order, driven end-to-end through SparkPreprocessor."""
    from chat_data_pipeline_spark.plans.pipeline import SparkPreprocessor
    from chat_data_pipeline_spark.plans.registry import (
        get_web_page_cleaners,
        get_web_page_filters,
    )

    good_body = (
        "This is a perfectly reasonable paragraph of english text that the "
        "quality rules should accept with room to spare. "
        "It has more than enough words for every bound. "
        "And it ends with terminal punctuation on every line."
    )
    df = spark.createDataFrame(
        [
            (1, f"<html><body><p>{good_body}</p></body></html>"),
            (2, "<script>var x = 1;</script><p>tiny.</p>"),
        ],
        "doc_id long, text string",
    )
    out = SparkPreprocessor(
        column_name="text",
        cleaners=get_web_page_cleaners(),
        filters=get_web_page_filters(min_words=10),
        deduplication_config=None,
    ).run(df)
    rows = out.collect()
    assert [r.doc_id for r in rows] == [1]
    assert "<" not in rows[0].text and "html" not in rows[0].text


def test_simhash_method_reachable_from_config(spark):
    """The dedup method dispatch covers the full family: 'simhash' routes to
    the banded-hamming path (exact clones collapse, near-identical texts
    merge)."""
    from chat_data_pipeline_spark.plans.pipeline import SparkPreprocessor

    base = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, "completely different content here")],
        "doc_id long, text string",
    )
    out = SparkPreprocessor(
        column_name="text",
        deduplication_config={"method": "simhash", "id_col": "doc_id"},
    ).run(df)
    kept = sorted(r.doc_id for r in out.collect())
    assert 1 in kept and 2 not in kept and 3 in kept
