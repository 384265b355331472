"""Unit tests for operators/temporal.py: edge semantics the sf0.01 oracle
parity run (tests/test_oracle_parity.py) can't isolate — equal-timestamp
ties, tolerance nulling, forward direction, band boundary in/exclusivity."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from chat_data_pipeline_spark.operators import temporal as TP


def _ts(s: float) -> datetime:
    return datetime.utcfromtimestamp(1_700_000_000 + s)


@pytest.fixture(scope="module")
def quotes(spark):
    # (key, ts, qid)
    rows = [
        (1, _ts(0.0), 10),
        (1, _ts(5.0), 11),
        (1, _ts(5.0), 12),  # equal-ts tie -> greatest qid must win
        (1, _ts(60.0), 13),
        (2, _ts(30.0), 20),
    ]
    return spark.createDataFrame(rows, "key int, ts timestamp, qid int")


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        (1, _ts(5.0), 100),   # exactly at tie pair -> inclusive, qid 12
        (1, _ts(59.9), 101),  # before 60 -> qid 12
        (1, _ts(61.0), 102),  # after 60 -> qid 13
        (2, _ts(0.0), 200),   # before any quote -> null
        (3, _ts(10.0), 300),  # key with no quotes -> null
    ]
    return spark.createDataFrame(rows, "key int, ts timestamp, tid int")


def test_asof_backward_ties_and_nulls(quotes, trades):
    out = TP.asof_join(trades, quotes, on="key", right_cols=["qid"])
    got = {r["tid"]: r["qid"] for r in out.collect()}
    assert got == {100: 12, 101: 12, 102: 13, 200: None, 300: None}


def test_asof_preserves_left_rowcount(quotes, trades):
    out = TP.asof_join(trades, quotes, on="key", right_cols=["qid"])
    assert out.count() == trades.count()
    # list, not set: a duplicated ts column would hide in a set compare and
    # make any downstream out.select("ts") raise AMBIGUOUS_REFERENCE
    assert sorted(out.columns) == ["key", "qid", "tid", "ts"]
    assert len(out.columns) == len(set(out.columns))
    assert out.select("ts").count() == trades.count()  # must resolve


def test_asof_forward(quotes, trades):
    out = TP.asof_join(trades, quotes, on="key", right_cols=["qid"], direction="forward")
    got = {r["tid"]: r["qid"] for r in out.collect()}
    # earliest quote at-or-after each trade; equal-ts tie -> greatest qid,
    # same deterministic rule as backward
    assert got == {100: 12, 101: 13, 102: None, 200: 20, 300: None}


def test_asof_tolerance_nulls_stale_matches(quotes, trades):
    out = TP.asof_join(trades, quotes, on="key", right_cols=["qid"], tolerance_seconds=10)
    got = {r["tid"]: r["qid"] for r in out.collect()}
    # trade 101 @59.9 matches quote @5.0 -> 54.9s old -> nulled; 102 @61 vs @60 ok
    assert got == {100: 12, 101: None, 102: 13, 200: None, 300: None}


def test_asof_payload_is_atomic(spark):
    # the winning right row has a NULL payload column: it must stay null,
    # not be backfilled from an older right row (whole-row semantics)
    quotes = spark.createDataFrame(
        [(1, _ts(0.0), 10, "a"), (1, _ts(5.0), 11, None)],
        "key int, ts timestamp, qid int, tag string",
    )
    trades = spark.createDataFrame([(1, _ts(6.0), 100)], "key int, ts timestamp, tid int")
    out = TP.asof_join(trades, quotes, on="key", right_cols=["qid", "tag"])
    row = out.collect()[0]
    assert (row["qid"], row["tag"]) == (11, None)


def test_asof_rejects_overlapping_columns(quotes, trades):
    with pytest.raises(ValueError, match="overlapping"):
        TP.asof_join(
            trades.withColumnRenamed("tid", "qid"), quotes, on="key", right_cols=["qid"]
        )


def test_banded_range_join_boundaries(spark):
    left = spark.createDataFrame(
        [(1, _ts(100.0), 1)], "key int, ts timestamp, lid int"
    )
    right = spark.createDataFrame(
        [
            (1, _ts(40.0), 1),    # ts - 60 exactly -> inclusive
            (1, _ts(39.999), 2),  # just outside
            (1, _ts(99.999), 3),  # just inside
            (1, _ts(100.0), 4),   # equal ts -> exclusive
            (2, _ts(50.0), 5),    # other key
        ],
        "key int, rts timestamp, rid int",
    )
    out = TP.banded_range_join(
        left, right, on="key", band_seconds=60, left_ts="ts", right_ts="rts"
    )
    assert sorted(r["rid"] for r in out.collect()) == [1, 3]


def test_banded_range_join_crosses_bin_edge(spark):
    # left at bin boundary: matches must come from the PREVIOUS bin too
    left = spark.createDataFrame([(1, _ts(120.0), 1)], "key int, ts timestamp, lid int")
    right = spark.createDataFrame(
        [(1, _ts(80.0), 1), (1, _ts(119.0), 2)], "key int, rts timestamp, rid int"
    )
    out = TP.banded_range_join(
        left, right, on="key", band_seconds=60, left_ts="ts", right_ts="rts"
    )
    assert sorted(r["rid"] for r in out.collect()) == [1, 2]


def test_sessionize_batch_gap_semantics(spark):
    rows = [
        (1, _ts(0.0), 1.0, 1),
        (1, _ts(1800.0), 2.0, 2),   # gap exactly 1800 -> same session
        (1, _ts(3600.5), 4.0, 3),   # gap 1800.5 -> new session
        (2, _ts(0.0), 8.0, 4),
    ]
    ev = spark.createDataFrame(rows, "user_id int, ts timestamp, value double, event_id int")
    out = TP.sessionize_batch(ev, gap_seconds=1800)
    got = {
        (r["user_id"], r["session_idx"]): (r["n_events"], r["total_value"])
        for r in out.collect()
    }
    assert got == {(1, 1): (2, 3.0), (1, 2): (1, 4.0), (2, 1): (1, 8.0)}


def test_funnel_steps_ordering_semantics(spark):
    """The funnel is ORDERED: a purchase before the first view never
    converts; each step's timestamp is the earliest strictly after the
    previous step; users without the first step are excluded."""
    from chat_data_pipeline_spark.operators import temporal as TP

    rows = [
        # u1: clean chain view(10) -> click(20) -> purchase(30)
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        # u2: purchase BEFORE view -> depth 2 only (view 10, click 15)
        (2, 5, "purchase"), (2, 10, "view"), (2, 15, "click"),
        # u3: click before view -> depth 1
        (3, 9, "click"), (3, 10, "view"),
        # u4: no view at all -> excluded
        (4, 1, "click"), (4, 2, "purchase"),
        # u5: earliest chain picked (views 10,12; clicks 11,13 -> click 11)
        (5, 10, "view"), (5, 12, "view"), (5, 11, "click"), (5, 13, "click"),
        (5, 11, "purchase"), (5, 14, "purchase"),
    ]
    df = spark.createDataFrame(
        [(u, float(t), ty) for u, t, ty in rows],
        "user_id long, tsec double, event_type string",
    ).select("user_id", F.timestamp_seconds("tsec").alias("ts"), "event_type")
    got = {
        r.user_id: (
            r.t_view and r.t_view.timestamp(),
            r.t_click and r.t_click.timestamp(),
            r.t_purchase and r.t_purchase.timestamp(),
            r.funnel_depth,
        )
        for r in TP.funnel_steps(df).collect()
    }
    assert set(got) == {1, 2, 3, 5}
    assert got[1] == (10.0, 20.0, 30.0, 3)
    assert got[2] == (10.0, 15.0, None, 2)
    assert got[3] == (10.0, None, None, 1)
    assert got[5] == (10.0, 11.0, 14.0, 3)  # purchase@11 not AFTER click@11
