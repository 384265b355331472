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
