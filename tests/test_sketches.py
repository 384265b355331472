"""Sketch scale-paths vs their exact twins: approx_count_distinct (HLL++)
and percentile_approx (t-digest-style) are the mergeable, map-side-combinable
replacements the 100 TB plan swaps in for countDistinct / percentile — this
guards that they stay within advertised error on the driver testdata."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("CDP_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def events(spark):
    from chat_data_pipeline_spark.queries import _read_events

    return _read_events(spark, SF_DIR)


def test_hll_distinct_within_rsd(events):
    row = events.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.05).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.15


def test_percentile_approx_near_exact(events):
    row = events.agg(
        F.expr("percentile(value, 0.5)").alias("exact"),
        F.percentile_approx("value", 0.5, 10_000).alias("approx"),
    ).collect()[0]
    assert row["exact"] > 0
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05


# ---------------------------------------------------------------------------
# Count-Min sketch (round 7)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_cms_never_undercounts_and_is_tight_here(spark, docs):
    """CMS guarantee: est(x) >= true count(x) for EVERY token; with this
    corpus's tiny vocab vs a 4x1024 table, collisions should cost nothing
    beyond the epsilon bound e/width of total mass."""
    import math

    from chat_data_pipeline_spark.functions import text as T
    from chat_data_pipeline_spark.operators import sketches as SK

    exact = {
        r.tok: r.c
        for r in docs.select(F.explode(T.words(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    total = sum(exact.values())
    sketch = SK.cms_table(docs, "text", depth=4, width=1024)
    cands = spark.createDataFrame([(t,) for t in exact], "tok string")
    est = {r.tok: r.est_count for r in SK.cms_estimate(sketch, cands).collect()}
    bound = math.e / 1024 * total
    for t, c in exact.items():
        assert est[t] >= c, t
        assert est[t] - c <= bound, t


def test_cms_merge_equals_whole_corpus_sketch(docs):
    """Cell-wise merge of two half-corpus sketches equals the one-pass
    sketch — the compositionality that makes per-shard / per-trigger
    sketches combine without rescans."""
    from chat_data_pipeline_spark.operators import sketches as SK

    a = SK.cms_table(docs.filter(F.col("doc_id") % 2 == 0), "text")
    b = SK.cms_table(docs.filter(F.col("doc_id") % 2 == 1), "text")
    merged = {
        (r.d, r.bucket): r.c for r in SK.cms_merge([a, b]).collect()
    }
    whole = {
        (r.d, r.bucket): r.c for r in SK.cms_table(docs, "text").collect()
    }
    assert merged == whole


def test_cms_heavy_hitters_no_false_negatives(docs):
    """Every token with true count >= the threshold appears in the output
    (overestimates can only ADD tokens, never drop one)."""
    from chat_data_pipeline_spark.functions import text as T
    from chat_data_pipeline_spark.operators import sketches as SK

    exact = {
        r.tok: r.c
        for r in docs.select(F.explode(T.words(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    hh = {r.tok for r in SK.cms_heavy_hitters(docs, "text", min_count=100).collect()}
    truly_heavy = {t for t, c in exact.items() if c >= 100}
    assert truly_heavy <= hh


def test_hll_distinct_accuracy_and_partition_invariance(spark):
    """Raw HLL at ~24k distinct shingles (well past the small-range zone)
    lands within the theoretical ±3σ (σ = 1.04/sqrt(512) ≈ 4.6%), and the
    sketch is a pure function of the DATA — identical registers/estimate
    under any partitioning."""
    from chat_data_pipeline_spark.operators import sketches as SK

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    r = SK.hll_distinct(docs, "text", ngram_size=5).collect()[0]
    assert r.n_exact > 2.5 * r.m  # out of the small-range correction zone
    assert abs(r.rel_error) < 3 * 1.04 / (512 ** 0.5)
    r2 = SK.hll_distinct(docs.repartition(13), "text", ngram_size=5).collect()[0]
    assert r.asDict() == r2.asDict()


def test_hll_rho_edge_cases(spark):
    """rho arithmetic: leading-zero hex chars count 4 bits each, the first
    non-zero digit contributes its own leading zeros, all-zero material
    saturates at 53."""
    from chat_data_pipeline_spark.operators.sketches import _hll_rho
    from pyspark.sql import functions as F

    cases = [
        ("f000000000000", 1),   # 1111... -> first bit set
        ("8000000000000", 1),
        ("7000000000000", 2),   # 0111
        ("1000000000000", 4),   # 0001
        ("0800000000000", 5),   # next hex digit
        ("0010000000000", 12),
        ("0000000000001", 52),
        ("0000000000000", 53),  # saturation
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "hx string")
    got = {r.hx: r.rho for r in df.select("hx", _hll_rho(F.col("hx")).alias("rho")).collect()}
    for h, want in cases:
        assert got[h] == want, (h, got[h], want)


def test_hll_merge_equals_whole(spark):
    """Register tables merge by bucket-wise max: sketching two halves and
    merging equals sketching the union (the shard/trigger composition)."""
    from chat_data_pipeline_spark.operators import sketches as SK

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = docs.filter("doc_id % 2 = 0")
    b = docs.filter("doc_id % 2 = 1")
    merged = {
        r.bucket: r.r
        for r in SK.hll_merge(
            [SK.hll_registers(a, "text", ngram_size=5),
             SK.hll_registers(b, "text", ngram_size=5)]
        ).collect()
    }
    whole = {r.bucket: r.r for r in SK.hll_registers(docs, "text", ngram_size=5).collect()}
    assert merged == whole


def test_value_histogram_sketch_accuracy_and_edges(spark):
    """Each quantile estimate lands within its bin (<=12.5% relative by
    construction; in practice ~1%) of the true percentile; non-positive
    cents are excluded; n/n_bins are exact."""
    import numpy as np

    from chat_data_pipeline_spark.operators import sketches as SK

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    r = SK.value_histogram_sketch(ev, "value").collect()[0]
    vals = np.array([x.value for x in ev.select("value").collect()])
    vals = vals[np.round(vals * 100) >= 1]
    assert r.n == len(vals)
    for q, est in ((50, r.p50_est), (90, r.p90_est), (99, r.p99_est)):
        true = float(np.percentile(vals, q))
        assert abs(est - true) / true < 0.125, (q, est, true)
    # planted: zero/negative excluded, exact small-bin behavior
    df = spark.createDataFrame(
        [(0.0,), (-5.0,), (0.01,), (0.02,), (0.03,), (0.04,)], "value double"
    )
    r2 = SK.value_histogram_sketch(df, "value").collect()[0]
    assert r2.n == 4 and r2.n_bins == 4  # cents 1..4, unit bins
    assert r2.p50_est == 0.02  # rank ceil(0.5*4)=2 -> second unit bin


def test_sketch_store_roundtrip_and_idempotent_retry(spark, tmp_path):
    """Batched sketches through the store merge back to the whole-corpus
    sketch (CMS sum-merge AND HLL max-merge), and a replayed batch with a
    batch_id leaves the merged result unchanged."""
    from chat_data_pipeline_spark.operators import sketches as SK

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = docs.filter("doc_id % 2 = 0")
    b = docs.filter("doc_id % 2 = 1")

    cms_store = str(tmp_path / "cms")
    for i, part in enumerate((a, b)):
        SK.update_sketch_store(SK.cms_table(part, "text"), cms_store, batch_id=i)
    SK.update_sketch_store(SK.cms_table(b, "text"), cms_store, batch_id=1)  # retry
    merged = {
        (r.d, r.bucket): r.c
        for r in SK.read_merged_sketch(spark, cms_store, ["d", "bucket"], "c").collect()
    }
    whole = {(r.d, r.bucket): r.c for r in SK.cms_table(docs, "text").collect()}
    assert merged == whole

    hll_store = str(tmp_path / "hll")
    for i, part in enumerate((a, b)):
        SK.update_sketch_store(
            SK.hll_registers(part, "text", ngram_size=5), hll_store, batch_id=i
        )
    merged_r = {
        r.bucket: r.r
        for r in SK.read_merged_sketch(
            spark, hll_store, ["bucket"], "r", how="max"
        ).collect()
    }
    whole_r = {r.bucket: r.r for r in SK.hll_registers(docs, "text", ngram_size=5).collect()}
    assert merged_r == whole_r


def test_sketch_store_mixed_write_modes_read_back_cleanly(spark, tmp_path):
    """Interleaving batch_id and ad-hoc (batch_id=None) writes must leave a
    uniformly hive-partitioned store every reader can list: the old
    root-level append next to batch= dirs produced a mixed tree Spark's
    partition discovery rejects (r9 ADVICE)."""
    from chat_data_pipeline_spark.operators import sketches as SK

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = docs.filter("doc_id % 2 = 0")
    b = docs.filter("doc_id % 2 = 1")

    store = str(tmp_path / "mixed")
    SK.update_sketch_store(SK.cms_table(a, "text"), store, batch_id=0)
    SK.update_sketch_store(SK.cms_table(b, "text"), store)  # ad-hoc
    SK.update_sketch_store(SK.cms_table(b, "text"), store, batch_id=1)

    merged = {
        (r.d, r.bucket): r.c
        for r in SK.read_merged_sketch(spark, store, ["d", "bucket"], "c").collect()
    }
    # the ad-hoc write double-counts b by design (no idempotency key);
    # the layout question is that the read WORKS and sums all three parts
    two_b = {(r.d, r.bucket): r.c for r in SK.cms_table(b, "text").collect()}
    whole = {(r.d, r.bucket): r.c for r in SK.cms_table(docs, "text").collect()}
    for cell, c in merged.items():
        assert c == whole.get(cell, 0) + two_b.get(cell, 0)
    # every write landed under a batch= partition dir — uniform hive layout
    import os

    entries = [e for e in os.listdir(store) if not e.startswith(("_", "."))]
    assert entries and all(e.startswith("batch=") for e in entries)


def test_sketch_store_absorbs_pre_r10_root_layout(spark, tmp_path):
    """A store written by the OLD ad-hoc path (bare parquet files at the
    store root) must be migrated — not bricked — by the first post-upgrade
    write: legacy files move into batch=legacy-adhoc and the merged read
    sums all parts (review finding r10)."""
    import os

    from chat_data_pipeline_spark.operators import sketches as SK

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = docs.filter("doc_id % 2 = 0")
    b = docs.filter("doc_id % 2 = 1")

    store = str(tmp_path / "legacy")
    # simulate the pre-r10 layout: root-level append, bare part files
    SK.cms_table(a, "text").write.mode("append").parquet(store)
    assert any(
        e.endswith(".parquet") or e.startswith("part-")
        for e in os.listdir(store)
        if not e.startswith(("_", "."))
    )
    # first post-upgrade write absorbs the legacy files, then lands its own
    SK.update_sketch_store(SK.cms_table(b, "text"), store, batch_id=7)
    entries = [e for e in os.listdir(store) if not e.startswith(("_", "."))]
    assert entries and all(e.startswith("batch=") for e in entries)
    assert "batch=legacy-adhoc" in entries

    merged = {
        (r.d, r.bucket): r.c
        for r in SK.read_merged_sketch(spark, store, ["d", "bucket"], "c").collect()
    }
    whole = {(r.d, r.bucket): r.c for r in SK.cms_table(docs, "text").collect()}
    assert merged == whole


# --------------------------------------------------------------------------
# Round-10 review hardening: empty-input totality, overflow-safe
# interpolation, loud migration failure
# --------------------------------------------------------------------------


def test_hll_distinct_empty_corpus_deterministic_not_null(spark):
    """Zero register rows must yield the raw-HLL empty-set estimate
    (numerator = m*2^53, est ~ alpha*m), not NULL-poisoned columns."""
    from chat_data_pipeline_spark.operators import sketches as SK

    empty = spark.createDataFrame([], "text string")
    row = SK.hll_distinct(empty, "text").collect()[0]
    assert row.n_zero_registers == SK.HLL_M
    assert row.harmonic_numerator == SK.HLL_M * (1 << 53)
    assert row.est_distinct is not None and row.est_distinct > 0
    assert row.n_exact == 0
    assert row.rel_error is None  # undefined against an exact count of 0


def test_value_histogram_sketch_empty_reports_zero_n(spark):
    from chat_data_pipeline_spark.operators import sketches as SK

    empty = spark.createDataFrame([], "value double")
    row = SK.value_histogram_sketch(empty, "value").collect()[0]
    assert row.n == 0 and row.n_bins == 0


def test_merge_empty_lists_raise_cleanly():
    import pytest as _pytest

    from chat_data_pipeline_spark.operators import sketches as SK

    with _pytest.raises(ValueError, match="no sketches"):
        SK.cms_merge([])
    with _pytest.raises(ValueError, match="no register tables"):
        SK.hll_merge([])


def test_quantile_interpolation_survives_int64_overflow_regime(spark):
    """bin_width * in-bin-offset passes 2^63 once a wide bin holds a few
    hundred rows of ~2^59-cent values; the DECIMAL(38,0) product must keep
    the estimate exact where the old BIGINT product raised (ANSI) or
    wrapped negative."""
    from chat_data_pipeline_spark.operators import sketches as SK

    v = float(1 << 59) / 100.0  # cents ~ 2^59 -> bin width ~ 2^55
    rows = [(v * (1.0 + 0.07 * (i % 2)),) for i in range(600)]
    out = SK.value_histogram_sketch(
        spark.createDataFrame(rows, "value double"), "value"
    ).collect()[0]
    assert out.n == 600
    for p in (out.p50_est, out.p90_est, out.p99_est):
        assert p is not None and v * 0.8 <= p <= v * 1.3  # sane, in-range


def test_legacy_absorb_raises_on_rename_conflict(spark, tmp_path):
    """If a legacy root file cannot be moved (destination already exists —
    FileSystem.rename returns FALSE, it does not raise), the migration must
    fail loudly instead of logging success over a still-mixed store."""
    import os

    import pytest as _pytest

    from chat_data_pipeline_spark.operators import sketches as SK

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20)
    store = str(tmp_path / "conflict")
    SK.cms_table(docs, "text").write.mode("append").parquet(store)
    legacy_name = next(
        e for e in os.listdir(store)
        if not e.startswith(("_", ".")) and e.endswith(".parquet")
    )
    # plant a same-named file at the rename destination
    dest = os.path.join(store, "batch=legacy-adhoc")
    os.makedirs(dest)
    with open(os.path.join(dest, legacy_name), "w") as fh:
        fh.write("occupied")
    with _pytest.raises(RuntimeError, match="legacy root file"):
        SK.update_sketch_store(SK.cms_table(docs, "text"), store, batch_id=1)
