"""Dedup differential + property tests.

The MinHash path is checked end-to-end against a single-process
reimplementation of the reference pipeline (embed_func → LSH → union-find →
keep-min, tests/reference_semantics.py) on a controlled near-dup corpus —
survivor sets must be identical, pinning both signature arithmetic (seed 42)
and the min-id keep rule."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from chat_data_pipeline_spark.operators import dedup as D
from tests import reference_semantics as R

WORDS = (
    "spark query join filter window table scan merge sort hash batch stream "
    "row column value key order group agg data fast slow small big the a"
).split()


def _make_corpus(n_clusters=30, seed=7) -> dict[int, str]:
    """Clusters of near-dups at varied similarity + singletons + exact dups +
    sub-min_ngram shorties (FIXTURES.md §3)."""
    rng = random.Random(seed)
    texts: dict[int, str] = {}
    idx = 0
    for c in range(n_clusters):
        base = [rng.choice(WORDS) for _ in range(40)]
        texts[idx] = " ".join(base)
        idx += 1
        for variant in range(rng.randint(0, 3)):
            mutated = list(base)
            n_mut = rng.choice([0, 1, 2, 8, 20])  # 0 = exact dup
            for _ in range(n_mut):
                mutated[rng.randrange(len(mutated))] = rng.choice(WORDS)
            texts[idx] = " ".join(mutated)
            idx += 1
    for _ in range(10):  # singletons
        texts[idx] = " ".join(rng.choice(WORDS) for _ in range(25)) + f" unique{idx}"
        idx += 1
    for short in ["tiny", "a b c", ""]:  # below min_ngram_size
        texts[idx] = short
        idx += 1
    return texts


@pytest.fixture(scope="module")
def corpus():
    return _make_corpus()


def test_minhash_matches_reference_pipeline(spark, corpus):
    expected = R.reference_minhash_dedup_keep_ids(corpus)
    df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    got = {
        r.doc_id
        for r in D.minhash_dedup(df, "text", id_col="doc_id").select("doc_id").collect()
    }
    assert got == expected


def test_minhash_properties(spark, corpus):
    df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    out = D.minhash_dedup(df, "text", id_col="doc_id")
    kept = {r.doc_id for r in out.select("doc_id").collect()}
    # subset of input; deterministic across runs
    assert kept <= set(corpus)
    again = {
        r.doc_id
        for r in D.minhash_dedup(df, "text", id_col="doc_id").select("doc_id").collect()
    }
    assert kept == again
    # exact duplicates never both survive; the min id of each exact-dup group does
    by_text: dict[str, list[int]] = {}
    for i, t in corpus.items():
        by_text.setdefault(t, []).append(i)
    for t, ids in by_text.items():
        if len(ids) > 1 and len(R.NON_ALPHA.split(t)) >= 5:
            assert min(ids) in kept
            assert len(set(ids) & kept) == 1


def test_exact_dedup_min_id(spark):
    df = spark.createDataFrame(
        [(0, "a"), (3, "a"), (1, "b"), (2, "b"), (9, "c")], "id long, t string"
    )
    kept = {r.id for r in D.exact_dedup(df, "t", "id").collect()}
    assert kept == {0, 1, 9}


def test_connected_components_chain(spark):
    """Chain a-b-c-d must collapse to min label even though no single bucket
    contains all members (transitivity — what a 1-round approach would miss).
    Asserted on BOTH executions: the guarded driver union-find (the common
    output-sized-edges case) and the distributed min-label loop (forced via
    driver_max_edges=0 — the past-the-guard scale path)."""
    edges = spark.createDataFrame(
        [(5, 3), (3, 1), (7, 5), (9, 7), (20, 18)], "src long, dst long"
    )
    for cap in (1_000_000, 0):
        labels = {
            r.node: r.label
            for r in D.connected_components_min_label(
                edges, driver_max_edges=cap
            ).collect()
        }
        assert labels[9] == labels[7] == labels[5] == labels[3] == labels[1] == 1
        assert labels[20] == 18


def test_ngram_jaccard_dedup(spark, corpus):
    df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    kept = {r.doc_id for r in D.ngram_jaccard_dedup(df, "text", "doc_id").collect()}
    assert kept <= set(corpus)
    # exact dup groups keep exactly the min
    by_text: dict[str, list[int]] = {}
    for i, t in corpus.items():
        by_text.setdefault(t, []).append(i)
    for t, ids in by_text.items():
        if len(ids) > 1 and len(t.split()) >= 5:
            assert min(ids) in kept and len(set(ids) & kept) == 1


def test_ngram_jaccard_clone_bridge(spark):
    """Clone groups collapse to representatives, and a near-dup bridge still
    merges a whole clone group into the component (survivor = global min)."""
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    # change the last word: 5 of 6 shingles shared -> Jaccard 5/7 ≈ 0.714 ≥ 0.7
    a_near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    b = "one two three four five six seven eight nine ten"
    c = "completely different words entirely unrelated to anything else here now"
    rows = [(1, a), (2, a), (3, a), (4, a_near), (10, b), (11, b), (20, c)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = {r.doc_id for r in D.ngram_jaccard_dedup(df, "text", "doc_id").collect()}
    assert kept == {1, 10, 20}


def test_simhash_dedup(spark, corpus):
    df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    kept = {r.doc_id for r in D.simhash_dedup(df, "text", "doc_id").collect()}
    assert kept <= set(corpus)
    by_text: dict[str, list[int]] = {}
    for i, t in corpus.items():
        by_text.setdefault(t, []).append(i)
    for t, ids in by_text.items():
        if len(ids) > 1 and t:
            assert min(ids) in kept and len(set(ids) & kept) == 1


def test_simhash_signature_python_parity():
    assert D._simhash64("the quick brown fox") == D._simhash64("the quick brown fox")
    assert D._simhash64("") == 0
    # near-identical docs have close signatures (low hamming)
    a = D._simhash64("the quick brown fox jumps over the lazy dog " * 3)
    b = D._simhash64("the quick brown fox jumps over the lazy cat " * 3)
    ham = bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham <= 16


def test_ngram_jaccard_cap_noop_below_threshold(spark, corpus):
    """With a document-frequency cap no corpus shingle reaches, the capped
    result is identical to the uncapped one (the registered query relies on
    this at sf0.01 with cap 128)."""
    df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    uncapped = {r.doc_id for r in D.ngram_jaccard_dedup(df, "text", "doc_id").collect()}
    capped = {
        r.doc_id
        for r in D.ngram_jaccard_dedup(
            df, "text", "doc_id", max_shingle_freq=128
        ).collect()
    }
    assert capped == uncapped


def test_ngram_jaccard_cap_prunes_hot_shingle_candidates(spark):
    """Docs that share ONLY a hot shingle lose their edge under the cap —
    the stop-shingle guard's whole point at scale."""
    hot = "the quick brown fox jumps"
    rows = [(i, f"{hot} unique{i} tail{i} words{i} here{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # at threshold 0.05 the uncapped index emits all 45 hot-shingle pairs;
    # capping at df<=5 (< 10 docs) drops the hot shingle and with it every
    # candidate — while per-doc set sizes (denominators) stay the true 5
    uncapped = D.ngram_jaccard_edges(df, "text", "doc_id", threshold=0.05)
    capped = D.ngram_jaccard_edges(
        df, "text", "doc_id", threshold=0.05, max_shingle_freq=5
    )
    assert uncapped.count() == 45
    assert capped.count() == 0


def test_minhash_telemetry_taxonomy(spark, corpus, caplog):
    """D9: verbose minhash dedup logs the reference's exact stage-timer
    taxonomy and counters (ref:minhash_deduplication.py:305-317)."""
    import logging

    df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    with caplog.at_level(logging.INFO, logger="chat_data_pipeline_spark"):
        D.minhash_dedup(df, "text", id_col="doc_id", num_perm=32, verbose=True).count()
    text = "\n".join(r.getMessage() for r in caplog.records)
    for marker in (
        "minhash",
        "clustering",
        "filtering",
        "Data Number (before)",
        "Data Number (after)",
        "Duplicate Number",
        "Total Time",
    ):
        assert marker in text, f"missing telemetry line: {marker}"


def test_minhash_dedup_string_ids(spark, corpus):
    """The fingerprint schema derives the id type from the input — string
    doc ids (the common case for web corpora) must survive end-to-end and
    keep the lexicographic-min survivor per cluster, matching the long-id
    run on the same corpus under the doc%05d order-preserving encoding."""
    df_long = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    expect = {
        f"doc{r.doc_id:05d}"
        for r in D.minhash_dedup(df_long, "text", id_col="doc_id").select("doc_id").collect()
    }
    df_str = spark.createDataFrame(
        [(f"doc{i:05d}", t) for i, t in corpus.items()], "doc_id string, text string"
    )
    got = {
        r.doc_id
        for r in D.minhash_dedup(df_str, "text", id_col="doc_id").select("doc_id").collect()
    }
    assert got == expect
    bands = D.minhash_bands(df_str, "text", "doc_id", num_perm=32)
    assert dict(bands.dtypes)["id"] == "string"


def test_minhash_md5_twin_properties(spark, corpus):
    """The md5-family oracle twin runs the SAME D5-D8 core as the production
    sha1 path: exact-duplicate groups never keep more than the min id, the
    survivor set is deterministic and partition-invariant, and docs below the
    shingle threshold always survive (they are never bucketed)."""
    df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    kept = {r.doc_id for r in D.minhash_dedup_md5(df, "text", "doc_id").select("doc_id").collect()}
    assert kept <= set(corpus)
    # exact duplicates: only the min id of each exact-dup group survives
    by_text: dict[str, list[int]] = {}
    for i, t in corpus.items():
        by_text.setdefault(t, []).append(i)
    for ids in by_text.values():
        if len(ids) > 1:
            survivors = kept & set(ids)
            assert survivors <= {min(ids)}
    # short docs (< ngram_size tokens) are never bucketed -> always kept
    for i, t in corpus.items():
        if len(t.split()) < 5:
            assert i in kept
    again = {
        r.doc_id
        for r in D.minhash_dedup_md5(df.repartition(7), "text", "doc_id").select("doc_id").collect()
    }
    assert kept == again


def test_minhash_md5_twin_plan_is_native(spark, corpus):
    """Fingerprinting in the md5 twin is pure Column code — the physical plan
    must contain NO Python evaluation (the production path's pandas UDF is
    exactly what makes it non-SQL-expressible)."""
    df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    plan = D.minhash_md5_fingerprints(df, "text", "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_simhash_md5_signatures_match_production_udf(spark, corpus):
    """The native Column signature implements the exact _simhash64 arithmetic
    (md5-first-8-bytes token hashes, per-bit majority vote): on this corpus
    the tokenizations agree, so signatures must be bit-identical to the
    production pandas UDF — the bridge that lets the DuckDB oracle twin
    stand in for the UDF path."""
    df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    native = {r.id: r.sig for r in D.simhash_md5_signatures(df, "text", "doc_id").collect()}
    prod = {
        r.doc_id: r.sig
        for r in df.select("doc_id", D.simhash_signature_col("text").alias("sig")).collect()
    }
    assert native == prod


def test_simhash_md5_dedup_equals_production(spark, corpus):
    """Same signatures + shared _simhash_dedup_from_sigs downstream ==
    identical survivor sets."""
    df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    a = sorted(r.doc_id for r in D.simhash_dedup(df, "text", "doc_id").select("doc_id").collect())
    b = sorted(r.doc_id for r in D.simhash_dedup_md5(df, "text", "doc_id").select("doc_id").collect())
    assert a == b


def test_cross_corpus_minhash_subtracts_planted_near_dups(spark):
    """Corpus onboarding: new docs near-duplicating a reference doc drop;
    genuinely new content and shingle-less shorts survive.  Exercised on
    BOTH fingerprint families (production sha1 + md5 twin)."""
    # 40-word base with ONE word changed -> Jaccard ~0.9, safely above the
    # 0.7 banding threshold's S-curve midpoint for the sha1 path
    base = [WORDS[i % len(WORDS)] for i in range(40)]
    ref_text = " ".join(base)
    near = " ".join(base[:-1] + ["changedword"])
    fresh = "completely different words entirely unrelated to anything else here now"
    short = "tiny"
    ref = spark.createDataFrame([(100, ref_text)], "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, ref_text), (2, near), (3, fresh), (4, short)],
        "doc_id long, text string",
    )
    for fn in (D.cross_corpus_minhash_filter, D.cross_corpus_minhash_filter_md5):
        kept = {r.doc_id for r in fn(new, ref, "text", "doc_id").collect()}
        assert 1 not in kept, fn.__name__       # exact clone of a ref doc
        assert 2 not in kept, fn.__name__       # near-dup of a ref doc
        assert {3, 4} <= kept, fn.__name__      # fresh + shingle-less survive


def test_cross_corpus_filter_is_stable_under_ref_growth(spark):
    """Monotonicity: growing the reference corpus can only drop MORE new
    docs, never resurrect one (collision with any ref doc decides)."""
    texts = [
        (i, f"document number {i} about topic {i % 3} with shared filler words here")
        for i in range(20)
    ]
    new = spark.createDataFrame(texts, "doc_id long, text string")
    ref_small = spark.createDataFrame(
        [(100 + i, t) for i, t in [texts[0][:2]]], "doc_id long, text string"
    )
    ref_big = spark.createDataFrame(
        [(100 + i, t) for i, (_, t) in enumerate(texts[:10])],
        "doc_id long, text string",
    )
    kept_small = {
        r.doc_id
        for r in D.cross_corpus_minhash_filter_md5(new, ref_small).collect()
    }
    kept_big = {
        r.doc_id for r in D.cross_corpus_minhash_filter_md5(new, ref_big).collect()
    }
    assert kept_big <= kept_small


def test_simhash_md5_signatures_handle_book_length_docs(spark):
    """The 2x31-bit lane packing has no practical token bound — a 40k-token
    document (which the earlier 4x15-bit packing hard-aborted on) produces
    the exact production-UDF signature."""
    long_doc = " ".join(WORDS[i % len(WORDS)] + str(i % 97) for i in range(40_000))
    df = spark.createDataFrame([(1, long_doc), (2, "short words here")],
                               "doc_id long, text string")
    native = {r.id: r.sig for r in D.simhash_md5_signatures(df, "text", "doc_id").collect()}
    assert native[1] == D._simhash64_vectorized(long_doc)
    assert native[2] == D._simhash64_vectorized("short words here")


def test_cross_corpus_short_ref_doc_never_subtracts_short_new_docs(spark):
    """Regression (review finding): shingle-less docs share the all-MAX_HASH
    sentinel signature, so one short REFERENCE doc used to band-collide with
    every short NEW doc and silently delete them; the sentinel bands are now
    excluded from both postings — matching the md5 twin's contract."""
    long_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    ref = spark.createDataFrame(
        [(100, "tiny ref"), (101, long_text)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "short new"), (2, ""), (3, long_text)], "doc_id long, text string"
    )
    kept = {r.doc_id for r in D.cross_corpus_minhash_filter(new, ref).collect()}
    assert kept == {1, 2}  # shorties survive; the clone of ref 101 drops


def test_connected_components_probe_collect_failure_falls_through(spark, monkeypatch):
    """A rejected probe collect (driver.maxResultSize on a small-driver
    deployment) must fall through to the distributed min-label path, not
    raise — same labels either way."""
    from pyspark.sql.classic.dataframe import DataFrame  # the concrete class

    edges = spark.createDataFrame(
        [(5, 3), (3, 1), (7, 5), (20, 18)], "src long, dst long"
    )
    orig = DataFrame.collect
    state = {"raised": False}

    def failing_first_collect(self):
        if not state["raised"]:
            state["raised"] = True
            raise RuntimeError(
                "Total size of serialized results is bigger than "
                "spark.driver.maxResultSize"
            )
        return orig(self)

    monkeypatch.setattr(DataFrame, "collect", failing_first_collect)
    labels_df = D.connected_components_min_label(edges)
    monkeypatch.setattr(DataFrame, "collect", orig)
    assert state["raised"], "probe collect was never attempted"
    labels = {r.node: r.label for r in labels_df.collect()}
    assert labels[7] == labels[5] == labels[3] == labels[1] == 1
    assert labels[20] == 18


def test_connected_components_probe_reraises_non_result_size_failures(
    spark, monkeypatch
):
    """The fall-through is CLASSIFIED, not catch-all: a genuine executor
    OutOfMemoryError (or any failure that is not a driver result-size
    rejection) re-raises with its real traceback instead of silently
    re-running the same expensive upstream on the distributed path."""
    from pyspark.sql.classic.dataframe import DataFrame  # the concrete class

    edges = spark.createDataFrame([(5, 3), (3, 1)], "src long, dst long")
    orig = DataFrame.collect

    def oom_collect(self):
        raise RuntimeError(
            "Job aborted due to stage failure: java.lang.OutOfMemoryError: "
            "Java heap space"
        )

    monkeypatch.setattr(DataFrame, "collect", oom_collect)
    with pytest.raises(RuntimeError, match="OutOfMemoryError"):
        D.connected_components_min_label(edges)
    monkeypatch.setattr(DataFrame, "collect", orig)


def test_result_size_rejection_classifier():
    """The classifier's contract directly: error-condition tagging wins,
    the abort's signature phrases match in any wording that names them,
    and bare OOM text never falls through."""

    class CondExc(Exception):
        def getCondition(self):
            return "COLLECT_RESULT_SIZE_EXCEEDED"

    assert D._is_result_size_rejection(CondExc("anything at all"))
    assert D._is_result_size_rejection(
        RuntimeError("result bigger than spark.driver.maxResultSize (1024.0 MiB)")
    )
    assert D._is_result_size_rejection(
        RuntimeError("Total size of serialized results of 3 tasks ...")
    )
    assert not D._is_result_size_rejection(
        RuntimeError("java.lang.OutOfMemoryError: Java heap space")
    )
    assert not D._is_result_size_rejection(RuntimeError("AnalysisException: boom"))


def test_source_similarity_matrix_planted(spark):
    """Identical corpora estimate J=1 (all 32 components match), disjoint
    corpora estimate 0, and a half-overlapping pair lands in between —
    the min-commutes-with-union property that makes per-source signatures
    estimate UNION-set Jaccard."""
    base = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "one two three four five six seven eight nine",
    ]
    other = ["completely different words entirely unrelated to anything else"]
    rows = (
        [(i, "a", t) for i, t in enumerate(base)]
        + [(10 + i, "b", t) for i, t in enumerate(base)]          # clone of a
        + [(20 + i, "c", t) for i, t in enumerate(other)]          # disjoint
        + [(30 + i, "d", t) for i, t in enumerate(base[:1] + other)]  # half
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    m = {
        (r.source_a, r.source_b): (r.n_match, r.est_jaccard)
        for r in D.source_similarity_matrix(df, "text", "source").collect()
    }
    assert m[("a", "b")] == (32, 1.0)
    assert m[("a", "c")][0] == 0
    assert 0 < m[("a", "d")][0] < 32
    assert m[("b", "c")][0] == 0
    # symmetric closure is implicit: only a<b pairs, all 6 present
    assert set(m) == {("a","b"),("a","c"),("a","d"),("b","c"),("b","d"),("c","d")}


def test_split_leakage_audit_planted(spark):
    """Planted near-twins across splits are reported; within-split twins and
    non-duplicates are not; multi-band collisions count once per pair."""
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    b = "one two three four five six seven eight nine ten eleven twelve"
    rows = [
        (1, a, "train"), (2, a, "val"),      # cross-split exact twins
        (3, b, "train"), (4, b, "train"),    # within-split twins: excluded
        (5, "totally different text with many unique words here now", "test"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, split string")
    got = {
        (r.split_a, r.split_b): r.n_pairs
        for r in D.split_leakage_audit(df, "text", "doc_id", "split").collect()
    }
    assert got == {("train", "val"): 1}


def test_split_leakage_audit_exact_covers_short_docs(spark):
    """The exact lens catches what the banding lens cannot: cross-split
    twins SHORTER than the shingle window, and combinatorial counts
    (2 train copies x 1 val copy = 2 pairs) without pair enumeration."""
    rows = [
        (1, "hi there", "train"), (2, "hi there", "train"),
        (3, "hi there", "val"),                  # 2x1 cross-split pairs
        (4, "bye now", "test"), (5, "bye now", "test"),  # within-split only
        (6, "unique text", "train"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, split string")
    exact = {
        (r.split_a, r.split_b): r.n_pairs
        for r in D.split_leakage_audit_exact(df, "text", "doc_id", "split").collect()
    }
    assert exact == {("train", "val"): 2}
    # the banding lens is blind here (both texts < 5 tokens) — the audit
    # query unions both lenses precisely for this reason
    near = D.split_leakage_audit(df, "text", "doc_id", "split").collect()
    assert near == []
