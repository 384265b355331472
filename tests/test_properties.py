"""Property-based tests (SURVEY.md §5.2 item 4): cleaner idempotence and
null-safety, filter score/keep duality, dedup invariants, seed determinism.

Hypothesis drives the *semantics* functions (pure Python / single-row Column
evaluation via a tiny DataFrame) — full-corpus behavior is covered by the
oracle-parity suite.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from chat_data_pipeline_spark.operators.dedup import (
    _simhash64,
    _simhash64_vectorized,
    minhash_signature,
    _permutations,
    optimal_param,
)
from tests.reference_semantics import (
    char_repetition_ratio as ref_char_repetition_ratio,
    clean_new_lines as ref_clean_new_lines,
    normalize_punctuation as ref_normalize_punctuation,
    normalize_whitespace as ref_normalize_whitespace,
)

TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=300
)
SETTINGS = settings(
    max_examples=150, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)


@given(TEXT)
@SETTINGS
def test_cleaners_idempotent(text):
    for clean in (ref_normalize_whitespace, ref_normalize_punctuation, ref_clean_new_lines):
        once = clean(text)
        assert clean(once) == once


@given(TEXT)
@SETTINGS
def test_char_repetition_score_bounds(text):
    r = ref_char_repetition_ratio(text, 10)
    assert 0.0 <= r <= 1.0


@given(TEXT)
@SETTINGS
def test_simhash_vectorized_matches_scalar(text):
    assert _simhash64(text) == _simhash64_vectorized(text)


@given(TEXT)
@SETTINGS
def test_minhash_signature_deterministic_and_shaped(text):
    perms = _permutations(16)
    B, R = optimal_param(0.7, 16)
    ranges = [(i * R, (i + 1) * R) for i in range(B)]
    s1 = minhash_signature(text, 16, 3, 3, perms, ranges)
    s2 = minhash_signature(text, 16, 3, 3, perms, ranges)
    assert s1 == s2
    assert len(s1) == B
    assert all(len(b) == R * 8 for b in s1)


def test_word_count_keep_iff_score_in_window(spark):
    """F1 duality: keep == (lo <= score <= hi) on a real DataFrame."""
    from chat_data_pipeline_spark.functions.filters import (
        check_word_number_keep,
        check_word_number_score,
    )

    rows = [(i, " ".join(["w"] * i)) for i in range(0, 20)] + [(99, None), (98, "")]
    df = spark.createDataFrame(rows, "id int, t string")
    out = df.select(
        "id",
        check_word_number_score(F.col("t")).alias("score"),
        check_word_number_keep(F.col("t"), 3, 10).alias("keep"),
    ).collect()
    for r in out:
        expected = r.score is not None and 3 <= r.score <= 10
        assert bool(r.keep) == expected, r


def test_dedup_output_subset_and_min_id_survivor(spark):
    from chat_data_pipeline_spark.operators.dedup import minhash_dedup

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = (
        [(i, base) for i in range(5)]  # exact dup cluster -> id 0 survives
        + [(i, f"unique document number {i} with its own words entirely") for i in range(10, 15)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = {r.doc_id for r in minhash_dedup(df, "text", id_col="doc_id").collect()}
    assert kept <= {r[0] for r in rows}
    assert 0 in kept and not (kept & {1, 2, 3, 4})
    assert {10, 11, 12, 13, 14} <= kept


def test_shuffle_seed_deterministic(spark):
    from chat_data_pipeline_spark.operators.sampling import shuffle_rows

    df = spark.range(500)
    a = [r.id for r in shuffle_rows(df, seed=42).collect()]
    b = [r.id for r in shuffle_rows(df, seed=42).collect()]
    assert a == b
    assert sorted(a) == list(range(500))


# --- round-3 operators: pure-semantics invariants ---------------------------

@given(st.lists(st.text(alphabet="ab ", min_size=0, max_size=12), max_size=40))
@SETTINGS
def test_gram_fracs_invariants(tokens):
    from chat_data_pipeline_spark.functions.repetition import (
        _PROFILE_FIELDS,
        _gram_fracs,
    )

    vals = dict(zip(_PROFILE_FIELDS, _gram_fracs(tokens)))
    assert all(v >= 0.0 for v in vals.values())
    # dup mass counts every occurrence of a duplicated gram, so it dominates
    # any single gram's mass at the same n whenever that gram is duplicated;
    # and with no tokens at all, everything is exactly zero
    if not tokens:
        assert all(v == 0.0 for v in vals.values())
    # fractions are scores, not proportions (overlapping occurrences may
    # push them past 1) — but they are always finite
    assert all(v == v and v != float("inf") for v in vals.values())


@given(
    st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(1, 400)),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    st.integers(16, 512),
)
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_packing_walk_invariants(rows, budget):
    """Pure replay of pack_sequences' documented walk: offsets stay inside
    [0, budget), bin ids are non-decreasing along the walk, and every bin
    except a shard's last is 'full' (next doc would overflow)."""
    import hashlib

    order = sorted(rows, key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0]))
    cum = 0
    prev_bin = 0
    for _id, toks in order:
        bin_id, off = cum // budget, cum % budget
        assert 0 <= off < budget
        assert bin_id >= prev_bin
        prev_bin = bin_id
        cum += toks


@given(
    st.lists(st.text(alphabet="abc", min_size=1, max_size=5), max_size=30),
    st.integers(2, 10),
    st.integers(0, 5),
)
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_chunking_matches_python_replay(spark, tokens, chunk, overlap):
    from chat_data_pipeline_spark.operators.chunking import chunk_documents

    if overlap >= chunk:
        overlap = chunk - 1
    step = chunk - overlap
    text = " ".join(tokens)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = sorted(
        (r.chunk_no, r.n_chunk_tokens, r.chunk_text)
        for r in chunk_documents(df, "text", "doc_id", chunk, overlap).collect()
    )
    toks = text.split()
    starts = [
        s
        for s in range(0, max(len(toks), 1), step)
        if s == 0 or s + overlap < len(toks)
    ]
    want = (
        [
            (i, min(chunk, len(toks) - s), " ".join(toks[s : s + chunk]))
            for i, s in enumerate(starts)
        ]
        if toks
        else []
    )
    assert got == want
    # correctness properties: full coverage, no chunk subsumed by its neighbor
    covered = set()
    for i, s in enumerate(starts):
        covered.update(range(s, min(s + chunk, len(toks))))
        if i > 0:
            assert s + overlap < len(toks)  # contributes new tokens
    assert covered == set(range(len(toks)))


@given(st.lists(st.integers(min_value=1, max_value=10**9), min_size=1, max_size=60))
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_value_histogram_matches_python_replay(spark, cents):
    """The log-histogram quantile sketch equals a pure-Python replay of its
    own integer contract (top-4-bit bins, ceil-rank, integer interpolation)
    on arbitrary positive cents multisets."""
    from chat_data_pipeline_spark.operators import sketches as SK

    bins: dict = {}
    for c in cents:
        hb = c.bit_length()
        if hb <= 3:
            lo, hi = c, c + 1
        else:
            s = hb - 4
            top4 = c >> s
            lo, hi = top4 << s, (top4 + 1) << s
        bins[(lo, hi)] = bins.get((lo, hi), 0) + 1
    n = len(cents)
    expected = {}
    for num in (50, 90, 99):
        rank = -(-n * num // 100)  # ceil
        cum = 0
        for (lo, hi), cnt in sorted(bins.items()):
            if cum < rank <= cum + cnt:
                expected[num] = (lo + ((hi - lo) * (rank - cum - 1)) // cnt) / 100
                break
            cum += cnt
    df = spark.createDataFrame([(c / 100,) for c in cents], "value double")
    r = SK.value_histogram_sketch(df, "value").collect()[0]
    assert r.n == n and r.n_bins == len(bins)
    assert (r.p50_est, r.p90_est, r.p99_est) == (
        expected[50], expected[90], expected[99],
    )


@given(
    st.lists(
        st.one_of(st.none(), st.integers(min_value=0, max_value=9)),
        min_size=1,
        max_size=60,
    ),
    st.integers(1, 8),
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_key_skew_matches_python_replay(spark, keys, top_n):
    """key_skew_report equals a pure-Python replay of its own contract on
    arbitrary key multisets (NULLs included): md-sentinel NULL grouping,
    round(1e9·n/total) shares, the double-expression x-avg, (n desc, key
    asc) top-N with ranks."""
    from chat_data_pipeline_spark.operators.diagnostics import (
        _NULL_KEY_SENTINEL,
        key_skew_report,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k int")
    got = [tuple(r) for r in key_skew_report(df, "k", top_n=top_n).collect()]

    counts: dict = {}
    for k in keys:
        s = _NULL_KEY_SENTINEL if k is None else str(k)
        counts[s] = counts.get(s, 0) + 1
    total, nkeys = len(keys), len(counts)
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top_n]
    want = [
        (
            rank,
            key,
            n,
            round(1e9 * n / total),
            round(1e9 * (float(n) * float(nkeys) / float(total))),
        )
        for rank, (key, n) in enumerate(ordered, 1)
    ]
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(0, 5)),
            st.one_of(st.none(), st.text(alphabet=" ab", max_size=6)),
        ),
        min_size=0,
        max_size=40,
    )
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_quality_gate_matches_python_replay(spark, rows):
    """data_quality_report + uniqueness_report equal a pure-Python replay on
    arbitrary (nullable id, nullable text) tables: NULL rule results count
    as violations, uniqueness violations are NULL keys plus every member of
    a >1 group, and rates are round(1e9·v/n) with 0 on empty input."""
    from chat_data_pipeline_spark.operators.diagnostics import (
        data_quality_report,
        uniqueness_report,
    )

    df = spark.createDataFrame(rows, "id int, text string")
    rules = {
        "id_not_null": F.col("id").isNotNull(),
        "text_nonblank": F.trim("text") != "",
    }
    got = {
        r.rule: (r.n_rows, r.n_violations, r.violation_nanos)
        for r in data_quality_report(df, rules).collect()
    }
    n = len(rows)
    v_id = sum(1 for i, _ in rows if i is None)
    v_tx = sum(1 for _, t in rows if t is None or t.strip() == "")
    rate = lambda v: round(1e9 * v / n) if n else 0
    assert got == {
        "id_not_null": (n, v_id, rate(v_id)),
        "text_nonblank": (n, v_tx, rate(v_tx)),
    }

    u = uniqueness_report(df, "id").collect()[0]
    from collections import Counter

    c = Counter(i for i, _ in rows)
    v_u = sum(m for k, m in c.items() if k is None or m > 1)
    assert (u.n_rows, u.n_violations, u.violation_nanos) == (n, v_u, rate(v_u))
