"""Distributed unigram-LM training vs a local reference running the SAME
Viterbi/seed/M-step code — the differential isolates the distributed E-step
plumbing (Arrow segmentation pass + explode/groupBy counts), the BPE test
model."""

from __future__ import annotations

import re

from chat_data_pipeline_spark.operators import unigram_lm as U


CORPUS = [
    "the cat sat on the mat",
    "the cats sat on the mats",
    "that thin cat thinks about things",
    "low lower lowest newer newest",
    "low low low lower newest",
    "hugging faces hug hugs hugged",
    "internationalization international nation nations national",
]


def _word_freqs(texts):
    from collections import Counter

    c = Counter()
    for t in texts:
        for w in re.findall(r"\w+", (t or "").lower()):
            c[w] += 1
    return sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))


def _ref_train(texts, vocab_size=64, seed_size=512, em_iters=3, shrink=0.25):
    words = _word_freqs(texts)
    logp = U.seed_vocab(words, seed_size)
    for _ in range(em_iters):
        counts = U._em_counts_local(words, logp)
        logp = U._m_step(counts, logp, vocab_size, shrink)
    return logp


def test_trained_vocab_matches_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    got = U.train_unigram_lm(
        df, vocab_size=64, seed_size=512, em_iters=3, shrink=0.25
    )
    want = _ref_train(CORPUS, vocab_size=64, seed_size=512, em_iters=3, shrink=0.25)
    assert got == want  # pieces AND logprobs identical
    assert any(len(p) > 1 for p in got)  # multi-char pieces learned


def test_viterbi_prefers_known_long_pieces():
    logp = {"i": -3.0, "n": -3.0, "g": -3.0, "ing": -1.0, "walk": -1.5, "w": -3.0,
            "a": -3.0, "l": -3.0, "k": -3.0}
    assert U.viterbi_segment("walking", logp) == ["walk", "ing"]
    # unknown chars fall back to single-char pieces, never crash
    assert U.viterbi_segment("wzz", logp) == ["w", "z", "z"]


def test_encode_roundtrip_and_compression(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    logp = U.train_unigram_lm(df, vocab_size=64, seed_size=512, em_iters=3)
    enc = {r.doc_id: r for r in U.unigram_encode_tokens(df, logp).collect()}
    total_pieces = 0
    total_chars = 0
    for i, text in enumerate(CORPUS):
        words = re.findall(r"\w+", text.lower())
        assert "".join(enc[i].pieces) == "".join(words)
        assert enc[i].n_pieces == len(enc[i].pieces)
        total_pieces += enc[i].n_pieces
        total_chars += sum(len(w) for w in words)
    assert total_pieces < total_chars  # the vocab actually compresses


def test_vocab_table_shape(spark):
    df = spark.createDataFrame([(0, "aaa aab aaa aab")], "doc_id long, text string")
    tbl = U.unigram_vocab_table(df, vocab_size=16, seed_size=64, em_iters=2).collect()
    pieces = [r.piece for r in tbl]
    assert pieces == sorted(pieces)
    assert all(r.logprob < 0 for r in tbl)


# ---------------------------------------------------------------------------
# Integer-micro-nat encode (the oracle-twin path, round 7)
# ---------------------------------------------------------------------------

_MICRO_VOCAB = {
    "ing": -1_000_000, "walk": -1_500_000, "w": -3_000_000, "a": -3_000_000,
    "l": -3_000_000, "k": -3_000_000, "i": -3_000_000, "n": -3_000_000,
    "g": -3_000_000, "al": -2_000_000, "king": -2_000_000,
}


def test_viterbi_micro_matches_float_semantics():
    """Same DP rules as the float path: best segmentation, longest-last-
    piece tie-break, unknown single-char fallback."""
    assert U.viterbi_segment_micro("walking", _MICRO_VOCAB) == ["walk", "ing"]
    assert U.viterbi_segment_micro("wzz", _MICRO_VOCAB) == ["w", "z", "z"]
    assert U.viterbi_segment_micro("", _MICRO_VOCAB) == []


def test_viterbi_micro_tie_prefers_longest_last_piece():
    # "ab": 'ab' (one piece) vs 'a'+'b' — equal total score; the whole-word
    # (smallest j) candidate must win, exactly the float path's rule
    vocab = {"a": -1_000_000, "b": -1_000_000, "ab": -2_000_000}
    assert U.viterbi_segment_micro("ab", vocab) == ["ab"]


def test_unigram_encode_micro_matches_local_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)] + [(99, "")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.unigram_text, r.n_pieces)
        for r in U.unigram_encode_micro(df, _MICRO_VOCAB).collect()
    }
    for i, text in enumerate(CORPUS):
        pieces: list[str] = []
        for w in re.findall(r"\w+", text.lower()):
            pieces.extend(U.viterbi_segment_micro(w, _MICRO_VOCAB))
        assert got[i] == (" ".join(pieces), len(pieces)), f"doc {i}"
    assert got[99] == ("", 0)
    assert len(got) == len(CORPUS) + 1


def test_unigram_encode_micro_partition_invariant(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    a = sorted(map(tuple, U.unigram_encode_micro(df, _MICRO_VOCAB).collect()))
    b = sorted(
        map(tuple, U.unigram_encode_micro(df.repartition(5), _MICRO_VOCAB).collect())
    )
    assert a == b


def test_unigram_oracle_errors_loudly_past_grid_bound():
    """ADVICE r7: a word longer than the oracle's 64-char candidate grid
    must make the oracle SQL FAIL, not silently drop the word's occurrences
    while Spark encodes them."""
    import duckdb
    import pytest as _pytest

    from chat_data_pipeline_spark.queries import REGISTRY

    sql = REGISTRY["unigram_encode_corpus"].oracle
    con = duckdb.connect()
    long_word = "x" * 65
    con.execute(
        f"CREATE VIEW documents AS SELECT 1 AS doc_id, '{long_word}' AS text"
    )
    with _pytest.raises(Exception, match="64-char candidate grid"):
        con.execute(sql).fetchall()
    con.close()
    # and the guard is inert on in-bound words
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT 1 AS doc_id, 'scan a' AS text")
    assert con.execute(sql).fetchall()
    con.close()
