"""r17: WordPiece greedy longest-match encode — differential-tested
against a pure-Python reference (the BPE/MinHash strategy), plus the
classic semantics pins: longest-first wins, ``##`` continuation forms,
whole-word ``[UNK]`` fallback, and word-free docs surviving reassembly."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from chat_data_pipeline_spark.operators import wordpiece as WP
from chat_data_pipeline_spark.queries import _WP_PIECES

SF_DIR = "/root/testdata/sf0.001"


def _ref_wordpiece(word: str, pieces: list[str]) -> list[str]:
    """Textbook greedy longest-match-first WordPiece (Wu et al. 2016)."""
    vocab = set(pieces)
    out: list[str] = []
    pos = 0
    while pos < len(word):
        for length in range(len(word) - pos, 0, -1):
            sub = word[pos : pos + length]
            form = sub if pos == 0 else "##" + sub
            if form in vocab:
                out.append(form)
                pos += length
                break
        else:
            return [WP.UNK]
    return out


def _ref_encode(text: str, pieces: list[str]) -> list[str]:
    toks: list[str] = []
    for w in re.findall(r"\w+", (text or "").lower()):
        toks.extend(_ref_wordpiece(w, pieces))
    return toks


def test_wordpiece_semantics_pins(spark):
    """Longest-first, continuation forms, UNK fallback — on constructed
    words whose alternatives would differ under shorter-first or partial
    emission."""
    df = spark.createDataFrame(
        [
            (1, "sort"),        # so ##r ##t (init-2 beats char-by-char)
            (2, "the"),         # whole-word piece wins over t-h-e
            (3, "there"),       # the ##r ##e (no ##re in the vocab)
            (4, "nation"),      # n ##at ##i ##on — greedy is NOT optimal:
                                # ##ation would need pieces the vocab lacks
            (5, "café"),   # non-ASCII char -> the WHOLE word is [UNK]
            (6, "x9_"),         # singles floor: every ASCII \w encodes
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.wp_text
        for r in WP.wordpiece_encode(df, _WP_PIECES).collect()
    }
    assert got[1] == "so ##r ##t"
    assert got[2] == "the"
    assert got[3] == "the ##r ##e"
    assert got[4] == "n ##at ##i ##on"
    assert got[5] == "[UNK]"
    assert got[6] == "x ##9 ##_"


def test_wordpiece_matches_python_reference_on_corpus(spark):
    """Full-corpus differential: the declarative fold equals the textbook
    loop on every sf0.001 document (text + token count)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    got = {
        r.doc_id: (r.wp_text, r.n_wp_tokens)
        for r in WP.wordpiece_encode(docs, _WP_PIECES).collect()
    }
    for row in docs.collect():
        toks = _ref_encode(row.text, _WP_PIECES)
        assert got[row.doc_id] == (" ".join(toks), len(toks)), row.doc_id
    assert len(got) == docs.count()


def test_wordpiece_wordfree_docs_and_vocab_validation(spark):
    """Word-free docs reassemble as ('', 0); degenerate vocab entries are
    refused (an empty piece would make the greedy scan loop forever)."""
    df = spark.createDataFrame(
        [(1, "!!! ???"), (2, None), (3, "the")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.wp_text, r.n_wp_tokens)
        for r in WP.wordpiece_encode(df, _WP_PIECES).collect()
    }
    assert got[1] == ("", 0) and got[2] == ("", 0) and got[3] == ("the", 1)
    with pytest.raises(ValueError, match="empty"):
        WP._piece_buckets(["a", ""])
    with pytest.raises(ValueError, match="##"):
        WP._piece_buckets(["a", "##"])


def test_wordpiece_unk_is_whole_word_not_partial(spark):
    """A word that matches for a while and then hits an unmatchable
    character must collapse ENTIRELY to [UNK] — no partial prefix may
    leak (the classic WordPiece contract)."""
    df = spark.createDataFrame([(1, "themé")], "doc_id long, text string")
    row = WP.wordpiece_encode(df, _WP_PIECES).first()
    assert (row.wp_text, row.n_wp_tokens) == ("[UNK]", 1)


def test_wordpiece_matches_reference_on_randomized_words(spark):
    """Seeded randomized differential: 400 words over a mixed alphabet
    (ASCII letters/digits/underscore plus non-ASCII letters that force
    the [UNK] path) — the declarative fold must equal the textbook loop
    on every one, in one batched comparison."""
    import random

    rng = random.Random(42)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789_éüλ漢"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 14)))
        for _ in range(400)
    ]
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.wp_text, r.n_wp_tokens)
        for r in WP.wordpiece_encode(df, _WP_PIECES).collect()
    }
    for i, w in enumerate(words):
        toks = _ref_wordpiece(w, _WP_PIECES)
        assert got[i] == (" ".join(toks), len(toks)), (i, w)


def test_wordpiece_fertility_counts_unk_separately(spark):
    """The fairness audit: fertility averages pieces over ENCODABLE words
    only, UNK words are counted on the side (the data-loss signal), and
    an all-UNK group reads NULL fertility, not a division blow-up."""
    df = spark.createDataFrame(
        [
            (1, "en", "the sort"),       # 'the'=1 piece, 'sort'=3 pieces
            (2, "en", "the"),            # repeat occurrence counts again
            (3, "zh", "漢字 漢字 the"),   # 2 UNK occurrences + 1 encodable
            (4, "el", "λόγος"),          # all-UNK group
        ],
        "doc_id long, lang string, text string",
    )
    rows = {
        r.lang: r
        for r in WP.wordpiece_fertility(df, _WP_PIECES, "text", "lang").collect()
    }
    en = rows["en"]
    assert (en.n_words, en.n_unk_words, en.n_pieces) == (3, 0, 5)
    assert abs(en.fertility - 5 / 3) < 1e-12
    zh = rows["zh"]
    assert (zh.n_words, zh.n_unk_words, zh.n_pieces) == (3, 2, 1)
    assert abs(zh.fertility - 1.0) < 1e-12
    el = rows["el"]
    assert (el.n_words, el.n_unk_words, el.n_pieces) == (1, 1, 0)
    assert el.fertility is None
