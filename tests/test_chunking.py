"""Document chunking (operators/chunking.py)."""

from __future__ import annotations

import pytest

from chat_data_pipeline_spark.operators import chunking as CH


def _chunks(spark, text, chunk=8, overlap=2):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = CH.chunk_documents(df, "text", "doc_id", chunk, overlap).collect()
    return [(r.chunk_no, r.n_chunk_tokens, r.chunk_text) for r in sorted(rows)]


def test_overlap_continuity(spark):
    toks = [f"w{i}" for i in range(14)]
    got = _chunks(spark, " ".join(toks), chunk=8, overlap=2)
    # step 6: start 12 would only re-emit tokens already covered by the
    # chunk at 6 (which reaches token 13), so starts are 0 and 6 only
    assert [g[0] for g in got] == [0, 1]
    assert got[0][2] == " ".join(toks[0:8])
    assert got[1][2] == " ".join(toks[6:14])
    # neighbors share exactly `overlap` tokens
    assert got[0][2].split()[-2:] == got[1][2].split()[:2]


def test_no_fully_redundant_final_chunk(spark):
    # step < n <= chunk: the whole doc fits in chunk 0 — no second chunk
    toks = [f"w{i}" for i in range(7)]
    got = _chunks(spark, " ".join(toks), chunk=8, overlap=2)
    assert got == [(0, 7, " ".join(toks))]
    # n just past chunk: second chunk must carry the uncovered tail
    toks9 = [f"w{i}" for i in range(9)]
    got9 = _chunks(spark, " ".join(toks9), chunk=8, overlap=2)
    assert [g[0] for g in got9] == [0, 1]
    assert got9[1][2] == " ".join(toks9[6:9])


def test_short_and_empty_docs(spark):
    assert _chunks(spark, "only three tokens") == [(0, 3, "only three tokens")]
    assert _chunks(spark, "   ") == []
    assert _chunks(spark, "") == []


def test_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        CH.chunk_documents(df, "text", "doc_id", 8, 8)
