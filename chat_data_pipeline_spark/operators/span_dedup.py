"""Corpus-wide paragraph (span) deduplication — C4-style.

Document-level dedup (operators/dedup.py) keeps one of two near-identical
documents; it does nothing about a boilerplate PARAGRAPH (cookie banner,
license header, navigation footer) repeated across millions of otherwise
distinct pages.  C4 (Raffel et al. 2020) removes repeated three-sentence
spans corpus-wide; the operator here is the paragraph-granular variant:

    every distinct (trimmed) paragraph survives exactly once — in the
    lexicographically smallest (id, position) occurrence — and documents
    are reassembled from their surviving paragraphs.

Scale design (100 TB):

- One explode pass (`posexplode` of the split — narrow), then the winner
  per paragraph key via ``min(struct(id, pos))`` **aggregation**, NOT a
  window: partial aggregation combines map-side, so a paragraph repeated in
  10% of the corpus costs one partial per task, not one 10-billion-row
  window partition.
- Winners re-join the exploded rows on the 8-byte ``xxhash64`` key as a
  shuffled equi-join — sort-merge/shuffled-hash joins are AQE-skew-splittable,
  unlike window partitions, so the hot-key case degrades gracefully.
- Reassembly is one ``groupBy(id)`` of the kept rows (array_agg sorted by
  position) — keys are document ids, uniform by construction.

Three shuffles total, all on hashed keys; no Python, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chat_data_pipeline_spark.functions.text import strip


def explode_paragraphs(df: DataFrame, column: str, id_col: str) -> DataFrame:
    """(id, pos, para) — trimmed, blanks dropped, original order preserved."""
    parts = F.split(F.col(column), "\n\n")
    return (
        df.select(F.col(id_col).alias("__id__"), F.posexplode(parts).alias("pos", "raw"))
        .select("__id__", "pos", strip(F.col("raw")).alias("para"))
        .filter(F.col("para") != "")
        .withColumnRenamed("__id__", id_col)
    )


def paragraph_dedup(
    df: DataFrame, column: str, id_col: str, joiner: str = "\n\n"
) -> DataFrame:
    """(id_col, text_dedup) for every document with ≥1 surviving paragraph.

    A paragraph occurrence survives iff it is the corpus-wide first
    occurrence of its content: ``(id, pos) == min(struct(id, pos))`` over
    equal trimmed paragraphs.
    """
    paras = explode_paragraphs(df, column, id_col)
    keyed = paras.withColumn("h", F.xxhash64("para"))
    winners = keyed.groupBy("h").agg(
        F.min(F.struct(id_col, "pos")).alias("w")
    )
    kept = (
        keyed.join(winners, "h")
        .filter((F.col(id_col) == F.col(f"w.{id_col}")) & (F.col("pos") == F.col("w.pos")))
        .select(id_col, "pos", "para")
    )
    return (
        kept.groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "para"))).alias("ps"))
        .select(
            id_col,
            F.array_join(F.transform("ps", lambda s: s["para"]), joiner).alias(
                "text_dedup"
            ),
        )
    )


def dedup_paragraphs_col(col: Column, joiner: str = "\n\n") -> Column:
    """INTRA-document paragraph dedup as a pure Column expression: the first
    occurrence of every distinct (trimmed) paragraph survives, blanks drop.

    Zero shuffles — split, strip, and the first-occurrence filter are all
    higher-order array expressions evaluated per row inside whole-stage
    codegen; O(p²) equality checks per document where p is its paragraph
    count (bounded by document length, not corpus size).  Exposed both as
    the :func:`dedup_paragraphs_within_doc` operator and as the
    ``dedup_paragraphs`` cleaner (functions/cleaners.py) so YAML pipelines
    can stack it with the reference's cleaners.
    """
    # The split+strip chain is bound to a lambda variable via a single-
    # element ``transform`` (the word_shingles trick) so it evaluates ONCE
    # per row; referencing the raw expression inside the filter lambda makes
    # Catalyst re-run the regex chain for every (element, slice) pair —
    # measured ~4x slower on the bench corpus.
    def first_occurrence(parts: Column) -> Column:
        return F.filter(
            parts,
            # i is 0-based: slice(parts, 1, i) = the i elements BEFORE this
            # one; array_position = 0 means "content not seen yet".  Blanks
            # drop.
            lambda x, i: (x != F.lit(""))
            & (F.array_position(F.slice(parts, F.lit(1), i), x) == F.lit(0)),
        )

    raw = F.transform(F.split(col, "\n\n"), lambda x: strip(x))
    deduped = F.get(F.transform(F.array(raw), first_occurrence), 0)
    return F.array_join(deduped, joiner)


def dedup_paragraphs_within_doc(
    df: DataFrame, column: str, out_col: str = "text_dedup", joiner: str = "\n\n"
) -> DataFrame:
    """INTRA-document paragraph dedup: each document keeps only the first
    occurrence of every distinct (trimmed) paragraph — the
    repetition-removal move for scraped pages whose template repeats the
    same block (nav text, share buttons, quoted reply chains) many times
    inside ONE document.  Complements :func:`paragraph_dedup`, which dedups
    ACROSS documents.  See :func:`dedup_paragraphs_col` for the scale
    notes (narrow, zero-shuffle)."""
    return df.withColumn(out_col, dedup_paragraphs_col(F.col(column), joiner))
