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
