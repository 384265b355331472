"""Exact substring deduplication — Lee et al. 2021 ("Deduplicating Training
Data Makes Language Models Better"), ExactSubstr, word-window variant.

Document dedup keeps or drops whole documents; paragraph dedup needs the
duplication to respect paragraph boundaries.  ExactSubstr removes VERBATIM
REPEATED SPANS wherever they sit: every ``k``-token window that occurs more
than once in the corpus is cut from every occurrence except the
lexicographically first (min ``(id, pos)``), and documents are rebuilt from
their surviving tokens.  (The paper runs on a suffix array at byte level;
the distributed re-expression below trades the suffix array for rolling
k-token windows — same contract for spans ≥ k tokens, Spark-native.)

Scale design (100 TB):

- window hashes are ``xxhash64`` of the space-joined window (8-byte shuffle
  keys); windows are generated per-row by a bound HOF — one tokenize per
  document, no Python;
- the winner per duplicated window is ``min(struct(id, pos))`` via
  AGGREGATION (map-side partial combine absorbs mega-duplicated spans; the
  join back is AQE-skew-splittable) — the same skew argument as
  ``span_dedup``;
- cut positions aggregate per document (keys = doc ids, uniform), and the
  rebuild is a per-row interval-exclusion filter over token positions —
  O(tokens · cuts) interpreted work only on documents that HAVE cuts;
  untouched documents bypass the rebuild entirely via left join.

Reassembly joins surviving tokens with single spaces (original intra-token
whitespace is normalized — documented loss, same as chunking).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from chat_data_pipeline_spark.functions import text as T


def _window_hashes(tokens: Column, k: int) -> Column:
    """array<struct<pos int, h long>> — rolling k-token window hashes,
    1-based positions; empty when the doc has fewer than k tokens."""

    def roll(toks: Column) -> Column:
        n = F.size(toks) - F.lit(k - 1)
        return F.when(
            n > 0,
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.struct(
                    i.cast("int").alias("pos"),
                    F.xxhash64(F.array_join(F.slice(toks, i, k), " ")).alias("h"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<pos:int,h:bigint>>"))

    return F.get(F.transform(F.array(tokens), roll), 0)


def exact_substring_dedup(
    df: DataFrame, column: str, id_col: str, k: int = 16
) -> DataFrame:
    """(id_col, text_dedup) — every duplicated k-token window cut from all
    but its first occurrence; whole-document token order preserved."""
    toks = T.whitespace_tokens(F.col(column))
    base = df.select(F.col(id_col).alias("id"), toks.alias("t"))
    occ = base.select(
        "id", F.explode(_window_hashes(F.col("t"), k)).alias("w")
    ).select("id", F.col("w.pos").alias("pos"), F.col("w.h").alias("h"))
    # ONE tokenize+rolling-hash pass (r17, guide §1.2 / §2.4): the former
    # groupBy(h)-then-join-back shape referenced occ as TWO separate
    # subtrees, so the window-hash Generate ran twice per query (3 corpus
    # scans in the plan) — and the planner cannot share the exchange
    # because the join-back's left-outer key pushes isnotnull(id) into
    # only ITS copy.  Per-h window functions compute the same (c, w)
    # against each occurrence row directly: occ appears ONCE (2 corpus
    # scans), one Exchange(h)+Sort replaces the agg exchange plus the
    # duplicate pass and the dup broadcast.  Same rows out: count/min
    # over the identical per-h groups, identical first-occurrence filter.
    from pyspark.sql import Window

    w_h = Window.partitionBy("h")
    cuts = (
        occ.withColumn("c", F.count(F.lit(1)).over(w_h))
        .withColumn("w", F.min(F.struct("id", "pos")).over(w_h))
        .filter(
            (F.col("c") > 1)
            & ((F.col("id") != F.col("w.id")) | (F.col("pos") != F.col("w.pos")))
        )
        .groupBy("id")
        .agg(F.collect_set("pos").alias("starts"))
    )

    joined = base.join(cuts, "id", "left_outer")

    def rebuild(s: Column) -> Column:
        t, starts = s["t"], s["starts"]
        idxs = F.sequence(F.lit(1), F.size(t))
        kept = F.filter(
            idxs,
            lambda i: ~F.exists(
                starts, lambda st: (st <= i) & (i < st + F.lit(k))
            ),
        )
        return F.array_join(
            F.transform(kept, lambda i: F.element_at(t, i)), " "
        )

    bound = F.get(
        F.transform(
            F.array(F.struct(F.col("t").alias("t"), F.col("starts").alias("starts"))),
            rebuild,
        ),
        0,
    )
    out = joined.select(
        F.col("id").alias(id_col),
        F.when(F.col("starts").isNull(), F.array_join("t", " "))
        .otherwise(bound)
        .alias("text_dedup"),
    )
    return out
