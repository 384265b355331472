"""Benchmark decontamination: drop training docs that overlap an eval set.

A training-data pipeline must remove documents that leak benchmark/test
content (GPT-3 App. C / PaLM-style n-gram overlap decontamination — public
methodology).  The reference pipeline has no such operator (SURVEY.md §2
extension); semantics here:

    a training document is CONTAMINATED iff it shares at least one word
    ``n``-gram with any benchmark document.

Scale design (100 TB train, benchmark ≪ train):

- Both sides shingle with the same native expression as the Jaccard
  dedup (``dedup.word_shingles`` — JVM regex tokenizer, bound once per
  row; no Python).
- Shingles travel as ``xxhash64`` LONGs, not ~8-word strings: the join
  key is 8 bytes and the benchmark set stays broadcastable (false
  contamination needs a 64-bit collision against the distinct bench set
  — ~|train_shingles|·|bench|/2⁶⁴, conservative direction anyway).
- The benchmark shingle set is deduplicated then BROADCAST, so the train
  side is a map-side left-semi probe: ZERO shuffle of the 100 TB side.
  For an over-large benchmark set ``broadcast_bench=False`` falls back to
  a shuffled semi-join.
- Survivors come from a left-anti join against the distinct contaminated
  id set (small), also broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from chat_data_pipeline_spark.operators.dedup import word_shingles


def _shingle_hashes(df: DataFrame, column: str, ngram_size: int, *cols: Column | str):
    """(``*cols``, h) — one row per distinct-in-doc shingle, hashed to long.

    The tokenize+shingle projection is the CPU-heavy stage, so the compute
    spread (no-op once input splits ≥ cores) lives HERE — callers' survivor
    anti-joins must not inherit a repartition of the big side.
    """
    from chat_data_pipeline_spark.session import repartition_for_compute

    return repartition_for_compute(df).select(
        *cols, F.explode(word_shingles(F.col(column), ngram_size)).alias("__s__")
    ).select(*cols, F.xxhash64("__s__").alias("h"))


def contamination_report(
    train: DataFrame,
    bench: DataFrame,
    column: str,
    id_col: str,
    ngram_size: int = 8,
    broadcast_bench: bool = True,
) -> DataFrame:
    """(id_col, n_bench_ngrams) for every CONTAMINATED training doc.

    ``n_bench_ngrams`` counts the doc's distinct n-grams that appear anywhere
    in the benchmark — a triage signal (1 shared 8-gram is a quote; hundreds
    is a verbatim copy).  The count aggregates map-side (partial agg on the
    probe output) before the single shuffle on ``id_col``.
    """
    bench_set = _shingle_hashes(bench, column, ngram_size).distinct()
    if broadcast_bench:
        bench_set = F.broadcast(bench_set)
    hits = _shingle_hashes(train, column, ngram_size, id_col).join(
        bench_set, "h", "left_semi"
    )
    return hits.groupBy(id_col).agg(F.count("*").alias("n_bench_ngrams"))


def ngram_decontaminate(
    train: DataFrame,
    bench: DataFrame,
    column: str,
    id_col: str,
    ngram_size: int = 8,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Training rows (full schema) with every contaminated doc removed.

    The contaminated-id side carries NO broadcast hint: contamination can
    approach the full train side on a dirty corpus (171/494 docs in the
    sf0.01 fixture already), so a forced broadcast would OOM exactly when
    decontamination matters most — AQE broadcasts it automatically whenever
    it actually is small.
    """
    contaminated = contamination_report(
        train, bench, column, id_col, ngram_size, broadcast_bench
    ).select(id_col)
    return train.join(contaminated, id_col, "left_anti")
