"""Sequence packing: assign documents to fixed-token-budget training bins.

LLM pre-training consumes fixed-length sequences; the curation pipeline must
group variable-length documents into bins of ~``budget`` tokens (T5/GPT-style
"packing").  The reference has no such operator (SURVEY.md §2 extension).

Semantics (deterministic, engine-independent — the duckdb oracle mirrors it):

1. every doc gets a shard in ``[0, n_shards)`` from its id's md5 (first 4 hex
   chars → int); packing is INDEPENDENT per shard,
2. within a shard docs are ordered by (md5(id), id) — a stable pseudo-random
   order, so bin composition doesn't correlate with ingest order,
3. walking that order with a running token sum, a doc lands in
   ``bin_id = floor((cumsum - n_tokens) / budget)`` — i.e. a new bin starts
   with the first doc whose PREDECESSORS already filled the budget.  Bins can
   overflow by up to one document (the trainer truncates or wraps); no doc is
   split.

Scale design (100 TB): the only wide operation is ONE hash-partition on
``shard`` with a per-shard sort — ``n_shards`` controls parallelism and keeps
any single sort partition bounded (pick shards so a shard's docs ≈ a few GB).
Packing quality loss vs global packing is negligible when every shard holds
thousands of bins.  No driver-side state, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _md5_shard(id_col: Column, n_shards: int) -> Column:
    hex4 = F.substring(F.md5(id_col.cast("string")), 1, 4)
    return F.pmod(F.conv(hex4, 16, 10).cast("long"), F.lit(n_shards)).cast("int")


def pack_sequences(
    df: DataFrame,
    token_col: str,
    id_col: str,
    budget: int,
    n_shards: int = 64,
) -> DataFrame:
    """Adds ``shard``, ``bin_id``, ``bin_offset`` to ``df``.

    ``bin_offset`` is the doc's starting token position inside its bin
    (pre-overflow), so a writer can lay sequences out without re-scanning.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    ordkey = F.md5(F.col(id_col).cast("string"))
    w = (
        Window.partitionBy("shard")
        .orderBy(ordkey.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(w)
    prev = cum - F.col(token_col)
    return (
        df.withColumn("shard", _md5_shard(F.col(id_col), n_shards))
        .withColumn("bin_id", F.floor(prev / F.lit(budget)))
        .withColumn("bin_offset", prev - F.col("bin_id") * F.lit(budget))
    )


def bin_manifest(packed: DataFrame, token_col: str) -> DataFrame:
    """(shard, bin_id, n_docs, bin_tokens) — writer-side manifest; rides the
    existing shard partitioning (map-side partial agg, one small shuffle)."""
    return packed.groupBy("shard", "bin_id").agg(
        F.count("*").alias("n_docs"), F.sum(token_col).alias("bin_tokens")
    )
