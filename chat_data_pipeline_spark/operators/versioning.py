"""Corpus snapshot diffing — dataset-versioning observability.

Curation pipelines re-crawl and re-clean; before shipping corpus v2 you
want to know what changed against v1: how many documents appeared,
vanished, or changed content, and where (per source).  This is a
content-hash FULL OUTER JOIN — one shuffle on the id, comparable to a
single exact-dedup pass, and bucket-joinable when both snapshots are
written bucketed by id (``sources/io.write_bucketed``).

Status semantics (md5 of the text column, null-safe):
  added     — id present only in ``new``
  removed   — id present only in ``old``
  changed   — id in both, content hash differs
  unchanged — id in both, content hash equal
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    column: str = "text",
) -> DataFrame:
    """Per-document diff: ``(id_col, status)`` over the full outer join of
    the two snapshots' content hashes."""
    o = old.select(
        F.col(id_col).alias("id"),
        F.md5(F.coalesce(F.col(column), F.lit(""))).alias("__h_old__"),
    )
    n = new.select(
        F.col(id_col).alias("id"),
        F.md5(F.coalesce(F.col(column), F.lit(""))).alias("__h_new__"),
    )
    joined = o.join(n, "id", "full_outer")
    status = (
        F.when(F.col("__h_old__").isNull(), F.lit("added"))
        .when(F.col("__h_new__").isNull(), F.lit("removed"))
        .when(F.col("__h_old__") == F.col("__h_new__"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(F.col("id").alias(id_col), status.alias("status"))


def corpus_diff_summary(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    column: str = "text",
) -> DataFrame:
    """``(status, n_docs)`` rollup of :func:`corpus_diff` — the one-line
    churn report (map-side combinable count over a 4-value domain)."""
    return (
        corpus_diff(old, new, id_col, column)
        .groupBy("status")
        .agg(F.count("*").alias("n_docs"))
    )
