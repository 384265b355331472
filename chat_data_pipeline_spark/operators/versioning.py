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


def corpus_drift_report(
    old: DataFrame,
    new: DataFrame,
    group_col: str = "lang",
    column: str = "text",
) -> DataFrame:
    """Composition drift between two snapshots (r11): per group —
    ``(group, n_old, n_new, delta_n, tokens_old, tokens_new, share_old_nanos,
    share_new_nanos, share_delta_nanos)`` — the "did the re-crawl shift the
    mix" audit that complements :func:`corpus_diff`'s content diff: a
    training mix tuned on v1 silently rebalances if v2's language/source
    SHARES moved, even when every individual document diffs clean.

    Shares are token-mass fractions in integer nanos (round(1e9·t/total),
    the module convention), so the whole report value-hashes cross-engine;
    groups present in only one snapshot appear with zeros on the other
    side.  NULL groups ride the sampling module's chr(31) sentinel.

    Scale: one map-side-combined (group, count, token-sum) aggregate per
    snapshot (group-cardinality output), a full-outer join of the two tiny
    aggregates, and one broadcastable one-row total per side — the corpus
    is scanned exactly once per snapshot.
    """
    from chat_data_pipeline_spark.functions import text as T

    def per_group(df: DataFrame, n_alias: str, t_alias: str) -> DataFrame:
        g = F.coalesce(F.col(group_col).cast("string"), F.lit("\x1f<null>"))
        return (
            df.select(
                g.alias("group"),
                F.coalesce(T.word_count(F.col(column)), F.lit(0)).alias("__t__"),
            )
            .groupBy("group")
            .agg(
                F.count(F.lit(1)).cast("long").alias(n_alias),
                F.sum("__t__").cast("long").alias(t_alias),
            )
        )

    o = per_group(old, "n_old", "tokens_old")
    n = per_group(new, "n_new", "tokens_new")
    joined = o.join(n, "group", "full_outer").select(
        "group",
        *[
            F.coalesce(c, F.lit(0)).cast("long").alias(c)
            for c in ("n_old", "n_new", "tokens_old", "tokens_new")
        ],
    )
    # group-cardinality checkpoint (r17, guide §1.2): joined feeds BOTH the
    # totals aggregate and the final share projection — unpinned, each
    # consumer re-expanded the two per-snapshot corpus aggregates, so every
    # snapshot was tokenized TWICE (4 corpus scans in the plan audit; the
    # docstring's "scanned exactly once per snapshot" was aspirational
    # until now).  Bounded state: one row per group.
    joined = joined.localCheckpoint(eager=True)
    totals = joined.agg(
        F.sum("tokens_old").alias("__to__"), F.sum("tokens_new").alias("__tn__")
    )
    share_old = F.coalesce(
        F.round(F.try_divide(F.lit(1e9) * F.col("tokens_old"), F.col("__to__")))
        .cast("long"),
        F.lit(0).cast("long"),
    )
    share_new = F.coalesce(
        F.round(F.try_divide(F.lit(1e9) * F.col("tokens_new"), F.col("__tn__")))
        .cast("long"),
        F.lit(0).cast("long"),
    )
    return (
        joined.crossJoin(F.broadcast(totals))
        .select(
            "group",
            "n_old",
            "n_new",
            (F.col("n_new") - F.col("n_old")).cast("long").alias("delta_n"),
            "tokens_old",
            "tokens_new",
            share_old.alias("share_old_nanos"),
            share_new.alias("share_new_nanos"),
            (share_new - share_old).cast("long").alias("share_delta_nanos"),
        )
        .orderBy("group")
    )
