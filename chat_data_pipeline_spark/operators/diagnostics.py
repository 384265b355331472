"""Scale diagnostics for large-scale pipelines: what will skew BEFORE it does.

Beyond the reference's operator set (SURVEY.md §2): at 100 TB the difference
between a plan that finishes and one that straggles is usually ONE hot key —
a viral user in an events join, a boilerplate duplicate cluster in a dedup
groupBy, an empty-string fallback id.  AQE's skew-join split repairs some of
the damage at runtime, but choosing the partitioning (salt this key? broadcast
that side? pre-collapse clones?) needs the skew measured up front, on the real
corpus, cheaply.  ``key_skew_report`` is that measurement as one
map-side-combined aggregation — the profile a pipeline runs once per new
corpus before committing to a join/dedup strategy.

Everything is native Column arithmetic with integer-nano shares (the module's
bm25/temperature convention), so the report value-hashes against a DuckDB
oracle like any other registered query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# the sampling-module NULL convention (chr(31) cannot appear in real keys)
_NULL_KEY_SENTINEL = "\x1f<null>"


def key_skew_report(df: DataFrame, key_col: str, top_n: int = 20) -> DataFrame:
    """``(rank, key, n, share_nanos, x_avg_nanos)`` — the ``top_n`` hottest
    values of ``key_col`` with their corpus share and their multiple of the
    mean key load.

    - ``share_nanos``: round(1e9 · n / total) — this key's fraction of all
      rows, in integer nanos.
    - ``x_avg_nanos``: round(1e9 · n·n_keys / total) — how many times an
      AVERAGE key's row count this key carries; 1e9 = perfectly uniform.
      A key at 50·1e9 means the task holding it does 50× the mean work —
      the number that says "salt this key" before the shuffle is planned.

    Reading the report: ``x_avg_nanos`` calibrates strategy thresholds
    (e.g. salt keys above ~20×, or pre-collapse exact clones when the top
    key is a duplicate artifact like '' / '<null>'); ``share_nanos`` bounds
    the benefit (a 100× key carrying 0.1% of rows is harmless).

    Scale shape: ONE map-side-combined ``groupBy(key).count()`` (the only
    corpus-width stage — partial aggregation collapses the hot key's rows
    per task, so the profile itself cannot skew), a key-cardinality-sized
    total/count aggregate broadcast back, and a TakeOrdered top-N (per-
    partition heap + driver merge, never a global sort).  The final rank
    window runs over ≤ ``top_n`` rows.  NULL keys group under the sampling
    module's chr(31) sentinel so both engines order them identically.
    """
    key = F.coalesce(F.col(key_col).cast("string"), F.lit(_NULL_KEY_SENTINEL))
    counts = df.select(key.alias("key")).groupBy("key").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.agg(
        F.sum("n").alias("__total__"), F.count(F.lit(1)).alias("__nkeys__")
    )
    top = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "key",
            "n",
            F.round(F.lit(1e9) * F.col("n") / F.col("__total__"))
            .cast("long")
            .alias("share_nanos"),
            F.round(
                F.lit(1e9)
                * (
                    F.col("n").cast("double")
                    * F.col("__nkeys__").cast("double")
                    / F.col("__total__").cast("double")
                )
            )
            .cast("long")
            .alias("x_avg_nanos"),
        )
        .orderBy(F.col("n").desc(), F.col("key").asc())
        .limit(top_n)
    )
    w = Window.orderBy(F.col("n").desc(), F.col("key").asc())
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "key",
        F.col("n").cast("long").alias("n"),
        "share_nanos",
        "x_avg_nanos",
    )
