"""Scale diagnostics for large-scale pipelines: what will skew BEFORE it does.

Beyond the reference's operator set (SURVEY.md §2): at 100 TB the difference
between a plan that finishes and one that straggles is usually ONE hot key —
a viral user in an events join, a boilerplate duplicate cluster in a dedup
groupBy, an empty-string fallback id.  AQE's skew-join split repairs some of
the damage at runtime, but choosing the partitioning (salt this key? broadcast
that side? pre-collapse clones?) needs the skew measured up front, on the real
corpus, cheaply.  ``key_skew_report`` is that measurement as one
map-side-combined aggregation — the profile a pipeline runs once per new
corpus before committing to a join/dedup strategy.  ``data_quality_report``
/ ``uniqueness_report`` are the ingest gate beside it: expectations-style
rule violations (all rules in ONE scan) and the primary-key check, run
before burning compute on a malformed drop.

Everything is native Column arithmetic with integer-nano shares (the module's
bm25/temperature convention), so the report value-hashes against a DuckDB
oracle like any other registered query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# the sampling-module NULL convention (chr(31) cannot appear in real keys)
_NULL_KEY_SENTINEL = "\x1f<null>"


def data_quality_report(df: DataFrame, rules: dict[str, "F.Column"]) -> DataFrame:
    """Expectations-style ingest gate: ``(rule, n_rows, n_violations,
    violation_nanos)`` — one row per named rule, where each rule is a
    boolean Column that is True for a PASSING row.

    The check a pipeline runs on a new 100 TB drop BEFORE burning compute
    on it: null rates, emptiness, metadata/content consistency — anything
    expressible per row.  NULL rule results count as violations (a rule
    that cannot evaluate did not pass — ANSI three-valued logic must not
    let bad rows slip through as "unknown").

    Scale shape: ALL rules evaluate in ONE corpus scan — a single
    map-side-combined aggregate of k conditional sums (no per-rule pass,
    no shuffle beyond the one-row agg) — then the one aggregate row
    explodes into the k-row report.  ``violation_nanos`` is the integer
    violation rate (round(1e9·v/n), 0 on an empty corpus), so the report
    value-hashes cross-engine like every other registered artifact.
    """
    if not rules:
        raise ValueError("data_quality_report: no rules given")
    aggs = [F.count(F.lit(1)).alias("__n__")] + [
        F.sum(
            F.when(F.coalesce(pred, F.lit(False)), 0).otherwise(1)
        ).alias(f"__v{i}__")
        for i, pred in enumerate(rules.values())
    ]
    one = df.agg(*aggs)
    report_rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col("__n__").cast("long").alias("n_rows"),
                F.coalesce(F.col(f"__v{i}__"), F.lit(0))
                .cast("long")
                .alias("n_violations"),
            )
            for i, name in enumerate(rules)
        ]
    )
    return (
        one.select(F.explode(report_rows).alias("r"))
        .select("r.rule", "r.n_rows", "r.n_violations")
        .withColumn(
            "violation_nanos",
            # try_divide: an empty corpus (n_rows = 0) reports rate 0, not
            # a NaN that an ANSI long cast would turn into a job abort
            F.coalesce(
                F.round(
                    F.try_divide(F.lit(1e9) * F.col("n_violations"), F.col("n_rows"))
                ).cast("long"),
                F.lit(0).cast("long"),
            ),
        )
        .orderBy("rule")
    )


def uniqueness_report(df: DataFrame, key_col: str) -> DataFrame:
    """Primary-key companion of :func:`data_quality_report`: the same
    ``(rule, n_rows, n_violations, violation_nanos)`` shape for the one
    check that is NOT per-row — ``<key>_unique``, where a violation is any
    row whose key is NULL or shared with another row.

    One map-side-combined ``groupBy(key).count()`` (the key_skew scan) and
    a key-cardinality-sized tally: violations = Σ c over groups with
    c > 1, plus every NULL-key row."""
    counts = df.groupBy(F.col(key_col).alias("__k__")).agg(
        F.count(F.lit(1)).alias("__c__")
    )
    agg = counts.agg(
        F.coalesce(F.sum("__c__"), F.lit(0)).alias("__n__"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("__c__") > 1) | F.col("__k__").isNull(), F.col("__c__")
                ).otherwise(0)
            ),
            F.lit(0),
        ).alias("__v__"),
    )
    return agg.select(
        F.lit(f"{key_col}_unique").alias("rule"),
        F.col("__n__").cast("long").alias("n_rows"),
        F.col("__v__").cast("long").alias("n_violations"),
        F.coalesce(
            F.round(
                F.try_divide(F.lit(1e9) * F.col("__v__"), F.col("__n__"))
            ).cast("long"),
            F.lit(0).cast("long"),
        ).alias("violation_nanos"),
    )


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
