"""The pipeline executor — Spark-first equivalent of ``DataPreprocessor`` +
``Pipeline`` (ref:preprocessor.py:1-91, ref:pipeline.py:1-75).

Reference lifecycle: clean → filter → dedup, each stage eagerly materializing
the whole dataset through pandas.  Here the stages build ONE lazy logical
plan: all cleaners collapse into a single projection, filters chain into
Catalyst predicates (pushed down / fused by the optimizer), and only dedup —
inherently iterative — triggers intermediate actions.

Observability contract (ref:pipeline.py:57, ref:preprocessor.py:81-91): per
filter, the reference logs the criteria column's describe() stats plus rows
removed (% and absolute).  ``verbose=True`` reproduces that with one extra
aggregate pass per filter (count/mean/std/min/quartiles/max via native
aggregates); ``verbose=False`` (default) stays fully lazy — stats ride the
final action via ``df.observe``.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from chat_data_pipeline_spark.functions.filters import FilterSpec
from chat_data_pipeline_spark.plans.registry import get_cleaner, get_filter

logger = logging.getLogger("chat_data_pipeline_spark")
# the reference self-reports at INFO (ref:preprocessor.py:81-91); make
# verbose mode visible even when the host app never configured logging
if not logger.handlers and not logging.getLogger().handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("%(levelname)s:%(name)s:%(message)s"))
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)

CRITERIA_SUFFIX = "criteria"


def criteria_column_name(column: str, filter_name: str) -> str:
    """ref:pipeline.py:54: ``f"{column_name}_{filter_func.__name__}_criteria"``."""
    return f"{column}_{filter_name}_{CRITERIA_SUFFIX}"


@dataclass
class FilterReport:
    filter_name: str
    column: str
    rows_before: int | None = None
    rows_after: int | None = None
    score_summary: dict[str, float] | None = None
    # non-verbose mode: metrics ride the caller's action (df.observe) and are
    # pulled into the plain fields by SparkPreprocessor.collect_reports()
    observation: object | None = None

    @property
    def removed(self) -> int | None:
        if self.rows_before is None or self.rows_after is None:
            return None
        return self.rows_before - self.rows_after


@dataclass
class SparkPreprocessor:
    """Ordered cleaners → filters → dedup over one string column.

    Mirrors ``DataPreprocessor`` (ref:preprocessor.py:14-37):

    - ``column_name``: the processed column;
    - ``cleaners``: names or ``Column -> Column`` callables;
    - ``filters``: names, ``FilterSpec``s, or ``(name, kwargs)`` pairs;
    - ``deduplication_config``: kwargs for MinHash-LSH dedup — keys
      ``ngram_size num_perm threshold min_ngram_size`` (ref defaults at
      ref:minhash_deduplication.py:214-221).  ``None`` disables dedup, like
      ``do_deduplication=False`` (ref:preprocessor.py:24,34-36).
    """

    column_name: str
    cleaners: Sequence[str | Callable[[Column], Column]] = field(default_factory=list)
    filters: Sequence[str | FilterSpec | tuple[str, dict]] = field(default_factory=list)
    deduplication_config: dict | None = None
    verbose: bool = False
    reports: list[FilterReport] = field(default_factory=list)
    _final_obs: object | None = field(default=None, repr=False)
    # filter names already warned about by THIS instance — the malformed-
    # splitter warning fires once per filter name per preprocessor, so a
    # later misconfigured pipeline in the same driver still warns
    _warned_null_criteria: set[str] = field(default_factory=set, repr=False)

    def run(self, df: DataFrame, dry_run: bool = False) -> DataFrame:
        df = self._clean(df)
        df = self._filter(df, dry_run=dry_run)
        # do_deduplication=False skips dedup at the LIBRARY level too
        # (ref:preprocessor.py:24,34-36) — previously only the CLI honored
        # the flag, so direct API users passing the reference-shaped config
        # got an unexpected dedup pass
        cfg = self.deduplication_config
        if cfg is not None and cfg.get("do_deduplication", True) and not dry_run:
            df = self._deduplicate(df)
        return df

    # -- clean (ref:preprocessor.py:39-42, ref:pipeline.py:45-49) ------------
    def _clean(self, df: DataFrame) -> DataFrame:
        col = F.col(self.column_name)
        for cleaner in self.cleaners:
            col = get_cleaner(cleaner)(col)
        if self.cleaners:
            df = df.withColumn(self.column_name, col)
        return df

    # -- filter (ref:preprocessor.py:44-58, ref:pipeline.py:52-67) -----------
    def _filter(self, df: DataFrame, dry_run: bool) -> DataFrame:
        for flt in self.filters:
            spec = self._resolve(flt)
            crit = criteria_column_name(self.column_name, spec.name)
            col = F.col(self.column_name)
            if dry_run:
                # keep the score column, drop no rows (ref:pipeline.py:56-58)
                df = df.withColumn(crit, spec.score_expr(col))
                continue
            report = FilterReport(spec.name, self.column_name)
            if self.verbose:
                scored = df.withColumn(crit, spec.score_expr(col))
                report.score_summary = _describe(scored, crit)
                report.rows_before = scored.count()
            elif not df.isStreaming:
                # fully lazy: the describe() stats ride the caller's FINAL
                # action as observed metrics — zero extra passes, vs one
                # count + one aggregate per filter in verbose mode.  (Not on
                # streaming plans: Observation rejects them — per-microbatch
                # metrics come from StreamingQueryListener instead.)
                if spec.keep_from_score is not None:
                    # keep ≡ f(score): materialize the score ONCE and hang
                    # both the metrics and the predicate off that column —
                    # otherwise a UDF-backed score runs twice (CollectMetrics
                    # and Filter hold distinct Python-UDF instances that
                    # Catalyst will not dedup)
                    df = df.withColumn(crit, spec.score_expr(col))
                    df, report.observation = _observe_score(df, F.col(crit))
                    df = df.filter(spec.keep_from_score_expr(F.col(crit))).drop(crit)
                    self.reports.append(report)
                    continue
                df, report.observation = _observe_criteria(df, spec, col)
            df = df.filter(spec.keep_expr(col))
            if self.verbose:
                report.rows_after = df.count()
                _log_reduction(report, self._warned_null_criteria)
            self.reports.append(report)
        if not dry_run and not self.verbose and any(
            r.observation is not None for r in self.reports
        ):
            from pyspark.sql import Observation

            self._final_obs = Observation()
            df = df.observe(self._final_obs, F.count(F.lit(1)).alias("rows_after"))
        return df

    def collect_reports(self) -> list[FilterReport]:
        """Non-verbose mode: pull the observed per-filter metrics (available
        after the caller has run ANY action over the returned plan) into the
        reports — rows_before/score stats per filter; ``rows_after`` is the
        next filter's rows_before (filters chain with nothing between them),
        and the trailing count-only observation closes the last filter.
        Blocks if called before an action has executed the plan."""
        observed = [r for r in self.reports if r.observation is not None]
        for i, report in enumerate(observed):
            stats = dict(report.observation.get)
            report.rows_before = int(stats.pop("rows_before"))
            report.score_summary = stats
            if i > 0:
                observed[i - 1].rows_after = report.rows_before
                _log_reduction(observed[i - 1], self._warned_null_criteria)
        if observed and self._final_obs is not None:
            observed[-1].rows_after = int(self._final_obs.get["rows_after"])
            _log_reduction(observed[-1], self._warned_null_criteria)
        return self.reports

    # -- dedup (ref:preprocessor.py:60-79) -----------------------------------
    def _deduplicate(self, df: DataFrame) -> DataFrame:
        """The reference only knows MinHash-LSH (ref:preprocessor.py:60-79);
        the ``method`` config key additionally routes to the engine's exact
        and n-gram-Jaccard dedup so the full lifecycle stays SQL-checkable
        (exact dedup has a DuckDB oracle; MinHash signatures do not)."""
        from chat_data_pipeline_spark.operators import dedup as D

        cfg = dict(self.deduplication_config or {})
        cfg.pop("do_deduplication", None)
        method = cfg.pop("method", "minhash")
        if method == "exact":
            return D.exact_dedup(df, self.column_name, cfg.pop("id_col"))
        if method == "ngram_jaccard":
            return D.ngram_jaccard_dedup(df, self.column_name, cfg.pop("id_col"), **cfg)
        if method == "simhash":
            return D.simhash_dedup(df, self.column_name, cfg.pop("id_col"), **cfg)
        if method != "minhash":
            raise ValueError(f"unknown dedup method {method!r}")
        return D.minhash_dedup(df, self.column_name, verbose=self.verbose, **cfg)

    @staticmethod
    def _resolve(flt: str | FilterSpec | tuple[str, dict]) -> FilterSpec:
        if isinstance(flt, tuple):
            name, kwargs = flt
            return get_filter(name, **kwargs)
        return get_filter(flt)


def _observe_criteria(df: DataFrame, spec: FilterSpec, col: Column):
    """Attach the describe() metric set for one filter's criteria as observed
    metrics (ref:pipeline.py:57's stats contract, with zero extra passes —
    CollectMetrics evaluates during whatever action the caller runs).

    Fallback path for filters whose keep is not a pure function of the score
    (`keep_from_score` absent) — the score expression appears in BOTH the
    metrics and (via keep) the filter; fine for native expressions, which is
    exactly the set that lands here.
    """
    return _observe_score(df, spec.score_expr(col))


def _observe_score(df: DataFrame, score: Column):
    from pyspark.sql import Observation

    score = score.cast("double")
    obs = Observation()
    df = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows_before"),
        # non-NULL score count: NULL criteria mark rows the filter REFUSES
        # (e.g. a splitter filter on a doc without exactly one splitter
        # token) — the count feeds the malformed-fraction warning below
        F.count(score).alias("count"),
        F.avg(score).alias("mean"),
        F.stddev(score).alias("std"),
        F.min(score).alias("min"),
        F.percentile_approx(score, 0.25).alias("25%"),
        F.percentile_approx(score, 0.5).alias("50%"),
        F.percentile_approx(score, 0.75).alias("75%"),
        F.max(score).alias("max"),
    )
    return df, obs


def _describe(df: DataFrame, column: str) -> dict[str, float]:
    """pandas ``describe()`` equivalent of the criteria column in one native
    aggregate pass (ref:pipeline.py:57)."""
    col = F.col(column).cast("double")
    row = df.select(
        F.count(col).alias("count"),
        F.avg(col).alias("mean"),
        F.stddev(col).alias("std"),
        F.min(col).alias("min"),
        F.percentile_approx(col, 0.25).alias("25%"),
        F.percentile_approx(col, 0.5).alias("50%"),
        F.percentile_approx(col, 0.75).alias("75%"),
        F.max(col).alias("max"),
    ).first()
    stats = row.asDict()
    logger.info("criteria %s stats: %s", column, stats)
    return stats


def _log_reduction(report: FilterReport, warned: set[str] | None = None) -> None:
    """ref:preprocessor.py:81-91 log contract."""
    before, after = report.rows_before, report.rows_after
    if not before:
        return
    removed = before - after
    logger.info(
        "Removed %.2f%% of rows (%d) with %s. New dataset size: %d",
        100.0 * removed / before,
        removed,
        report.filter_name,
        after,
    )
    # Diagnosability of silent NULL-keep drops (r11 ADVICE): the reference
    # RAISES on a malformed splitter doc where this engine maps it to a NULL
    # keep and drops it declaratively — correct for stray bad rows, but a
    # WRONG splitter_token turns the whole corpus malformed and would read
    # as a 100%-drop filter with no error.  Warn once per filter name within
    # the caller's `warned` scope — the preprocessor instance (r12 ADVICE
    # fix: a module-global set silenced later, genuinely misconfigured
    # pipelines in a long-lived driver).
    if warned is None:
        warned = set()
    scored = (report.score_summary or {}).get("count")
    if (
        scored is not None
        and scored < before * 0.5
        and report.filter_name not in warned
    ):
        warned.add(report.filter_name)
        logger.warning(
            "%s produced NULL criteria for %.1f%% of %d rows — NULL-keep "
            "rows are DROPPED. For splitter-based filters "
            "(check_truncation/check_gender) this usually means a wrong "
            "splitter_token (the doc must contain it exactly once).",
            report.filter_name,
            100.0 * (before - scored) / before,
            before,
        )


def split_dataset_by_filter(
    df: DataFrame, column: str, flt: str | FilterSpec, **kwargs: object
) -> tuple[DataFrame, DataFrame]:
    """G4 (ref:utils.py:239-250): (pass, fail) partition by one filter.

    One criteria computation + cache instead of the reference's filter +
    id-set anti-join double pass.
    """
    spec = get_filter(flt, **kwargs) if not isinstance(flt, FilterSpec) else flt
    # NULL keep (e.g. NULL input text) must land in `failed`, not vanish from
    # both partitions under three-valued logic — the split is exhaustive
    keep = F.coalesce(spec.keep_expr(F.col(column)), F.lit(False))
    scored = df.withColumn("__keep__", keep).cache()
    passed = scored.filter(F.col("__keep__")).drop("__keep__")
    failed = scored.filter(~F.col("__keep__")).drop("__keep__")
    return passed, failed


def rename_dry_run_columns(df: DataFrame, suffix: str) -> DataFrame:
    """ref:utils.py:160-169 — suffix criteria columns after a dry-run sweep so
    successive sweeps don't collide."""
    for name in df.columns:
        if name.endswith(f"_{CRITERIA_SUFFIX}"):
            df = df.withColumnRenamed(name, f"{name}_{suffix}")
    return df
