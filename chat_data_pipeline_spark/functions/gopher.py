"""Gopher quality-rule filter (Rae et al. 2021, "Scaling Language Models:
Methods, Analysis & Insights from Training Gopher", Appendix A1.1).

The full published rule set, each signal a pure native Column expression so
the whole filter rides one whole-stage-codegen projection — the shape you
want when gating 100 TB before any expensive operator runs:

1. ``50 <= n_words <= 100_000``        (whitespace words)
2. ``3 <= mean_word_len <= 10``
3. ``hash_ratio <= 0.1`` AND ``ellipsis_ratio <= 0.1`` — the paper applies
   the symbol-to-word threshold to EACH symbol ('#'; '...' or '…'), not to
   their sum
4. ``bullet_line_frac <= 0.9``         (drop only when MORE than 90% of
                                        lines start with a bullet glyph)
5. ``ellipsis_line_frac <= 0.3``       (likewise: drop only above 30%)
6. ``alpha_word_frac >= 0.8``          (words containing >=1 letter)
7. ``stop_hits >= 2``                  (distinct members of the 8-word
                                        required-stopword list present)

Dialect parity: every regex below is valid and identical under Java regex
(Spark) and RE2 (duckdb oracle) — bullet/ellipsis classes are explicit,
letters use ``\\p{L}``, and the whitespace class is the shared
``text.STRIP_CLASS``.  The oracle twin lives in ``queries.py``
(``filter_gopher_quality``).

Reference scope note: the reference pipeline has no Gopher ruleset
(ref:filters.py covers F1-F11 only); this module is part of the
training-data extension inventory (SURVEY.md §2 extensions).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from chat_data_pipeline_spark.functions import text as T

# The paper's required-stopword list, verbatim (A1.1: "contains at least two
# of the following English words: the, be, to, of, and, that, have, with").
REQUIRED_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

# Bullet glyphs: the common markdown/typographic set.  '-' sits last so the
# class is literal in both dialects.
_BULLET_CLASS = "[•‣▸·*-]"
BULLET_LINE_PATTERN = f"^{T.STRIP_CLASS}*{_BULLET_CLASS}"
ELLIPSIS_LINE_PATTERN = r"(\.\.\.|…)" + T.STRIP_CLASS + "*$"
_LETTER = r"\p{L}"

# Default thresholds — the paper's published values.
DEFAULTS = dict(
    min_words=50,
    max_words=100_000,
    min_mean_word_len=3.0,
    max_mean_word_len=10.0,
    max_hash_ratio=0.1,
    max_ellipsis_ratio=0.1,
    max_bullet_line_frac=0.9,
    max_ellipsis_line_frac=0.3,
    min_alpha_word_frac=0.8,
    min_stop_hits=2,
)

SIGNAL_FIELDS = [
    "n_words",
    "mean_word_len",
    "hash_ratio",
    "ellipsis_ratio",
    "bullet_line_frac",
    "ellipsis_line_frac",
    "alpha_word_frac",
    "stop_hits",
]


def gopher_signals(col: Column) -> Column:
    """Struct of the seven Gopher quality signals for one text column.

    The token and line arrays are bound ONCE via the single-element-transform
    wrapper (captured outer expressions re-evaluate per lambda element —
    same discipline as ``repetition.line_repetition_stats``).  Ratios are
    rounded to 6 dp so the duckdb oracle hashes identically.
    """
    # null text = empty signals (n_words 0), not the -1 that F.size(null)
    # would propagate into every ratio
    empty = F.array().cast("array<string>")
    toks = F.coalesce(T.whitespace_tokens(col), empty)
    lines = F.coalesce(
        F.filter(F.split(col, "\n"), lambda x: F.trim(x) != F.lit("")), empty
    )
    # \w+ tokens for stopword containment ("the." hits)
    words = F.coalesce(T.words(col), empty)

    def stats(s: Column) -> Column:
        tk = s["t"]
        ln = s["l"]
        wd = s["w"]
        n = F.size(tk)
        n_lines = F.size(ln)
        nd = n.cast("double")
        mean_len = F.when(
            n > 0,
            F.round(
                F.aggregate(
                    tk, F.lit(0).cast("long"), lambda a, w: a + F.length(w)
                )
                / nd,
                6,
            ),
        ).otherwise(F.lit(0.0))
        # per-symbol ratios (A1.1 thresholds apply to EACH symbol, not the
        # sum); '…' counts as an ellipsis alongside '...', matching the
        # module's own ellipsis-line rule
        hashes = T.substring_count(s["x"], "#")
        ellipses = T.substring_count(s["x"], "...") + T.substring_count(s["x"], "…")
        hash_ratio = F.when(n > 0, F.round(hashes / nd, 6)).otherwise(F.lit(0.0))
        ellipsis_ratio = F.when(n > 0, F.round(ellipses / nd, 6)).otherwise(F.lit(0.0))
        line_frac = lambda pat: F.when(  # noqa: E731
            n_lines > 0,
            F.round(
                F.size(F.filter(ln, lambda x: F.regexp_count(x, F.lit(pat)) > 0))
                / n_lines.cast("double"),
                6,
            ),
        ).otherwise(F.lit(0.0))
        alpha_frac = F.when(
            n > 0,
            F.round(
                F.size(
                    F.filter(tk, lambda w: F.regexp_count(w, F.lit(_LETTER)) > 0)
                )
                / nd,
                6,
            ),
        ).otherwise(F.lit(0.0))
        stop_hits = F.size(
            F.filter(
                F.array(*[F.lit(sw) for sw in REQUIRED_STOPWORDS]),
                lambda sw: F.array_contains(wd, sw),
            )
        )
        return F.struct(
            n.alias("n_words"),
            mean_len.alias("mean_word_len"),
            hash_ratio.alias("hash_ratio"),
            ellipsis_ratio.alias("ellipsis_ratio"),
            line_frac(BULLET_LINE_PATTERN).alias("bullet_line_frac"),
            line_frac(ELLIPSIS_LINE_PATTERN).alias("ellipsis_line_frac"),
            alpha_frac.alias("alpha_word_frac"),
            stop_hits.alias("stop_hits"),
        )

    bound = F.array(
        F.struct(toks.alias("t"), lines.alias("l"), words.alias("w"), col.alias("x"))
    )
    return F.get(F.transform(bound, stats), 0)


def gopher_quality_keep(signals: Column, **overrides) -> Column:
    """Keep predicate over a ``gopher_signals`` struct (paper thresholds by
    default; override any via kwargs, e.g. ``min_words=10`` for short-form
    corpora)."""
    p = {**DEFAULTS, **overrides}
    unknown = set(overrides) - set(DEFAULTS)
    if unknown:
        raise ValueError(f"unknown gopher threshold(s): {sorted(unknown)}")
    return (
        signals["n_words"].between(p["min_words"], p["max_words"])
        & signals["mean_word_len"].between(
            p["min_mean_word_len"], p["max_mean_word_len"]
        )
        & (signals["hash_ratio"] <= p["max_hash_ratio"])
        & (signals["ellipsis_ratio"] <= p["max_ellipsis_ratio"])
        # paper drops only when MORE than the threshold fraction: keep on <=
        & (signals["bullet_line_frac"] <= p["max_bullet_line_frac"])
        & (signals["ellipsis_line_frac"] <= p["max_ellipsis_line_frac"])
        & (signals["alpha_word_frac"] >= p["min_alpha_word_frac"])
        & (signals["stop_hits"] >= p["min_stop_hits"])
    )
