"""F1-F11 row-quality filters with the reference's dry-run score/keep duality.

Reference executor contract (ref:pipeline.py:52-67): each filter produces a
criteria column named ``{column}_{filter}_criteria``; in dry-run mode the raw
score is kept and no rows are dropped, otherwise rows where the criteria is
truthy survive and the column is dropped.

Every filter here exposes a pair of ``Column -> Column`` builders:

- ``<name>_score`` — the dry-run score expression;
- ``<name>_keep``  — the boolean keep predicate.

Filters F1, F4, F6, F7, F8, F9, F10, F11 are pure native expressions (JVM,
whole-stage codegen).  F3 (nsfw substring ratio over 403 phrases) and F5
(char-ngram repetition) are Arrow-batched pandas UDFs — the per-row Python
algorithms (Counter over sliding windows; 403 substring counts) have no
acceptable native form.  F2 (perplexity) delegates to a pluggable scorer
(real KenLM when installed, a deterministic stub otherwise) — see
``chat_data_pipeline_spark.functions.perplexity``.

dry-run quirks preserved from the reference: F8 ``check_gender`` ignores
dry_run (ref:filters.py:162 — param unused) and F9/F10/F11 return booleans
even when scoring (ref:filters.py:178-185,270-289); our score builders return
the same shapes.
"""

from __future__ import annotations

import re
from collections import Counter
from dataclasses import dataclass, field
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from chat_data_pipeline_spark.functions import text as T
from chat_data_pipeline_spark.functions.wordlists import (
    HARSH_UNWANTED_PHRASES,
    NSFW_PHRASES,
    UNWANTED_PHRASES,
)

# --------------------------------------------------------------------------
# F1 check_word_number (ref:filters.py:6-15)
# --------------------------------------------------------------------------


def check_word_number_score(col: Column, **_: object) -> Column:
    return T.word_count(col).cast("long")


def _word_number_pred(
    s: Column,
    min_word_threshold: int = 5,
    max_word_threshold: int = 512,
    **_: object,
) -> Column:
    return (s >= F.lit(min_word_threshold)) & (s <= F.lit(max_word_threshold))


def check_word_number_keep(
    col: Column,
    min_word_threshold: int = 5,
    max_word_threshold: int = 512,
    **_: object,
) -> Column:
    return _word_number_pred(
        check_word_number_score(col),
        min_word_threshold=min_word_threshold,
        max_word_threshold=max_word_threshold,
    )


# --------------------------------------------------------------------------
# F2 check_perplexity (ref:filters.py:18-28, ref:kenlm_model.py)
# --------------------------------------------------------------------------


def check_perplexity_score(col: Column, model: object | None = None, **_: object) -> Column:
    from chat_data_pipeline_spark.functions import perplexity

    return perplexity.perplexity_score(col, model)


def _perplexity_pred(
    s: Column,
    min_perplexity_threshold: float = 300,
    max_perplexity_threshold: float = 3_000,
    **_: object,
) -> Column:
    return (s >= F.lit(float(min_perplexity_threshold))) & (
        s <= F.lit(float(max_perplexity_threshold))
    )


def check_perplexity_keep(
    col: Column,
    model: object | None = None,
    min_perplexity_threshold: float = 300,
    max_perplexity_threshold: float = 3_000,
    **_: object,
) -> Column:
    return _perplexity_pred(
        check_perplexity_score(col, model=model),
        min_perplexity_threshold=min_perplexity_threshold,
        max_perplexity_threshold=max_perplexity_threshold,
    )


# --------------------------------------------------------------------------
# F3 check_nsfw_words (ref:filters.py:83-99)
# ratio = sum of non-overlapping substring counts of 403 phrases over the
# lowercased doc, divided by \w+ word count; 0 when no words.
# --------------------------------------------------------------------------

_WORD_RE = re.compile(r"\w+")


def _nsfw_ratio_batch(batch: pd.Series) -> pd.Series:
    phrases = NSFW_PHRASES

    def ratio(doc: str | None) -> float:
        # bug-compat sentinel: the reference's row-wise apply stringifies a
        # missing doc to the literal "none" (word count 1, ratio 0) rather
        # than the ""/coalesce the sibling filters use; the DuckDB oracle
        # encodes the same choice, so changing it would break value parity
        doc = str(doc).lower() if doc is not None else "none"
        num_words = len(_WORD_RE.findall(doc))
        if num_words == 0:
            return 0.0
        return sum(doc.count(p) for p in phrases) / num_words

    return batch.map(ratio)


def check_nsfw_words_score(col: Column, **_: object) -> Column:
    return pandas_udf(_nsfw_ratio_batch, "double")(col)


def _nsfw_words_pred(
    s: Column, flagged_words_threshold: float = 0.025, **_: object
) -> Column:
    return s <= F.lit(float(flagged_words_threshold))


def check_nsfw_words_keep(
    col: Column, flagged_words_threshold: float = 0.025, **_: object
) -> Column:
    return _nsfw_words_pred(
        check_nsfw_words_score(col), flagged_words_threshold=flagged_words_threshold
    )


def nsfw_ratio_native(col: Column, phrases: list[str] | None = None) -> Column:
    """Native-expression variant of the F3 score for a *small* phrase list.

    Used by oracle-parity queries where the UDF-free plan matters; the full
    403-phrase list would emit ~800 string expressions, so the pandas UDF is
    the production path (SURVEY.md §2.4 F3).
    """
    phrases = NSFW_PHRASES if phrases is None else phrases
    if not phrases:  # empty list: zero hits by definition, not a None deref
        return F.lit(0.0)
    lowered = F.lower(col)
    total = None
    for p in phrases:
        cnt = T.substring_count(lowered, p)
        total = cnt if total is None else total + cnt
    wc = T.word_count(col)
    return F.when(wc > 0, total.cast("double") / wc).otherwise(F.lit(0.0))


# --------------------------------------------------------------------------
# F4 check_lowercase_ratio (ref:filters.py:102-113)
# count of chars in ascii_lowercase / total chars; 0 if empty.
# --------------------------------------------------------------------------


def check_lowercase_ratio_score(col: Column, **_: object) -> Column:
    n = F.length(col)
    lower_count = n - F.length(F.regexp_replace(col, "[a-z]", ""))
    return F.when(n > 0, lower_count.cast("double") / n).otherwise(F.lit(0.0))


def _lowercase_ratio_pred(
    s: Column, lowercase_threshold: float = 0.75, **_: object
) -> Column:
    return s >= F.lit(float(lowercase_threshold))


def check_lowercase_ratio_keep(
    col: Column, lowercase_threshold: float = 0.75, **_: object
) -> Column:
    return _lowercase_ratio_pred(
        check_lowercase_ratio_score(col), lowercase_threshold=lowercase_threshold
    )


# --------------------------------------------------------------------------
# F5 check_char_repetition (ref:filters.py:116-128, ref:utils.py:310-339)
# Sliding char n-grams (n=10); ratio = sum of the top min(floor(sqrt(k)),
# k - #singletons) frequencies over the total frequency mass.
# --------------------------------------------------------------------------


def char_repetition_ratio(doc: str, n: int) -> float:
    """Pure-Python reimplementation of ref:utils.py:310-339 (used in-UDF and
    by differential tests)."""
    if doc is None:
        return 0.0
    ngrams = [doc[i : i + n] for i in range(len(doc) - n + 1)]
    freq = Counter(ngrams)
    if not freq:
        return 0.0
    values = sorted(freq.values(), reverse=True)
    singletons = sum(1 for v in values if v == 1)
    top_k = min(int(np.sqrt(len(values))), len(values) - singletons)
    return sum(values[:top_k]) / sum(values)


def check_char_repetition_score(
    col: Column, char_repetition_len: int = 10, **_: object
) -> Column:
    n = int(char_repetition_len)

    def batch_ratio(batch: pd.Series) -> pd.Series:
        return batch.map(lambda d: char_repetition_ratio(d, n))

    return pandas_udf(batch_ratio, "double")(col)


def _char_repetition_pred(
    s: Column, char_repetition_threshold: float = 0.2, **_: object
) -> Column:
    return s <= F.lit(float(char_repetition_threshold))


def check_char_repetition_keep(
    col: Column,
    char_repetition_len: int = 10,
    char_repetition_threshold: float = 0.2,
    **_: object,
) -> Column:
    return _char_repetition_pred(
        check_char_repetition_score(col, char_repetition_len),
        char_repetition_threshold=char_repetition_threshold,
    )


# --------------------------------------------------------------------------
# F6 check_truncation (ref:filters.py:131-140)
# doc.split(token) -> (model_response, edited_response); keep (=is truncation)
# when edited_response is NOT a substring of model_response.
# --------------------------------------------------------------------------


def _split2(col: Column, token: str) -> tuple[Column, Column, Column]:
    """(ok, part1, part2) for a doc expected to contain the splitter token
    exactly once.  ``ok`` is False for 0 or ≥2 occurrences — the reference's
    2-tuple unpack RAISES there (ref:filters.py:133,163); this engine maps
    malformed docs to a NULL keep instead (dropped by the executor's filter
    and by split_dataset_by_filter's coalesce), the declarative-plan
    equivalent of refusing the row.  ``try_element_at`` keeps the lookups
    total: a bare ``element_at(parts, 2)`` on a token-less doc is a
    job-killing INVALID_ARRAY_INDEX under Spark 4's ANSI default."""
    parts = F.split(col, re.escape(token), -1)
    ok = F.size(parts) == 2
    return ok, F.try_element_at(parts, F.lit(1)), F.try_element_at(parts, F.lit(2))


def check_truncation_keep(
    col: Column, splitter_token: str = "<|truncation_splitter|>", **_: object
) -> Column:
    ok, model_response, edited_response = _split2(col, splitter_token)
    return F.when(ok, ~F.contains(model_response, edited_response))


def check_truncation_score(
    col: Column, splitter_token: str = "<|truncation_splitter|>", **_: object
) -> Column:
    return check_truncation_keep(col, splitter_token).cast("int")


# --------------------------------------------------------------------------
# F7 check_completion (ref:filters.py:143-156)
# last char of the stripped doc must be one of the completion punctuation set.
# --------------------------------------------------------------------------

COMPLETION_PUNCTUATION = [".", "!", "?", "*", '"', "”", "~", "…", "'", "]", ")", "`", ";"]


def check_completion_keep(col: Column, **_: object) -> Column:
    stripped = T.strip(col)
    last = F.substring(stripped, -1, 1)
    return (F.length(stripped) > 0) & last.isin(COMPLETION_PUNCTUATION)


def check_completion_score(col: Column, **_: object) -> Column:
    return check_completion_keep(col).cast("int")


# --------------------------------------------------------------------------
# F8 check_gender (ref:filters.py:159-175)
# Split on token; True when some aligned whitespace-token position holds two
# *different* gendered words.  zip_with pads the longer side with nulls, which
# the null-safe condition rejects — equivalent to the reference's min-length
# loop.  NB the reference ignores dry_run here (ref:filters.py:162).
# --------------------------------------------------------------------------

GENDERED_WORDS = ["he", "she", "him", "her", "girl", "boy"]


def check_gender_keep(
    col: Column, splitter_token: str = "<|gender_splitter|>", **_: object
) -> Column:
    """BUG-COMPAT: the reference IGNORES ``dry_run`` for this filter
    (ref:filters.py:162 — no score branch; the boolean IS the score), so
    ``check_gender_score`` aliases this keep predicate on purpose.  Do not
    "fix" by adding a dry-run score path — it would break keep/drop parity
    with the reference (see SURVEY §7.3)."""
    ok, response, edited = _split2(col, splitter_token)
    rw = T.whitespace_tokens(F.lower(response))
    ew = T.whitespace_tokens(F.lower(edited))
    pair_hit = F.zip_with(
        rw,
        ew,
        lambda x, y: x.isin(GENDERED_WORDS) & y.isin(GENDERED_WORDS) & (x != y),
    )
    return F.when(ok, F.coalesce(F.exists(pair_hit, lambda b: b), F.lit(False)))


# dry_run is ignored by the reference: score IS the boolean.
check_gender_score = check_gender_keep


# --------------------------------------------------------------------------
# F9 check_empty (ref:filters.py:178-185)
# non-empty after removing "..." and "…" and stripping.  Returns bool in
# dry-run too (reference has no score branch).
# --------------------------------------------------------------------------


def check_empty_keep(col: Column, **_: object) -> Column:
    cleaned = F.replace(col, F.lit("..."), F.lit(""))
    cleaned = F.replace(cleaned, F.lit("…"), F.lit(""))
    return F.length(T.strip(cleaned)) != 0


check_empty_score = check_empty_keep


# --------------------------------------------------------------------------
# F10/F11 check_ethics / check_ethics_harsh (ref:filters.py:270-289)
# keep when the lowercased doc contains NONE of the phrase list.
# --------------------------------------------------------------------------


def _contains_none(col: Column, phrases: list[str]) -> Column:
    # bind lower(col) ONCE via a single-element transform: an expression
    # referenced inside a higher-order lambda re-evaluates per element, so
    # the naive form lowercases the whole document once per phrase (49-69
    # phrases → measured ~5s of pure re-lowercasing at sf0.1)
    hit = F.get(
        F.transform(
            F.array(F.lower(col)),
            lambda low: F.exists(
                F.lit(phrases).cast("array<string>"), lambda p: F.contains(low, p)
            ),
        ),
        0,
    )
    return ~hit


def check_ethics_keep(col: Column, **_: object) -> Column:
    return _contains_none(col, UNWANTED_PHRASES)


def check_ethics_harsh_keep(col: Column, **_: object) -> Column:
    return _contains_none(col, HARSH_UNWANTED_PHRASES)


check_ethics_score = check_ethics_keep
check_ethics_harsh_score = check_ethics_harsh_keep


# --------------------------------------------------------------------------
# Training-data extension filters (round 3) — Gopher repetition gates and
# the domain blocklist, exposed through the same name registry so YAML/
# SparkPreprocessor configs compose them with the reference filters.
# --------------------------------------------------------------------------


def check_repetition_score(col: Column, **_: object) -> Column:
    """Dry-run scalar: the top-2-gram char fraction (the Gopher signal with
    the widest dynamic range on real corpora) — computed alone, one Counter
    pass per doc."""
    from chat_data_pipeline_spark.functions import repetition as RP

    return RP.ngram_repetition_profile(T.words(col), top_ns=(2,), dup_ns=())[
        "top_2gram_char_frac"
    ]


def check_repetition_keep(
    col: Column,
    thresholds: dict | None = None,
    signals: list | None = None,
    **_: object,
) -> Column:
    from chat_data_pipeline_spark.functions import repetition as RP

    names = (
        list(signals)
        if signals is not None
        else list(RP.LINE_FIELDS) + RP._PROFILE_FIELDS
    )
    # build the narrowest profile the gate references — each extra n is a
    # per-doc Counter pass the predicate would never look at
    top_ns, dup_ns = RP.profile_ns_for(names)
    profile = (
        RP.ngram_repetition_profile(T.words(col), top_ns, dup_ns)
        if (top_ns or dup_ns)
        else F.lit(None)
    )
    # NULL guard: a NULL doc tokenizes to an empty array whose all-zero
    # fractions pass every <= threshold, so this was the ONE filter in the
    # module where NULL rows uniquely SURVIVED.  NULL keep = dropped, the
    # module convention.
    return F.when(
        col.isNotNull(),
        RP.repetition_keep(
            RP.line_repetition_stats(col),
            profile,
            thresholds=thresholds,
            signals=names,
        ),
    )


def _check_domain_list(blocked_domains: object) -> list:
    # a YAML scalar ('blocked_domains: example.com') would otherwise pass
    # the truthiness check and list() it into single CHARACTERS — a silent
    # no-op blocklist; the c4 filter's posture: config mistakes must raise
    if isinstance(blocked_domains, (str, bytes)):
        raise TypeError(
            "blocked_domains must be a list of domains, got a bare string "
            f"({blocked_domains!r}) — wrap it in a list"
        )
    return list(blocked_domains or [])


def check_domain_blocklist_keep(
    col: Column, blocked_domains: list | None = None, **_: object
) -> Column:
    from chat_data_pipeline_spark.functions import analysis as A

    blocked = _check_domain_list(blocked_domains)
    if not blocked:
        return F.lit(True)
    return A.domain_blocklist_keep(col, blocked)


def check_domain_blocklist_score(
    col: Column, blocked_domains: list | None = None, **_: object
) -> Column:
    """Dry-run scalar: number of links to BLOCKED domains (0 with an empty
    blocklist) — faithful to the keep predicate (keep ≡ score == 0), so a
    dry-run sweep actually predicts what the filter will drop.  (The old
    score counted ALL http(s) links, which ranked docs inversely to the
    keep signal whenever allowed-link-heavy docs outnumbered blocked
    ones.)"""
    from chat_data_pipeline_spark.functions import analysis as A

    blocked = _check_domain_list(blocked_domains)
    if not blocked:
        return F.lit(0.0)
    return F.size(A.blocked_urls(col, blocked)).cast("double")


def _classifier_weights(
    weights: object, weights_path: object, n_buckets: int
) -> list[int]:
    """Resolve the fixed-point model: an inline integer list (programmatic
    use) or a trained ``(bucket, weight)`` parquet table (the YAML path —
    ``quality_classifier_train``'s output written wherever the pipeline
    persists models).  Missing buckets read as weight 0."""
    if weights is not None:
        return [int(w) for w in weights]  # type: ignore[union-attr]
    if weights_path:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                "check_quality_classifier: no active SparkSession to read "
                f"weights_path {weights_path!r}"
            )
        rows = spark.read.parquet(str(weights_path)).collect()
        # The trainer always persists a DENSE n_buckets-row table (one row
        # per bucket, zero-weight buckets included), so the stored modulus
        # IS top+1 and must equal the configured one in BOTH directions: a
        # larger stored modulus scored with a smaller n_buckets AND a
        # smaller stored modulus scored with a larger n_buckets each hash
        # every token into the wrong bucket.  Sparse (bucket, weight)
        # tables are unsupported via weights_path for exactly this reason —
        # they would make the trained modulus unrecoverable.
        top = max((int(r.bucket) for r in rows), default=-1)
        if top + 1 != n_buckets or len(rows) != n_buckets:
            raise ValueError(
                f"check_quality_classifier: weights_path {weights_path!r} "
                f"holds {len(rows)} rows with buckets up to {top} (trained "
                f"modulus {top + 1}) but n_buckets={n_buckets} — scoring "
                "with a different modulus than the model was trained with "
                f"silently mis-hashes every token; pass n_buckets={top + 1} "
                "(the trained size).  Sparse weight tables are unsupported "
                "via weights_path: persist the trainer's dense output."
            )
        out = [0] * n_buckets
        for r in rows:
            out[int(r.bucket)] = int(r.weight)
        return out
    raise ValueError(
        "check_quality_classifier needs `weights` (list[int]) or "
        "`weights_path` (trained (bucket, weight) parquet)"
    )


def check_quality_classifier_score(
    col: Column,
    weights: object = None,
    weights_path: object = None,
    n_buckets: int = 256,
    **_: object,
) -> Column:
    """Trained fixed-point classifier forward pass as a filter score (r12,
    engine extension): pred = Σ trained bucket weights over the doc's
    distinct md5 buckets — the model ``quality_classifier_train`` fits,
    riding the scan as a literal array (zero shuffle, zero Python)."""
    from chat_data_pipeline_spark.functions import scoring as SC

    w = _classifier_weights(weights, weights_path, n_buckets)
    return SC.fixed_point_score(SC.doc_bucket_features(col, len(w)), w).cast(
        "double"
    )


def _quality_classifier_pred(
    score: Column, min_score_threshold: int = 0, **_: object
) -> Column:
    return score >= F.lit(float(min_score_threshold))


def check_quality_classifier_keep(col: Column, **kwargs: object) -> Column:
    return _quality_classifier_pred(
        check_quality_classifier_score(col, **kwargs), **kwargs
    )


# --------------------------------------------------------------------------
# Registry — mirrors the reference's getattr(filters, name) lookup
# (ref:utils.py:23-50) plus custom_partial kwargs (ref:utils.py:142-146).
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class FilterSpec:
    name: str
    score: Callable[..., Column]
    keep: Callable[..., Column]
    defaults: dict = field(default_factory=dict)
    # keep as a function of the SCORE column, where keep ≡ f(score): lets the
    # pipeline materialize the score once and derive both the observed stats
    # AND the predicate from that single column — without it, a UDF-backed
    # score would execute twice (once inside CollectMetrics, once inside the
    # Filter; Catalyst does not dedup distinct Python-UDF instances across
    # those nodes).
    keep_from_score: Callable[..., Column] | None = None

    def score_expr(self, col: Column, **kwargs: object) -> Column:
        return self.score(col, **{**self.defaults, **kwargs})

    def keep_expr(self, col: Column, **kwargs: object) -> Column:
        return self.keep(col, **{**self.defaults, **kwargs})

    def keep_from_score_expr(self, score_col: Column, **kwargs: object) -> Column:
        assert self.keep_from_score is not None
        return self.keep_from_score(score_col, **{**self.defaults, **kwargs})


def _gopher_keep_as_score(col: Column, **overrides: object) -> Column:
    """Full Rae et al. 2021 A1.1 ruleset as a YAML-reachable filter; any
    threshold overridable (``min_words=10`` etc., see gopher.DEFAULTS)."""
    from chat_data_pipeline_spark.functions import gopher as _G

    return _G.gopher_quality_keep(_G.gopher_signals(col), **overrides)


def _c4_keep_as_score(
    col: Column, min_line_words: int = 5, min_sentences: int = 3, **unknown: object
) -> Column:
    """Raffel et al. 2020 §2.2 page-level verdict as a YAML-reachable
    filter: line rules produce the cleaned view, the page keeps only if the
    lorem-ipsum/brace/sentence-count rules pass on (raw, cleaned).  Unknown
    overrides raise (the gopher sibling's posture) — a silently-swallowed
    threshold typo would run the filter at defaults while the config claims
    otherwise."""
    if unknown:
        raise ValueError(f"unknown c4 threshold(s): {sorted(unknown)}")
    from chat_data_pipeline_spark.functions import c4 as _C4

    return _C4.c4_doc_keep(
        col, _C4.c4_clean_lines(col, min_line_words), min_sentences
    )


FILTERS: dict[str, FilterSpec] = {
    spec.name: spec
    for spec in [
        FilterSpec(
            "check_word_number",
            check_word_number_score,
            check_word_number_keep,
            {"min_word_threshold": 5, "max_word_threshold": 512},
            keep_from_score=_word_number_pred,
        ),
        FilterSpec(
            "check_perplexity",
            check_perplexity_score,
            check_perplexity_keep,
            {"min_perplexity_threshold": 300, "max_perplexity_threshold": 3_000},
            keep_from_score=_perplexity_pred,
        ),
        FilterSpec(
            "check_nsfw_words",
            check_nsfw_words_score,
            check_nsfw_words_keep,
            {"flagged_words_threshold": 0.025},
            keep_from_score=_nsfw_words_pred,
        ),
        FilterSpec(
            "check_lowercase_ratio",
            check_lowercase_ratio_score,
            check_lowercase_ratio_keep,
            {"lowercase_threshold": 0.75},
            keep_from_score=_lowercase_ratio_pred,
        ),
        FilterSpec(
            "check_char_repetition",
            check_char_repetition_score,
            check_char_repetition_keep,
            {"char_repetition_len": 10, "char_repetition_threshold": 0.2},
            keep_from_score=_char_repetition_pred,
        ),
        FilterSpec(
            "check_truncation",
            check_truncation_score,
            check_truncation_keep,
            {"splitter_token": "<|truncation_splitter|>"},
        ),
        FilterSpec("check_completion", check_completion_score, check_completion_keep),
        FilterSpec(
            "check_gender",
            check_gender_score,
            check_gender_keep,
            {"splitter_token": "<|gender_splitter|>"},
        ),
        FilterSpec("check_empty", check_empty_score, check_empty_keep),
        FilterSpec("check_ethics", check_ethics_score, check_ethics_keep),
        FilterSpec(
            "check_ethics_harsh", check_ethics_harsh_score, check_ethics_harsh_keep
        ),
        FilterSpec(
            "check_repetition", check_repetition_score, check_repetition_keep
        ),
        FilterSpec(
            "check_domain_blocklist",
            check_domain_blocklist_score,
            check_domain_blocklist_keep,
            {"blocked_domains": []},
            # keep == "no blocked links" == score 0 (the score now counts
            # BLOCKED links only), so the executor can materialize the
            # score once and derive both metrics and predicate from it
            keep_from_score=lambda s, **_: s == F.lit(0.0),
        ),
        # published rulesets as one-line YAML filters (round 6): the boolean
        # IS the score, the gender/ethics precedent for verdict-style checks
        FilterSpec(
            "check_gopher_quality",
            _gopher_keep_as_score,
            _gopher_keep_as_score,
        ),
        # the TRAINED gate (r12): score once, metrics + predicate off that
        # column (keep_from_score — the model is a plain Column fold, but
        # there is no reason to build the 256-literal array twice)
        FilterSpec(
            "check_quality_classifier",
            check_quality_classifier_score,
            check_quality_classifier_keep,
            {"n_buckets": 256, "min_score_threshold": 0},
            keep_from_score=_quality_classifier_pred,
        ),
        FilterSpec(
            "check_c4_quality",
            _c4_keep_as_score,
            _c4_keep_as_score,
        ),
    ]
}
