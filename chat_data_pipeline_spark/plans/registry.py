"""Name → expression-factory registry.

The reference resolves cleaners/filters from YAML by name with
``getattr(cleaners, name)`` / ``getattr(filters, name)`` and binds kwargs via
``custom_partial`` which preserves ``__name__`` for criteria-column naming
(ref:utils.py:23-50,142-146).  Here the registry maps names to Column-builder
factories; user-supplied callables pass straight through, so arbitrary custom
cleaners/filters plug in exactly like the reference's.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column

from chat_data_pipeline_spark.functions.cleaners import CLEANERS
from chat_data_pipeline_spark.functions.filters import FILTERS, FilterSpec


def get_cleaner(cleaner: str | Callable[[Column], Column]) -> Callable[[Column], Column]:
    if callable(cleaner):
        return cleaner
    try:
        return CLEANERS[cleaner]  # type: ignore[return-value]
    except KeyError:
        raise KeyError(
            f"unknown cleaner {cleaner!r}; known: {sorted(CLEANERS)}"
        ) from None


def get_filter(flt: str | FilterSpec, **kwargs: object) -> FilterSpec:
    """Resolve a filter by name, optionally re-binding default kwargs — the
    ``custom_partial`` equivalent (ref:utils.py:142-146)."""
    spec = flt if isinstance(flt, FilterSpec) else None
    if spec is None:
        try:
            spec = FILTERS[flt]  # type: ignore[index]
        except KeyError:
            raise KeyError(f"unknown filter {flt!r}; known: {sorted(FILTERS)}") from None
    if kwargs:
        spec = FilterSpec(
            spec.name,
            spec.score,
            spec.keep,
            {**spec.defaults, **kwargs},
            keep_from_score=spec.keep_from_score,
        )
    return spec


# Preset bundles (ref:utils.py:53-139) — the reference's ready-made cleaner /
# filter stacks for response ("output text") and instruction ("input text").
def get_output_text_cleaners() -> list[str]:
    # ref:utils.py:53-60
    return ["fix_utf8_encoding", "normalize_punctuation", "remove_empty_lines"]


def get_input_text_cleaners() -> list[str]:
    # ref:utils.py:63-68
    return ["fix_utf8_encoding", "normalize_punctuation"]


def get_output_text_filters(
    do_nsfw_filter: bool = True, do_perplexity_filter: bool = False
) -> list[FilterSpec]:
    # ref:utils.py:71-107: word count 5-128, completion, char-rep (10, 0.2),
    # lowercase 0.75, optional nsfw 0.025, optional perplexity 300-10k.
    specs = [
        get_filter("check_word_number", min_word_threshold=5, max_word_threshold=128),
        get_filter("check_completion"),
        get_filter(
            "check_char_repetition",
            char_repetition_len=10,
            char_repetition_threshold=0.2,
        ),
        get_filter("check_lowercase_ratio", lowercase_threshold=0.75),
    ]
    if do_nsfw_filter:
        specs.append(get_filter("check_nsfw_words", flagged_words_threshold=0.025))
    if do_perplexity_filter:
        specs.append(
            get_filter(
                "check_perplexity",
                min_perplexity_threshold=300,
                max_perplexity_threshold=10_000,
            )
        )
    return specs


def get_input_text_filters() -> list[FilterSpec]:
    # ref:utils.py:122-129: lowercase ratio 0.55.
    return [get_filter("check_lowercase_ratio", lowercase_threshold=0.55)]


def get_web_page_cleaners() -> list[str]:
    """Web-scrape preset (round 6, no reference twin): markup off first,
    then the standard text normalization — the order matters because tag
    stripping exposes whitespace runs the normalizer then collapses."""
    return ["strip_html", "fix_utf8_encoding", "normalize_whitespace"]


def get_web_page_filters(**gopher_overrides: object) -> list[FilterSpec]:
    """Web-scrape quality preset: the two published page rulesets in the
    order the papers apply them — C4's line/page rules (cheap, structural)
    before Gopher's statistical signals."""
    return [
        get_filter("check_c4_quality"),
        get_filter("check_gopher_quality", **gopher_overrides),
    ]
