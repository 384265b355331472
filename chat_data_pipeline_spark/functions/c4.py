"""C4-style page cleaning (Raffel et al. 2020, "Exploring the Limits of
Transfer Learning with a Unified Text-to-Text Transformer", §2.2).

The published heuristics, re-expressed as pure native Column expressions so
cleaning a 100 TB crawl stays one whole-stage-codegen projection:

Line level (``c4_line_keep`` / ``c4_clean_lines``):
- keep only lines ending in a terminal punctuation mark (``.`` ``!`` ``?``
  ``"``), trailing whitespace ignored;
- keep only lines with at least ``min_line_words`` (paper: 5) whitespace
  words;
- drop any line containing the word "javascript" (case-insensitive).

Page level (``c4_doc_keep``):
- drop pages whose RAW text contains "lorem ipsum" (case-insensitive);
- drop pages whose RAW text contains a curly brace ``{``;
- drop pages whose CLEANED text has fewer than ``min_sentences`` (paper: 3)
  sentences — counted as terminal-punctuation runs, a documented
  approximation of the paper's (unspecified) sentence splitter.

The paper's three-sentence-span corpus dedup is a separate operator here
(``operators.span_dedup`` covers it corpus-wide and intra-doc).

Dialect parity: every pattern is valid and identical under Java regex and
RE2; the oracle twin lives in ``queries.py`` (``docs_c4_clean``).

Reference scope note: the reference pipeline has no C4 ruleset
(ref:cleaners.py covers C1-C5 only); this module is part of the
training-data extension inventory (SURVEY.md §2 extensions).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from chat_data_pipeline_spark.functions import text as T

# A line's terminal punctuation, trailing whitespace ignored.  The quote is
# doubled out of the class to stay literal in both dialects' SQL strings.
TERMINAL_LINE_PATTERN = '[.!?"]' + T.STRIP_CLASS + "*$"
# One sentence ≈ one terminal-punctuation run.
SENTENCE_PATTERN = "[.!?]+"

MIN_LINE_WORDS = 5
MIN_SENTENCES = 3


def c4_line_keep(line: Column, min_line_words: int = MIN_LINE_WORDS) -> Column:
    """Keep predicate for ONE line (the §2.2 line-level rules)."""
    return (
        (F.regexp_count(line, F.lit(TERMINAL_LINE_PATTERN)) > 0)
        & (F.regexp_count(line, F.lit(T.NONWS_TOKEN)) >= min_line_words)
        & ~F.contains(F.lower(line), F.lit("javascript"))
    )


def c4_clean_lines(col: Column, min_line_words: int = MIN_LINE_WORDS) -> Column:
    """The page text with non-qualifying lines removed (lines re-joined
    with ``\\n``; a page with no qualifying line becomes '')."""
    kept = F.filter(
        F.split(col, "\n"), lambda x: c4_line_keep(x, min_line_words)
    )
    return F.array_join(kept, "\n")


def c4_doc_keep(
    raw: Column, cleaned: Column, min_sentences: int = MIN_SENTENCES
) -> Column:
    """Page-level keep predicate: no "lorem ipsum", no '{' (both on the raw
    page, as in the paper), and >= ``min_sentences`` sentences in the
    cleaned text."""
    return (
        ~F.contains(F.lower(raw), F.lit("lorem ipsum"))
        & ~F.contains(raw, F.lit("{"))
        & (F.regexp_count(cleaned, F.lit(SENTENCE_PATTERN)) >= min_sentences)
    )
