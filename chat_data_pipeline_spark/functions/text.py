"""Shared text-expression helpers used by cleaners, filters and analysis.

All helpers are pure Column-expression builders (JVM-side, codegen-friendly).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Python's ``str.strip()`` strips every unicode whitespace char; Java's
# ``trim`` only strips ASCII space.  This class covers Java \s plus the
# common unicode space block so semantics track the reference's strip()
# (ref:main.py:110-113, ref:filters.py:150, ref:cleaners.py:77).
# Kept to explicit escapes so the identical class works in RE2 (duckdb oracle).
STRIP_CLASS = (
    "[\\s\\u0085\\u00a0\\u1680\\u2000-\\u200a\\u2028\\u2029\\u202f\\u205f\\u3000]"
)

# a run of non-whitespace — Python str.split() token (Java spelling; the
# duckdb oracle uses the RE2 \x{hhhh} spelling of the same class)
NONWS_TOKEN = STRIP_CLASS.replace("[", "[^", 1) + "+"

# ``re.findall(r'\w+', text.lower())`` — the reference's universal word
# tokenizer (ref:utils.py:304-305).  Python's \w is UNICODE-aware (letters,
# digits incl. fullwidth forms, underscore); Java and RE2 default \w to
# ASCII.  The explicit class below is valid and identical in Java regex AND
# RE2 (duckdb oracle) and matches Python's semantics on L*/N*/_ .
WORD_PATTERN = r"[\p{L}\p{N}_]+"


def strip(col: Column) -> Column:
    """Python-``str.strip()`` equivalent (leading+trailing whitespace)."""
    return F.regexp_replace(
        F.regexp_replace(col, f"^{STRIP_CLASS}+", ""), f"{STRIP_CLASS}+$", ""
    )


def word_count(col: Column) -> Column:
    """len(re.findall(r'\\w+', text.lower())) (ref:utils.py:304-305).

    Lowercasing does not change \\w+ match counts, but is kept for parity.
    """
    return F.regexp_count(F.lower(col), F.lit(WORD_PATTERN))


def words(col: Column) -> Column:
    """The word list itself: re.findall(r'\\w+', text.lower())."""
    return F.regexp_extract_all(F.lower(col), F.lit(WORD_PATTERN), F.lit(0))


def whitespace_tokens(col: Column) -> Column:
    """Python ``str.split()`` equivalent: split on whitespace runs, drop
    empties (ref:filters.py:166-167 uses ``.split()``).  Splits on the full
    unicode whitespace class — Java ``\\s`` is ASCII-only and would leave
    'he\\u00a0went' as one token where Python yields two."""
    return F.filter(F.split(strip(col), f"{STRIP_CLASS}+"), lambda x: x != F.lit(""))


def substring_count(col: Column, phrase: str) -> Column:
    """Non-overlapping occurrences of ``phrase`` — Python ``str.count``
    equivalent (ref:filters.py:92-94) expressed with length arithmetic."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(phrase), F.lit(""))))
        / len(phrase)
    ).cast("long")
