"""C1-C5 string-normalization cleaners (ref:cleaners.py:1-79).

Each cleaner is a pure ``Column -> Column`` builder.  The reference applies
cleaners via single-threaded row-wise ``pandas.apply`` (ref:pipeline.py:45-49);
here they are native Catalyst expressions, so an arbitrary chain of cleaners
fuses into one whole-stage-codegen projection — N reference passes become one.

Only C1 (ftfy mojibake repair) needs Python; it is an Arrow-batched pandas UDF
gated on ftfy being importable, with a passthrough fallback.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from chat_data_pipeline_spark.functions.text import strip

# --- C2: normalize_whitespace (ref:cleaners.py:13-19) -----------------------
# The reference maps every char in its `whitespace` set to ASCII space.  Set
# members by codepoint: 0x20 0x84(NEL as latin-1) 0x2002 0x2003 0x2005 0x2008
# 0x2009 0x200a 0x202f 0x3000 0xfffc.  (The set literal also contains "", a
# no-op member — SURVEY.md §2.3 C2.)
_WHITESPACE_CHARS = (
    "\u0084\u2002\u2003\u2005\u2008\u2009\u200a\u202f\u3000\ufffc"
)

# --- C3: normalize_punctuation (ref:cleaners.py:22-63) -----------------------
# 34 unicode → ASCII mappings; three have multi-char replacements and must go
# through replace() rather than translate().
_PUNCT_MULTI = {"—": " - ", "．": ". ", "…": "..."}
_PUNCT_SINGLE = {
    "，": ",",
    "。": ".",
    "、": ",",
    "„": '"',
    "”": '"',
    "“": '"',
    "«": '"',
    "»": '"',
    "１": '"',
    "」": '"',
    "「": '"',
    "《": '"',
    "》": '"',
    "´": "'",
    "∶": ":",
    "：": ":",
    "？": "?",
    "！": "!",
    "（": "(",
    "）": ")",
    "；": ";",
    "–": "-",
    "～": "~",
    "’": "'",
    "━": "-",
    "〈": "<",
    "〉": ">",
    "【": "[",
    "】": "]",
    "％": "%",
    "►": "-",
}

try:  # optional dependency — not baked into the test container
    import ftfy  # type: ignore

    _HAS_FTFY = True
except ImportError:  # pragma: no cover
    _HAS_FTFY = False


def _ftfy_fix(batch: pd.Series) -> pd.Series:
    import ftfy  # local import: runs on executors

    return batch.map(lambda t: "" if t is None else ftfy.fix_text(t))


# chars that only plausibly appear as the Latin-1/cp1252 rendering of UTF-8
# lead/continuation bytes (Â Ã â plus the cp1252 window-punctuation block) —
# the trigger set for attempting an encoding reversal
_MOJIBAKE_HINT = re.compile("[ÂÃâ€œžˆ‹]")


def fix_encoding_text(text: str | None, max_passes: int = 3) -> str:
    """Stdlib reimplementation of the core ftfy ``fix_encoding`` move
    (ref:cleaners.py:5-8 wraps ftfy): when a string looks like UTF-8 bytes
    read back through cp1252/Latin-1, re-encode through that codec and decode
    as UTF-8.  A repair is accepted only if the full round-trip succeeds AND
    it reduces the count of mojibake hint characters (ftfy's "badness must
    decrease" rule); up to ``max_passes`` passes unwind double-encoding.
    ``None -> ""`` like C1.  Limitation vs real ftfy: a string mixing
    mojibake with codepoints outside both codecs is left unrepaired (no
    sloppy-codec segment fixing)."""
    if text is None:
        return ""
    for _ in range(max_passes):
        hints = len(_MOJIBAKE_HINT.findall(text))
        if not hints:
            break
        fixed = None
        for codec in ("cp1252", "latin-1"):
            try:
                candidate = text.encode(codec).decode("utf-8")
            except (UnicodeEncodeError, UnicodeDecodeError):
                continue
            if len(_MOJIBAKE_HINT.findall(candidate)) < hints:
                fixed = candidate
            break  # cp1252 encodable: don't also try latin-1 on the same text
        if fixed is None or fixed == text:
            break
        text = fixed
    return text


def _heuristic_fix(batch: pd.Series) -> pd.Series:
    return batch.map(fix_encoding_text)


def fix_utf8_encoding(col: Column) -> Column:
    """C1 — mojibake repair; ``None -> ""`` (ref:cleaners.py:5-8).

    Prefers real ftfy when importable; otherwise runs the stdlib
    :func:`fix_encoding_text` heuristic in an Arrow-batched UDF — the
    production path executes either way instead of silently degrading to a
    null-coalescing passthrough.  The UDF is built lazily so importing this
    module never requires an active SparkSession.
    """
    if _HAS_FTFY:
        return pandas_udf(_ftfy_fix, "string")(col)
    return pandas_udf(_heuristic_fix, "string")(col)


# The highest-frequency UTF-8-read-as-Latin-1/cp1252 mojibake sequences (the
# core of what ftfy repairs in web corpora).  Longest-first so compound
# sequences win before their prefixes.  All-native replace chain — the 100 TB
# path when the full ftfy heuristic isn't worth a Python roundtrip.
MOJIBAKE_MAP: dict[str, str] = {
    "â€™": "’",
    "â€œ": "“",
    "â€“": "–",
    "â€”": "—",
    "â€¦": "…",
    "â€˜": "‘",
    "Ã©": "é",
    "Ã¨": "è",
    "Ã§": "ç",
    "Ã±": "ñ",
    "Ã¼": "ü",
    "Ã¶": "ö",
    "Ã¤": "ä",
    "Ã³": "ó",
    "Ãº": "ú",
    "Ã­": "í",
    "Â«": "«",
    "Â»": "»",
    "Â°": "°",
}


def fix_mojibake_native(col: Column) -> Column:
    """Native-expression repair of the common mojibake sequences; ``None ->
    ""`` like C1.  Deterministic and engine-independent (oracle-safe), unlike
    the full ftfy heuristic."""
    out = F.coalesce(col, F.lit(""))
    for bad, good in MOJIBAKE_MAP.items():
        out = F.replace(out, F.lit(bad), F.lit(good))
    return out


def normalize_whitespace(col: Column) -> Column:
    """C2 — map the reference's unicode-space set to ASCII space
    (ref:cleaners.py:13-19)."""
    return F.translate(col, _WHITESPACE_CHARS, " " * len(_WHITESPACE_CHARS))


def normalize_punctuation(col: Column) -> Column:
    """C3 — 34 unicode→ASCII punctuation mappings (ref:cleaners.py:22-63).

    Multi-char replacements first (their outputs are ASCII, disjoint from the
    translate source set, so order is safe).
    """
    out = col
    for src, dst in _PUNCT_MULTI.items():
        out = F.replace(out, F.lit(src), F.lit(dst))
    src_chars = "".join(_PUNCT_SINGLE)
    dst_chars = "".join(_PUNCT_SINGLE.values())
    return F.translate(out, src_chars, dst_chars)


def remove_empty_lines(col: Column, strict_compat: bool = False) -> Column:
    """C4 — drop blank lines, re-join with \\n (ref:cleaners.py:66-73).

    The reference has a bug: its guard ``if text is None or isinstance(text,
    str)`` is always true so it always returns "" (SURVEY.md §7.3).  Default
    is the *intended* semantics; ``strict_compat=True`` reproduces the bug.
    """
    if strict_compat:
        return F.lit("")
    from chat_data_pipeline_spark.functions.text import STRIP_CLASS

    # "blank" = nothing but unicode whitespace (Python line.strip() == ""),
    # not just ASCII \s
    non_ws = STRIP_CLASS.replace("[", "[^", 1)
    lines = F.split(col, "\n")
    kept = F.filter(lines, lambda x: x.rlike(non_ws))
    return F.array_join(kept, "\n")


def clean_new_lines(col: Column) -> Column:
    """C5 — strip() then remove all newlines (ref:cleaners.py:76-79)."""
    return F.regexp_replace(strip(col), "\n", "")


# --- PII redaction (training-data extension; no reference counterpart) ------
# Patterns restricted to the Java-regex ∩ RE2 subset (no lookarounds) so the
# duckdb oracle can run the byte-identical regex.  Replacement order matters:
# emails first (their local part may contain digits a later phone pass would
# mangle), then IPv4 (so the phone pattern can't swallow dotted quads), then
# phone runs.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b(\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
    (r"\+?\d[\d().\s-]{6,}\d", "[PHONE]"),
]


def redact_pii(col: Column) -> Column:
    """Replace emails / IPv4s / phone-number runs with typed placeholders.

    A curation pipeline redacts rather than drops — the document stays useful
    while the identifier is gone.  Three chained native ``regexp_replace``
    calls fuse into the same codegen projection as the other cleaners.
    """
    out = col
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def dedup_paragraphs(col: Column) -> Column:
    """Intra-document paragraph dedup as a cleaner (training-data extension,
    no reference twin): first occurrence of each trimmed paragraph survives,
    blanks drop — template/boilerplate repetition removal that stacks with
    the reference cleaners in any YAML pipeline.  Pure narrow expression;
    see operators/span_dedup.dedup_paragraphs_col for the scale notes."""
    from chat_data_pipeline_spark.operators.span_dedup import dedup_paragraphs_col

    return dedup_paragraphs_col(col)


# decoded LAST so '&amp;lt;' yields the literal '&lt;' (single-decode)
_HTML_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
]


def strip_html(col: Column) -> Column:
    """Web-scrape cleaner: drop ``<script>``/``<style>`` blocks and HTML
    comments, strip the remaining tags, decode the common entities, collapse
    whitespace runs, trim.

    Deliberately regex-based (no parser dependency) and deliberately
    backreference-free: the duckdb oracle runs RE2, which has no
    backreferences, so script and style get their own patterns instead of
    ``</\\1>``.  Tags strip BEFORE entities decode, so text like
    ``&lt;b&gt;`` becomes a literal ``<b>`` in the output rather than being
    re-stripped — the standard single-decode order.  Whitespace collapse
    uses the explicit ``[ \\t\\n\\f\\r]`` class (Java ``\\s`` adds \\x0B,
    RE2's does not — the explicit class is identical in both engines).
    """
    out = col
    for pat in (
        # explicit class, not \s: Java \s includes \x0B, RE2's does not —
        # the same rule the whitespace-collapse below already follows
        r"(?is)<script\b[^>]*>.*?</script[ \t\n\f\r]*>",
        r"(?is)<style\b[^>]*>.*?</style[ \t\n\f\r]*>",
        r"(?s)<!--.*?-->",
        r"(?s)<[^>]*>",
    ):
        out = F.regexp_replace(out, pat, " ")
    for ent, ch in _HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, "[ \\t\\n\\f\\r]+", " "))


CLEANERS: dict[str, object] = {
    "fix_utf8_encoding": fix_utf8_encoding,
    "normalize_whitespace": normalize_whitespace,
    "normalize_punctuation": normalize_punctuation,
    "remove_empty_lines": remove_empty_lines,
    "clean_new_lines": clean_new_lines,
    "redact_pii": redact_pii,
    "dedup_paragraphs": dedup_paragraphs,
    "strip_html": strip_html,
}
