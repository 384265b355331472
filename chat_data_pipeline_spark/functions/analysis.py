"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's operator set (SURVEY.md §2), a 100 TB curation pipeline
needs cheap full-corpus text statistics.  Everything here is a pure native
Column expression — no Python in the hot path — so the whole module rides
whole-stage codegen and scales linearly with executors.

Operators:
- ``language_id``       n-gram/stopword-heuristic language guess (en/de/es/fr)
- ``quality_score``     composite [0,1] quality heuristic
- ``token_count_*``     whitespace + word-regex + BPE-ish token counts
- ``doc_fingerprint``   Karp-Rabin-style rolling hash over word tokens
- ``content_hash``      md5 content fingerprint (exact-dup key)

Each has an exact ANSI-SQL twin used by the duckdb oracle (see
``__spark_entry__.oracle_sql``), so definitions avoid engine-specific
constructs (regex stays in the shared Java/RE2 subset).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from chat_data_pipeline_spark.functions import text as T

# Tiny stopword sets — enough signal for a heuristic language ID over clean
# text.  Ordered dict fixes the deterministic tie-break priority.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was", "with", "on", "as", "are", "this"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "auf", "für", "von", "den", "im", "zu"],
    "es": ["el", "la", "los", "las", "de", "que", "y", "en", "un", "una", "es", "por", "con", "para", "del"],
    "fr": ["le", "la", "les", "des", "et", "est", "un", "une", "dans", "pour", "que", "qui", "sur", "pas", "avec"],
}

_PUNCT_CLASS = r"[.,;:!?'\"()\[\]{}<>~`*%&#@^_|\\/+=-]"
# BPE-ish pre-tokenizer: letter runs | single digits | punctuation runs.
# (GPT-2-style contraction handling omitted — needs lookahead, which RE2
# lacks; this subset is identical under Java regex and RE2.)
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+"


def stopword_hits(col: Column, lang: str) -> Column:
    """Count of word tokens that are stopwords of ``lang`` (with duplicates)."""
    sw = STOPWORDS[lang]
    return F.size(F.filter(T.words(col), lambda w: w.isin(sw)))


def language_id(col: Column) -> Column:
    """Deterministic argmax over per-language stopword hit counts.

    Tie-break follows STOPWORDS order (en > de > es > fr); zero hits
    everywhere → 'und' (undetermined).  The SQL oracle mirrors the CASE
    chain verbatim (over 4 per-language filter counts — same counts).

    Plan shape: ONE tokenize and ONE aggregate fold; each token takes 4
    hash-set probes (``isin`` over ≥10 literals compiles to InSet) and the
    four counts ride a single accumulator as two 32-bit fields per long —
    the naive form (4 × tokenize → filter(isin) passes, each re-evaluated
    by the when-chain) measured ~4× slower at sf0.1.  Counts saturate only
    past 2³² single-language stopword hits per document — unreachable.
    """
    en_w, de_w, es_w, fr_w = (STOPWORDS[l] for l in ("en", "de", "es", "fr"))
    zero = F.lit(0).cast("long")

    def hit(tok: Column, words: list[str], shift: int) -> Column:
        bump = F.lit(1 << shift).cast("long") if shift else F.lit(1).cast("long")
        return F.when(tok.isin(words), bump).otherwise(zero)

    packed = F.aggregate(
        T.words(col),
        F.struct(zero.alias("a"), zero.alias("b")),
        lambda acc, t: F.struct(
            (acc["a"] + hit(t, en_w, 0) + hit(t, de_w, 32)).alias("a"),
            (acc["b"] + hit(t, es_w, 0) + hit(t, fr_w, 32)).alias("b"),
        ),
    )

    low32 = F.lit((1 << 32) - 1).cast("long")

    def decide(p: Column) -> Column:
        en = p["a"].bitwiseAND(low32)
        de = F.shiftright(p["a"], 32)
        es = p["b"].bitwiseAND(low32)
        fr = F.shiftright(p["b"], 32)
        return (
            F.when((en == 0) & (de == 0) & (es == 0) & (fr == 0), F.lit("und"))
            .when((en >= de) & (en >= es) & (en >= fr), F.lit("en"))
            .when((de >= es) & (de >= fr), F.lit("de"))
            .when(es >= fr, F.lit("es"))
            .otherwise(F.lit("fr"))
        )

    # bind the aggregate ONCE (single-element transform) — the when-chain
    # references the counts many times, and an unbound reference would
    # re-run the whole fold per reference
    return F.get(F.transform(F.array(packed), decide), 0)


def token_count_whitespace(col: Column) -> Column:
    return F.size(T.whitespace_tokens(col))


def token_count_words(col: Column) -> Column:
    return T.word_count(col)


def token_count_bpe_ish(col: Column) -> Column:
    return F.regexp_count(col, F.lit(BPE_ISH_PATTERN))


def punct_ratio(col: Column) -> Column:
    n = F.length(col)
    punct = n - F.length(F.regexp_replace(col, _PUNCT_CLASS, ""))
    return F.when(n > 0, punct.cast("double") / n).otherwise(F.lit(0.0))


def alpha_ratio(col: Column) -> Column:
    n = F.length(col)
    alpha = F.length(F.regexp_replace(col, "[^A-Za-z]", ""))
    return F.when(n > 0, alpha.cast("double") / n).otherwise(F.lit(0.0))


def stopword_ratio(col: Column) -> Column:
    wc = T.word_count(col)
    hits = stopword_hits(col, "en")
    return F.when(wc > 0, hits.cast("double") / wc).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Composite [0,1] heuristic: length saturation, English stopword mass,
    low punctuation noise, alphabetic density.  Weights sum to 1; each term
    is clamped so adversarial outliers can't escape [0,1]."""
    wc = T.word_count(col).cast("double")
    length_term = F.least(wc / F.lit(100.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(col) * F.lit(3.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(col) * F.lit(4.0), F.lit(1.0))
    alpha_term = alpha_ratio(col)
    score = (
        F.lit(0.25) * length_term
        + F.lit(0.25) * stop_term
        + F.lit(0.25) * punct_term
        + F.lit(0.25) * alpha_term
    )
    return F.round(score, 6)


# 31/2^31-ish Karp-Rabin over word tokens: per-token contribution is the
# first-char codepoint ×131 plus the token length, folded mod 2_147_483_647.
_FP_MOD = 2_147_483_647
_FP_MULT = 1_000_003


def doc_fingerprint(col: Column) -> Column:
    tokens = T.words(col)
    return F.aggregate(
        tokens,
        F.lit(0).cast("long"),
        lambda acc, tok: (
            acc * F.lit(_FP_MULT)
            + F.ascii(tok) * F.lit(131)
            + F.length(tok)
        )
        % F.lit(_FP_MOD),
    )


def content_hash(col: Column) -> Column:
    """md5 of the raw text — the exact-duplicate key."""
    return F.md5(F.encode(col, "UTF-8"))


# --- URL / domain signals (C4 / RefinedWeb-style source filtering) ----------
# Java-regex ∩ RE2 patterns so the duckdb oracle runs them byte-identically.
URL_PATTERN = r"https?://[^\s]+"
_DOMAIN_PATTERN = r"^https?://([^/:?#\s]+)"


def extract_urls(col: Column) -> Column:
    """All http(s) URLs in the text, in order (array<string>)."""
    return F.regexp_extract_all(col, F.lit(URL_PATTERN), F.lit(0))


def url_domain(url: Column) -> Column:
    """Lower-cased host part of a URL ('' if the value isn't a URL)."""
    return F.lower(F.regexp_extract(url, _DOMAIN_PATTERN, 1))


def blocked_urls(col: Column, blocked: list[str]) -> Column:
    """The doc's links whose domain is on the blocklist, as an array —
    the ONE expression both the keep predicate and the dry-run score
    derive from, so ``keep ≡ (score == 0)`` holds by construction.

    The blocklist compiles to an InSet probe over the extracted domains —
    native, no join; for blocklists too big for a literal set, join the
    exploded domains against a broadcast blocklist table instead.  Extracted
    domains are lowercased, so the blocklist is case-folded to match (a
    mixed-case entry would otherwise never fire).
    """
    folded = [d.lower() for d in blocked]
    return F.filter(extract_urls(col), lambda u: url_domain(u).isin(folded))


def domain_blocklist_keep(col: Column, blocked: list[str]) -> Column:
    """Keep predicate: the text links to NO blocked domain (see
    :func:`blocked_urls` for the shared-expression rationale)."""
    return F.size(blocked_urls(col, blocked)) == 0


# --- script-mix ratios (round 5) -------------------------------------------

_LATIN_CLASS = "[A-Za-z]"
_CJK_CLASS = "[一-鿿]"
_DIGIT_CLASS = "[0-9]"


def script_ratio(col: Column, char_class: str) -> Column:
    """Fraction of characters matching ``char_class`` (0.0 for empty text).
    Native regexp_count — one codegen pass per class, no tokenizer."""
    n = F.length(col)
    return F.when(
        n > 0, F.round(F.regexp_count(col, F.lit(char_class)) / n, 6)
    ).otherwise(F.lit(0.0))


def script_mix(col: Column) -> list[Column]:
    """(latin_ratio, cjk_ratio, digit_ratio) — the multilingual-curation
    signal for routing docs to per-script pipelines and catching
    mixed-script spam (e.g. latin text stuffed with CJK SEO tokens).
    All-native; the three counts fuse into one whole-stage-codegen
    projection."""
    return [
        script_ratio(col, _LATIN_CLASS).alias("latin_ratio"),
        script_ratio(col, _CJK_CLASS).alias("cjk_ratio"),
        script_ratio(col, _DIGIT_CLASS).alias("digit_ratio"),
    ]
