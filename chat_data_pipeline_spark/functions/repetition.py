"""Gopher-style repetition signals for training-data quality filtering.

Beyond the reference's filter set (SURVEY.md §2.4), large-scale corpus
curation needs the repetition heuristics popularized by the Gopher paper
(Rae et al. 2021, Appendix A) and reused by MassiveText/FineWeb-style
pipelines:

- duplicate line / paragraph fraction,
- duplicate line character fraction,
- top n-gram character fraction   (n = 2, 3, 4),
- duplicated n-gram character fraction (n = 5..10).

Scale design (100 TB): every signal is computed per-document with NO
shuffle — a document's lines and word n-grams never leave the partition
that scanned it.

- Line/paragraph fractions are native Column expressions (whole-stage
  codegen).  The char-fraction fold is O(lines²) interpreted HOF work, so
  it is only suitable for short documents; the Arrow-batched profile below
  is the hot path for full corpora.
- The n-gram char fractions need per-document frequency counting (argmax /
  count>1 over hundreds of grams); an interpreted HOF would be O(tokens²)
  per row, so they live in ONE Arrow-batched pandas UDF (`Counter` per
  doc, one pass per n).  Tokenization stays JVM-side (`T.words`) — Python
  only sees the token arrays.

Definitions (documented here because variants differ between papers; the
duckdb oracle in queries.py mirrors these exactly):

- ``dup_line_frac``       = (#lines - #distinct lines) / #lines
- ``dup_line_char_frac``  = Σ_distinct (count-1)·len / Σ_distinct count·len
- ``dup_para_frac``       = same as dup_line_frac over blank-line-separated
                            paragraphs
- ``top_{n}gram_char_frac`` = max_g count(g)·len(g) / len(' '.join(tokens))
  (the max of the product — tie-free, unlike argmax-then-measure)
- ``dup_{n}gram_char_frac`` = Σ_{g: count>1} count(g)·len(g) / len(' '.join)
  (overlapping occurrences counted in full, so values may exceed 1 on
  degenerate inputs — it is a score, not a proportion)

Blank lines/paragraphs (trim == '') are excluded before any counting.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StructField, StructType

TOP_NS = (2, 3, 4)
DUP_NS = (5, 6, 7, 8, 9, 10)

_PROFILE_FIELDS = [f"top_{n}gram_char_frac" for n in TOP_NS] + [
    f"dup_{n}gram_char_frac" for n in DUP_NS
]


def _nonblank(parts: Column) -> Column:
    return F.filter(parts, lambda x: F.trim(x) != F.lit(""))


def line_repetition_stats(col: Column) -> Column:
    """Struct(dup_line_frac, dup_line_char_frac, dup_para_frac) — native.

    The split arrays are bound ONCE via the single-element-transform wrapper
    (see spark-graft lesson: captured outer expressions re-evaluate per
    lambda element).  The duplicate-char fold iterates distinct lines and
    counts occurrences with an inner filter — O(distinct·lines) interpreted,
    fine for documents with tens of lines; use the corpus profile query
    shape for anything heavier.
    """
    lines = _nonblank(F.split(col, "\n"))
    paras = _nonblank(F.split(col, "\n\n"))

    def stats(s: Column) -> Column:
        lin = s["l"]
        par = s["p"]
        n_l = F.size(lin)
        n_p = F.size(par)
        dup_frac = lambda arr, n: F.when(  # noqa: E731
            n > 0, (n - F.size(F.array_distinct(arr))) / n
        ).otherwise(F.lit(0.0))
        dup_chars = F.aggregate(
            F.array_distinct(lin),
            F.lit(0).cast("long"),
            lambda acc, d: acc
            + (F.size(F.filter(lin, lambda x: x == d)) - 1) * F.length(d),
        )
        tot_chars = F.aggregate(
            lin, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        )
        return F.struct(
            dup_frac(lin, n_l).alias("dup_line_frac"),
            F.when(tot_chars > 0, dup_chars / tot_chars)
            .otherwise(F.lit(0.0))
            .alias("dup_line_char_frac"),
            dup_frac(par, n_p).alias("dup_para_frac"),
        )

    bound = F.array(F.struct(lines.alias("l"), paras.alias("p")))
    return F.get(F.transform(bound, stats), 0)


def _gram_fracs(
    toks: list[str],
    top_ns: tuple[int, ...] = TOP_NS,
    dup_ns: tuple[int, ...] = DUP_NS,
) -> list[float]:
    n_fields = len(top_ns) + len(dup_ns)
    joined_len = len(" ".join(toks)) if toks else 0
    out: list[float] = []
    if joined_len == 0:
        return [0.0] * n_fields
    for n in top_ns:
        grams = Counter(
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        )
        top = max((c * len(g) for g, c in grams.items()), default=0)
        out.append(top / joined_len)
    for n in dup_ns:
        grams = Counter(
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        )
        dup = sum(c * len(g) for g, c in grams.items() if c > 1)
        out.append(dup / joined_len)
    return out


def ngram_repetition_profile(
    tokens_col: Column,
    top_ns: tuple[int, ...] = TOP_NS,
    dup_ns: tuple[int, ...] = DUP_NS,
) -> Column:
    """Struct of top-``top_ns``-gram and dup-``dup_ns``-gram char fractions.

    ``tokens_col`` must be an ``array<string>`` of word tokens (produce it
    JVM-side with ``T.words`` so the regex never runs in Python).  Pass only
    the n values you gate on — each n costs one Counter pass per document.
    The UDF is built here, driver-side — a module-level ``@pandas_udf``
    would re-run its schema parse on worker import, where no SparkSession
    exists.
    """
    top_ns, dup_ns = tuple(top_ns), tuple(dup_ns)
    fields = [f"top_{n}gram_char_frac" for n in top_ns] + [
        f"dup_{n}gram_char_frac" for n in dup_ns
    ]
    schema = StructType(
        [StructField(f, DoubleType(), nullable=False) for f in fields]
    )

    def batch(tokens: pd.Series) -> pd.DataFrame:
        rows = [
            _gram_fracs(list(t) if t is not None else [], top_ns, dup_ns)
            for t in tokens
        ]
        return pd.DataFrame(rows, columns=fields)

    return pandas_udf(batch, schema)(tokens_col)


def profile_ns_for(signals: list[str]) -> tuple[tuple[int, ...], tuple[int, ...]]:
    """(top_ns, dup_ns) actually referenced by ``signals`` — lets callers
    build the narrowest profile their gate needs."""
    top = tuple(n for n in TOP_NS if f"top_{n}gram_char_frac" in signals)
    dup = tuple(n for n in DUP_NS if f"dup_{n}gram_char_frac" in signals)
    return top, dup


# Gopher Appendix-A thresholds (Rae et al. 2021, Table A1).
GOPHER_THRESHOLDS: dict[str, float] = {
    "dup_line_frac": 0.30,
    "dup_para_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
    "dup_6gram_char_frac": 0.14,
    "dup_7gram_char_frac": 0.13,
    "dup_8gram_char_frac": 0.12,
    "dup_9gram_char_frac": 0.11,
    "dup_10gram_char_frac": 0.10,
}


LINE_FIELDS = ("dup_line_frac", "dup_line_char_frac", "dup_para_frac")


def repetition_keep(
    line_stats: Column,
    profile: Column,
    thresholds: dict[str, float] | None = None,
    signals: list[str] | None = None,
) -> Column:
    """Gopher-style keep predicate over the two signal structs.

    ``signals`` restricts which fractions participate (default: all 12).
    The restriction prunes work only if the PROFILE was built narrow too —
    pair with ``profile_ns_for(signals)`` when constructing ``profile``
    (the UDF computes every field present in its schema regardless of which
    the predicate references).
    """
    th = dict(GOPHER_THRESHOLDS)
    if thresholds:
        th.update(thresholds)
    names = list(signals) if signals is not None else list(LINE_FIELDS) + _PROFILE_FIELDS
    keep = F.lit(True)
    for name in names:
        src = line_stats if name in LINE_FIELDS else profile
        keep = keep & (src[name] <= F.lit(th[name]))
    return keep
