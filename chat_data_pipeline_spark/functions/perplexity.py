"""F2 perplexity scoring (ref:filters.py:18-28, ref:kenlm_model.py:1-200).

The reference scores documents with a KenLM 5-gram LM after a cc_net-style
normalization (strip → optional lower/accent-strip → digit squash → unicode
punctuation replace → non-printing-char removal, ref:kenlm_model.py:144-184)
and SentencePiece tokenization.

KenLM + SentencePiece are heavyweight native deps and are NOT required by this
engine: when importable, ``KenlmScorer`` wraps them in an Arrow-batched pandas
UDF with lazy per-executor model init; otherwise ``StubScorer`` provides a
deterministic, fully JVM-side stand-in so pipelines and tests exercise the
same plan shape.

The normalizer itself is reproduced as native Column expressions — every step
is regexp/translate-able except accent stripping (NFD), which uses a small
stdlib-only pandas UDF when requested (default off, matching the reference's
``remove_accents=False`` default at ref:kenlm_model.py:82).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from chat_data_pipeline_spark.functions import text as T
from chat_data_pipeline_spark.functions.cleaners import normalize_punctuation

# chr(0..31) + chr(127..159) (ref:kenlm_model.py:70-73)
_NON_PRINTING_RE = "[\\x00-\\x1f\\x7f-\\x9f]"


def _strip_accents_batch(batch: pd.Series) -> pd.Series:
    import unicodedata

    def strip_accents(line: str | None) -> str | None:
        if line is None:
            return None
        nfd = unicodedata.normalize("NFD", line)
        return "".join(c for c in nfd if unicodedata.category(c) != "Mn")

    return batch.map(strip_accents)


def cc_net_normalize(
    col: Column,
    accent: bool = False,
    case: bool = False,
    numbers: bool = True,
    punct: int = 1,
) -> Column:
    """ref:kenlm_model.py:144-166 ``KenlmModel.normalize`` as a Column expr."""
    line = T.strip(col)
    if case:
        line = F.lower(line)
    if accent:
        line = pandas_udf(_strip_accents_batch, "string")(line)
    if numbers:
        line = F.regexp_replace(line, r"\d", "0")
    if punct == 1:
        line = normalize_punctuation(line)  # same mapping table, ref:kenlm_model.py:34-67
    elif punct == 2:
        from chat_data_pipeline_spark.functions.cleaners import (
            _PUNCT_MULTI,
            _PUNCT_SINGLE,
        )

        chars = "".join(list(_PUNCT_SINGLE) + list(_PUNCT_MULTI))
        line = F.translate(line, chars, "")
    line = F.regexp_replace(line, _NON_PRINTING_RE, "")
    # normalize() short-circuits empty post-strip lines (ref:kenlm_model.py:152-154)
    return F.when(F.length(T.strip(col)) == 0, T.strip(col)).otherwise(line)


class StubScorer:
    """Deterministic stand-in for KenLM: a smooth, content-sensitive pseudo
    perplexity.  ppl = 1 + (md5_32(normalized doc) % 10_000) — stable across
    runs/executors, JVM-native, spans the reference's default keep window
    [300, 3000] partially so filters actually drop rows in tests.  md5 (not
    crc32) so the duckdb oracle reproduces the score bit-for-bit — the
    whole cc_net normalize → hash → keep-window path gets a cross-engine
    value hash, not just a rowcount.
    """

    def score(self, col: Column) -> Column:
        normalized = cc_net_normalize(col)
        return (
            F.pmod(
                F.conv(F.substring(F.md5(normalized), 1, 8), 16, 10).cast("long"),
                F.lit(10_000),
            )
        ).cast("double") + F.lit(1.0)


def doc_perplexity(doc: str | None, model: object, sp: object) -> float:
    """ref:kenlm_model.py:122-142 arithmetic, factored out of the UDF closure
    so it is unit-testable against fake model/tokenizer objects (the real
    kenlm/sentencepiece natives are not installable in every environment):
    per-line log10-score over the sentencepiece-tokenized doc,
    ppl = 10^(−Σlog/Σ(len+1)), rounded to 1 decimal."""
    if doc is None:
        return float("nan")
    doc = " ".join(sp.encode_as_pieces(doc))
    log_score, length = 0.0, 0
    for line in doc.split("\n"):
        log_score += model.score(line)
        length += len(line.split()) + 1
    return round(10.0 ** (-log_score / length), 1)


class KenlmScorer:
    """Real KenLM scorer (requires kenlm + sentencepiece + model files).

    Scoring arithmetic lives in :func:`doc_perplexity`; models load lazily
    once per executor.
    """

    def __init__(self, kenlm_model_path: str, sp_model_path: str, **normalize_kwargs):
        self.kenlm_model_path = kenlm_model_path
        self.sp_model_path = sp_model_path
        self.normalize_kwargs = normalize_kwargs

    def _load_models(self):
        """Executor-side model init; overridable for fake-model testing."""
        import kenlm  # noqa: F401 — executor-side import
        import sentencepiece

        model = kenlm.Model(self.kenlm_model_path)
        sp = sentencepiece.SentencePieceProcessor()
        sp.load(self.sp_model_path)
        return model, sp

    def score(self, col: Column) -> Column:
        load = self._load_models

        def batch_ppl(batch: pd.Series) -> pd.Series:
            if not hasattr(batch_ppl, "_models"):
                batch_ppl._models = load()
            model, sp = batch_ppl._models
            return batch.map(lambda doc: doc_perplexity(doc, model, sp))

        normalized = cc_net_normalize(col, **self.normalize_kwargs)
        return pandas_udf(batch_ppl, "double")(normalized)


_DEFAULT_SCORER: object | None = None


def default_scorer() -> object:
    global _DEFAULT_SCORER
    if _DEFAULT_SCORER is None:
        _DEFAULT_SCORER = StubScorer()
    return _DEFAULT_SCORER


def perplexity_score(col: Column, model: object | None = None) -> Column:
    scorer = model if model is not None else default_scorer()
    return scorer.score(col)
