"""Distributed unigram-LM subword vocabulary training (Kudo 2018,
"Subword Regularization", simplified Viterbi-EM variant).

The complement of ``operators/bpe.py``: where BPE grows a vocabulary by
merging, the unigram method starts from a LARGE seed vocabulary (frequent
substrings), fits piece probabilities by EM under a unigram segmentation
model, and prunes low-utility pieces until the target size remains.  This
module implements the standard simplification (hard-EM / Viterbi counts
instead of full forward-backward, count-proportional pruning instead of
likelihood-loss ranking) — deterministic, dependency-free, and exactly
reproducible by the pure-Python reference the tests diff against.

Distributed shape (the same contract as the BPE trainer):

- Corpus-scale work runs on the DISTINCT-WORD table (Zipf-bounded), built
  with one map-side-combinable aggregation.
- The MODEL is vocabulary-bounded: seed candidates are capped to
  ``seed_size`` rows, so the count table collected per EM round is small
  and the piece→logprob dict broadcasts to the E-step UDF in its closure.
- Each EM round = one Arrow-batched segmentation pass over the word table
  (narrow) + one explode/groupBy count aggregation (map-combined) + a
  driver-side M-step over ≤ seed_size entries.  Driver state never scales
  with the corpus.

Viterbi determinism: CPython float arithmetic in the UDF and in the local
reference is bit-identical (same interpreter), loop order is fixed, and
score ties resolve to the LONGEST last piece — so Spark and the reference
produce the same segmentations, counts, and final vocabulary.
"""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chat_data_pipeline_spark.operators.bpe import word_frequencies

MAX_PIECE_LEN = 8


def viterbi_segment(word: str, logp: dict[str, float]) -> list[str]:
    """Best segmentation of ``word`` under a unigram model: maximize the sum
    of piece log-probs.  DP left-to-right; at position i, candidate pieces
    are ``word[j:i]`` for i-MAX_PIECE_LEN <= j < i.  Ties resolve to the
    LONGEST last piece (smallest j wins on equal score).  Characters absent
    from the model segment as themselves with a large penalty so every word
    remains segmentable."""
    n = len(word)
    best = [0.0] + [-math.inf] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        for j in range(max(0, i - MAX_PIECE_LEN), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j == 1:
                    lp = -100.0  # unknown single char fallback
                else:
                    continue
            score = best[j] + lp
            # strict > with ascending j: the FIRST (smallest j = longest
            # piece) candidate wins ties
            if score > best[i]:
                best[i] = score
                back[i] = j
    out: list[str] = []
    i = n
    while i > 0:
        out.append(word[back[i] : i])
        i = back[i]
    return out[::-1]


def seed_vocab(words: list[tuple[str, int]], seed_size: int) -> dict[str, float]:
    """Initial model: all substrings up to MAX_PIECE_LEN weighted by word
    frequency, capped to the top ``seed_size`` by count (ties: shorter
    piece, then lexicographic), single chars always kept.  Log-probs are
    count-proportional."""
    counts: Counter[str] = Counter()
    chars: set[str] = set()
    for w, f in words:
        chars.update(w)
        for i in range(len(w)):
            for L in range(1, min(MAX_PIECE_LEN, len(w) - i) + 1):
                counts[w[i : i + L]] += f
    multi = [p for p in counts if len(p) > 1]
    multi.sort(key=lambda p: (-counts[p], len(p), p))
    keep = set(chars) | set(multi[: max(0, seed_size - len(chars))])
    total = sum(counts[p] for p in keep)
    return {p: math.log(counts[p] / total) for p in keep}


def _em_counts_local(
    words: list[tuple[str, int]], logp: dict[str, float]
) -> Counter:
    """Reference E-step (the tests' oracle and the M-step's shape): Viterbi
    counts over the word-frequency list."""
    c: Counter[str] = Counter()
    for w, f in words:
        for piece in viterbi_segment(w, logp):
            c[piece] += f
    return c


def _m_step(
    counts: Counter,
    logp: dict[str, float],
    vocab_size: int,
    shrink: float,
) -> dict[str, float]:
    """Prune toward ``vocab_size``: drop the lowest-count ``shrink``
    fraction of multi-char pieces (never below vocab_size, never single
    chars — unseen single chars keep a floor count so every word stays
    segmentable), then renormalize."""
    chars = {p for p in logp if len(p) == 1}
    multi = [p for p in logp if len(p) > 1]
    multi.sort(key=lambda p: (-counts[p], len(p), p))
    n_multi_target = max(vocab_size - len(chars), 0)
    n_keep = max(n_multi_target, int(len(multi) * (1.0 - shrink)))
    kept_multi = [p for p in multi[:n_keep] if counts[p] > 0]
    keep = chars | set(kept_multi)
    total = sum(max(counts[p], 1) for p in keep)
    return {p: math.log(max(counts[p], 1) / total) for p in keep}


def train_unigram_lm(
    df: DataFrame,
    column: str = "text",
    vocab_size: int = 512,
    seed_size: int = 4096,
    em_iters: int = 4,
    shrink: float = 0.25,
    max_seed_words: int = 250_000,
) -> dict[str, float]:
    """Learn a unigram subword vocabulary from the corpus; returns
    ``{piece: logprob}``.

    The final size is an UPPER-BOUNDED approximation of ``vocab_size``,
    not an exact target: each EM round prunes at most the ``shrink``
    fraction of multi-char pieces (plus zero-Viterbi-count drops), so with
    few ``em_iters`` the vocab can settle above ``vocab_size`` — from a
    seed of S multi-char pieces, the floor after N rounds is
    ``max(vocab_size, S·(1-shrink)^N)`` before count-zero pruning.  Raise
    ``em_iters`` (or ``shrink``) when the exact budget matters; the
    SentencePiece trainer makes the same trade (prune fraction per round,
    final size approximate until the last rounds).

    The word table stays distributed; the seed statistics come from the
    ``max_seed_words`` most frequent words (deterministic order: count
    desc, word asc) — the standard bounded-sample model build (the IVF
    centroid-training posture).  Each EM round segments the FULL word table
    in parallel and aggregates piece counts map-side.
    """
    # checkpoint FIRST: the seed collect and every EM round read the word
    # table, and an un-checkpointed plan would re-run the full corpus
    # tokenize/groupBy once for the seed and again for the checkpoint
    wf = word_frequencies(df, column).localCheckpoint(eager=True)
    seed_rows = [
        (r["word"], r["freq"])
        for r in wf.orderBy(F.col("freq").desc(), F.col("word"))
        .limit(max_seed_words)
        .collect()
    ]
    logp = seed_vocab(seed_rows, seed_size)

    for _ in range(em_iters):
        counts = _em_counts_spark(wf, logp)
        logp = _m_step(counts, logp, vocab_size, shrink)
    return logp


def _em_counts_spark(wf: DataFrame, logp: dict[str, float]) -> Counter:
    """Distributed E-step: Viterbi-segment every distinct word (Arrow
    batches, model in the UDF closure), explode the used pieces, and
    map-side-combine the counts; the collected result is vocabulary-bounded
    (≤ |model| rows)."""
    from pyspark.sql.functions import pandas_udf

    model = dict(logp)

    def seg_batch(words):  # no annotations: stringified hints break pandas_udf
        return words.map(lambda w: viterbi_segment(w, model))

    seg = pandas_udf(seg_batch, "array<string>")
    rows = (
        wf.select(seg(F.col("word")).alias("pieces"), "freq")
        .select(F.explode("pieces").alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").alias("c"))
        .collect()
    )
    return Counter({r["piece"]: r["c"] for r in rows})


def unigram_vocab_table(
    df: DataFrame,
    column: str = "text",
    vocab_size: int = 512,
    **kwargs,
) -> DataFrame:
    """The learned vocabulary as a DataFrame ``(piece, logprob)`` — the
    artifact a tokenizer consumes (6-dp rounding for display stability)."""
    logp = train_unigram_lm(df, column, vocab_size, **kwargs)
    spark = df.sparkSession
    from chat_data_pipeline_spark.session import values_df

    return values_df(
        spark,
        sorted((p, round(lp, 6)) for p, lp in logp.items()),
        "piece string, logprob double",
    )


def unigram_encode_tokens(
    df: DataFrame,
    logp: dict[str, float],
    column: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(id_col, pieces array<string>, n_pieces int)`` — Viterbi-encode
    every document's words with a trained model (narrow Arrow pass, zero
    shuffle; the model rides in the closure)."""
    from pyspark.sql.functions import pandas_udf

    model = dict(logp)

    def enc_batch(texts):  # no annotations: stringified hints break pandas_udf
        import re

        word_re = re.compile(r"\w+", re.UNICODE)

        def enc(text):
            if not text:
                return []
            out = []
            for w in word_re.findall(text.lower()):
                out.extend(viterbi_segment(w, model))
            return out

        return texts.map(enc)

    enc = pandas_udf(enc_batch, "array<string>")
    return df.select(id_col, enc(F.col(column)).alias("pieces")).withColumn(
        "n_pieces", F.size("pieces")
    )


# ---------------------------------------------------------------------------
# Integer-micro-nat Viterbi encode — the ORACLE-TWIN encode path
# ---------------------------------------------------------------------------

UNKNOWN_MICRO = -100_000_000  # the -100.0-nat unknown-single-char fallback


def viterbi_segment_micro(word: str, vocab_micro: dict[str, int]) -> list[str]:
    """:func:`viterbi_segment` with INTEGER micro-nat piece scores — the
    same DP (left-to-right, candidates ``word[j:i]`` for
    ``i-MAX_PIECE_LEN <= j < i``, ties to the longest last piece via strict
    ``>`` over ascending j, unknown single chars at ``UNKNOWN_MICRO``), but
    every score is an exact integer sum, so any engine replays it
    bit-for-bit — what buys the DuckDB oracle for the encode
    (float log-probs would make tie boundaries engine-dependent)."""
    n = len(word)
    best: list[int | None] = [0] + [None] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        for j in range(max(0, i - MAX_PIECE_LEN), i):
            piece = word[j:i]
            lp = vocab_micro.get(piece)
            if lp is None:
                if i - j == 1:
                    lp = UNKNOWN_MICRO
                else:
                    continue
            score = best[j] + lp  # type: ignore[operator]
            if best[i] is None or score > best[i]:
                best[i] = score
                back[i] = j
    out: list[str] = []
    i = n
    while i > 0:
        out.append(word[back[i] : i])
        i = back[i]
    return out[::-1]


def unigram_encode_micro(
    df: DataFrame,
    vocab_micro: dict[str, int],
    column: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(id_col, unigram_text, n_pieces)`` — Viterbi-encode the corpus
    under a FIXED integer-micro-nat vocabulary (the oracle-twin encode,
    closing the unigram family's driver-evidence gap the way
    ``bpe_encode_fold`` closed BPE's; the float-model production encoder is
    :func:`unigram_encode_tokens`).

    Scale shape: the DP runs once per DISTINCT word (Zipf-bounded vocab
    table, model in the closure) via the shared
    :func:`~chat_data_pipeline_spark.operators.bpe.encode_vocab_and_reassemble`
    pipeline (the BPE-fold shape).
    """
    from pyspark.sql.functions import pandas_udf

    from chat_data_pipeline_spark.operators.bpe import encode_vocab_and_reassemble

    model = dict(vocab_micro)

    def seg_batch(words):
        return words.map(
            lambda w: " ".join(viterbi_segment_micro(w, model)) if w else ""
        )

    seg = pandas_udf(seg_batch, "string")

    def encode_vocab(vocab: DataFrame) -> DataFrame:
        return vocab.select("word", seg(F.col("word")).alias("__enc__")).withColumn(
            "__n__", F.size(F.split("__enc__", " "))
        )

    return encode_vocab_and_reassemble(
        df, column, id_col, "unigram_text", "n_pieces", encode_vocab
    )
