"""WordPiece greedy longest-match-first encoding (Wu et al. 2016,
"Google's Neural Machine Translation System", §3.2 — the tokenizer family
BERT popularized).

The third classic subword scheme next to this engine's BPE
(``operators/bpe.py``: apply learned merges in rank order) and unigram LM
(``operators/unigram_lm.py``: Viterbi-best segmentation under piece
log-probs): WordPiece segments each word GREEDILY — at every position
take the LONGEST vocabulary piece that matches, with non-initial pieces
carried under a ``##`` continuation prefix, and the whole word collapsing
to ``[UNK]`` when no piece matches at some position.  No reference parity
claimed (the reference pipeline has no tokenizers); engine-extension
surface like the BPE/unigram encoders, with the same oracle-twin
discipline: the encode is a pure Column fold a DuckDB ``list_reduce``
replays symbol-for-symbol, so under a FIXED piece vocabulary the full
corpus encoding value-hashes cross-engine.

Scale shape (100 TB posture): identical to the sibling encoders — the
greedy fold runs once per DISTINCT word (the Zipf-bounded vocabulary,
via the shared :func:`operators.bpe.encode_vocab_and_reassemble`
pipeline), never per occurrence; the piece table ships as literal arrays
inside one expression (constant-size plan, no join, no shuffle beyond
the distinct + re-join the shared shape already pays).

Unicode note: lengths/substrings are JVM UTF-16 vs DuckDB code points;
the ``\\w+`` word tokenizer keeps the practical corpus BMP-only (same
caveat as ``operators/bpe.py``), where the two agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

UNK = "[UNK]"

# Character-floor default vocabulary for the CLI `tokenize:` block: every
# ASCII ``\w`` word encodes (one piece per character), non-ASCII words hit
# [UNK] — the honest zero-training baseline; real deployments pass their
# own `pieces:` list.
_ASCII_WORD_CHARS = "abcdefghijklmnopqrstuvwxyz0123456789_"
DEFAULT_PIECES: list[str] = list(_ASCII_WORD_CHARS) + [
    "##" + c for c in _ASCII_WORD_CHARS
]


def _piece_buckets(
    pieces: list[str],
) -> tuple[dict[int, list[str]], dict[int, list[str]]]:
    """Split a WordPiece vocabulary into word-INITIAL and ``##``
    CONTINUATION pieces, bucketed by MATCH length (the ``##`` prefix is a
    position marker, not matched text).  Validates the vocabulary: empty
    pieces or a bare ``##`` would make the greedy scan loop forever."""
    init: dict[int, list[str]] = {}
    cont: dict[int, list[str]] = {}
    for p in pieces:
        if p.startswith("##"):
            body = p[2:]
            if not body:
                raise ValueError("'##' with no body is not a valid piece")
            cont.setdefault(len(body), []).append(body)
        else:
            if not p:
                raise ValueError("empty string is not a valid piece")
            init.setdefault(len(p), []).append(p)
    return init, cont


def wordpiece_tokens(word: Column, pieces: list[str]) -> Column:
    """``array<string>`` of WordPiece tokens for one (lowercased ``\\w+``)
    word — the greedy longest-match-first scan as ONE declarative fold.

    Construction: the scan state is ``struct(pos, toks, bad)`` folded over
    ``sequence(1, length(word))`` — every matching step consumes at least
    one character, so ``length(word)`` iterations always suffice and the
    tail iterations no-op behind the ``pos > length`` guard.  Each step
    probes the piece table longest-length-first: per match-length a pair
    of LITERAL arrays (initial / continuation pieces), an
    ``array_contains`` against ``substr(word, pos, L)``, and the
    position-1 switch between the two forms; the first hit wins
    (``coalesce`` over the length ladder).  A miss at any position sets
    ``bad`` and the word collapses to ``[UNK]`` — classic WordPiece
    whole-word fallback, not a partial emission.

    The expression is constant-size in the vocabulary (literal arrays),
    JVM-evaluated (no Python), and mirrors the DuckDB fold in
    ``queries._wordpiece_fold_sql`` CASE-for-CASE — keep the two in
    lockstep."""
    init, cont = _piece_buckets(pieces)
    lens = sorted(set(init) | set(cont), reverse=True)

    def _lit_arr(vals: list[str]) -> Column:
        return F.array(*[F.lit(v) for v in vals])

    def _step(acc: Column, _x: Column) -> Column:
        pos = acc["pos"]
        ladder = []
        for length in lens:
            sub = F.substr(word, pos, F.lit(length))
            hit_i = (
                F.array_contains(_lit_arr(init[length]), sub)
                if init.get(length)
                else F.lit(False)
            )
            hit_c = (
                F.array_contains(_lit_arr(cont[length]), sub)
                if cont.get(length)
                else F.lit(False)
            )
            ladder.append(
                F.when(F.when(pos == 1, hit_i).otherwise(hit_c), F.lit(length))
            )
        mlen = F.coalesce(*ladder, F.lit(None).cast("int"))
        matched = F.substr(word, pos, mlen)
        piece = F.when(pos == 1, matched).otherwise(
            F.concat(F.lit("##"), matched)
        )
        return (
            F.when(acc["bad"] | (pos > F.length(word)), acc)
            .when(
                mlen.isNull(),
                F.struct(
                    acc["pos"].alias("pos"),
                    acc["toks"].alias("toks"),
                    F.lit(True).alias("bad"),
                ),
            )
            .otherwise(
                F.struct(
                    (pos + mlen).alias("pos"),
                    F.concat(acc["toks"], F.array(piece)).alias("toks"),
                    F.lit(False).alias("bad"),
                )
            )
        )

    final = F.aggregate(
        F.sequence(F.lit(1), F.length(word)),
        F.struct(
            F.lit(1).alias("pos"),
            F.array().cast("array<string>").alias("toks"),
            F.lit(False).alias("bad"),
        ),
        _step,
    )
    return F.when(final["bad"], F.array(F.lit(UNK))).otherwise(final["toks"])


def wordpiece_fertility(
    df: DataFrame,
    pieces: list[str],
    column: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """Tokenizer-fairness audit under a fixed WordPiece vocabulary:
    ``(group_col, n_words, n_unk_words, n_pieces, fertility)`` — the
    pieces-per-ENCODABLE-word ratio plus the out-of-vocabulary word count
    per group.  The WordPiece-specific fairness signal is the UNK side:
    a vocabulary that merely over-fragments a language inflates its
    fertility (the BPE audit's metric), but one that cannot SPELL a
    language at all collapses its words to ``[UNK]`` — silent data loss
    the fertility ratio alone would hide, so UNK words are counted
    separately and excluded from the ratio (``fertility`` is NULL for a
    group with no encodable words).

    Same scale shape as ``operators/bpe.bpe_fertility``: the greedy fold
    runs once per DISTINCT word, the occurrence re-join carries only
    ``(word, n_pieces, is_unk)``, and the group aggregate is
    map-side-combinable."""
    from chat_data_pipeline_spark.functions import text as T

    docw = df.select(
        F.col(group_col).alias("__grp__"),
        F.explode(T.words(F.col(column))).alias("word"),
    )
    toks = wordpiece_tokens(F.col("word"), pieces)
    enc = (
        docw.select("word")
        .distinct()
        .select(
            "word",
            F.size(toks).alias("__np__"),
            # UNK is only ever emitted as the whole-word fallback, and
            # \w+ words can never literally equal the bracketed sentinel
            ((F.size(toks) == 1) & (F.element_at(toks, 1) == UNK)).alias(
                "__unk__"
            ),
        )
    )
    agg = (
        docw.join(enc, "word")
        .groupBy("__grp__")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.when(F.col("__unk__"), 1).otherwise(0)).alias(
                "n_unk_words"
            ),
            F.sum(F.when(F.col("__unk__"), 0).otherwise(F.col("__np__"))).alias(
                "n_pieces"
            ),
        )
    )
    encodable = F.col("n_words") - F.col("n_unk_words")
    return agg.select(
        F.col("__grp__").alias(group_col),
        F.col("n_words").cast("long").alias("n_words"),
        F.col("n_unk_words").cast("long").alias("n_unk_words"),
        F.col("n_pieces").cast("long").alias("n_pieces"),
        F.when(
            encodable > 0, F.col("n_pieces").cast("double") / encodable
        ).alias("fertility"),
    )


def wordpiece_encode(
    df: DataFrame,
    pieces: list[str],
    column: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(id_col, wp_text, n_wp_tokens)`` — encode the corpus under a fixed
    WordPiece vocabulary: universal ``\\w+`` tokenize, greedy
    longest-match each DISTINCT word once (:func:`wordpiece_tokens`),
    re-join occurrences and reassemble in word order via the shared
    distinct-word encode pipeline the BPE and unigram encoders also run
    (``operators/bpe.encode_vocab_and_reassemble``).  An un-encodable
    word contributes the single ``[UNK]`` token."""
    from chat_data_pipeline_spark.operators.bpe import (
        encode_vocab_and_reassemble,
    )

    toks = wordpiece_tokens(F.col("word"), pieces)

    def encode_vocab(vocab: DataFrame) -> DataFrame:
        return vocab.select(
            "word",
            F.concat_ws(" ", toks).alias("__enc__"),
            F.size(toks).alias("__n__"),
        )

    return encode_vocab_and_reassemble(
        df, column, id_col, "wp_text", "n_wp_tokens", encode_vocab
    )
