"""Distributed BPE vocabulary learning (Sennrich, Haddow & Birch 2016).

The engine already counts tokens with a BPE-ish regex
(``functions/analysis.py``); this module LEARNS a merge table from the
corpus — the training half of a subword tokenizer, run as an iterative
Spark job.  The algorithm is the textbook one: represent every distinct
word as a character sequence (plus a terminal ``</w>`` marker), repeatedly
count adjacent symbol pairs weighted by word frequency, merge the most
frequent pair corpus-wide, repeat.

Scale shape (100 TB posture):

- Training state is the WORD-FREQUENCY table, not the corpus: one initial
  ``groupBy(word).count()`` collapses 100 TB of text into the distinct-word
  table (Zipf: orders of magnitude smaller), and every subsequent iteration
  touches only that table.
- Each iteration shuffles map-side-combined ``(pair, freq)`` partials —
  one row per (partition, distinct pair) — and collects exactly ONE row
  (the argmax pair) to the driver.  Driver state is the O(num_merges)
  merge list, never data.
- The merge application is a narrow per-row array fold (no shuffle);
  the word table is ``localCheckpoint``-ed each iteration so lineage stays
  O(1) instead of accumulating ``num_merges`` chained transforms.

Correctness evidence is three-way: a pure-Python reference implementation
(tests/test_bpe.py, mirroring the MinHash D1-D9 strategy), and — since
round 10 — a full DuckDB value-hash oracle that unrolls the batched loop
into per-round CTEs (queries._bpe_trainer_sql; a recursive CTE cannot
re-aggregate per level, but a fixed-num_merges unroll needs no such
recursion).

Unicode note: symbols come from ``substring`` (UTF-16 code units in the
JVM), so astral-plane characters would split into surrogate halves; the
word tokenizer feeding this (``\\w+``) keeps the practical corpus BMP-only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from chat_data_pipeline_spark.functions import text as T

END_OF_WORD = "</w>"


def word_frequencies(df: DataFrame, column: str) -> DataFrame:
    """``(word, freq)`` over the universal tokenizer (lowercased ``\\w+``)."""
    return (
        df.select(F.explode(T.words(F.col(column))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _initial_symbols(word: Column) -> Column:
    """Character array plus the terminal ``</w>`` marker symbol."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)), lambda i: F.substring(word, i, 1)
    )
    return F.concat(chars, F.array(F.lit(END_OF_WORD)))


def _apply_merge(syms: Column, left: str | Column, right: str | Column) -> Column:
    """Greedy left-to-right non-overlapping merge of adjacent (left, right)
    — one array fold, no shuffle.  No re-merge flag is needed: the merged
    symbol is strictly longer than ``left``, so it can never match ``left``
    again within the same pass (e.g. 'x x x' → 'xx x', matching the
    reference regex-replace semantics).  ``left``/``right`` are usually
    Python strings (the trainer's literals) but may be Columns — the
    encode path folds the merge table as data (:func:`_fold_syms`), and
    sharing THIS body is what keeps train and encode semantics from
    diverging."""
    if isinstance(left, str):
        left = F.lit(left)
    if isinstance(right, str):
        right = F.lit(right)
    merged = F.concat(left, right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == left)
            & (s == right),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _fold_syms(word: Column, merges: list[tuple[str, str]]) -> Column:
    """The encode-side merge chain: ``_initial_symbols`` folded through
    ``merges`` in rank order, with inapplicable merges PRUNED per word by a
    substring test before any fold runs.

    The prune is exact, not heuristic: symbols always partition
    ``word + '</w>'`` contiguously in order, so two symbols can only sit
    adjacent if their concatenation is a contiguous substring of that raw
    string — ``contains(raw, left+right)`` is a necessary condition for the
    merge to ever fire, and dropping a merge that fails it is the identity
    its fold would have computed.  (``\\w+`` words can't contain
    ``<``/``/``/``>``, so the marker can't false-match inside a word.)

    Construction: the merge list ships as ONE literal array of structs,
    ``filter`` keeps each word's applicable merges (rank order preserved —
    filter is order-stable), and a single nested ``aggregate`` replays
    :func:`_apply_merge`'s greedy pass once per SURVIVING merge.  Two
    reasons this shape and not a per-merge ``when(contains, fold, syms)``
    chain: (1) that chain embeds the running symbols subtree in BOTH
    branches, doubling the expression tree per merge — exponential
    analysis/codegen blowup, a planner hang long before vocab size matters;
    (2) higher-order folds are interpreted per element while ``contains``
    is a cheap scan, and on Zipf vocab most (word, merge) combinations
    miss — the fold count drops to the few applicable merges.  The
    expression here is CONSTANT-size in #merges (the table is one literal),
    so a 32k-merge production table plans as fast as a 20-merge demo."""
    raw = F.concat(word, F.lit(END_OF_WORD))
    table = F.array(
        *[
            F.struct(F.lit(l).alias("l"), F.lit(r).alias("r"))
            for l, r in merges
        ]
    ).cast("array<struct<l:string,r:string>>")
    applicable = F.filter(table, lambda m: F.contains(raw, F.concat(m["l"], m["r"])))
    return F.aggregate(
        applicable,
        _initial_symbols(word),
        lambda acc, m: _apply_merge(acc, m["l"], m["r"]),
    )


def _adjacent_pairs(syms: Column) -> Column:
    """``array<struct<left,right>>`` of adjacent symbol pairs — the pair
    candidates one trainer round counts.  Guard: Spark's ``sequence(2, n)``
    DESCENDS for n < 2, so fully-merged single-symbol words need the
    explicit empty-array branch."""
    return F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(2), F.size(syms)),
            lambda i: F.struct(
                F.element_at(syms, i - 1).alias("left"),
                F.element_at(syms, i).alias("right"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<left:string,right:string>>"))


def bpe_first_merge(df: DataFrame, column: str = "text") -> DataFrame:
    """The trainer's ROUND-1 argmax as a one-shot declarative plan:
    ``(left_sym, right_sym, pair_freq)`` — the pair ``learn_bpe_merges``
    would merge first, with the same (freq desc, left asc, right asc) tie
    rule.

    This is the SQL-expressible slice of the iterative trainer (merge #1
    sees only the initial character symbols, no prior merges), so it gives
    the loop a cross-engine value-hash oracle: the word-frequency table,
    symbol construction, pair explosion, weighting, and tie-breaking are the
    exact code paths round 1 executes (shared ``word_frequencies`` /
    ``_initial_symbols`` / ``_adjacent_pairs``); rounds 2+ differ only by
    ``_apply_merge`` folds, which are differentially pytest-verified."""
    words = word_frequencies(df, column).select(
        _initial_symbols(F.col("word")).alias("syms"), "freq"
    )
    pairs = words.select(F.explode(_adjacent_pairs(F.col("syms"))).alias("p"), "freq")
    return (
        pairs.groupBy(
            F.col("p.left").alias("left_sym"), F.col("p.right").alias("right_sym")
        )
        .agg(F.sum("freq").alias("pair_freq"))
        .orderBy(F.col("pair_freq").desc(), "left_sym", "right_sym")
        .limit(1)
    )


def _candidate_pool_size(k: int) -> int:
    """Candidate rows collected per batched round: enough headroom that the
    symbol-disjoint greedy usually fills K accepted merges, small enough
    that the collect stays O(K) driver bytes.  Part of the documented
    batched semantics — the pure-Python differential reference mirrors it."""
    return 4 * k + 4


def learn_bpe_merges(
    df: DataFrame,
    column: str = "text",
    num_merges: int = 50,
    min_frequency: int = 2,
    checkpoint_interval: int = 8,
    batch_k: int = 8,
) -> list[tuple[str, str]]:
    """Learn up to ``num_merges`` BPE merges from the corpus; returns the
    ordered merge list ``[(left, right), ...]``.

    Ties break on (smallest left, smallest right) so the result is
    deterministic and engine-independent.  Stops early when the best pair's
    corpus frequency drops below ``min_frequency``.

    ``batch_k``: merges accepted per Spark round (per pair-count job).
    ``batch_k=1`` is EXACTLY classic sequential BPE (one argmax per round).
    For ``batch_k=K>1`` each round collects the top ``_candidate_pool_size
    (K)`` pairs by (freq desc, left asc, right asc) and greedily accepts up
    to K pairs whose symbols are pairwise DISJOINT from every pair already
    accepted this round.  Disjointness makes the batch exact with respect
    to round-start counts: merging (a,b) cannot change the adjacency count
    of any pair touching neither a nor b, so each accepted merge is the
    true sequential argmax restricted to symbols untouched earlier in the
    round.  The only divergence from K=1 is that a pair CREATED by an
    in-round merge (one involving a just-merged symbol) must wait for the
    next round — the standard batched-BPE approximation; merge-list quality
    is empirically indistinguishable while driver round-trips drop K-fold.
    Both regimes are differentially verified against pure-Python references
    in tests/test_bpe.py.

    ``checkpoint_interval``: the word table re-materializes every N merges
    instead of every merge — an eager checkpoint is itself a job, and with
    per-iteration checkpoints the fixed job overhead (~0.1 s each in local
    mode) dominated the actual pair counting.  Between checkpoints the
    argmax job just recomputes ≤N narrow array folds over the word table,
    which is cheaper than N materializations; lineage stays O(N), not
    O(num_merges).  Measured at sf0.1/20 merges: interval 8 ≈ interval 20 <
    interval 4 — the recompute is cheap at these fold depths, so fewer
    checkpoints win.
    """
    if batch_k < 1:
        raise ValueError(f"batch_k must be >= 1, got {batch_k}")
    words = word_frequencies(df, column).select(
        _initial_symbols(F.col("word")).alias("syms"), "freq"
    )
    words = words.localCheckpoint(eager=True)

    merges: list[tuple[str, str]] = []
    since_checkpoint = 0
    while len(merges) < num_merges:
        k = min(batch_k, num_merges - len(merges))
        pairs = words.select(
            F.explode(_adjacent_pairs(F.col("syms"))).alias("p"), "freq"
        )
        candidates = (
            pairs.groupBy("p.left", "p.right")
            .agg(F.sum("freq").alias("pf"))
            .orderBy(F.col("pf").desc(), F.col("left"), F.col("right"))
            .limit(_candidate_pool_size(k))
            .collect()
        )
        if not candidates or candidates[0]["pf"] < min_frequency:
            break
        accepted: list[tuple[str, str]] = []
        used_syms: set[str] = set()
        for row in candidates:
            if len(accepted) >= k or row["pf"] < min_frequency:
                break
            left, right = row["left"], row["right"]
            if left in used_syms or right in used_syms:
                continue
            accepted.append((left, right))
            # the concatenated symbol is reserved too: a pre-existing 'ab'
            # pair candidate would otherwise also match NEW 'ab' symbols
            # produced by an in-round (a,b) merge, breaking the
            # round-start-count exactness guarantee
            used_syms.update((left, right, left + right))
        # candidates[0] always passes the disjointness check, so the round
        # is guaranteed ≥1 merge of progress
        for left, right in accepted:
            merges.append((left, right))
            words = words.select(
                _apply_merge(F.col("syms"), left, right).alias("syms"), "freq"
            )
        since_checkpoint += len(accepted)
        if since_checkpoint >= checkpoint_interval:
            words = words.localCheckpoint(eager=True)
            since_checkpoint = 0
    return merges


def bpe_merge_table(
    spark_df: DataFrame,
    column: str = "text",
    num_merges: int = 50,
    min_frequency: int = 2,
    checkpoint_interval: int = 8,
    batch_k: int = 8,
) -> DataFrame:
    """The learned merges as a DataFrame ``(rank int, left, right, merged)``
    — the artifact a tokenizer consumes, and the registered-query surface."""
    merges = learn_bpe_merges(
        spark_df, column, num_merges, min_frequency, checkpoint_interval, batch_k
    )
    spark = spark_df.sparkSession
    from chat_data_pipeline_spark.session import values_df

    return values_df(
        spark,
        [(i + 1, l, r, l + r) for i, (l, r) in enumerate(merges)],
        "rank int, left string, right string, merged string",
    )


def bpe_segment(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Segment one word with a learned merge-rank table — the standard
    lowest-rank-first encode loop (driver/test-side helper; the distributed
    encode path wraps this in :func:`bpe_encode_tokens`)."""
    syms = list(word) + [END_OF_WORD]
    while len(syms) > 1:
        ranked = [
            (ranks[(a, b)], i)
            for i, (a, b) in enumerate(zip(syms, syms[1:]))
            if (a, b) in ranks
        ]
        if not ranked:
            break
        _, i = min(ranked)
        syms[i : i + 2] = [syms[i] + syms[i + 1]]
    return syms


def encode_vocab_and_reassemble(
    df: DataFrame,
    column: str,
    id_col: str,
    out_col: str,
    count_col: str,
    encode_vocab,
) -> DataFrame:
    """The shared distinct-word encode shape (BPE fold encode and the
    unigram micro-Viterbi encode both run THIS code): tokenize with the
    universal ``\\w+`` tokenizer, encode each DISTINCT word once via
    ``encode_vocab(vocab_df) -> (word, __enc__ string, __n__ int)`` (the
    Zipf-bounded table; AQE broadcasts the re-join while it fits and falls
    back to a shuffle join above the threshold — deliberately unhinted so a
    100 TB \\w+ vocabulary cannot OOM the driver), then reassemble per
    document in word order — ``(id_col, out_col, count_col)`` with
    word-free docs carrying ('', 0).

    Reassembly shape (r11): ``posexplode_outer`` keeps word-free docs as a
    (NULL, NULL) row riding the SAME groupBy, so the output needs no
    restore-missing-docs left join — the previous plan broadcast the whole
    per-doc output table (output-sized, NOT model-sized: the one broadcast
    in this operator that could not survive 100x) back onto ``df``.
    Measured same-session at sf0.1: 1x 1.28 s -> 1.14 s, 10x 4.65 s ->
    1.42 s; scale-probe exponent 0.63 -> ~0.09."""
    words_pos = df.select(
        id_col, F.posexplode_outer(T.words(F.col(column))).alias("__pos__", "word")
    )
    encoded = encode_vocab(
        words_pos.select("word").where(F.col("word").isNotNull()).distinct()
    )
    return (
        words_pos.join(encoded, "word", "left")
        .groupBy(id_col)
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("word").isNotNull(),
                                F.struct("__pos__", "__enc__"),
                            )
                        )
                    ),
                    lambda x: x["__enc__"],
                ),
            ).alias(out_col),
            F.coalesce(F.sum("__n__"), F.lit(0)).cast("long").alias(count_col),
        )
    )


def bpe_encode_fold(
    df: DataFrame,
    merges: list[tuple[str, str]],
    column: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(id_col, bpe_text, n_bpe_tokens)`` — encode the corpus by applying
    ``merges`` IN RANK ORDER as chained greedy left-to-right array folds
    (:func:`_apply_merge`), the Sennrich apply-in-learned-order encode.

    This is the ORACLE-TWIN encode path: every fold is a pure Column
    ``aggregate`` a DuckDB ``list_reduce`` chain replays symbol-for-symbol,
    so with a FIXED merge table the full corpus encoding value-hashes
    cross-engine (the trainer's iterative argmax has no such twin — this
    closes the BPE family's driver-evidence gap).  ``bpe_encode_tokens``
    remains the production encoder (lowest-rank-first loop in an Arrow
    batch, equivalent output for merge tables learned by
    :func:`learn_bpe_merges` on its training corpus).

    Scale shape: the fold chain runs once per DISTINCT word (the
    Zipf-bounded vocab, exactly the trainer's state), not per occurrence —
    the shared :func:`encode_vocab_and_reassemble` pipeline — and each fold
    is substring-gated (:func:`_fold_syms`) so inapplicable merges cost a
    codegen'd scan, not an interpreted array fold.
    """
    syms: Column = _fold_syms(F.col("word"), merges)

    def encode_vocab(vocab: DataFrame) -> DataFrame:
        return vocab.select(
            "word",
            F.concat_ws(" ", syms).alias("__enc__"),
            F.size(syms).alias("__n__"),
        )

    return encode_vocab_and_reassemble(
        df, column, id_col, "bpe_text", "n_bpe_tokens", encode_vocab
    )


def bpe_fertility(
    df: DataFrame,
    merges: list[tuple[str, str]],
    column: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """Tokenizer-fertility audit: ``(group_col, n_words, n_bpe_tokens,
    fertility)`` — pieces-per-word under ``merges``, per language/source.

    Fertility (tokens emitted per word) is the standard check that a subword
    vocabulary serves every language fairly: a merge table learned on
    English-heavy text over-fragments other scripts, inflating their
    training cost per unit of content.  Integer-exact sums + one IEEE
    division keep it oracle-hashable.

    Piece-count convention (r9 verdict item, settled): a DANGLING terminal
    ``</w>`` — one no merge fused into a real piece — is a boundary
    artifact, not an emitted token, and is NOT counted (standard
    pieces-per-word, so a fully-unmerged 3-char word has fertility 3, not
    4); a ``</w>`` merged into its last piece (e.g. ``low</w>``) counts
    inside that piece as usual.  ``bpe_encode_corpus`` deliberately keeps
    the raw symbol count — its output IS the symbol sequence.

    Scale: the fold chain runs once per DISTINCT word (Zipf-bounded vocab),
    piece counts re-join occurrences via broadcast, and the final aggregate
    is group-cardinality-sized — no stage touches corpus-width data twice.
    """
    syms: Column = _fold_syms(F.col("word"), merges)
    toks = df.select(
        F.col(group_col), F.explode(T.words(F.col(column))).alias("word")
    )
    n_pieces = F.size(syms) - F.when(
        F.element_at(syms, -1) == F.lit(END_OF_WORD), 1
    ).otherwise(0)
    vocab = toks.select("word").distinct().select(
        "word", n_pieces.alias("__np__")
    )
    return (
        toks.join(F.broadcast(vocab), "word")
        .groupBy(group_col)
        .agg(
            F.count("*").alias("n_words"),
            F.sum("__np__").alias("n_bpe_tokens"),
        )
        .select(
            group_col,
            F.col("n_words").cast("long").alias("n_words"),
            F.col("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
            (F.col("n_bpe_tokens").cast("double") / F.col("n_words")).alias(
                "fertility"
            ),
        )
    )


def bpe_encode_tokens(
    df: DataFrame,
    merges: list[tuple[str, str]],
    column: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(id_col, bpe_tokens array<string>, n_bpe_tokens int)`` — encode every
    document's words with the learned merges.

    The merge table is tiny (O(vocab) strings), so it ships inside the UDF
    closure as a broadcast-sized literal; encoding is a narrow Arrow-batched
    pandas pass — zero shuffle, scales with the scan.
    """
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    # no inner annotations: under ``from __future__ import annotations``
    # they stringify and pyspark's typehint parser rejects them — the
    # explicit returnType carries the schema
    def _encode_batch(texts):
        import re

        word_re = re.compile(r"\w+", re.UNICODE)

        def enc(text):
            if not text:
                return []
            out = []
            for w in word_re.findall(text.lower()):
                out.extend(bpe_segment(w, ranks))
            return out

        return texts.map(enc)

    encode = pandas_udf(_encode_batch, "array<string>")

    toks = encode(F.col(column))
    return df.select(
        id_col,
        toks.alias("bpe_tokens"),
    ).withColumn("n_bpe_tokens", F.size("bpe_tokens"))
