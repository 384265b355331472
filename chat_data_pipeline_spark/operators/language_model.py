"""Corpus-trained n-gram language-model scoring.

The reference's perplexity filter (ref:filters.py:18-28,
ref:kenlm_model.py:122-142) scores documents with a PRETRAINED native KenLM
— a heavyweight dependency this environment cannot install, so that path is
env-gated (``functions/perplexity.py``).  This module provides the same
quality-signal family with zero native deps: train an add-k-smoothed bigram
LM **on the corpus itself** (two map-side-combinable aggregations) and score
every document with pure Column math.  Self-trained corpus LMs are the
standard bootstrap when no external model is available (the cc_net paper
itself trains its LMs on the target corpus distribution), and an in-corpus
bigram score separates natural prose from gibberish/repetition exactly like
a pretrained model does — fluent text is made of bigrams the corpus has seen
often.

Scale shape (100 TB posture):

- Training is two ``groupBy().count()`` aggregations over the bigram
  postings — partial (map-side) combine means the shuffle carries one row
  per (partition, distinct bigram), never the raw postings.
- The probability dictionary (distinct bigrams ⋈ context totals) is
  aggregated data, orders of magnitude smaller than the corpus; the final
  scoring join BROADCASTS it when it fits (model-sized, the DSIR-table
  contract — AQE left a corpus-width sort-merge join otherwise, the r8
  scale probe's measured linear term).  Bigram types grow ~heaps-law with
  corpus size, so the broadcast is SIZE-GUARDED: above
  ``max_broadcast_bigrams`` distinct types the scorer falls back to the
  shuffle join (AQE skew-splits the Zipf head) instead of OOMing the
  driver/executors on the shipped model.
- No driver-side state: the vocabulary size enters the plan as a
  broadcast one-row cross join, so the whole operator is ONE lazy plan an
  external oracle can replay.

Float determinism for the oracle (the BM25 convention,
``operators/retrieval.py:25-28``): per-bigram ln-probabilities are rounded
to integer NANOS and summed as longs, so cross-engine addition order cannot
change any document's sum; the displayed average rounds to 6 decimals and
the perplexity is derived FROM the rounded average.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chat_data_pipeline_spark.functions import text as T


def bigram_postings(df: DataFrame, column: str, id_col: str) -> DataFrame:
    """``(id, w1, w2)`` — one row per adjacent token pair per document.

    Tokens are the engine's universal word tokenizer (lowercased ``\\w+``,
    ``functions/text.py``); documents with fewer than two tokens contribute
    no rows (they are re-attached with a left join by the scorer).
    """
    toks = df.select(F.col(id_col).alias("id"), T.words(F.col(column)).alias("t"))
    bigrams = F.when(
        F.size("t") >= 2,
        F.transform(
            F.sequence(F.lit(2), F.size("t")),
            lambda i: F.struct(
                F.element_at(F.col("t"), i - 1).alias("w1"),
                F.element_at(F.col("t"), i).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return toks.select("id", F.explode(bigrams).alias("b")).select(
        "id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2")
    )


def bigram_lm_scores(
    df: DataFrame,
    column: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
    broadcast_model: bool | None = None,
    max_broadcast_bigrams: int = 10_000_000,
) -> DataFrame:
    """Per-document average bigram log-probability under an add-``k``
    corpus-trained LM, plus the derived perplexity.

    P(w2 | w1) = (c(w1, w2) + k) / (c_ctx(w1) + k·V) where c_ctx(w1) is the
    number of bigram tokens with context w1 (= Σ_w2 c(w1, w2)) and V is the
    corpus vocabulary size — add-k (Lidstone) smoothing, the textbook
    formulation (Jurafsky & Martin ch. 3; Chen & Goodman 1998).

    Output: ``(id_col, n_bigrams int, avg_logprob double, ppl double)``.
    ``avg_logprob`` is the mean natural-log probability over the document's
    bigrams rounded to 6 decimals (higher = more fluent under the corpus);
    ``ppl = exp(-avg_logprob)`` rounded to 4, computed FROM the rounded
    average so both engines derive it from identical input.  Documents with
    fewer than two tokens keep a row with ``n_bigrams = 0`` and null scores.

    ``broadcast_model`` (default None = auto): the scoring join attaches
    each bigram occurrence's log-prob from the trained table, which is
    MODEL-sized (distinct bigram types — the same contract as the
    DSIR/classifier tables, which are collected literals).  Without the
    hint AQE kept a corpus-width sort-merge join even at tiny model sizes,
    which was the measured linear term in the 1×→10× scale probe
    (fixed-vocab 10×: 4.8 s → 1.5-2.0 s with the hint; exponent 0.54 → the
    0.19-0.30 band across r8 probe runs — local noise spans it).  BUT
    bigram types grow ~heaps-law with corpus size, so an unconditional
    broadcast becomes a driver/executor OOM exactly where the shuffle join
    survives.  Auto mode counts the trained table (one count over the
    already-checkpointed pair aggregation) and broadcasts only when it has
    ≤ ``max_broadcast_bigrams`` types (default 10M ≈ 0.5-1 GB serialized —
    comfortably under Spark's 8 GB broadcast ceiling with headroom for the
    Zipf-long string tails); larger models take the shuffle join, where
    AQE skew-splits the Zipf head.  Pass True/False to force either plan.
    """
    # materialized once (the S5 defragment pattern, same as the
    # ngram-jaccard postings): the posting feeds BOTH the pair-count
    # training aggregation and the final scoring join, and without the
    # checkpoint each consumer re-runs the tokenize→shingle→explode subtree
    # over the full corpus text
    posting = bigram_postings(df, column, id_col).localCheckpoint(eager=True)

    # vocabulary size as a broadcast one-row cross join — the scalar enters
    # the lazy plan instead of a driver-side collect (determinism convention;
    # same pattern as queries.py's quota cross joins)
    vocab = (
        df.select(F.explode(T.words(F.col(column))).alias("w"))
        .agg(F.count_distinct("w").alias("v"))
    )

    pairs = posting.groupBy("w1", "w2").agg(F.count("*").alias("c_pair"))
    if broadcast_model is None:
        # two-tier size guard.  Tier 1 is FREE (driver-side logical-plan
        # stats, no job): bigram types cannot exceed bigram occurrences,
        # which cannot exceed the input's decompressed characters / ~6 per
        # word — so an input whose scan stats sit under
        # max_broadcast_bigrams/4 BYTES cannot produce an oversized model
        # even at a pathological 10× parquet compression ratio (2.5 MB →
        # ≤ 25 MB text → ≤ ~4M types at the 10M default).  Tier 2, for
        # inputs past that bound, counts the trained table exactly — the
        # count rides the checkpoint's own materialization job as an
        # observed metric (the CC-loop trick; a separate count() re-ran a
        # whole job, measured +0.9 s at sf0.1), and the materialized table
        # then feeds ctx and probs.
        try:
            stats_bytes = int(
                df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
        except Exception:  # non-classic DataFrame / connect: no stats surface
            stats_bytes = -1
        if 0 <= stats_bytes <= max_broadcast_bigrams // 4:
            broadcast_model = True
        else:
            from pyspark.sql import Observation

            obs = Observation()
            pairs = pairs.observe(obs, F.count(F.lit(1)).alias("n_types"))
            pairs = pairs.localCheckpoint(eager=True)
            broadcast_model = int(obs.get["n_types"] or 0) <= max_broadcast_bigrams
    ctx = pairs.groupBy("w1").agg(F.sum("c_pair").alias("c_ctx"))
    probs = (
        pairs.join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.round(
                F.log(
                    (F.col("c_pair") + F.lit(float(k)))
                    / (F.col("c_ctx") + F.lit(float(k)) * F.col("v"))
                )
                * F.lit(1e9)
            )
            .cast("long")
            .alias("lp_nanos"),
        )
    )

    model = F.broadcast(probs) if broadcast_model else probs
    scored = (
        posting.join(model, ["w1", "w2"])
        .groupBy("id")
        .agg(F.sum("lp_nanos").alias("lp_sum"), F.count("*").alias("n_bigrams"))
    )
    avg_lp = F.round(F.col("lp_sum") / F.lit(1e9) / F.col("n_bigrams"), 6)
    return (
        df.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("int").alias("n_bigrams"),
            avg_lp.alias("avg_logprob"),
            F.round(F.exp(-avg_lp), 4).alias("ppl"),
        )
    )
