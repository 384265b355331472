"""Corpus-level retrieval / lexical-statistics operators: BM25 scoring and
top-k n-gram heavy hitters.

The reference pipeline has no retrieval surface (SURVEY.md §2.7: its only
aggregations are describe() stats and per-user sampling groups) — but a
training-data curation stack needs lexical relevance scoring (mining docs
that match a probe query, e.g. targeted-domain upsampling as in DoReMi-style
recipes) and corpus vocabulary statistics (top n-grams drive tokenizer
training and boilerplate detection).  Both are public, textbook algorithms
(Robertson/Spärck Jones BM25; word-count heavy hitters).

Scale design (100 TB):

- ``bm25_scores``: the token explode is a narrow flatMap; the probe-term
  filter prunes it to query-relevant rows BEFORE any shuffle, so the
  (doc, term) aggregation shuffles only matching postings — corpus size
  drops out of the wide stages.  Document-frequency and corpus stats are
  term-cardinality-sized (≤ #probe terms) and broadcast; the final per-doc
  sum shuffles on doc_id only.  No all-pairs anywhere.
- ``top_ngrams``: per-partition partial aggregation (map-side combine)
  collapses the gram stream before the one vocabulary shuffle;
  ``orderBy(...).limit(k)`` compiles to TakeOrderedAndProject — per-partition
  top-k then a driver merge of k·partitions rows, never a global sort.

Float determinism for the oracle: per-(doc, term) BM25 contributions are
rounded to integer nanos and summed as longs, so the cross-term addition
order (which Spark and DuckDB pick differently) cannot change the result;
the displayed score rounds to 6 decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chat_data_pipeline_spark.functions import text as T


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every document against a fixed bag of query
    terms.  Returns ``(id_col, bm25)`` for documents matching ≥1 term.

    idf uses the standard "+1 inside the log" form
    ``ln(1 + (N - df + 0.5) / (df + 0.5))`` so scores are always positive.
    Tokenization is the pipeline-wide word tokenizer (functions/text.py
    WORD_PATTERN — identical in the DuckDB oracle).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    toks = docs.select(
        F.col(id_col), T.words(F.col(text_col)).alias("__toks__")
    ).withColumn("dl", F.size("__toks__"))
    stats = toks.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        toks.select(id_col, "dl", F.explode("__toks__").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    # tf feeds BOTH the df-count broadcast and the scoring probe; without a
    # checkpoint each consumer re-runs the corpus scan + explode.  The
    # postings are probe-term-pruned (tiny at any corpus size), so pinning
    # them is cheap and caps the plan at two corpus scans (stats + postings).
    tf = tf.localCheckpoint(eager=False)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    k1_l, b_l = F.lit(float(k1)), F.lit(float(b))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    contrib = (
        idf
        * F.col("tf")
        * (k1_l + 1.0)
        / (F.col("tf") + k1_l * (F.lit(1.0) - b_l + b_l * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("__nano__", F.round(contrib * 1e9).cast("long"))
    )
    return (
        scored.groupBy(id_col)
        .agg((F.sum("__nano__").cast("double") / 1e9).alias("__raw__"))
        .select(F.col(id_col), F.round("__raw__", 6).alias("bm25"))
    )


def top_ngrams(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 2,
    k: int = 20,
) -> DataFrame:
    """Corpus-wide top-``k`` word ``n``-grams by document-stream frequency,
    ties broken lexicographically (fully deterministic).  Returns
    ``(ngram, n_occurrences)`` sorted by (count desc, ngram asc).
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    ws = T.words(F.col(text_col))
    # sequence(1, 0) would produce a DESCENDING [1, 0] — guard short docs
    grams = F.when(
        F.size(ws) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - n + 1),
            lambda i: F.array_join(F.slice(ws, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("ngram").asc())
        .limit(k)
    )
