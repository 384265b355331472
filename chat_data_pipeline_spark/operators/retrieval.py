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


# --- persisted BM25 text index (r12) -----------------------------------------
# bm25_scores rebuilds its postings per probe — correct for one-off mining,
# the wrong cost model for an index served many times at 100 TB.  The
# build-once posture of the ANN index (operators/similarity.py) applied to
# lexical retrieval, with one property the IVF index does not have:
# EXTENSIONS ARE EXACT.  Every BM25 ingredient is a per-doc fact (tf, dl) or
# an integer-additive global (df per term, n_docs, Σdl), so per-delivery
# batches merge on read to the bit-identical full-rebuild statistics —
# sum(df), sum(n_docs), sum(sum_dl) — and an extended-index probe equals a
# probe over a from-scratch build of the union.
#
#   <index_path>/stats/batch=<id>/     one row (n_docs, sum_dl) — BIGINT exact
#   <index_path>/dfreq/batch=<id>/bkt=<n>/     (term, df)
#   <index_path>/postings/batch=<id>/bkt=<n>/  (doc, term, tf, dl)
#
# `bkt` is the md5 term bucket (functions/scoring.token_bucket arithmetic, so
# the probe computes it DRIVER-side with hashlib and prunes at the file
# listing: a 5-term probe touches ≤5 of n_term_buckets partition dirs).

N_TERM_BUCKETS = 64


def _term_bucket_py(term: str, n_buckets: int = N_TERM_BUCKETS) -> int:
    import hashlib

    return int(hashlib.md5(term.encode()).hexdigest()[:2], 16) % n_buckets


def build_text_index(
    docs: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_id: int | str = "base",
    _clear: bool = True,
) -> None:
    """Build (or, via :func:`extend_text_index`, append to) the persisted
    BM25 index.  Idempotent: each artifact writes through the root
    (clearing stale extension batches on a rebuild) or overwrites its own
    ``batch=`` partition on extension replay."""
    from chat_data_pipeline_spark.functions.scoring import token_bucket

    spark = docs.sparkSession
    toks = docs.select(
        F.col(id_col).alias("doc"), T.words(F.col(text_col)).alias("__toks__")
    ).withColumn("dl", F.size("__toks__"))
    postings = (
        toks.select("doc", "dl", F.explode("__toks__").alias("term"))
        .groupBy("doc", "dl", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("bkt", token_bucket(F.col("term"), N_TERM_BUCKETS))
        .localCheckpoint(eager=False)
    )
    dfreq = postings.groupBy("bkt", "term").agg(F.count("*").alias("df"))
    stats = toks.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("sum_dl"),
    )
    batch = F.lit(str(batch_id))
    id_type = dict(docs.dtypes)[id_col]
    if _clear:
        # meta carries the id type so probes can supply EXPLICIT schemas —
        # no footer sampling at read time (on a million-file index, schema
        # inference would open an arbitrary footer per read)
        spark.createDataFrame(
            [(id_type, N_TERM_BUCKETS)], "id_type string, n_term_buckets int"
        ).repartition(1).write.mode("overwrite").parquet(f"{index_path}/meta")
    if _clear:  # base build: write through the root, clearing old batches
        postings.withColumn("batch", batch).repartition(F.col("bkt")).write.mode(
            "overwrite"
        ).partitionBy("batch", "bkt").parquet(f"{index_path}/postings")
        dfreq.withColumn("batch", batch).repartition(F.col("bkt")).write.mode(
            "overwrite"
        ).partitionBy("batch", "bkt").parquet(f"{index_path}/dfreq")
        stats.withColumn("batch", batch).write.mode("overwrite").partitionBy(
            "batch"
        ).parquet(f"{index_path}/stats")
    else:  # extension: overwrite only this delivery's partition
        postings.repartition(F.col("bkt")).write.mode("overwrite").partitionBy(
            "bkt"
        ).parquet(f"{index_path}/postings/batch={batch_id}")
        dfreq.repartition(F.col("bkt")).write.mode("overwrite").partitionBy(
            "bkt"
        ).parquet(f"{index_path}/dfreq/batch={batch_id}")
        stats.write.mode("overwrite").parquet(f"{index_path}/stats/batch={batch_id}")


def extend_text_index(
    docs: DataFrame,
    index_path: str,
    batch_id: int | str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Deliver one corpus batch into an existing index — EXACT: df / n_docs
    / Σdl are integer-additive and merge on read, so probes over base +
    extensions are bit-identical to a full rebuild over the union (tested).
    Replaying a batch id overwrites its own partitions (sketch-store
    idempotence)."""
    build_text_index(
        docs, index_path, text_col, id_col, batch_id=batch_id, _clear=False
    )


def bm25_topk_indexed(
    spark,
    index_path: str,
    query_terms: list[str],
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Load-and-probe BM25 over a persisted index: the probe terms' md5
    buckets become a LITERAL ``IN`` on the ``bkt`` partition column (static
    pruning at the listing — ≤ #terms of N_TERM_BUCKETS dirs touched), the
    batch dimension merges by integer addition, and the scoring arithmetic
    is :func:`bm25_scores`'s own — output bit-identical to the
    self-contained path over the same corpus."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    bkts = sorted({_term_bucket_py(t) for t in terms})
    meta = spark.read.parquet(f"{index_path}/meta").first()
    # explicit schemas (from meta): zero footer sampling — the pruned read
    # lists only the probed bkt dirs and opens nothing else
    p_schema = f"doc {meta.id_type}, dl int, term string, tf long"
    postings = (
        spark.read.schema(p_schema).parquet(f"{index_path}/postings")
        .filter(F.col("bkt").isin(bkts))
        .filter(F.col("term").isin(terms))
        .select(F.col("doc").alias(id_col), "dl", "term", "tf")
    )
    dfreq = (
        spark.read.schema("term string, df long")
        .parquet(f"{index_path}/dfreq")
        .filter(F.col("bkt").isin(bkts))
        .filter(F.col("term").isin(terms))
        .groupBy("term")
        .agg(F.sum("df").cast("long").alias("df"))
    )
    stats = (
        spark.read.schema("n_docs long, sum_dl long")
        .parquet(f"{index_path}/stats")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("sum_dl").cast("long").alias("__sum_dl__"),
        )
        # integer-exact Σdl / n — the identical double F.avg(dl) computes
        # (integer-valued double sums are exact below 2^53)
        .select(
            "n_docs",
            (F.col("__sum_dl__").cast("double") / F.col("n_docs").cast("double")).alias(
                "avgdl"
            ),
        )
    )
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
        postings.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("__nano__", F.round(contrib * 1e9).cast("long"))
    )
    return (
        scored.groupBy(id_col)
        .agg((F.sum("__nano__").cast("double") / 1e9).alias("__raw__"))
        .select(F.col(id_col), F.round("__raw__", 6).alias("bm25"))
    )
