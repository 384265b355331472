"""Persisted MinHash-LSH signature store — incremental corpus-onboarding
dedup without re-fingerprinting the curated corpus.

The reference pipeline deduplicates within one in-memory run
(ref:minhash_deduplication.py:264-280); its cross-corpus analogue here
(:func:`dedup.cross_corpus_minhash_filter`) still re-computes the REFERENCE
side's shingles + signatures on every onboarding run — at 100 TB that
re-pays the full fingerprint pass of the curated corpus each time a fresh
crawl arrives.  This store persists the exploded ``(id, band, sig)``
postings once and lets every onboarding run probe them, giving the dedup
family the same build-once / serve-many lifecycle the BM25 and IVF indexes
already have — including the ledger, tombstones, compaction and crash
posture, which are shared code (operators/retrieval.py).

Layout::

    <root>/bands/batch=<id>/band=<b>/   (id, sig) posting rows
    <root>/meta/                        fingerprint params + column types
    <root>/batches/                     commit-ledger touch files
    <root>/tombstones/batch=<id>/       deleted ref ids (probe anti-join)

Exactness: probes against the store are BIT-IDENTICAL to the self-contained
cross-corpus filter over the union of delivered reference batches (tested
for both fingerprint families) because the store holds the exact band
signatures that filter computes — the meta pins every parameter (family,
shingle size, permutations, banding, seed), so a probe reconstructs the
identical fingerprint arithmetic for the NEW side.

Scale shape: one fingerprint pass per delivery (the thing this store
exists to avoid repeating), band-clustered salted writes (file count
O(bands × salt), write tasks scale with the salt), and a probe that is one
fingerprint pass over the NEW corpus + one (band, sig) semi-join — the
reference side ships signatures, never raw text.  There is no content
pruning at the listing (a probe must compare against every band by
definition); the partition-by-band layout keeps the semi-join's store-side
scan balanced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chat_data_pipeline_spark.operators.retrieval import (
    _committed_batches,
    read_meta_row,
    _fold_manifest_forward,
    _fs_for,
    _guard_batch_id_kind,
    _guard_delivery_id_type,
    _guard_spent_batch_id,
    _guard_tombstoned_delivery,
    _tombstoned_ids,
    cluster_for_partitioned_write,
    folded_clear,
    invalidate_index_meta,
    ledger_commit,
    ledger_reset,
    validate_batch_id,
)

SEED = 42


def _params_from_meta(meta) -> dict:
    return {
        "family": meta.family,
        "ngram_size": int(meta.ngram_size),
        "num_perm": int(meta.num_perm),
        "num_bands": int(meta.num_bands),
        "threshold": float(meta.threshold),
        "min_ngram_size": int(meta.min_ngram_size),
        "seed": int(meta.seed),
    }


def _bands_for(df: DataFrame, column: str, id_col: str, m: dict) -> DataFrame:
    """(id, band, sig) postings under the store's pinned fingerprint family.

    sha1 family: the all-MAX_HASH sentinel of shingle-less docs is excluded
    on BOTH sides (store write and probe) — one short reference doc would
    otherwise band-collide with every short new doc and silently subtract
    them all (the same guard :func:`dedup.cross_corpus_minhash_filter`
    documents).  The md5 family skips shingle-less docs by construction."""
    from chat_data_pipeline_spark.operators import dedup as D

    if m["family"] == "md5":
        fp = D.minhash_md5_fingerprints(
            df, column, id_col, m["ngram_size"], m["num_perm"], m["num_bands"]
        )
        return fp.select("id", F.posexplode("sigs").alias("band", "sig"))
    if m["family"] != "sha1":
        raise ValueError(f"family must be 'md5' or 'sha1', got {m['family']!r}")
    bands = D.minhash_bands(
        df,
        column,
        id_col,
        m["ngram_size"],
        m["num_perm"],
        m["threshold"],
        m["min_ngram_size"],
        m["seed"],
    )
    B, R = D.optimal_param(m["threshold"], m["num_perm"])
    hashranges = [(i * R, (i + 1) * R) for i in range(B)]
    sentinel = D.minhash_signature(
        "",
        m["num_perm"],
        m["ngram_size"],
        m["min_ngram_size"],
        D._permutations(m["num_perm"], m["seed"]),
        hashranges,
    )
    return bands.filter(~F.col("sig").isin([bytes(s) for s in sentinel]))


def _write_dedup_base(
    spark, index_path: str, bands: DataFrame, meta_row, clear_folded: bool = True
) -> None:
    """Base write with the shared crash posture: meta deleted FIRST (the
    whole (re)build window is meta-less — probes of a partial root fail
    loudly), tombstones cleared inside that window, band-clustered salted
    postings written through the root (clearing stale extension batches,
    static overwrite pinned), ledger reset, meta written LAST as the
    commit marker."""
    invalidate_index_meta(spark, index_path)
    fs, tpath, _jvm = _fs_for(spark, f"{index_path}/tombstones")
    fs.delete(tpath, True)
    if clear_folded:
        folded_clear(spark, index_path)
    cluster_for_partitioned_write(
        bands.withColumn("batch", F.lit("base")), ["band"], F.col("sig")
    ).write.mode("overwrite").option(
        "partitionOverwriteMode", "static"
    ).partitionBy("batch", "band").parquet(f"{index_path}/bands")
    ledger_reset(spark, index_path)
    from chat_data_pipeline_spark.session import values_df

    values_df(
        spark,
        [meta_row],
        "family string, ngram_size int, num_perm int, num_bands int, "
        "threshold double, min_ngram_size int, seed int, "
        "id_type string, sig_type string, text_col string, id_col string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_path}/meta")


def build_dedup_index(
    df: DataFrame,
    index_path: str,
    column: str = "text",
    id_col: str = "doc_id",
    family: str = "md5",
    ngram_size: int = 5,
    num_perm: int = 16,
    num_bands: int = 4,
    threshold: float = 0.7,
    min_ngram_size: int = 5,
    seed: int = SEED,
) -> None:
    """Fingerprint the reference corpus ONCE and persist its band postings.

    ``family='md5'`` uses the cross-engine md5 fingerprint family (every
    step DuckDB-expressible — the registered onboarding row value-hashes
    the full build→extend→delete→probe lifecycle); ``family='sha1'`` uses
    the production sha1/seeded-permutation family with datasketch-optimal
    (B, R) banding, so "near-duplicate" means exactly what the in-corpus
    :func:`dedup.minhash_dedup` means.  Idempotent overwrite, same crash
    posture as the other two persisted indexes."""
    spark = df.sparkSession
    m = {
        "family": family,
        "ngram_size": int(ngram_size),
        "num_perm": int(num_perm),
        "num_bands": int(num_bands),
        "threshold": float(threshold),
        "min_ngram_size": int(min_ngram_size),
        "seed": int(seed),
    }
    bands = _bands_for(df.select(id_col, column), column, id_col, m)
    id_type = dict(df.dtypes)[id_col]
    sig_type = "string" if family == "md5" else "binary"
    _write_dedup_base(
        spark,
        index_path,
        bands,
        (
            family, m["ngram_size"], m["num_perm"], m["num_bands"],
            m["threshold"], m["min_ngram_size"], m["seed"],
            id_type, sig_type, column, id_col,
        ),
    )


def extend_dedup_index(
    df: DataFrame,
    index_path: str,
    batch_id: int | str,
    column: str | None = None,
    id_col: str | None = None,
) -> None:
    """Deliver one curated batch's signatures into the store — the
    onboarding loop's write-back step: a crawl that SURVIVED the probe
    joins the reference side for the next crawl, fingerprinted once, here.
    Fingerprint params always come from meta (every delivery uses the
    exact arithmetic the base was built with); ``column``/``id_col``
    override the meta COLUMN NAMES when the delivered frame uses its own
    (config-driven callers pass theirs instead of pre-reading meta — one
    meta read per delivery, not two).  Replay overwrites its own
    partition and re-commits; a delivery containing a tombstoned id is
    refused until compaction (same contract as the other indexes)."""
    batch_id = validate_batch_id(batch_id)
    spark = df.sparkSession
    if _guard_spent_batch_id(spark, index_path, batch_id, "extension"):
        return  # folded replay: the base already holds this delivery
    _guard_batch_id_kind(
        spark, index_path, batch_id, "tombstones", "extension", "delete"
    )
    meta = read_meta_row(spark, index_path)
    column = column or meta.text_col
    id_col = id_col or meta.id_col
    _guard_delivery_id_type(df, id_col, meta.id_type, index_path)
    _guard_tombstoned_delivery(df.select(id_col), index_path, id_col)
    bands = _bands_for(
        df.select(id_col, column), column, id_col,
        _params_from_meta(meta),
    )
    cluster_for_partitioned_write(bands, ["band"], F.col("sig")).write.mode(
        "overwrite"
    ).option("partitionOverwriteMode", "static").partitionBy("band").parquet(
        f"{index_path}/bands/batch={batch_id}"
    )
    # commit marker LAST: a crashed delivery stays invisible to probes
    ledger_commit(spark, index_path, batch_id)


def delete_from_dedup_index(
    spark,
    index_path: str,
    ids: DataFrame,
    batch_id: int | str,
) -> None:
    """Tombstone-delete reference documents from the store — a taken-down
    doc must stop subtracting near-duplicates from future onboarding runs
    (its content is gone, so new near-copies are no longer duplicates of
    anything).  The store keeps per-id posting rows precisely so this is
    an id-level operation: one ledger-committed tombstone set that probes
    anti-join before the (band, sig) keys are formed; no additive state to
    adjust.  Compaction makes it physical and clears the set."""
    batch_id = validate_batch_id(batch_id)
    if _guard_spent_batch_id(spark, index_path, batch_id, "delete"):
        return  # folded replay: the victims are already physically gone
    _guard_batch_id_kind(
        spark, index_path, batch_id, "bands", "delete", "extension"
    )
    meta = read_meta_row(spark, index_path)
    committed = _committed_batches(spark, index_path)
    want = ids.select(
        F.col(ids.columns[0]).cast(meta.id_type).alias("doc")
    ).distinct()
    tomb = _tombstoned_ids(
        spark, index_path, meta.id_type, committed, exclude_batch=batch_id
    )
    if tomb is not None:
        want = want.join(tomb, "doc", "left_anti")
        want = want.localCheckpoint(eager=True)  # write overwrites a read root
    want.write.mode("overwrite").parquet(f"{index_path}/tombstones/batch={batch_id}")
    ledger_commit(spark, index_path, batch_id)


def _committed_bands(
    spark, index_path: str, meta, committed: list[str] | None = None
) -> DataFrame:
    """Committed, non-tombstoned (id, band, sig) store postings.

    ``committed`` lets the compactor pass its ONE ledger snapshot through
    (r15 review): a delivery committing between two independent ledger
    listings would otherwise be folded into the rewritten base without
    being marked spent in the folded manifest."""
    if committed is None:
        committed = _committed_batches(spark, index_path)
    ref = (
        spark.read.schema(f"id {meta.id_type}, sig {meta.sig_type}")
        .parquet(f"{index_path}/bands")
        .filter(F.col("batch").isin(committed))
    )
    tomb = _tombstoned_ids(spark, index_path, meta.id_type, committed)
    if tomb is not None:
        ref = ref.join(tomb.withColumnRenamed("doc", "id"), "id", "left_anti")
    return ref


def filter_against_dedup_index(
    spark,
    index_path: str,
    new_df: DataFrame,
    column: str | None = None,
    id_col: str | None = None,
) -> DataFrame:
    """Onboard a fresh corpus: drop NEW documents whose band signatures
    collide with ANY live reference signature in the store.  One
    fingerprint pass over the NEW side (the store side never re-computes —
    the point of persisting), one distinct over the store keys, one
    (band, sig) semi-join, one anti-join back — bit-identical to
    :func:`dedup.cross_corpus_minhash_filter` / ``_md5`` over the union of
    live reference batches (tested)."""
    meta = read_meta_row(spark, index_path)
    column = column or meta.text_col
    id_col = id_col or meta.id_col
    ref_keys = _committed_bands(spark, index_path, meta).select("band", "sig").distinct()
    nb = _bands_for(
        new_df.select(id_col, column), column, id_col, _params_from_meta(meta)
    )
    hits = (
        nb.join(ref_keys, ["band", "sig"], "left_semi")
        .select(F.col("id").alias(id_col))
        .distinct()
    )
    return new_df.join(hits, id_col, "left_anti")


def compact_dedup_index(spark, index_path: str, dst_index: str | None = None) -> None:
    """Fold base + committed deliveries into one fresh base, dropping
    tombstoned ids physically and clearing the tombstone set — probes
    BIT-IDENTICAL (the store is a plain posting set; compaction changes
    layout, not content).  ``dst_index=None`` compacts in place (eager
    checkpoint pins the postings before the overwrite); a 100 TB
    deployment passes ``dst_index`` and swaps probes over
    (``retrieval.swap_index_alias`` works here too — resolution only needs
    the root's meta)."""
    meta = read_meta_row(spark, index_path)
    committed = _committed_batches(spark, index_path)
    bands = _committed_bands(spark, index_path, meta, committed).select(
        "id", "sig", "band"
    )
    if dst_index is None:
        bands = bands.localCheckpoint(eager=True)
        dst_index = index_path
    # spent-id manifest BEFORE the rewrite (see retrieval.folded_record)
    _fold_manifest_forward(spark, index_path, dst_index, committed)
    _write_dedup_base(
        spark,
        dst_index,
        bands,
        (
            meta.family, int(meta.ngram_size), int(meta.num_perm),
            int(meta.num_bands), float(meta.threshold),
            int(meta.min_ngram_size), int(meta.seed),
            meta.id_type, meta.sig_type, meta.text_col, meta.id_col,
        ),
        clear_folded=False,
    )


def dedup_store_health(spark, index_path: str) -> DataFrame:
    """Per-delivery health report for the signature store — completing the
    observability trilogy (``retrieval.text_index_health``,
    ``similarity.ivf_index_drift_report``): one row per ledger-committed
    batch from the store's OWN artifacts, no corpus access.

    Columns: ``(batch, n_rows, n_ids, n_tombstones)`` — posting rows,
    distinct reference docs, and takedown ids per delivery.  A delete
    delivery reads as (0, 0, k).  Signals: ``n_rows / n_ids`` far from the
    banding width means shingle-less docs dominate a delivery (they carry
    no rows and can never subtract near-dups); a large tombstone count →
    compact, every probe pays the anti-join until then.

    Scale shape: one map-side-combined count agg over the postings plus an
    id-sized tombstone count; O(batches) output rows."""
    meta = read_meta_row(spark, index_path)
    committed = _committed_batches(spark, index_path)
    bands = (
        spark.read.schema(f"id {meta.id_type}, sig {meta.sig_type}")
        .parquet(f"{index_path}/bands")
        .filter(F.col("batch").isin(committed))
        .groupBy(F.col("batch").cast("string").alias("batch"))
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.countDistinct("id").cast("long").alias("n_ids"),
        )
    )
    fs, tpath, _jvm = _fs_for(spark, f"{index_path}/tombstones")
    if fs.exists(tpath):
        tombs = (
            spark.read.schema(f"doc {meta.id_type}")
            .parquet(f"{index_path}/tombstones")
            .filter(F.col("batch").isin(committed))
            .groupBy(F.col("batch").cast("string").alias("batch"))
            .agg(F.count("*").cast("long").alias("n_tombstones"))
        )
    else:
        from chat_data_pipeline_spark.session import values_df

        tombs = values_df(spark, [], "batch string, n_tombstones long")
    out = bands.join(tombs, "batch", "full_outer")
    return out.fillna(
        {"n_rows": 0, "n_ids": 0, "n_tombstones": 0}
    ).orderBy("batch")
