#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced through full materialization with the noop sink (write
path executes every operator; count() alone can let Catalyst prune work).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Headliners: relational core + the pipeline/dedup/vector/text surfaces.
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_forecast",
    "q7_nation_volume",
    "q9_product_profit",
    "orders_rollup",
    "events_hourly_agg",
    "events_top_users",
    "events_sessionize_batch",
    "events_asof_view",
    "events_funnel",
    "events_value_hist_quantiles",
    "events_error_context",
    "conversation_pairs",
    "conversation_chatml",
    "pipeline_output_preset",
    "filter_nsfw_score",
    "filter_char_repetition",
    "docs_normalize",
    "dedup_exact",
    "dedup_minhash",
    "dedup_minhash_md5",
    "dedup_ngram_jaccard",
    "embedding_neardup_pairs",
    "embedding_neardup_lsh",
    "ann_topk_cosine",
    "lang_id_counts",
    "quality_scores",
    "token_counts",
    "doc_fingerprints",
    "sample_grouped_users",
    "pipeline_lifecycle",
    # round-3 training-data extensions
    "docs_repetition_signals",
    "decontaminate_ngram",
    "pack_sequences_bins",
    "docs_redact_pii",
    "filter_domain_blocklist",
    "paragraph_dedup",
    "quality_classifier_scores",
    "chunk_documents_windows",
    "multimodal_resize",
    "q13_order_count_distribution",
    "q22_idle_rich_customers",
    "substring_dedup_docs",
    "sample_stratified_lang",
    "events_moving_average",
    # round-4 additions
    "docs_bm25_probe",
    "corpus_top_bigrams",
    "dedup_keep_best",
    "sample_temperature_lang",
    # round-5 additions
    "dedup_semantic",
    "paragraph_dedup_within",
    "decontaminate_bloom_report",
    "decontaminate_semantic",
    "ann_topk_pq",
    "dedup_cluster_histogram",
    "sample_weighted_chars",
    "docs_script_mix",
    "ann_topk_ivfpq",
    "docs_length_deciles",
    # round-6 additions
    "filter_gopher_quality",
    "docs_c4_clean",
    "dsir_select_en",
    "dedup_simhash_md5",
    "docs_bigram_lm",
    "dedup_soft_weights",
    "bpe_merges_corpus",
    "docs_ccnet_buckets",
    "embeddings_hard_negatives",
    "docs_strip_html",
    "corpus_diff_v2",
    "multimodal_image_dedup",
    "embedding_neardup_lsh_md5",
    "unigram_vocab_corpus",
    "corpus_datacard",
    # round-7 additions
    "ann_topk_pq_md5",
    "ann_topk_ivfpq_md5",
    "bpe_encode_corpus",
    "unigram_encode_corpus",
    "ann_topk_ivf_md5",
    "corpus_cms_heavy_hitters",
    "dedup_cross_corpus_md5",
    "sample_token_budget_lang",
    "sample_token_budget_scalable",
    "bpe_first_merge",
    "corpus_source_similarity",
    "bpe_fertility_by_lang",
    "corpus_hll_distinct",
    "corpus_mix_manifest",
    "split_leakage_audit",
    # round-11 additions
    "events_key_skew",
    "dedup_banding_calibration",
    "docs_quality_gate",
    "conversation_structure",
    "corpus_drift",
    # round-12 additions
    "ann_topk_ivf_persisted",
    "quality_classifier_train",
    "quality_classifier_train_scores",
    "docs_classifier_gate",
    "q12_late_shipments",
    "q14_promo_revenue",
    "q19_discounted_revenue",
    "docs_uniqueness_approx",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q8_market_share",
    "docs_bm25_indexed",
    # round-13 additions
    "docs_bm25_topk_indexed",
    "ann_ivf_drift_report",
    "classifier_eval_report",
    "docs_bm25_batch_serving",
    "q11_important_parts",
    "q20_top_suppliers_promo",
    "q21_waiting_suppliers",
    # round-14 addition: the drift-repair lifecycle (build→extend→rebuild→
    # report behind the build-once memo; best-of-3 reads the steady-state
    # report cost like the other serving rows)
    "ann_ivf_rebuild_report",
    # round-14: tombstone-delete serving on both persisted indexes
    # (build+delete behind the build-once memo; best-of-3 reads the served
    # probe cost WITH the tombstone anti-join in the plan)
    "docs_bm25_delete_serving",
    "ann_ivf_delete_serving",
    # round-14: hybrid lexical+vector serving — both arms' persisted-index
    # probes plus the query-sized RRF fusion in one number
    "docs_hybrid_rrf",
    # round-14: the persisted signature store's onboarding probe (store
    # builds behind the build-once memo; best-of-3 reads the steady-state
    # probe — one NEW-side fingerprint pass + one band semi-join)
    "dedup_onboarding_indexed",
    # round-14: text-index observability (reads the delete-serving
    # artifact's own aggregates; O(batches) output)
    "bm25_index_health",
    "dedup_store_health",
    # round-14: compressed ANN serving (codes-only store; build-once memo,
    # best-of-3 reads the pruned LUT probe)
    "ann_topk_ivfpq_persisted",
    # round-15: compressed-store delete serving (build+delete behind the
    # build-once memo; best-of-3 reads the LUT probe WITH the tombstone
    # anti-join in the plan — completes the delete-serving trilogy)
    "ann_ivfpq_delete_serving",
    # round-15: the maintenance decision (store builds behind the memo;
    # best-of-3 reads the O(batches) plan cost — the per-root price of a
    # fleet-wide maintenance sweep)
    "bm25_maintenance_plan",
    # round-15: SEMANTIC onboarding against the persisted SRP-LSH embedding
    # store (build+deliver+takedown behind the memo; best-of-3 reads the
    # steady-state probe — one new-side fingerprint pass + the bucket
    # collision join + the cosine verify)
    "embedding_onboarding_indexed",
    # round-16: the fifth store's health audit + the 3-kind fleet
    # maintenance sweep (both O(batches) reads over store artifacts behind
    # the build-once memo) and the compressed store's rebuild-from-source
    # serving row (rebuild chain memoizes; best-of-3 reads the steady-state
    # probe like the other serving rows)
    "neardup_store_health",
    "fleet_maintenance_plan",
    "ann_ivfpq_rebuild_report",
    # round-17: the compaction-hash matrix — the full build→extend→delete
    # →compact chain lands behind the build-once memo on every persisted
    # store, so best-of-3 reads the compacted single-batch root's serving
    # cost (which must match the uncompacted delete/onboarding rows')
    "bm25_compacted_serving",
    "ivf_compacted_serving",
    "ivfpq_compacted_serving",
    "dedup_compacted_onboarding",
    "neardup_compacted_onboarding",
    # round-17 second half: the crash-debris GC fleet row — builds its own
    # five-kind fleet behind the build-once memo, then best-of-3 reads the
    # per-run plant→sweep→report pass (FS metadata walks + the O(batches)
    # live_units sweep)
    "fleet_gc_report",
    # round-17 second half: the WordPiece greedy encode — like the BPE
    # fold encode, cost is one declarative scan per DISTINCT word behind
    # the shared reassembly pipeline
    "wordpiece_encode_corpus",
    # round-17 second half: snapshot serving — the file-level clone lands
    # behind the build-once memo; best-of-3 reads the snapshot root's
    # steady-state probe (which must match the source's delete-serving)
    "ivf_snapshot_serving",
    # round-17 second half: the WordPiece fairness audit — distinct-word
    # fold + broadcast re-join + map-side-combinable group aggregate
    "wordpiece_fertility_by_lang",
    # round-17 third session: the read-only structural fsck audit — pure
    # FS metadata walks over the five-kind fleet behind the build-once
    # memo, plus the same O(batches) live_units sweep the GC row pays
    "fleet_fsck_report",
    # round-17 third session: backup-restore serving — the loss+restore
    # chain lands behind the build-once memo; best-of-3 reads the
    # restored root's steady-state probe (which must match the source
    # delete-serving row's cost)
    "bm25_restore_serving",
]


# Scale-probe subset: the operators whose 100 TB posture rests on
# banded/bounded designs — measured at 1x and 10x to confirm near-linear
# wall-clock (see README "Empirical scaling probe").
SCALE_PROBE_QUERIES = [
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash_md5",
    "embedding_neardup_lsh",
    "dsir_select_en",
    "docs_bigram_lm",
    "bpe_encode_corpus",
    "filter_gopher_quality",
    # round-8 additions
    "dedup_cross_corpus_md5",
    "corpus_cms_heavy_hitters",
    "dedup_ngram_jaccard",
    "corpus_hll_distinct",
    "corpus_source_similarity",
    # round-10 addition: the batched BPE trainer — its iteration state is
    # the distinct-word table, so the probe's 10x-vocab corpus measures
    # exactly the claimed "cost scales with vocabulary" posture
    "bpe_merges_corpus",
    # round-11 additions: the clone-linear banding audit (the probe corpus
    # preserves within-replica clone structure, so this measures the rep
    # collapse directly), plus the events side — the probe corpus now
    # replicates events (10x the USERS at constant per-user density), so
    # the temporal family and the hot-key profile finally have 10x
    # measurements instead of plan-shape tests alone.
    "dedup_banding_calibration",
    "events_key_skew",
    "events_sessionize_batch",
    "events_funnel",
    "conversation_structure",
    "corpus_drift",
    # round-12 additions: the persisted-index lifecycle (build is the
    # corpus-sized pass — the probe measures that the build + the
    # partition-pruned probe together stay near-linear) and the fixed-point
    # trainer (one checkpointed feature pass + 4 driver-paced aggregations;
    # the probe corpus' 10x vocab also stresses the explode width)
    "ann_topk_ivf_persisted",
    "quality_classifier_train",
    # round-13 additions: the SERVING rows (build-once memo means rep 1
    # builds the artifact and the best-of-3 reads the steady-state serving
    # cost — the number that must stay near-flat at 100 TB), plus the
    # train-gate-evaluate confusion report
    "docs_bm25_topk_indexed",
    "docs_bm25_batch_serving",
    "ann_ivf_drift_report",
    "classifier_eval_report",
    # round-13: the relational side's first empirical exponents (the probe
    # corpus now replicates the TPC-H tables with referentially-consistent
    # key strides) — q8's 7-table snowflake, q11's HAVING-scalar, q20's
    # nested-agg semi-join, q21's semi+anti double correlation
    "q8_market_share",
    "q11_important_parts",
    "q20_top_suppliers_promo",
    "q21_waiting_suppliers",
    # round-14: delete serving — the probe measures that the tombstone
    # anti-join keeps the served probe near-flat when the corpus (and the
    # tombstone set, which grows with it) is 10x
    "docs_bm25_delete_serving",
    "ann_ivf_delete_serving",
    # round-14: hybrid serving — both arms' pruned probes + query-sized
    # fusion must stay near-flat at 10x corpus
    "docs_hybrid_rrf",
    # round-14: onboarding probe — the NEW-side fingerprint pass is the
    # corpus-sized stage; the store side ships signatures, never text
    "dedup_onboarding_indexed",
    # round-14: the compressed ANN probe must stay near-flat at 10x like
    # its full-precision sibling — same listing prune, 1/16th the bytes
    "ann_topk_ivfpq_persisted",
    # round-15: the compressed store's delete serving — near-flat at 10x
    # corpus AND 10x tombstones, like the BM25/IVF delete rows
    "ann_ivfpq_delete_serving",
    # round-15: semantic onboarding — the probe's corpus-sized stage is the
    # NEW side's single fingerprint pass (the reference side is persisted),
    # so the exponent should track the lexical onboarding row's ~0.16
    "embedding_onboarding_indexed",
    # round-16: the fleet maintenance decision must stay O(batches) — its
    # exponent should sit at ~0 like the single-store plan row (never reads
    # the corpus); the compressed rebuild's served probe must stay near-flat
    # at 10x corpus like the other IVF-PQ serving rows (the rebuild itself
    # is corpus-sized by design and memoized out of the steady-state number)
    "fleet_maintenance_plan",
    "ann_ivfpq_rebuild_report",
    # round-17: compacted-root serving — after the lifecycle memoizes, the
    # steady-state probe reads a SINGLE-batch base, so the exponent should
    # match (or beat) the multi-batch delete-serving rows' near-flat
    # numbers on the same 10x corpus + 10x tombstone axes; the dedup/
    # neardup onboarding twins likewise track their uncompacted siblings'
    # fingerprint-pass exponents
    "bm25_compacted_serving",
    "ivf_compacted_serving",
    "ivfpq_compacted_serving",
    "dedup_compacted_onboarding",
    "neardup_compacted_onboarding",
    # round-17 second half: the GC fleet row is FS-metadata + O(batches)
    # sweeps over five fixed-lifecycle stores — like the maintenance fleet
    # row its exponent should sit at ~0 (the builds scale, the memo hides
    # them; the sweep itself never reads the corpus)
    "fleet_gc_report",
    # round-17 second half: the WordPiece encode scales with the distinct-
    # word table like the BPE encode — the fixed-vocab twin isolates
    # 10x-bytes from 10x-vocabulary exactly as for that row
    "wordpiece_encode_corpus",
    # round-17 second half: the snapshot root's served probe must stay in
    # the same near-flat class as the source delete-serving row — the
    # clone preserves batch structure byte-for-byte, so any divergence
    # would mean the copy changed the plan
    "ivf_snapshot_serving",
    # round-17 second half: the fertility audit shares the encode row's
    # distinct-word scaling — its exponent should track
    # wordpiece_encode_corpus's near-flat number on both corpus axes
    "wordpiece_fertility_by_lang",
    # round-17 third session: the fsck fleet row is the GC row's cost
    # class — FS-metadata dir walks + the O(batches) live_units sweep;
    # its exponent should likewise sit at ~0
    "fleet_fsck_report",
    # round-17 third session: the restored root's served probe must stay
    # in the same class as the source delete-serving row — the restore
    # preserves batch structure and tombstones byte-for-byte, so any
    # divergence would mean the round trip changed the plan
    "bm25_restore_serving",
]

# The two operators whose r7 exponents (0.57 / 0.48) stood out get a second
# 10x measurement on an UNPREFIXED replica corpus (fixed vocab — their
# stages don't depend on the duplicate structure that prefixing preserves).
# The r8 experiment REFUTED the vocab-growth hypothesis (fixed-vocab
# exponents barely moved), which localized the real linear term: for the
# bigram LM it was a corpus-width sort-merge scoring join (fixed — the
# model table now broadcasts, exponent 0.54 -> the 0.19-0.30 band across
# r8 probe runs — local noise spans it); for the BPE encode
# it is the per-document output reassembly (inherent output-proportional
# work, and embarrassingly parallel).
FIXED_VOCAB_QUERIES = [
    "docs_bigram_lm",
    "bpe_encode_corpus",
    "wordpiece_encode_corpus",
    "wordpiece_fertility_by_lang",
]


def _build_scale_corpus(
    spark, src_dir: str, out_dir: str, factor: int, prefix_replicas: bool = True
) -> None:
    """Replicate documents/embeddings ``factor``x with fresh ids and a
    per-replica token/element transform that PRESERVES the within-replica
    duplicate profile while sharing no shingles/bigrams/buckets across
    replicas — so a 10x corpus has 10x the docs, 10x the vocab, and 10x
    the near-dup clusters (the honest scale-up, not a 90%-redundant blob):

    - documents: every word in replica i>0 is prefixed ``r{i}`` (token
      stats, lengths, and internal near-dup structure identical per
      replica; zero cross-replica shingle overlap);
    - embeddings: replica i circularly shifts the vector by i positions
      (norms and pairwise-within-replica cosines preserved; cross-replica
      cosines decorrelate).
    """
    import shutil

    from pyspark.sql import functions as F

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    docs = spark.read.parquet(f"{src_dir}/documents.parquet")
    # stride by max(id)+1, NOT count: sparse id spaces (max >= count) would
    # otherwise overlap replica ranges and silently corrupt the dedup probes
    stride = (docs.agg(F.max("doc_id")).first()[0] or 0) + 1
    parts = []
    for i in range(factor):
        rep = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * stride))
        if i and prefix_replicas:
            # the pipeline tokenizer's unicode word class, NOT \w (Java \w
            # is ASCII-only — non-ASCII words would keep their shingles and
            # break the zero-cross-replica-overlap premise)
            rep = rep.withColumn(
                "text", F.regexp_replace("text", r"([\p{L}\p{N}_]+)", f"r{i}$1")
            )
        parts.append(rep)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    emb = spark.read.parquet(f"{src_dir}/embeddings.parquet")
    vstride = (emb.agg(F.max("vec_id")).first()[0] or 0) + 1
    dim = len(emb.select("embedding").head()[0])
    parts = []
    for i in range(factor):
        rep = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * vstride))
        if i:
            shift = i % dim
            rep = rep.withColumn(
                "embedding",
                F.concat(
                    F.slice("embedding", shift + 1, dim - shift),
                    F.slice("embedding", 1, shift),
                ),
            )
        parts.append(rep)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")

    # events (r11): replica i shifts user_id/event_id by i·stride and keeps
    # timestamps — every user's timeline structure (sessions, funnels,
    # per-user event counts, hot-key profile) is preserved per replica, so
    # a 10x corpus has 10x the users with the SAME per-user density (the
    # honest scale-up for temporal/skew operators; replicating events ONTO
    # the same users would instead measure a 10x-denser timeline).
    ev = spark.read.parquet(f"{src_dir}/events.parquet")
    ustride = (ev.agg(F.max("user_id")).first()[0] or 0) + 1
    estride = (ev.agg(F.max("event_id")).first()[0] or 0) + 1
    parts = []
    for i in range(factor):
        parts.append(
            ev.withColumn("user_id", F.col("user_id") + F.lit(i * ustride))
            .withColumn("event_id", F.col("event_id") + F.lit(i * estride))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")

    # TPC-H side (r13): give the relational shapes their first empirical
    # exponents.  Replica i shifts every surrogate key by i·stride while
    # keeping all categorical/dimension attributes (status, priority,
    # brand/type/size, nationkey) — so per-replica join fan-outs and
    # predicate selectivities are preserved, dimension-filtered sets
    # (e.g. one region's suppliers) grow ×factor, and nation/region stay
    # the fixed 25/5-row dims they are at any scale factor.
    keys = {
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
    }
    tables = {t: spark.read.parquet(f"{src_dir}/{t}.parquet") for t in keys}
    # one stride per KEY DOMAIN (a fact's foreign key shifts by the SAME
    # stride as the key it references, so referential joins survive);
    # the stride covers the max across every column of the domain, so a
    # dangling foreign key can't collide into the next replica's range
    domain = {
        "o_orderkey": "orders", "l_orderkey": "orders",
        "o_custkey": "customers", "c_custkey": "customers",
        "l_partkey": "parts", "p_partkey": "parts",
        "l_suppkey": "suppliers", "s_suppkey": "suppliers",
    }
    dmax: dict[str, int] = {}
    for t, cols in keys.items():
        for c in cols:
            m = tables[t].agg(F.max(c)).first()[0] or 0
            d = domain[c]
            dmax[d] = max(dmax.get(d, 0), int(m))
    strides = {d: m + 1 for d, m in dmax.items()}
    for t, cols in keys.items():
        parts = []
        for i in range(factor):
            rep = tables[t]
            for c in cols:
                rep = rep.withColumn(
                    c, F.col(c) + F.lit(i * strides[domain[c]])
                )
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
    for t in ("nation", "region"):  # fixed dims: copy as-is
        spark.read.parquet(f"{src_dir}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{t}.parquet")


def scale_probe(factor: int = 10) -> None:
    """Time the scale-critical operators at 1x ($SPARK_GRAFT_SF_DIR) and at
    ``factor``x (replicated corpus in a temp dir); print one JSON line with
    per-query t1/tN, the ratio, and the scaling exponent
    log(tN/t1)/log(factor) — 1.0 = perfectly linear, <1 = sublinear
    (fixed job overhead amortizing), >1 = superlinear (a scale smell)."""
    import gc
    import math

    from chat_data_pipeline_spark import get_spark
    from chat_data_pipeline_spark.queries import REGISTRY

    spark = get_spark(
        app_name="cdp-scale-probe",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "64")),
    )
    big_dir = os.environ.get("SPARK_GRAFT_PROBE_DIR", "/tmp/cdp-scale-probe")
    _build_scale_corpus(spark, SF_DIR, big_dir, factor)
    # fixed-vocab twin corpus (unprefixed replicas) for the vocab-bounded
    # operators — isolates "10x the bytes" from "10x the vocabulary"
    fv_dir = big_dir + "-fixed-vocab"
    _build_scale_corpus(spark, SF_DIR, fv_dir, factor, prefix_replicas=False)

    def _best_of(fn, d: str, reps: int = 3) -> float:
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn(spark, d).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
            gc.collect()
        return round(best, 3)

    results: dict[str, dict[str, float]] = {}
    for name in SCALE_PROBE_QUERIES:
        q = REGISTRY[name]
        t = {
            "t1": _best_of(q.fn, SF_DIR),
            f"t{factor}": _best_of(q.fn, big_dir),
        }
        ratio = t[f"t{factor}"] / t["t1"] if t["t1"] else float("nan")
        results[name] = {
            **t,
            "ratio": round(ratio, 2),
            "exponent": round(math.log(ratio) / math.log(factor), 3),
        }
        if name in FIXED_VOCAB_QUERIES:
            tfv = _best_of(q.fn, fv_dir)
            rfv = tfv / t["t1"] if t["t1"] else float("nan")
            results[name][f"t{factor}_fixed_vocab"] = tfv
            results[name]["exponent_fixed_vocab"] = round(
                math.log(rfv) / math.log(factor), 3
            )
        print(f"# {name}: {results[name]}", file=sys.stderr)

    # r13: the BM25 index lifecycle measured in its TWO phases — the only
    # r12 heavyweight without an exponent.  The BUILD is the corpus-sized
    # stage (tokenize/explode/agg + the salted bucket-partitioned write);
    # the PROBE should stay near-flat: the probed term buckets prune at the
    # file listing and df/stats merge by integer addition, so probe cost
    # tracks the posting volume of 5 terms, not the corpus.
    import shutil

    from chat_data_pipeline_spark.operators import retrieval as RTOP

    probe_terms = ["join", "hash", "scan", "window", "sort"]

    def _bm25_phases(d: str) -> tuple[float, float]:
        docs = spark.read.parquet(f"{d}/documents.parquet").select("doc_id", "text")
        idx = os.path.join(big_dir + "-bm25idx")
        shutil.rmtree(idx, ignore_errors=True)
        tb = float("inf")
        for _ in range(2):  # overwrite-idempotent: rebuild in place
            t0 = time.time()
            RTOP.build_text_index(docs, idx)
            tb = min(tb, time.time() - t0)
        tp = float("inf")
        for _ in range(3):
            t0 = time.time()
            RTOP.bm25_topk_indexed(spark, idx, probe_terms, k=10).write.format(
                "noop"
            ).mode("overwrite").save()
            tp = min(tp, time.time() - t0)
        shutil.rmtree(idx, ignore_errors=True)
        gc.collect()
        return round(tb, 3), round(tp, 3)

    b1, p1 = _bm25_phases(SF_DIR)
    bN, pN = _bm25_phases(big_dir)
    for name, t1, tN in (
        ("docs_bm25_index_build", b1, bN),
        ("docs_bm25_index_probe", p1, pN),
    ):
        ratio = tN / t1 if t1 else float("nan")
        results[name] = {
            "t1": t1,
            f"t{factor}": tN,
            "ratio": round(ratio, 2),
            "exponent": round(math.log(ratio) / math.log(factor), 3),
        }
        print(f"# {name}: {results[name]}", file=sys.stderr)

    # r14: batch serving scaled in the QUERY axis — the 0.08 exponent above
    # is corpus-side only; this row fixes the corpus (1x index) and scales
    # the query TABLE 3 → 300.  The one-pass design prunes the listing on
    # the UNION of query terms (bounded by the term pool, not the query
    # count) and fans per-(doc, term) contributions out through a broadcast
    # query join, so the exponent in query count should stay well below 1.
    qidx = big_dir + "-bm25idx-qscale"
    shutil.rmtree(qidx, ignore_errors=True)
    RTOP.build_text_index(
        spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text"),
        qidx,
    )

    def _serve(n_q: int) -> float:
        rows = [
            (
                i,
                [
                    probe_terms[i % len(probe_terms)],
                    probe_terms[(i + 1) % len(probe_terms)],
                    probe_terms[(i + 2) % len(probe_terms)],
                ],
            )
            for i in range(n_q)
        ]
        # VALUES-backed local table (r17): the registered serving rows build
        # their query tables through values_df, so the probe should too — a
        # parallelize-backed qtab added a Python-worker round trip to every
        # timed serving action, measuring harness overhead instead of the
        # serving path (measurement fix, noted in OPTIMIZATION_r17.md).
        from chat_data_pipeline_spark.session import values_df

        qtab = values_df(spark, rows, "query_id long, terms array<string>")
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            RTOP.bm25_topk_indexed_batch(spark, qidx, qtab, k=10).write.format(
                "noop"
            ).mode("overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 3)

    tq1, tqN = _serve(3), _serve(300)
    qratio = tqN / tq1 if tq1 else float("nan")
    results["docs_bm25_batch_qscale"] = {
        "t_q3": tq1,
        "t_q300": tqN,
        "ratio": round(qratio, 2),
        "exponent_queries": round(math.log(qratio) / math.log(100), 3),
    }
    print(f"# docs_bm25_batch_qscale: {results['docs_bm25_batch_qscale']}", file=sys.stderr)
    shutil.rmtree(qidx, ignore_errors=True)

    print(
        json.dumps(
            {"metric": "scale_probe", "factor": factor, "sf": SF_DIR, "queries": results}
        )
    )
    spark.stop()


def time_queries(names: list[str], reps: int = 3) -> None:
    """Ad-hoc A/B timing of specific registry queries (same session/warmup
    discipline as the full bench): ``python bench.py --queries a,b [reps]``
    prints one JSON line {name: best_of_reps_sec}."""
    import gc

    from chat_data_pipeline_spark import get_spark
    from chat_data_pipeline_spark.queries import REGISTRY

    spark = get_spark(
        app_name="cdp-bench-adhoc",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32")),
    )
    out = {}
    for name in names:
        q = REGISTRY[name]
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            q.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
            gc.collect()
        out[name] = round(best, 3)
    print(json.dumps(out))
    spark.stop()


def main() -> None:
    from chat_data_pipeline_spark import get_spark
    from chat_data_pipeline_spark.queries import REGISTRY

    spark = get_spark(
        app_name="cdp-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "64")),
    )
    try:
        sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", "") or 0)
    except ValueError:
        sf = 0.0

    # warm table IO/JIT so the first query isn't charged for session warmup
    for t in ["lineitem", "orders", "customer", "part", "supplier", "nation",
              "region", "events", "documents", "embeddings"]:
        try:
            spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
        except Exception:
            pass

    # warm the Python UDF workers (one per core): first pandas-UDF stage in a
    # session otherwise pays ~5s of worker spawn + Arrow init, charged to
    # whichever query happens to run first
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _noop(s):
        return s

    n = spark.sparkContext.defaultParallelism
    spark.range(n * 10, numPartitions=n).select(_noop("id")).write.format(
        "noop"
    ).mode("overwrite").save()

    # three timed runs per query, report the min: steady-state cost with JIT
    # / page-cache first-touch amortized (inputs are NOT pre-cached — every
    # run includes the parquet scan).  Three, not two: on virtualized hosts
    # the first execution of a plan can pay 5×+ in codegen-compile + CPU
    # steal (q1 measured [5.5, 1.6, 1.2, 0.8, ...] on an idle VM), so
    # min-of-2 still charges cold costs to whichever query drew a noisy
    # second run.
    import gc

    # machine-calibration row (r16 verdict item 5): fixed synthetic
    # constant work — a seeded in-memory aggregate, no IO, no Python UDF —
    # whose wall time moves ONLY with machine load/CPU.  Two consecutive
    # rounds of cross-round absolute comparisons were invalidated by
    # shared-machine variance; future verdicts read per-row movement
    # AGAINST this factor instead of guessing (reference value on the
    # build machine, quiet: ~0.2-0.4 s; see README "Reading the bench").
    mf_best = float("inf")
    for _ in range(3):
        t0 = time.time()
        spark.range(0, 256_000_000, 1, int(CPUS)).selectExpr(
            # pmod keeps the running sum inside long range under ANSI mode
            "sum(pmod(xxhash64(id), 1000000007)) AS h", "avg(id % 997) AS a"
        ).write.format("noop").mode("overwrite").save()
        mf_best = min(mf_best, time.time() - t0)
    machine_factor = round(mf_best, 3)
    print(f"# machine_factor: {machine_factor:.3f}s", file=sys.stderr)

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        q = REGISTRY[name]
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            q.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        # release this query's localCheckpoint blocks before timing the next
        # one: checkpointed RDDs (dedup fingerprints, CC labels, postings)
        # unpersist only after the Python DataFrame refs are collected, and
        # with ~60 queries in one JVM the stale blocks otherwise stack up
        # into storage/GC pressure charged to whichever query runs later
        # (dedup_keep_best measured 7× its isolated time mid-bench).  Python
        # gc only — an explicit JVM System.gc() full-collection stalls the
        # executor threads for longer than the leak costs.
        gc.collect()
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    # BASELINE.md comparability: clean -> filter -> dedup throughput in rows/s
    # (the reference's own execution model is single-threaded pandas apply)
    extras: dict[str, float] = {}
    if "pipeline_lifecycle" in timings and timings["pipeline_lifecycle"] > 0:
        n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
        extras["lifecycle_rows_per_sec"] = round(
            n_docs / timings["pipeline_lifecycle"], 1
        )
    extras["machine_factor"] = machine_factor
    summary = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        **extras,
    }
    # full line first (human/pipe consumers), THEN the durable copy, THEN a
    # compact final line: the driver records only the last ~2KB of stdout,
    # and at 120+ queries the full map no longer fits — r13/r14 both landed
    # "parsed": null with the line's HEAD truncated away.  The last stdout
    # line now always parses on its own (same schema, the slowest-25 map +
    # a pointer), and the complete per-query map survives in the repo.
    print(json.dumps(summary))
    summary_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "BENCH_SUMMARY.json")
    with open(summary_path, "w") as fh:
        json.dump(summary, fh)
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:25]
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": slowest,
                "queries_truncated_to_slowest": len(slowest) < len(timings),
                "n_queries": len(timings),
                "full_map": "BENCH_SUMMARY.json",
                "sf": sf,
                **extras,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    if "--queries" in sys.argv:
        i = sys.argv.index("--queries")
        names = sys.argv[i + 1].split(",")
        reps = int(sys.argv[i + 2]) if len(sys.argv) > i + 2 else 3
        time_queries(names, reps)
    elif "--scale-probe" in sys.argv:
        scale_probe()
    else:
        main()
