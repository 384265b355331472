"""The driver contract itself: __spark_entry__ exposes entry/queries/
oracle_sql coherently."""

from __future__ import annotations

import __spark_entry__ as E


def test_oracle_keys_subset_of_queries():
    qs = E.queries()
    osql = E.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 50
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in osql.values())


def test_entry_runs_and_has_stable_schema(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert [f.name for f in df.schema.fields] == [
        "doc_id",
        "text",
        "lang",
        "source",
        "n_chars_clean",
    ]


def test_cli_main_end_to_end(spark, tmp_path):
    """argparse main(): config file in, parquet out."""
    from chat_data_pipeline_spark.cli import main

    conv = str(tmp_path / "conv.parquet")
    spark.createDataFrame(
        [(i, "s", [(f"question {i}", False, "User"), (f"answer {i % 5}!", True, "Assistant")]) for i in range(20)],
        "id long, source string, conversation array<struct<content string, do_train boolean, role string>>",
    ).write.parquet(conv)
    out = str(tmp_path / "out.parquet")
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        f"datasets:\n  - path: {conv}\noutput_path: {out}\nseed: 42\n"
        "response:\n  cleaners: [normalize_whitespace]\n  filters: []\n"
        "  deduplication:\n    do_deduplication: true\n"
        "    minhash_config: {ngram_size: 2, num_perm: 32, threshold: 0.7, min_ngram_size: 2}\n"
        "instruction:\n  cleaners: []\n  filters: []\n"
        "  deduplication: {do_deduplication: false}\n"
    )
    main(["--config_path", str(cfg)])
    result = spark.read.parquet(out)
    assert result.count() == 5  # 20 pairs dedup to 5 distinct answers
    assert {f.name for f in result.schema.fields} >= {"conversation", "source"}


def test_correctness_window_is_all_oracle_backed():
    """The driver hash-checks only the first 50 registry entries; every one of
    them must carry an oracle, with the rows-only queries rotated to the tail
    (round-2 verdict task #1)."""
    from chat_data_pipeline_spark.queries import REGISTRY

    window = list(REGISTRY)[:50]
    # the two sanctioned rows-only window entries (r5 verdict item 2): PQ /
    # residual-PQ approximate scores have no SQL twin, but they were the only
    # registered queries with zero driver evidence, so they hold window rows
    # (rows-only signal beats no signal).  dedup_semantic LEFT this set in
    # round 6: its sign-quantized planted-clone redesign gave it a real
    # survivor-set oracle (r5 verdict item 5).
    # round 6 added bpe_merges_corpus to this set (iterative per-round
    # argmax, then oracle-less); round 8 removed ann_topk_pq/ann_topk_ivfpq
    # (hash-verified by their literal-codebook md5 twins).  Round 10 closes
    # the set ENTIRELY: the batched trainer gained a full unrolled-CTE
    # DuckDB oracle (_bpe_trainer_sql), so every window row — and in fact
    # every registry row the driver can reach — is now value-hash-checked.
    rows_only_allowed: set[str] = set()
    assert all(
        REGISTRY[n].oracle is not None or n in rows_only_allowed for n in window
    )
    # queries still awaiting their first driver hash-verification + standing
    # window residents; test_correctness_window_covers_unverified_queries
    # derives the oracle invariant dynamically from the CORRECTNESS files
    must_be_windowed = {
        "pipeline_lifecycle", "dedup_semantic", "dedup_simhash_md5",
        "sample_token_budget_scalable", "bpe_first_merge",
        "corpus_source_similarity", "bpe_fertility_by_lang",
        "corpus_hll_distinct", "q9_product_profit", "split_leakage_audit",
        # round-11 rule-1 entries: the NEW events_key_skew hot-key profile
        # displaces events_value_hist_quantiles (r10-green, sketch region
        # untouched) and the NEW dedup_banding_calibration audit displaces
        # dedup_keep_best (r10-green, keep-best region untouched)
        "events_key_skew", "dedup_banding_calibration",
        # ...and the NEW docs_quality_gate ingest-gate displaces
        # sample_temperature_lang (r10-green, temperature region untouched
        # by the round's weighted_sample_topk-only sampling.py change)
        "docs_quality_gate",
        # ...and the NEW conversation_structure QA displaces
        # docs_ccnet_buckets (r10-green, language_model.py untouched)
        "conversation_structure",
        # ...and the NEW corpus_drift snapshot-composition audit displaces
        # dedup_soft_weights (r10-green, soft-weights region untouched)
        "corpus_drift",
        "docs_bigram_lm", "dedup_cross_corpus_md5",
        "embeddings_hard_negatives", "filter_repetition",
        "multimodal_image_dedup", "dedup_simhash",
        # round-11 staleness rotation (the r10 verdict's top item, the
        # standing README queue executed): the 19 tail entries last
        # hash-verified in rounds 2-3 re-earn driver hashes.  Rotated out to
        # make room (each r10-green, implementing region untouched in r11):
        # q1/q7/q6/q18, users_intersect, orders_running_total,
        # events_pivot_types, docs_normalize, docs_clean_new_lines,
        # filter_word_count/lowercase/empty/ethics_harsh,
        # dedup_ngram_jaccard, dedup_minhash_md5, conversation_dedup,
        # embedding_neardup_lsh_md5, ann_topk_pq_md5, ann_topk_ivfpq_md5
        "lineitem_unpivot_measures", "events_json_extract",
        "q3_shipping_priority", "orders_rollup", "events_top_users",
        "q10_returned_revenue", "events_type_cube", "events_value_quantiles",
        "events_sessionize_batch", "customers_without_orders", "token_counts",
        "quality_scores", "q5_local_supplier_volume", "events_error_context",
        "q4_order_priority", "q2_min_cost_supplier", "docs_remove_empty_lines",
        "events_grouping_sets", "doc_fingerprints",
        # round-11 changed-code queries (rotation rule 2): the encode
        # reassembly moved to the posexplode_outer shape (bpe.py — carries
        # bpe_encode_corpus AND the shared-path unigram_encode_corpus, which
        # re-entered displacing dedup_cluster_histogram), the trainer
        # re-batched to K=12 (bpe_merges_corpus + its oracle), the A-Res
        # NULL-id draw gained the weight mix (sample_weighted_chars + its
        # oracle), and the splitter filters' _split2 region gained the
        # malformed-fraction warning plumbing (filter_truncation,
        # filter_gender)
        "bpe_encode_corpus", "bpe_merges_corpus", "unigram_encode_corpus",
        "sample_weighted_chars", "filter_truncation", "filter_gender",
    }
    assert must_be_windowed <= set(window)


def test_correctness_window_covers_unverified_queries():
    """Every oracle-backed query that has never earned a driver CORRECTNESS
    row must sit inside the first-50 window (the driver checks only those),
    and every in-window entry must have an oracle.  Guards the displacement
    trap: a new @_register placed mid-file silently pushes later entries
    past position 50."""
    import json
    import os

    import __spark_entry__ as E

    names = list(E.queries())
    oracles = E.oracle_sql()
    window = names[:50]
    assert all(n in oracles for n in window), [
        n for n in window if n not in oracles
    ]

    verified: set[str] = set()
    for fname in sorted(os.listdir("/root/repo")):
        if fname.startswith("CORRECTNESS_r") and fname.endswith(".json"):
            rows = json.load(open(f"/root/repo/{fname}"))
            verified |= {
                k
                for k, v in rows.items()
                if isinstance(v, dict) and v.get("hash_match")
            }
    never = [n for n in names if n in oracles and n not in verified]
    outside = [n for n in never if n not in window]
    assert not outside, f"never-driver-verified queries outside the window: {outside}"
