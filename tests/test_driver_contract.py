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
    # derives the oracle invariant dynamically from the CORRECTNESS files.
    # (The round-11 window this set previously pinned is recorded in git
    # history; round 12 executed the standing README queue — r4 + full r5
    # bands — so the pinned set below IS the r12 window.)
    must_be_windowed = {
        # round-17 rule-2 holds: riders of the regions r17 touched — the
        # batch=base id_type pin in delete_from_ivf_index /
        # extend_ivf_index / extend_ivfpq_index, rebuild_ivf_index's
        # unification onto _fold_manifest_forward, and the _mk_dedup_store
        # / _mk_two_batch_ivf extractions in queries.py
        "ann_ivf_delete_serving", "ann_ivf_drift_report",
        "ann_ivf_rebuild_report", "dedup_onboarding_indexed",
        "dedup_store_health", "fleet_maintenance_plan",
        "ann_ivfpq_delete_serving", "ann_ivfpq_rebuild_report",
        # round-17 rule-1: the compaction-hash matrix — every persisted
        # store's fold path executed under a driver hash
        "bm25_compacted_serving", "ivf_compacted_serving",
        "ivfpq_compacted_serving", "dedup_compacted_onboarding",
        "neardup_compacted_onboarding",
        # ride the shared retained-topk oracle-template factorings
        "docs_bm25_delete_serving", "ann_topk_ivf_persisted",
        # round-17 second half: the crash-debris GC fleet row, the
        # WordPiece encode + fertility rows and the snapshot serving row
        # (all NEW, never-driver-verified — displacing r16-green
        # corpus_cms_heavy_hitters / dsir_select_en / bpe_merges_corpus /
        # bpe_encode_corpus)
        "fleet_gc_report", "wordpiece_encode_corpus",
        "ivf_snapshot_serving", "wordpiece_fertility_by_lang",
        # round-17 third session: the read-only structural fsck audit
        # (NEW, never-driver-verified — displacing r16-green
        # multimodal_resize, whose module is byte-unchanged this round;
        # the multimodal family keeps multimodal_frame_sample in-window)
        "fleet_fsck_report",
        # round-17 third session: the backup-restore round trip (NEW,
        # never-driver-verified — displacing r16-green docs_bm25_indexed,
        # whose module is byte-unchanged this round; the retrieval family
        # keeps docs_bm25_delete_serving + bm25_compacted_serving +
        # bm25_maintenance_plan in-window)
        "bm25_restore_serving",
        # round-17 staleness rotation rule 3 — the complete r12 band:
        "conversation_chatml", "decontaminate_report", "dedup_exact",
        "docs_fix_mojibake", "edit_pairs_concat", "events_asof_view",
        "filter_completion", "filter_ethics", "filter_stats_describe",
        "multimodal_frame_sample", "q12_late_shipments",
        "q13_order_count_distribution", "q14_promo_revenue",
        "q15_top_supplier", "q16_supplier_part_counts",
        "q17_small_quantity_revenue", "q19_discounted_revenue",
        "q8_market_share", "sample_grouped_users",
        "sample_proportional_mix", "shuffle_hash_sample",
        "union_provenance",
        # standing residents (r16-green; family-coverage holds)
        "pipeline_lifecycle",
        "quality_classifier_train",
        "decontaminate_semantic",
        "bm25_maintenance_plan", "embedding_onboarding_indexed",
        "neardup_store_health", "ann_topk_ivfpq_persisted",
        "fleet_maintenance_plan", "ann_ivfpq_delete_serving",
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


def test_registered_fns_declare_dataframe_returns():
    """Static wiring lint (r14 incident): a decorator accidentally applied
    to a helper inserted between @_register and its query function put a
    str-returning callable in the registry — the parity sweep catches it
    only when that row happens to re-run.  Every registered fn must
    declare a DataFrame return (milliseconds, no execution)."""
    import inspect

    from pyspark.sql import DataFrame

    from chat_data_pipeline_spark.queries import REGISTRY

    bad = [
        (name, inspect.signature(q.fn).return_annotation)
        for name, q in REGISTRY.items()
        if inspect.signature(q.fn).return_annotation not in ("DataFrame", DataFrame)
    ]
    assert not bad, bad
