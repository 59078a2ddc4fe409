"""The driver's correctness gate checks only the FIRST 50 queries in
registry order — pin that every operator family keeps a representative
inside that window (round-1 verdict requirement), and that the round-3
rotation actually landed every previously-unchecked query inside it
(round-2 verdict item 2)."""

# queries that need a driver row THIS round — round-5 additions plus
# rows whose behavior or oracle changed since their last green hash —
# all must sit inside the 50-row window; everything rotated out is
# cumulatively driver-proven in r1-r4 and stays oracle-checked every
# pytest run (tests/test_oracle_parity.py)
ROTATED_IN = [
    # round-8 additions (never driver-checked)
    "etl_search_index_incremental",
    "attribution_position",
    "grouped_gain_curve",
    "chisq_drift",
    "ngram_novelty",
    "rrf_fusion",
    # round-8 session-2 additions (never driver-checked)
    "weighted_median_group",
    "concentration_topn",
    "seasonal_anomaly",
    "user_accumulation",
    "bigram_pmi_topk",
    "split_leakage_audit",
    # round-8 session-3 additions (never driver-checked)
    "mode_group",
    "fk_orphan_audit",
    "source_token_overlap",
    "vocab_accumulation",
    "churn_summary",
    # round-8 session-4 additions (never driver-checked)
    "lang_confusion",
    "dup_cluster_histogram",
    "balanced_downsample",
    "golden_record_merge",
    "decile_migration",
]


# Families benched from the window THIS round: with 12 never-driver-
# checked round-8 rows pinned into the 50 slots, the family set-cover
# no longer fits. A family may be benched ONLY if every one of its
# representatives is driver-hash-green in the immediately previous
# round's CORRECTNESS file (checked mechanically below) and stays
# oracle-checked every pytest run (tests/test_oracle_parity.py).
WINDOW_EXEMPT_FAMILIES = {
    "layout",           # partition_prune green in r07
    "packing",          # pack_sequences green in r07
    "pipeline",         # corpus_curation green in r07
    "quality-filter",   # quality_percentile green in r07
    "tree-train",       # stump_train green in r07
    "multimodal",       # multimodal_decode green in r07
    "robust-location",  # trimmed_mean_group green in r07
    "tokenizer",        # bpe_train green in r07
}
_PREV_CORRECTNESS = "CORRECTNESS_r07.json"


def test_first_50_covers_every_family():
    import json
    import os

    import __spark_entry__ as e

    window = list(e.queries())[:50]
    families = {
        "flagship": ["etl_search_index"],
        # since r4 the flagship row itself carries the FULL 67-column hash
        # oracle — the wide/spine twins are redundant proofs, both r1-r4
        # driver-green and pytest-oracle-checked
        "flagship-oracle": ["etl_search_index", "etl_search_index_wide",
                            "etl_search_index_spine"],
        "aggregation": ["global_agg", "rollup_totals", "cube_counts"],
        "join": ["join_salted_skew", "harmonisation_cascade",
                 "bloom_prune_join"],
        "subquery": ["correlated_count"],
        "cascade": ["harmonisation_cascade"],
        "array-join": ["array_equality_group"],
        "window": ["window_ntile", "grouped_topk", "rolling_window"],
        "set-op": ["except_keys"],
        "cdc": ["scd2_merge", "stream_scd2_upsert", "ivm_merge"],
        "collect": ["collect_set_markers", "global_agg"],
        "json": ["json_agg_struct"],
        "sketch": ["approx_distinct", "heavy_hitters", "approx_quantile",
                   "grouped_quantiles", "trimmed_mean_group",
                   "quantile_bin", "weighted_median_group"],
        "pivot": ["pivot_status"],
        "timeseries": ["events_daily", "cohort_retention",
                       "timeseries_gapfill", "funnel_time_to_convert"],
        "anomaly": ["anomaly_iqr", "anomaly_mad", "seasonal_anomaly"],
        "recursion": ["recursive_closure", "pagerank", "bfs_distance"],
        "graph-analytics": ["triangle_count", "pagerank", "kcore",
                            "bfs_distance"],
        "assoc": ["itemset_pairs", "assoc_rules"],
        "dedup": ["dedup_edit_distance", "dedup_minhash_lsh",
                  "dedup_minhash_incremental", "dedup_keeper_quality",
                  "dedup_semantic", "dedup_groups", "dedup_groups_star",
                  "dedup_paragraph", "dedup_containment", "dedup_winnow",
                  "dedup_prefix_filter", "dup_cluster_histogram"],
        "skyline": ["pareto_frontier"],
        "similarity": ["ann_ivf_trained_topk", "ann_ivf_persisted",
                       "ann_ivf_delta_append"],
        "ann-eval": ["ann_recall", "dedup_recall"],
        "dedup-eval": ["dedup_recall"],
        "text": ["text_quality", "text_tfidf", "text_chunk",
                 "text_pii_scrub", "text_contamination", "text_repetition",
                 "unigram_lm_score", "bigram_lm_score", "ngram_novelty"],
        "multimodal": ["multimodal_decode", "multimodal_frames",
                       "multimodal_resize", "multimodal_dedup",
                       "multimodal_audio"],
        "temporal": ["asof_join", "range_join", "funnel_stages",
                     "sessionize_batch", "interval_overlap_join",
                     "rolling_window", "twap"],
        "skew-profile": ["key_skew_profile"],
        "join-planning": ["join_cardinality_estimate",
                          "key_skew_profile"],
        "table-profile": ["table_stats", "profile_notnull",
                          "entropy_profile", "benford_profile",
                          "grouped_moments"],
        "markov": ["event_transitions", "event_path_topk"],
        "crosstab": ["crosstab_lift", "chi_square_assoc"],
        "sampling": ["sample_stratified", "shuffle_shards",
                     "sample_weighted", "sample_weighted_grouped",
                     "sample_domain_mix", "split_leakage_audit",
                     "balanced_downsample"],
        "corpus-stats": ["ngram_topk", "inverted_index",
                         "corpus_language_mix", "bigram_pmi_topk",
                         "source_token_overlap", "vocab_accumulation"],
        "tokenizer": ["bpe_pair_counts", "bpe_train", "bpe_encode"],
        "pipeline": ["corpus_curation"],
        "clustering": ["kmeans_assign", "kmeans_assign_bcast"],
        "tree-train": ["stump_train"],
        "layout": ["zorder_layout", "bucket_cojoin", "partition_prune"],
        "packing": ["pack_sequences"],
        "quality-filter": ["quality_percentile", "percentile_rank"],
        "feature-encode": ["target_encode", "percentile_rank",
                           "robust_scale", "winsorize_group",
                           "quantile_bin"],
        "correlation": ["spearman_corr", "crosstab_lift",
                        "chi_square_assoc", "linreg_group"],
        "regression": ["linreg_group"],
        "data-quality": ["dq_check", "fk_orphan_audit"],
        "entropy": ["entropy_profile"],
        "inequality": ["gini_concentration", "concentration_topn"],
        "benford": ["benford_profile"],
        "listagg": ["string_agg_ordered"],
        "lm-filter": ["unigram_lm_score", "bigram_lm_score"],
        "quantile-normalize": ["quantile_normalize"],
        "entity-resolution": ["sorted_neighborhood", "er_score_pairs",
                              "golden_record_merge"],
        "streaming": ["stream_events_daily", "stream_events_sliding",
                      "session_window", "stream_stream_join",
                      "stream_sessionize", "stream_dedup",
                      "stream_windowed_topk", "stream_dq_monitor",
                      "stream_static_join", "stream_left_outer_join",
                      "stream_scd2_upsert"],
        # round-8 families
        "incremental-etl": ["etl_search_index_incremental"],
        "rank-fusion": ["rrf_fusion"],
        "novelty": ["ngram_novelty"],
        # round-7 families
        "ann-persist": ["ann_ivf_persisted", "ann_ivf_delta_append"],
        "binning": ["winsorize_group", "quantile_bin"],
        "link-prediction": ["link_predict_cn"],
        "attribution": ["attribution_touch", "stream_left_outer_join",
                        "attribution_position"],
        "drift": ["distribution_drift", "ks_drift", "chisq_drift"],
        "funnel-latency": ["funnel_time_to_convert"],
        "robust-location": ["trimmed_mean_group"],
        "model-eval": ["grouped_auc", "grouped_gain_curve",
                       "decile_migration"],
        # round-8 session-2/3 families
        "weighted-order-stats": ["weighted_median_group"],
        "growth-accounting": ["user_accumulation", "churn_summary"],
        "collocation": ["bigram_pmi_topk"],
        "leakage-audit": ["split_leakage_audit"],
        "mode": ["mode_group"],
        "referential-integrity": ["fk_orphan_audit"],
        "vocab-overlap": ["source_token_overlap", "vocab_accumulation"],
        # round-8 session-4 families
        "lang-confusion": ["lang_confusion"],
        "survivorship": ["golden_record_merge"],
        "class-balance": ["balanced_downsample"],
        "decile-migration": ["decile_migration"],
        "cluster-histogram": ["dup_cluster_histogram"],
    }
    missing = {
        fam: reps
        for fam, reps in families.items()
        if fam not in WINDOW_EXEMPT_FAMILIES
        and not any(r in window for r in reps)
    }
    assert not missing, f"families without a first-50 representative: {missing}"

    # exemptions are few and mechanically justified: at least one rep of
    # every benched family must be hash-green in the PREVIOUS round's
    # committed correctness file
    assert len(WINDOW_EXEMPT_FAMILIES) <= 8
    prev_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        _PREV_CORRECTNESS,
    )
    prev = json.load(open(prev_path))
    for fam in WINDOW_EXEMPT_FAMILIES:
        green = [
            r
            for r in families[fam]
            if prev.get(r, {}).get("hash_match") is True
        ]
        assert green, (
            f"benched family {fam} has no rep hash-green in "
            f"{_PREV_CORRECTNESS}; it may not be exempted"
        )


def test_rotated_in_queries_are_inside_the_window():
    import __spark_entry__ as e

    window = set(list(e.queries())[:50])
    out = [q for q in ROTATED_IN if q not in window]
    assert not out, f"never-driver-checked queries still outside window: {out}"


def test_registry_is_large_and_oracled():
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    assert len(q) >= 88
    # every query has an oracle except the full-width flagship (whose
    # 66-column wide twin IS hash-checked); round 3 converted
    # stream_sessionize, approx_distinct and multimodal_decode (the
    # deterministic stub fake is SQL-expressible) to exact oracles
    rows_only = set(q) - set(o)
    assert rows_only <= {"etl_search_index"}, rows_only
