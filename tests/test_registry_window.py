"""The driver's correctness gate checks only the FIRST 50 queries in
registry order — pin that every operator family keeps a representative
inside that window (round-1 verdict requirement)."""


def test_first_50_covers_every_family():
    import __spark_entry__ as e

    window = list(e.queries())[:50]
    families = {
        "flagship": ["etl_search_index"],
        "flagship-oracle": ["etl_search_index_spine"],
        "aggregation": ["pricing_summary"],
        "scan-filter": ["filter_project"],
        "join": ["join_left_fk", "join_full_outer"],
        "subquery": ["correlated_count"],
        "cascade": ["harmonisation_cascade"],
        "array-join": ["array_equality_group"],
        "window": ["sorted_list_per_group", "window_lag_delta"],
        "topk": ["topk"],
        "grouping-sets": ["grouping_sets"],
        "set-op": ["intersect_keys", "except_keys"],
        "cdc": ["scd2_merge"],
        "scalar-kit": ["case_buckets", "string_kit", "split_part"],
        "collect": ["collect_set_markers", "global_agg"],
        "json": ["json_agg_struct"],
        "date": ["date_arithmetic"],
        "percentile": ["exact_percentile"],
        "profiling": ["profile_histogram"],
        "unpivot": ["unpivot_metrics"],
        "pivot": ["pivot_status"],
        "timeseries": ["events_daily"],
        "recursion": ["recursive_closure"],
        "dedup": ["dedup_exact", "dedup_minhash_lsh", "dedup_semantic"],
        "similarity": ["ann_ivf_topk"],
        "ann-eval": ["ann_recall"],
        "text": ["text_quality", "text_tfidf", "text_chunk"],
        "multimodal": ["multimodal_decode"],
        "temporal": ["asof_join", "range_join"],
        "sampling": ["sample_stratified"],
        "pipeline": ["corpus_curation"],
        "clustering": ["kmeans_assign"],
        "packing": ["pack_sequences"],
        "quality-filter": ["quality_percentile"],
        "streaming": ["stream_events_daily", "session_window",
                      "stream_stream_join"],
    }
    missing = {
        fam: reps
        for fam, reps in families.items()
        if not any(r in window for r in reps)
    }
    assert not missing, f"families without a first-50 representative: {missing}"


def test_registry_is_large_and_oracled():
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    assert len(q) >= 88
    # every query has an oracle except the declared rows-only set
    rows_only = set(q) - set(o)
    assert rows_only <= {
        "etl_search_index", "multimodal_decode", "stream_sessionize",
        "approx_distinct",
    }, rows_only
