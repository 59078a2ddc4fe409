"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator from SURVEY.md §2
(plus the large-scale training-data extensions); ``oracle_sql()`` pairs each
with DuckDB-ANSI SQL over the same parquet tables. Implementations live in
``pdcm_etl_spark/`` — this module only assembles the registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full metadata ETL (raw provider modules → entity DAG →
    denormalized search_index) over the synthetic provider workload derived
    from /root/testdata/sf0.001. Fixed column projection → stable schema."""
    from pdcm_etl_spark.plans.synth import run_etl_search_index

    return run_etl_search_index(spark, SF0001)


# The driver's correctness gate checks the FIRST 50 queries in registry
# order. Every query rotated out of the window is driver-hash-proven in
# a prior round (r1-r5) and stays oracle-checked every pytest run
# (tests/test_oracle_parity.py); one representative per operator family
# remains pinned inside the window by tests/test_registry_window.py.
_PRIORITY: list[str] = [
    # ---- window slots 1-50: the driver's correctness gate hashes these.
    # Round-6 rotation: the 12 round-6 additions + the r5 queue
    # (target_encode / robust_scale / spearman_corr) take the slots of 15
    # r5-driver-proven rows; every rotated-out row stays oracle-checked
    # every pytest run (tests/test_oracle_parity.py) and every family
    # keeps an in-window representative (tests/test_registry_window.py).
    # flagship (full 67-column hash oracle since round 4)
    "etl_search_index",
    # round-8 additions (never driver-checked), windowed immediately:
    # delta-aware incremental flagship — oracle IS the full-rebuild SQL,
    # so the hash proves delta-applied ≡ rebuilt from scratch
    "etl_search_index_incremental",
    # round-8 analytics/curation additions (never driver-checked):
    # U-shaped multi-touch attribution (exact integer conservation),
    # gains/lift deciles, per-category chi-square drift decomposition,
    # first-occurrence n-gram novelty, reciprocal-rank fusion
    "attribution_position",
    "grouped_gain_curve",
    "chisq_drift",
    "ngram_novelty",
    "rrf_fusion",
    # joins / subqueries / cascades
    "correlated_count",
    "harmonisation_cascade",
    "array_equality_group",
    # skyline
    "pareto_frontier",
    # grouping / set ops / timeseries (timeseries_gapfill rotated out —
    # r4-proven; timeseries family stays repped by funnel_time_to_convert)
    "corpus_language_mix",
    "except_keys",
    "anomaly_mad",
    # markov + CDC
    "event_transitions",
    "stream_scd2_upsert",
    # scalar kit / JSON / pivot / sketches
    "global_agg",
    "json_agg_struct",
    "pivot_status",
    # (approx_quantile rotated out — r5-proven; the sketch family
    # stays repped by the exact grouped_quantiles twin; grouped_moments
    # rotated out — r6-proven, table-profile family stays repped by
    # entropy_profile + benford_profile)
    # round-6 additions (never driver-checked), windowed immediately:
    # statistical analytics
    "linreg_group",
    "chi_square_assoc",
    "benford_profile",
    "entropy_profile",
    "gini_concentration",
    # declarative data-quality suite
    "dq_check",
    # bounded-hop BFS keeps the graph/recursion families in-window
    # (pagerank + kcore rotated out -- r5 driver-proven)
    "bfs_distance",
    # LISTAGG (sample_weighted rotated out — r6-proven; sampling family
    # stays repped by sample_weighted_grouped)
    "string_agg_ordered",
    # round-6 session-2 additions (never driver-checked): bigram LM,
    # quantile normalization, record-linkage scoring
    "bigram_lm_score",
    "quantile_normalize",
    "er_score_pairs",
    "dedup_recall",
    # (target_encode, spearman_corr and robust_scale rotated out —
    # r6-proven; feature-encode stays repped by winsorize_group +
    # quantile_bin, correlation by linreg_group + chi_square_assoc)
    # clustering representative (broadcast-centroid variant)
    "kmeans_assign_bcast",
    # assoc rules (itemset_pairs r4-proven, outside)
    "assoc_rules",
    # dedup family representative (groups_star / winnow / containment /
    # paragraph / edit_distance all driver-proven r1-r5, outside)
    "dedup_prefix_filter",
    # similarity search + eval (ann_recall r4-proven and
    # ann_ivf_trained_topk r6-proven rotated out — the family stays
    # repped by the persisted/delta twins, which share the trained
    # oracle; recall-harness repped by dedup_recall)
    # round-7 additions, windowed immediately: IVF served from a
    # persisted bucketed index (same oracle as the trained twin),
    # winsorization, link prediction, session attribution
    "ann_ivf_persisted",
    "winsorize_group",
    "link_predict_cn",
    "quantile_bin",
    "trimmed_mean_group",
    "funnel_time_to_convert",
    # (grouped_quantiles and event_path_topk rotated out — r6-proven;
    # order-statistics stay repped by trimmed_mean_group + quantile_bin,
    # markov by event_transitions)
    # multimodal (audio r5-proven, rotated out; decode keeps the family)
    "multimodal_decode",
    # temporal / window / skew
    "rolling_window",
    "key_skew_profile",
    # sampling / curation (twap + sample_domain_mix rotated out —
    # r5-proven; their umbrella families stay repped by rolling_window /
    # sample_weighted. The round-6 session-3 pair is windowed
    # immediately)
    "sample_weighted_grouped",
    # (join_cardinality_estimate rotated out — r6-proven; join-planning
    # family stays repped by key_skew_profile)
    # tokenizer
    "bpe_train",
    "corpus_curation",
    "stump_train",
    # layout
    "partition_prune",
    "pack_sequences",
    "quality_percentile",
    # streaming representatives (sliding rotated out — r4/r5-proven;
    # the round-6 DQ monitor + stream-static enrichment keep the
    # family growing, windowed immediately; table_stats rotates out —
    # r5-proven, table-profile stays repped by the pytest-checked
    # profile_notnull oracle row)
    # ---- below the 50-row window: all driver-proven in r1-r6, still
    # oracle-checked every pytest run
    # (stream_dq_monitor + stream_static_join rotated out — r6-proven;
    # streaming family stays repped in-window by stream_scd2_upsert +
    # the new stream_left_outer_join)
    # (ann_ivf_delta_append rotated out — r7-proven; ann-persist family
    # stays repped by ann_ivf_persisted, which shares its oracle)
    "ann_ivf_delta_append",
    # (attribution_touch, stream_left_outer_join, distribution_drift,
    # ks_drift, grouped_auc rotated out — r7-proven; attribution is
    # repped by attribution_position, drift by chisq_drift, model-eval
    # by grouped_gain_curve, streaming by stream_scd2_upsert)
    "attribution_touch",
    "stream_left_outer_join",
    "distribution_drift",
    "ks_drift",
    "grouped_auc",
    "stream_dq_monitor",
    "stream_static_join",
    "robust_scale",
    "grouped_quantiles",
    "ann_ivf_trained_topk",
    "timeseries_gapfill",
    "grouped_moments",
    "event_path_topk",
    "join_cardinality_estimate",
    "sample_weighted",
    "target_encode",
    "heavy_hitters",
    "approx_quantile",
    "ann_recall",
    "unigram_lm_score",
    "table_stats",
    "twap",
    "sample_domain_mix",
    "stream_events_sliding",
    "shuffle_shards",
    "percentile_rank",
    "interval_overlap_join",
    "bpe_encode",
    "dedup_groups_star",
    "dedup_winnow",
    "pagerank",
    "kcore",
    "stream_windowed_topk",
    "token_budget_select",
    "snapshot_diff",
    "sorted_neighborhood",
    "bloom_prune_join",
    "crosstab_lift",
    "multimodal_audio",
    "ivm_merge",
    "stream_sessionize",
    "bucket_cojoin",
    "sessionize_batch",
    "kmeans_assign",
    "itemset_pairs",
    "dedup_containment",
    "bpe_pair_counts",
    "dedup_paragraph",
    "grouped_topk",
    "etl_search_index_spine",
    "dedup_edit_distance",
    "anomaly_iqr",
    "etl_search_index_wide",
]


def _full_catalog() -> dict[str, tuple]:
    from pdcm_etl_spark.plans.catalog import RELATIONAL_CATALOG

    cat: dict[str, tuple] = dict(RELATIONAL_CATALOG)
    for extra in _optional_catalogs():
        cat.update(extra)
    ordered: dict[str, tuple] = {}
    for name in _PRIORITY:
        if name in cat:
            ordered[name] = cat[name]
    for name, entry in cat.items():
        if name not in ordered:
            ordered[name] = entry
    return ordered


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _full_catalog().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _full_catalog().items() if sql}


def _optional_catalogs() -> list[dict]:
    cats = []
    try:
        from pdcm_etl_spark.plans.extensions import EXTENSION_CATALOG

        cats.append(EXTENSION_CATALOG)
    except ImportError:
        pass
    try:
        from pdcm_etl_spark.plans.catalog_extra import EXTRA_CATALOG

        cats.append(EXTRA_CATALOG)
    except ImportError:
        pass
    try:
        from pdcm_etl_spark.plans.extensions_b import EXTENSION_B_CATALOG

        cats.append(EXTENSION_B_CATALOG)
    except ImportError:
        pass
    try:
        from pdcm_etl_spark.plans.extensions_c import EXTENSION_C_CATALOG

        cats.append(EXTENSION_C_CATALOG)
    except ImportError:
        pass
    try:
        from pdcm_etl_spark.plans.extensions_d import EXTENSION_D_CATALOG

        cats.append(EXTENSION_D_CATALOG)
    except ImportError:
        pass
    return cats
