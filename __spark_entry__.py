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
# order. Round-3 rotation (round-2 verdict item 2): the 17 queries that
# had never seen a driver row are now IN the window, plus the new
# wide-flagship hash oracle; the rows rotated out are all twice-proven
# (driver-hash-green in r01 and/or r02) and stay oracle-checked every
# pytest run (tests/test_oracle_parity.py). One representative per
# operator family remains pinned by tests/test_registry_window.py.
_PRIORITY: list[str] = [
    # flagship (full 67-column hash oracle since round 4 — the internal
    # id is the portable md5-based hash) + its spine/wide oracle twins
    "etl_search_index",
    # (etl_search_index_spine AND _wide rotated out — r1-r4
    # driver-proven, and since round 4 the flagship row itself carries
    # the FULL 67-column hash oracle, making both twins redundant
    # proofs; they stay oracle-checked every pytest run)
    # joins (left/full-outer/multi-key variants r01/r02-proven, rotated
    # out; the cascade + salted-skew + correlated paths keep the family)
    "correlated_count",
    "harmonisation_cascade",
    "array_equality_group",
    # (join_salted_skew rotated out — r3 driver-proven; the cascade
    # keeps the join family. Its slot goes to the skyline query)
    "pareto_frontier",
    # grouping / window / set ops (rollup_totals + text_chunk rotated
    # out — r3 driver-proven; global_agg / unigram_lm_score keep their
    # families; the slots go to the round-4 gapfill + anomaly queries.
    # window_ntile rotated out — r3 driver-proven, grouped_topk keeps
    # the window family; its slot goes to the language-mix report)
    "corpus_language_mix",
    "except_keys",
    "timeseries_gapfill",
    # (anomaly_iqr rotated out — r4 driver-proven; the MAD robust twin
    # keeps and grows the anomaly family, windowed immediately)
    "anomaly_mad",
    # round-5 addition: per-source percentile-rank calibration,
    # windowed immediately
    "percentile_rank",
    # CDC family: the streaming upsert twin keeps it (scd2_merge rotated
    # out — r3 driver-proven; its slot goes to the containment dedup)
    # (dedup_containment rotated out — r4 driver-proven; five dedup
    # reps remain in-window. Its slot goes to the Markov transition
    # matrix, windowed immediately)
    "event_transitions",
    "stream_scd2_upsert",
    # scalar kit / JSON / profiling / pivot representatives
    # (collect_set_markers rotated out for the round-4 additions — r1+r3
    # driver-proven; global_agg keeps the collect family in-window)
    "global_agg",
    "json_agg_struct",
    "pivot_status",
    # (approx_distinct rotated out — r4 driver-proven; the round-5
    # sketch pair keeps (and grows) the sketch family in-window)
    "heavy_hitters",
    "approx_quantile",
    # (cohort_retention rotated out — r4 driver-proven;
    # timeseries_gapfill keeps the timeseries family in-window.
    # triangle_count rotated out — r4 driver-proven; pagerank keeps the
    # graph family. Their slots go to the round-5 star components +
    # broadcast-centroid kmeans, windowed immediately)
    "dedup_groups_star",
    "kmeans_assign_bcast",
    "pagerank",
    # round-5 addition: k-core peeling of the near-dup pair graph,
    # windowed immediately
    "kcore",
    # (itemset_pairs rotated out — r4 driver-proven; the directed-rule
    # extension keeps AND grows the assoc family in-window)
    "assoc_rules",
    # training-data: dedup family (exact/minhash_lsh proven; the
    # incremental + keeper variants take their slots)
    # (dedup_ngram_jaccard rotated out — r3 driver-proven; the new
    # edit-distance verifier takes its slot)
    # (dedup_edit_distance rotated out — r4 driver-proven; four dedup
    # reps remain. Its slot goes to the streaming leaderboard)
    "stream_windowed_topk",
    # (bucket_cojoin and sessionize_batch rotated out — both r4
    # driver-proven; layout keeps partition_prune in-window, temporal
    # keeps rolling_window + interval_overlap_join. Their slots make
    # room for the round-5 session-3 additions while the streaming
    # family keeps stream_events_sliding inside the window)
    # (dedup_minhash_incremental rotated out — r4 driver-proven; the
    # round-5 winnowing fingerprinter keeps the dedup family growing,
    # windowed immediately)
    "dedup_winnow",
    # round-5 addition: EXACT Jaccard join via prefix filtering —
    # windowed immediately; its brute-force all-pairs oracle proves
    # filter completeness, not just cross-engine pipeline agreement
    "dedup_prefix_filter",
    # round-5 addition: quota-filling curriculum selector (two-level
    # running sum vs the oracle's naive per-domain window)
    "token_budget_select",
    # round-5 addition: release-regression snapshot diff (digest-only
    # shuffle through the full-outer join)
    "snapshot_diff",
    # round-5 addition: sorted-neighborhood ER blocking (global ranks
    # with no global sort; exactly-once rank-block pairing)
    "sorted_neighborhood",
    # (dedup_simhash / dedup_semantic / dedup_keeper_quality rotated
    # out — r3 driver-proven; four dedup reps remain in-window. The
    # slots go to the bloom-pruned join + per-group top-k)
    "bloom_prune_join",
    # (grouped_topk rotated out — r4 driver-proven; rolling_window keeps
    # the window family. Its slot goes to the crosstab lift profile)
    "crosstab_lift",
    # similarity search: trained-IVF variant in, plain IVF out
    "ann_ivf_trained_topk",
    "ann_recall",
    # text analysis (tfidf/quality/pii_scrub rotated out for the round-4
    # additions — all r3 driver-proven, oracle-checked every pytest run;
    # chunk keeps the family; unigram_lm_score is new)
    "unigram_lm_score",
    # multimodal: decode is BACK in-window for round 5 — its codec is
    # now a real byte-level BMP encode/parse (the stub is retired), so
    # the new behavior needs a driver hash row; digest-dedup keeps the
    # family alongside (frames / resize stay r3/r4-proven)
    "multimodal_decode",
    # round-5 addition: REAL RIFF/WAV PCM codec twin (chunk-walking
    # parse), windowed immediately; ivm_merge slides out (r4-proven,
    # stream_scd2_upsert keeps the CDC family in-window)
    "multimodal_audio",
    # (multimodal_dedup rotated out — r4 driver-proven; decode keeps
    # the multimodal family)
    # temporal / sampling / composed pipelines (asof_join, range_join,
    # sample_stratified, and funnel_stages are r01-r04 driver-proven —
    # sessionize_batch keeps the temporal family; the slots go to the
    # round-5 trailing-window + interval-overlap + skew-profile ops,
    # windowed immediately)
    "rolling_window",
    "interval_overlap_join",
    "key_skew_profile",
    # (ngram_topk + inverted_index rotated out — r4 driver-proven;
    # heavy_hitters + corpus_language_mix keep corpus-stats in-window)
    "shuffle_shards",
    # round-4 additions, windowed immediately (never driver-checked)
    # (dedup_paragraph rotated out — r4 driver-proven; four dedup reps
    # remain in-window. Its slot goes to the time-weighted average)
    "twap",
    "sample_domain_mix",
    # (bpe_pair_counts rotated out — r4 driver-proven; bpe_train +
    # bpe_encode keep the tokenizer family. Its slot goes to the
    # ANALYZE-style one-pass profiler, windowed immediately)
    "table_stats",
    "bpe_train",
    "bpe_encode",
    "corpus_curation",
    # (kmeans_assign rotated out — r2/r3 driver-proven; the broadcast
    # twin kmeans_assign_bcast keeps the clustering family in-window)
    "stump_train",
    # (zorder_layout rotated out — r4 driver-proven; the round-5
    # hive-partition-pruned scan keeps the layout family alongside
    # bucket_cojoin, windowed immediately)
    "partition_prune",
    "pack_sequences",
    "quality_percentile",
    # streaming: four paths in-window (sliding windows new in round 4;
    # events_daily + stream_stream_join + session_window rotated out —
    # r3 driver-proven; the slot goes to the IVM merge)
    "stream_events_sliding",
    "ivm_merge",
    "stream_sessionize",
    # round-5 additions that found no honest window slot (every
    # in-window row is either a sole family representative or a
    # this-round addition needing its first driver hash): first in
    # line for the round-6 rotation; oracle-checked every pytest run
    "target_encode",
    "robust_scale",
    "spearman_corr",
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
    # (stream_dedup rotated out — r3/r4 driver-proven; three streaming
    # paths remain in-window)
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
    return cats
