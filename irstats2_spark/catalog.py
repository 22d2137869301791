"""Query catalog: one named entry per implemented operator (SURVEY.md §2).

Each entry pairs a Spark DataFrame implementation with an equivalent ANSI-SQL
oracle string that DuckDB runs over the same parquet tables. The driver
compares row-count + schema + order-insensitive value-hash, so:

- every computed column is aliased identically on both sides;
- money/measure aggregates go through exact DECIMAL arithmetic and are cast
  to DOUBLE only at the end (sum order must not change the value);
- dates/timestamps are emitted as formatted strings (no tz/type ambiguity).

Implementations live in the operator modules; this file only wires them to
the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}

# The driver's correctness gate checks the FIRST 50 entries of queries() in
# iteration order. Registration order is module-import order, which packs
# related queries together — so without reordering, whole operator families
# land past the cutoff and never get a driver-verified row. This list pins
# the gate set explicitly: queries named here come first (in this order),
# everything else follows in registration order. Names not (yet) registered
# are ignored, so entries can be staged ahead of their implementations.
#
# Round-5 rotation (the set is re-cut each round so driver verification
# CYCLES through the whole catalog instead of freezing on one list):
# - FIRST, the 9 queries registered in round 4 with no driver row yet
#   (the round-4 verdict's #1 ask, pre-committed last round): the
#   rows-only BPE trainer, the shard manifest, fractional-epoch mixing,
#   in-place chunk dedup, quality-aware keepers, IDF-weighted Jaccard,
#   the two PQ interior stages, and the global-rank classifier cut;
# - the LAST two r1-only rows (a8_count_rows, anon_md5_values) — with
#   these re-gated, every registered query has a row from r4∪r5;
# - the 2 queries NEW this round: the near-dup maintenance composition
#   (simhash -> connected components -> quality keepers as one replayed
#   chain) and the hierarchical (md5-of-md5s) shard manifest;
# - every query whose implementation changed this round: the three
#   shingle pair expanders + the LSH recall audit (finite default
#   max_docs_per_shingle=64, mirrored in their oracles) and the
#   pq_fit-headed blocking chain (persisted subvector scan);
# - two core anchors (A1 grouped sum, exact repeat — back after ceding
#   its r4 slot) so the star-schema spine stays continuously verified;
# - fill to 50 with the 31 oldest displaced r2-green rows (listed as
#   displaced in round 4's comment).
# Rotated out: the r4-green set just verified last round (they keep
# their pytest sf0.01 oracle runs either way); of round 4's displaced-
# r2 list, robots_filter_outcome (also re-verified inside the r3
# etl_silver_views_fact row) and dedup_simhash (16-bit variant,
# unchanged code, its 64-bit successor has an r4 row) wait for round 6.
GATE_PRIORITY: tuple[str, ...] = (
    # -- registered in r4, no driver row yet (gate-debt head) --
    "bpe_train_merges",
    "corpus_shard_manifest",
    "mix_with_epochs",
    "text_dedup_chunks_inplace",
    "dedup_cluster_quality_keepers",
    "dedup_ngram_idf_jaccard",
    "similarity_pq_fit",
    "similarity_pq_encode",
    "text_classifier_top_fraction",
    # -- last two r1-only rows --
    "a8_count_rows",
    "anon_md5_values",
    # -- new this round --
    "pipeline_neardup_maintenance_e2e",
    "corpus_shard_manifest_hierarchical",
    "text_frequent_chunks",
    "text_remove_frequent_chunks",
    "text_vocab_encode",
    "similarity_knn_graph_ivf",
    "corpus_source_overlap",
    "text_gopher_quality_gate",
    "dedup_simhash_incremental",
    "pack_efficiency_audit",
    "text_dup_span_coverage",
    "corpus_deterministic_shuffle",
    "pipeline_semdedup_e2e",
    "text_remove_frequent_chunks_incremental",
    "text_winnow_fingerprints",
    "dedup_winnowing",
    "text_cdc_chunks",
    "dedup_winnowing_incremental",
    "mix_by_temperature_tokens",
    "text_decontamination_spans",
    "corpus_dup_rate_by_source",
    "similarity_ivf_balance_audit",
    "pack_sequences_offsets",
    "dedup_simhash_quality_audit",
    "corpus_length_histogram",
    "mix_with_epochs_tokens",
    "text_cdc_frequent_chunks",
    "text_cdc_remove_frequent",
    "similarity_pq_balance_audit",
    # -- implementation changed this round: re-verify on today's code --
    "dedup_ngram_jaccard",
    "dedup_ngram_containment",
    "dedup_lsh_recall_audit",
    "dedup_embedding_pq_blocking",
    # -- continuously-verified core anchors --
    "a1_grouped_sum",
    "repeat_filter_exact",
    # -- fill: displaced r2-green rows from round 4's cut --
    "j1_fact_join_dim",
    "j2_grouping_join",
    "t2_densify",
    "a6_a7_cumulative_running_avg",
)
# ROUND 6 SHOULD GATE FIRST: the queries registered late in round
# 5 with no driver row yet (session-5 adds: corpus_zonemap_prune_audit,
# corpus_zorder_layout, corpus_zorder_prune_gain, corpus_zonemap_merge,
# embedding_covariance, embedding_pca_project (rows-only),
# similarity_opq_distortion (rows-only), events_top_paths,
# events_covisit_lift, events_interval_overlap,
# text_encoding_anomaly, corpus_curriculum_order,
# embedding_class_separation, similarity_cluster_purity,
# text_vocab_decode_roundtrip, corpus_ngram_diversity_approx,
# events_trending_types, pipeline_release_e2e;
# session-4 adds: events_markov_transitions,
# events_rolling_anomaly,
# graph_pagerank, graph_triangles, text_cosine_pairs_inverted,
# corpus_ngram_diversity, text_tokenizer_fertility,
# events_attribution_windows, graph_label_propagation,
# text_minhash_containment_asym, sample_coreset_diverse,
# mix_doremi_proxy_reweight, text_burstiness_audit,
# pipeline_dedup_cascade_audit, corpus_quota_pack,
# events_session_quantiles_exact) — plus the 19 from session 3:
# similarity_pq_rerank_topk,
# dedup_edit_distance, dedup_edit_distance_incremental,
# dedup_lsh_band_sweep, text_ccnet_perplexity_buckets,
# text_lang_confusion_audit, text_quality_calibration_audit,
# text_token_entropy, text_vocab_coverage_curve,
# sample_split_leakage_safe, similarity_knn_mutual_graph,
# similarity_ivf_probe_sweep, mix_temperature_sweep,
# corpus_compaction_plan, pipeline_quality_funnel_e2e,
# similarity_pq_m_sweep,
# agg_grouping_sets, events_retention_cohorts,
# events_funnel_conversion (all green in the pytest sf0.01 oracle
# mirror) — then: robots_filter_outcome, dedup_simhash,
# text_quality_features, text_lang_id, text_fingerprint,
# text_token_counts, sample_split_assign, sample_stratified,
# dedup_clusters, dedup_exact, t6_f12_formatting, o4_listing_engine,
# f1_f3_url_parse, f9_subject_closure, s7_sets_build,
# s7_groupings_build, view_sparkline, ctx_data_min, ctx_prelive_clamp,
# ctx_set_series, ctx_top_sets, ctx_grouping_top, geoip_range_join,
# view_monthly_graph, events_unique_visitors_approx,
# etl_downloads_fact, events_asof_prior, events_sessionize, and
# a5_ratio_metric (the r2-green rows that could not
# fit round 5's 50 — each ceded its slot to a first-ever row for an
# operator new this round, per the brand-new-outranks-unchanged-refresh
# rule; dedup_clusters' connected-components core and dedup_exact's
# hash-groupBy were both additionally re-verified this round inside
# gated chains — pipeline_neardup_maintenance_e2e and the exact-dedup
# stage of pipeline_pretrain_e2e's r4 row respectively), then rotate
# the oldest remaining r2/r3 rows as usual.


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = QuerySpec(spark=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def _gate_ordered() -> dict[str, QuerySpec]:
    first = {n: _REGISTRY[n] for n in GATE_PRIORITY if n in _REGISTRY}
    rest = {n: s for n, s in _REGISTRY.items() if n not in first}
    return {**first, **rest}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: spec.spark for name, spec in _gate_ordered().items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {n: s.oracle for n, s in _gate_ordered().items() if s.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers catalog entries."""
    global _LOADED
    if _LOADED:
        return
    # Imports are for their registration side effects.
    from irstats2_spark import queries_core  # noqa: F401
    from irstats2_spark import queries_ext  # noqa: F401
    from irstats2_spark import queries_irstats  # noqa: F401
    from irstats2_spark import queries_pipeline  # noqa: F401

    _LOADED = True


def main() -> None:
    """`python -m irstats2_spark.catalog`: list the operator catalog."""
    # run-as-__main__ gets its own module instance; use the canonical one
    from irstats2_spark import catalog as _canonical

    _canonical._ensure_loaded()
    reg = _canonical._REGISTRY
    width = max(len(n) for n in reg)
    for name, spec in sorted(reg.items()):
        gate = "oracle" if spec.oracle else "rows-only"
        print(f"{name:<{width}}  [{gate:>9}]  {spec.doc}")
    print(f"\n{len(reg)} queries, "
          f"{sum(1 for s in reg.values() if s.oracle)} with SQL oracles")


if __name__ == "__main__":
    main()
