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
# Round-6 rotation — the CONSOLIDATION cut (round-5 verdict ask #1):
# the catalog is FROZEN this round (220 queries, no new registrations)
# and the gate burns the never-driver-verified debt. 54 queries had no
# green CORRECTNESS row across r1..r5 (all green in the pytest sf0.01
# oracle mirror); of those:
# - bpe_train_merges stays OUT of rotation permanently — it has no SQL
#   oracle, the driver can only answer err:"no_oracle" (r5 spent slot
#   #1 to learn this); it stays pytest-pinned (sample ⊇ vocab exact
#   reproduction) instead;
# - embedding_pca_project and similarity_opq_distortion are now
#   VALUE-CHECKABLE (verdict ask #2): re-registered with derived
#   invariant oracles (exact-integer quantized energy + Pythagoras /
#   energy-conservation ppm + distortion<=energy), so they gate
#   normally below;
# - 6 stable-since-r3 queries whose operator FAMILY already holds green
#   rows are deferred to round 7 (listed at the end of this comment) —
#   53 gateable debt + 1 changed-impl re-gate + 2 anchors = 56 > 50.
# Also gated: corpus_source_overlap (green r5, but its implementation
# changed this round — eager audit materialization + cache release), and
# the two core anchors (A1 grouped sum, exact repeat) every round.
# The graph/zorder/covariance/covisit/interval queries below also had
# implementation changes this round (shared kNN-edge prefix, n_files
# guard, DECIMAL overflow fix, lazy session count, floor bucketing), so
# their first-ever rows verify today's code, not a stale snapshot.
GATE_PRIORITY: tuple[str, ...] = (
    # -- newest first: session-5 adds (no driver row yet) --
    "embedding_pca_project",
    "similarity_opq_distortion",
    "embedding_covariance",
    "corpus_zonemap_prune_audit",
    "corpus_zorder_layout",
    "corpus_zorder_prune_gain",
    "corpus_zonemap_merge",
    "events_top_paths",
    "events_covisit_lift",
    "events_interval_overlap",
    "text_encoding_anomaly",
    "corpus_curriculum_order",
    "embedding_class_separation",
    "similarity_cluster_purity",
    "text_vocab_decode_roundtrip",
    "corpus_ngram_diversity_approx",
    "events_trending_types",
    "pipeline_release_e2e",
    # -- session-4 adds (no driver row yet) --
    "events_markov_transitions",
    "events_rolling_anomaly",
    "graph_pagerank",
    "graph_triangles",
    "graph_label_propagation",
    "text_cosine_pairs_inverted",
    "corpus_ngram_diversity",
    "text_tokenizer_fertility",
    "events_attribution_windows",
    "text_minhash_containment_asym",
    "sample_coreset_diverse",
    "mix_doremi_proxy_reweight",
    "text_burstiness_audit",
    "pipeline_dedup_cascade_audit",
    "corpus_quota_pack",
    "events_session_quantiles_exact",
    # -- session-3 adds (no driver row yet) --
    "dedup_edit_distance",
    "dedup_lsh_band_sweep",
    "text_ccnet_perplexity_buckets",
    "text_lang_confusion_audit",
    "text_quality_calibration_audit",
    "text_token_entropy",
    "sample_split_leakage_safe",
    "similarity_knn_mutual_graph",
    "similarity_ivf_probe_sweep",
    "pipeline_quality_funnel_e2e",
    "agg_grouping_sets",
    "events_retention_cohorts",
    "events_funnel_conversion",
    # -- implementation changed this round (green r5, re-verify) --
    "corpus_source_overlap",
    # -- continuously-verified core anchors --
    "a1_grouped_sum",
    "repeat_filter_exact",
)
# ROUND 7 SHOULD GATE FIRST: the 6 debt queries deferred from round
# 6's cut (stable since r3, each with green rows elsewhere in its
# operator family, all green in the pytest sf0.01 oracle mirror):
# similarity_pq_rerank_topk, similarity_pq_m_sweep,
# dedup_edit_distance_incremental, mix_temperature_sweep,
# text_vocab_coverage_curve, corpus_compaction_plan.
# With those green, every oracled query has a driver row (219/219;
# bpe_train_merges is the one permanent rows-only entry, pytest-pinned
# and deliberately out of rotation).
# THEN re-gate the queries whose implementations changed AFTER round
# 6's cut was frozen (the expression-binding performance rewrites in
# shingle_array / fixed_chunk_array / winnow_key_array /
# _ordered_pair_structs / pq_subvectors / pq_encode_vec /
# repetition_score — output-identical by construction, green in this
# round's three full local oracle-mirror runs, and plan-guarded in
# tests/test_plan_quality.py, but their existing driver rows verified
# the pre-rewrite code): dedup_ngram_jaccard, dedup_ngram_containment,
# dedup_ngram_idf_jaccard, dedup_lsh_recall_audit, dedup_minhash_lsh,
# similarity_pq_fit, similarity_pq_encode, similarity_pq_topk,
# similarity_ivfpq_topk, similarity_pq_balance_audit,
# dedup_embedding_pq_blocking, pipeline_embed_index_search_e2e,
# text_frequent_chunks, text_remove_frequent_chunks,
# text_remove_frequent_chunks_incremental, text_dedup_chunks_inplace,
# text_repetition_score, text_decontamination_spans,
# pipeline_pretrain_e2e (queries already in round 6's gate got their
# rows on the new code and do not need this).
# Then resume the normal rotation:
# re-gate whatever round 7 changes, the two anchors, and fill the
# remaining ~40 slots with the oldest r2/r3-green rows
# (robots_filter_outcome, dedup_simhash, text_quality_features,
# text_lang_id, text_fingerprint, text_token_counts,
# sample_split_assign, sample_stratified, dedup_clusters, dedup_exact,
# t6_f12_formatting, o4_listing_engine, f1_f3_url_parse,
# f9_subject_closure, s7_sets_build, s7_groupings_build,
# view_sparkline, ctx_data_min, ctx_prelive_clamp, ctx_set_series,
# ctx_top_sets, ctx_grouping_top, geoip_range_join, view_monthly_graph,
# events_unique_visitors_approx, etl_downloads_fact, events_asof_prior,
# events_sessionize, a5_ratio_metric — the round-4 displaced-r2 list).
# Append every NEW registration to this comment so the debt ledger
# stays complete.


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
