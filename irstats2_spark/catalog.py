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
# Round-7 rotation — LEDGER COMPLETION (round-6 verdict ask #1): with
# this cut green, every oracled catalog query (219/220) has a driver
# row verifying CURRENT code; bpe_train_merges stays the one permanent
# rows-only entry (no SQL oracle, pytest-pinned, out of rotation).
# Slot budget (50):
# - 6 debt queries deferred from round 6's cut (stable since r3, green
#   in every local mirror run, family-verified elsewhere);
# - 19 stale re-gates: the expression-binding perf rewrites landed
#   AFTER round 6's cut froze (shingle_array / fixed_chunk_array /
#   winnow_key_array / _ordered_pair_structs / pq_subvectors /
#   pq_encode_vec / repetition_score) — output-identical by
#   construction and plan-guarded, but their existing rows verified
#   pre-rewrite code;
# - 9 queries whose implementation changed THIS round: the audit
#   eager-release defaults (dedup_lsh_recall_audit is already in the 19;
#   dedup_simhash_quality_audit, text_minhash_containment_asym), the
#   e2e pin releases (pipeline_embed_index_search_e2e in the 19;
#   pipeline_rag_index_e2e), the shared SimHash banded-pair prefix
#   (dedup_simhash_hamming, sample_split_leakage_safe,
#   pipeline_neardup_maintenance_e2e), and the graph tier whose memo
#   keying gained a testdata fingerprint (graph_pagerank,
#   graph_triangles, graph_label_propagation — output-identical, but
#   the rows should verify the code as it ships);
# - 2 anchors (A1 grouped sum, exact repeat) every round;
# - 14 oldest-rotation slots from the round-4 displaced-r2 list.
# embedding_pca_project's oracle now derives its VALUES list from the
# same _PCA_KS constant the query passes — the generated SQL is
# byte-identical to the r6-verified string, so no re-gate is spent.
GATE_PRIORITY: tuple[str, ...] = (
    # -- the 6 deferred debt queries (gate these FIRST) --
    "similarity_pq_rerank_topk",
    "similarity_pq_m_sweep",
    "dedup_edit_distance_incremental",
    "mix_temperature_sweep",
    "text_vocab_coverage_curve",
    "corpus_compaction_plan",
    # -- the 19 stale re-gates (post-freeze expression-binding rewrites) --
    "dedup_ngram_jaccard",
    "dedup_ngram_containment",
    "dedup_ngram_idf_jaccard",
    "dedup_lsh_recall_audit",
    "dedup_minhash_lsh",
    "similarity_pq_fit",
    "similarity_pq_encode",
    "similarity_pq_topk",
    "similarity_ivfpq_topk",
    "similarity_pq_balance_audit",
    "dedup_embedding_pq_blocking",
    "pipeline_embed_index_search_e2e",
    "text_frequent_chunks",
    "text_remove_frequent_chunks",
    "text_remove_frequent_chunks_incremental",
    "text_dedup_chunks_inplace",
    "text_repetition_score",
    "text_decontamination_spans",
    "pipeline_pretrain_e2e",
    # -- changed this round (cache lifecycle + shared prefixes) --
    "dedup_simhash_quality_audit",
    "text_minhash_containment_asym",
    "pipeline_rag_index_e2e",
    "dedup_simhash_hamming",
    "sample_split_leakage_safe",
    "pipeline_neardup_maintenance_e2e",
    "graph_pagerank",
    "graph_triangles",
    "graph_label_propagation",
    # -- continuously-verified core anchors --
    "a1_grouped_sum",
    "repeat_filter_exact",
    # -- oldest-rotation fill (round-4 displaced-r2 list) --
    "robots_filter_outcome",
    "dedup_simhash",
    "text_quality_features",
    "text_lang_id",
    "text_fingerprint",
    "text_token_counts",
    "sample_split_assign",
    "sample_stratified",
    "dedup_clusters",
    "dedup_exact",
    "t6_f12_formatting",
    "o4_listing_engine",
    "f1_f3_url_parse",
    "f9_subject_closure",
)
# ROUND 8 SHOULD GATE: whatever round 8 changes, the two anchors, and
# the oldest remaining rotation debt, in this order:
# - the rest of the round-4 displaced-r2 list not re-gated above:
#   s7_sets_build, s7_groupings_build, view_sparkline, ctx_data_min,
#   ctx_prelive_clamp, ctx_set_series, ctx_top_sets, ctx_grouping_top,
#   geoip_range_join, view_monthly_graph, events_unique_visitors_approx,
#   etl_downloads_fact, events_asof_prior, events_sessionize,
#   a5_ratio_metric;
# - then oldest r3-green rows;
# - STAGED NEW REGISTRATIONS (round 7 kept the catalog frozen at 220
#   per the r6 verdict; these are implemented + sequential-reference-
#   pinned in tests/test_suffix.py and should register WITH oracle +
#   gate slots in round 8): pipeline/suffix.py's repeated_substrings
#   (suffix-array maximal-repeat miner, full lcp-interval enumeration),
#   repeated_substrings_incremental (new-vs-snapshot nightly twin),
#   exact_substring_coverage (arbitrary-length dup-span fraction) and
#   streaming/ingest.substring_match_stream (ingest-time exact-run
#   probe of the same stored window snapshot). The registration-ready
#   DuckDB oracle (declarative maximal-repeat characterization:
#   L-grams with >=2 distinct left AND right contexts) already passes
#   at sf0.01 — see
#   test_suffix.test_repeated_substrings_matches_duckdb_oracle_at_sf001.
# Queries whose ONLY change this round was gaining a no-op
# ``materialize=False`` keyword (release_after returns the identical
# DataFrame object when False) were NOT re-gated: text_tfidf_top_term,
# text_dup_span_coverage, text_cdc_remove_frequent, dedup_clusters
# (also in the rotation fill anyway), dedup_cluster_quality_keepers,
# pipeline_dedup_cascade_audit, pipeline_select_e2e — their existing
# rows still verify the code path that executes.
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
