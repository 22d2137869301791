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
# Round-13 rotation, cut from `python -m tools.gate_ledger` (ENFORCED:
# `--check 6` fails when a query's newest driver row would fall more
# than 6 rounds stale without a slot in this cut —
# tests/test_gate_ledger.py runs it).
#
# Slot budget (50):
# - the complete 24-query r6 remainder, promoted verbatim from the
#   round-12 staged NEXT_CUT (r12 verdict #7) — these turn 7 rounds
#   stale at round 13 without a slot, so they head the cut;
# - 2 anchors (A1 grouped sum, exact repeat) every round;
# - 1 re-gate slot for pack_sequences_offsets, the r12 verdict #2
#   reproduced regression this round must fix (fresh at r12, but its
#   implementation will change — re-gate discipline);
# - the remaining 23 slots go to the stalest r7 rows in ledger order
#   (`python -m tools.gate_ledger --debt 60`). This fill deliberately
#   covers the round-13 optimization targets
#   pipeline_embed_index_search_e2e and the graph family (r12 verdict
#   #4), so this round's changed rows mostly gate without extra swaps.
#   The 23 r7 rows displaced by this cut turn 7 rounds stale at
#   round 14 and are staged in NEXT_CUT below.
# - further rows CHANGED by round-13 optimization work are swapped
#   into the cut as they land (re-gate discipline), displacing the
#   newest ledger rows from the r7 fill.
GATE_PRIORITY: tuple[str, ...] = (
    # -- the 24-query r6 remainder (mandatory this round) --
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
    # -- continuously-verified core anchors --
    "a1_grouped_sum",
    "repeat_filter_exact",
    # -- re-gate: rows changed by round-13 optimization work --
    "pack_sequences_offsets",
    # -- stalest r7 rows, ledger order --
    "corpus_compaction_plan",
    "dedup_edit_distance_incremental",
    "dedup_embedding_pq_blocking",
    "dedup_exact",
    "dedup_lsh_recall_audit",
    "dedup_minhash_lsh",
    "dedup_ngram_containment",
    "dedup_ngram_idf_jaccard",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_simhash_hamming",
    "f1_f3_url_parse",
    "f9_subject_closure",
    "graph_label_propagation",
    "graph_pagerank",
    "graph_triangles",
    "mix_temperature_sweep",
    "o4_listing_engine",
    "pipeline_embed_index_search_e2e",
    "pipeline_neardup_maintenance_e2e",
    "pipeline_pretrain_e2e",
    "pipeline_rag_index_e2e",
    "robots_filter_outcome",
)
# NEXT_CUT: the STAGED round-14 cut (r10 verdict #5 mechanism). The
# driver writes CORRECTNESS_r13.json AFTER this round's final commit,
# which advances the ledger's "upcoming round" to 14 while
# GATE_PRIORITY still holds the consumed r13 cut — without staging,
# `--check 6` goes red at HEAD every round by construction.
# gate_ledger consults NEXT_CUT *only* when the newest artifact round
# EQUALS GATE_CUT_ROUND (i.e. the GATE_PRIORITY cut was just
# consumed); if a later artifact lands without a promotion, the check
# fails on purpose to surface the missed recut (r11 ADVICE medium).
# Round 14's first commit must still PROMOTE this tuple into
# GATE_PRIORITY (bumping GATE_CUT_ROUND) — queries() ordering, which
# is what the driver actually gates on, always follows GATE_PRIORITY.
# Staged at round-13 promotion time (the 23 r7 rows the round-13 fill
# displaces — the complete r7 remainder, which turns 7 rounds stale at
# round 14); extended at end of round 13 with any round-13-changed
# rows and re-verified with `--simulate-next 6` before the final
# commit.
GATE_CUT_ROUND = 13  # the round GATE_PRIORITY was cut FOR
NEXT_CUT: tuple[str, ...] = (
    # the r7 remainder displaced by the round-13 cut
    "sample_split_assign",
    "sample_split_leakage_safe",
    "sample_stratified",
    "similarity_ivfpq_topk",
    "similarity_pq_balance_audit",
    "similarity_pq_encode",
    "similarity_pq_fit",
    "similarity_pq_m_sweep",
    "similarity_pq_rerank_topk",
    "similarity_pq_topk",
    "t6_f12_formatting",
    "text_decontamination_spans",
    "text_dedup_chunks_inplace",
    "text_fingerprint",
    "text_frequent_chunks",
    "text_lang_id",
    "text_minhash_containment_asym",
    "text_quality_features",
    "text_remove_frequent_chunks",
    "text_remove_frequent_chunks_incremental",
    "text_repetition_score",
    "text_token_counts",
    "text_vocab_coverage_curve",
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
