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
# Round-11 rotation, cut from `python -m tools.gate_ledger` (ENFORCED:
# `--check 6` fails when a query's newest driver row would fall more
# than 6 rounds stale without a slot in this cut —
# tests/test_gate_ledger.py runs it).
#
# Slot budget (50):
# - the complete 19-query r4 remainder (pre-enumerated in the round-10
#   comment and in the r10 verdict/advice) — these would exceed the
#   6-round window in round 11 without a slot, so they head the cut;
# - 2 anchors (A1 grouped sum, exact repeat) every round;
# - new registrations this round gate immediately: multimodal_dims
#   (real PNG/JPEG/GIF header decode, r10 verdict #3),
#   sample_score_calibration_merge (the mergeable-histogram
#   incremental calibration tier, r10 verdict #6),
#   text_classifier_top_fraction_approx (the continuous-score
#   two-phase quality cut the exact form's docstring promised), and
#   pipeline_multimodal_e2e (the eighth gated e2e composition:
#   synthesize -> decode -> gate -> per-format stats);
# - 7 rows CHANGED this round: the score-calibration pair (the binned
#   form's NULL-score join drop — r10 ADVICE medium — means both forms
#   change together to keep the bit-identity contract), the k-skyband
#   pair (the `_skyband_fold` searchsorted side fix — r10 ADVICE low),
#   and the three skyline rows (unique-vector collapse + d=2 staircase
#   + partition-parallel merges — r10 verdict #4);
# - the remaining 18 slots go to the stalest r5 rows in ledger order
#   (`python -m tools.gate_ledger --debt 40`). The r5 remainder
#   (pipeline_semdedup_e2e .. text_winnow_fingerprints) is round 12's
#   rotation debt — the displaced r5 rows turn 7 rounds stale at
#   round 12, so they are staged in NEXT_CUT below.
GATE_PRIORITY: tuple[str, ...] = (
    # -- the 19-query r4 remainder (mandatory this round) --
    "pipeline_curation_summary",
    "pipeline_select_e2e",
    "referrer_classification",
    "sample_balanced_topk",
    "select_dsir_weights",
    "similarity_ivf_probe2_topk",
    "similarity_ivf_topk",
    "similarity_kmeans_ivf_topk",
    "similarity_recall_audit",
    "similarity_rp_topk",
    "similarity_scalar_quant_error",
    "t1_month_trunc",
    "t5_period_compare",
    "text_chunk_windows",
    "text_classifier_top_fraction_binned",
    "text_classifier_votes",
    "text_decontamination",
    "text_lm_nll_score",
    "text_ngram_novelty",
    # -- continuously-verified core anchors --
    "a1_grouped_sum",
    "repeat_filter_exact",
    # -- NEW registrations this round (gate immediately) --
    "multimodal_dims",
    "sample_score_calibration_merge",
    "text_classifier_top_fraction_approx",
    "pipeline_multimodal_e2e",
    # -- re-gate: rows changed in round 11 (ADVICE fixes + the
    #    unique-collapse/staircase/parallel-merge fold rework) --
    "sample_score_calibration_by_source",
    "sample_score_calibration_binned",
    "select_k_skyband",
    "select_k_skyband_incremental",
    "select_pareto_skyline",
    "select_pareto_skyline_incremental",
    "select_pareto_skyline_3axis",
    # -- stalest r5 rows, ledger order --
    "a6_a7_cumulative_running_avg",
    "a8_count_rows",
    "anon_md5_values",
    "corpus_deterministic_shuffle",
    "corpus_dup_rate_by_source",
    "corpus_length_histogram",
    "corpus_shard_manifest",
    "corpus_shard_manifest_hierarchical",
    "dedup_cluster_quality_keepers",
    "dedup_simhash_incremental",
    "dedup_winnowing",
    "dedup_winnowing_incremental",
    "j1_fact_join_dim",
    "j2_grouping_join",
    "mix_by_temperature_tokens",
    "mix_with_epochs",
    "mix_with_epochs_tokens",
    "pack_efficiency_audit",
)
# NEXT_CUT: the STAGED round-12 cut (r10 verdict #5). The driver writes
# CORRECTNESS_r11.json AFTER this round's final commit, which advances
# the ledger's "upcoming round" to 12 while GATE_PRIORITY still holds
# the consumed r11 cut — without staging, `--check 6` goes red at HEAD
# every round by construction. gate_ledger consults NEXT_CUT *only*
# when the newest artifact round has caught up with GATE_CUT_ROUND
# (i.e. the GATE_PRIORITY cut is consumed); until then the active cut
# is GATE_PRIORITY and NEXT_CUT is inert. Round 12's first commit must
# still PROMOTE this tuple into GATE_PRIORITY (bumping GATE_CUT_ROUND)
# — queries() ordering, which is what the driver actually gates on,
# always follows GATE_PRIORITY. Empty until cut at end of round 11.
GATE_CUT_ROUND = 11  # the round GATE_PRIORITY was cut FOR
# The 13 names below are exactly the queries whose newest driver row
# (assuming CORRECTNESS_r11 verifies the cut above) turns 7 rounds
# stale at round 12 — the complete r5 remainder. Round 12's first
# commit must PROMOTE these into GATE_PRIORITY (bump GATE_CUT_ROUND to
# 12, add the two anchors, round-12 changes, then stalest r6 rows per
# `python -m tools.gate_ledger --debt 40` to fill 50 slots).
NEXT_CUT: tuple[str, ...] = (
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
)
# Bench baseline note: the
# committed BENCH_DETAIL.json is the r11 idle run — 203.3 s over 238
# catalog queries (ratio 1.003 vs the r10 baseline over the 235 common
# queries; one contention-window attempt at 228.9 s with calib_io 1.3x
# was rejected per protocol; calib_sec 0.145 / calib_io_sec 0.268) —
# plus pipeline_multimodal_e2e (0.77 s) spliced from the follow-up
# idle run whose whole-run ratio was 1.056, so that one entry may read
# ~3-5% pessimistic (provenance in the file's producer field). Total
# 204.1 s / 239 queries, 0 failed, 0 run-only. The r10 numbers for
# reference: 199.9 s / 235 queries, calib 0.144 / 0.315.
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
