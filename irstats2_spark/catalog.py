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
# Round-8 rotation. The ledger is now SCRIPTED: `python -m
# tools.gate_ledger` reads every CORRECTNESS_r*.json and prints each
# query's most recent driver-verified round (oldest first) — the cut
# below is its output plus this round's changes. Slot budget (50):
# - 3 NEW registrations: the suffix-array exact-substring family
#   (repeated_substrings, repeated_substrings_incremental,
#   exact_substring_coverage) — staged in r7, registered this round
#   after parallelizing the interval sweep by stretch (the r7 verdict's
#   one `weak` finding); their oracle is the independent declarative
#   maximal-repeat characterization (>= 2 distinct left/right
#   contexts). streaming/ingest.substring_match_stream stays
#   pytest-pinned like the other streaming twins (no batch surface).
# - 1 NEWLY ORACLED: bpe_train_merges — the last rows-only entry now
#   carries an unrolled bounded-round CTE oracle (the graph-tier
#   idiom), making the catalog 223/223 value-oracled.
# - changed this round: dedup_simhash_quality_audit (truth side now
#   flows lazily through one shared shingle pin — the r7 advice's
#   double-checkpoint fix).
# - 2 anchors (A1 grouped sum, exact repeat) every round;
# - ALL 18 remaining r2-stale rows (the round-4 displaced-r2 list plus
#   a2_sum_all / a3_daily_preagg / dedup_minhash_signatures) — after
#   this cut nothing older than r3 remains;
# - 25 oldest r3-stale rows (alphabetical head of the ledger); the
#   ~14-query r3 remainder (search_term_extraction, the similarity_*
#   base tier, text_* quantiles/vocab, view_compare_years) is round
#   9's rotation debt.
GATE_PRIORITY: tuple[str, ...] = (
    # -- new registrations (gate these FIRST) --
    "repeated_substrings",
    "repeated_substrings_incremental",
    "exact_substring_coverage",
    # -- newly oracled / changed this round --
    "bpe_train_merges",
    "dedup_simhash_quality_audit",
    # -- continuously-verified core anchors --
    "a1_grouped_sum",
    "repeat_filter_exact",
    # -- the 18 r2-stale rows (complete; nothing r2 remains after this) --
    "a2_sum_all",
    "a3_daily_preagg",
    "a5_ratio_metric",
    "ctx_data_min",
    "ctx_grouping_top",
    "ctx_prelive_clamp",
    "ctx_set_series",
    "ctx_top_sets",
    "dedup_minhash_signatures",
    "etl_downloads_fact",
    "events_asof_prior",
    "events_sessionize",
    "events_unique_visitors_approx",
    "geoip_range_join",
    "s7_groupings_build",
    "s7_sets_build",
    "view_monthly_graph",
    "view_sparkline",
    # -- 25 oldest r3-stale rows (ledger order) --
    "agg_argmax_order",
    "agg_pivot_monthly",
    "agg_rollup_monthly",
    "agg_topk_per_group",
    "ctx_daily_series",
    "ctx_lifetime_total",
    "ctx_top_eprints",
    "dedup_embedding_cosine",
    "dedup_exact_incremental",
    "dedup_minhash_incremental",
    "dedup_url_canonical",
    "etl_doc_downloads_fact",
    "etl_silver_views_fact",
    "etl_views_fact",
    "events_unique_visitors",
    "join_anti_no_purchase",
    "join_salted_skew",
    "meta_json_extract",
    "mix_by_source_cap",
    "multimodal_decode_stub",
    "o3_topn",
    "p3_date_range",
    "p7_semi_join",
    "pack_training_sequences",
    "sample_weighted",
)
# ROUND 9 SHOULD GATE: exact_substring_remove,
# exact_substring_remove_incremental and exactsubstr_removal_audit
# (registered r8 past the 50-slot cut — never-gated), whatever round 9
# changes, the two anchors, then the r3-stale remainder per
# `python -m tools.gate_ledger --debt 40`
# (search_term_extraction, similarity_bruteforce_topk,
# similarity_hyperplane_sig, similarity_hyperplane_topk,
# similarity_ivf_assign, similarity_kmeans_fit, text_chunk_dedup,
# text_length_quantiles, text_length_quantiles_approx, text_pii_scrub,
# text_tfidf_top_term, text_vocab_heavyhitters_approx, text_vocab_topk,
# view_compare_years), then oldest r4 rows.
# Append every NEW registration to this comment AND re-gate any query
# whose implementation changes after the cut freezes.


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
