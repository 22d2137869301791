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
GATE_PRIORITY: tuple[str, ...] = (
    # -- never driver-verified in round 1: LLM-pipeline family --
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_signatures",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_embedding_ivf",
    "similarity_bruteforce_topk",
    "similarity_ivf_assign",
    "similarity_ivf_topk",
    "similarity_hyperplane_sig",
    "similarity_hyperplane_topk",
    "sample_split_assign",
    "sample_stratified",
    "pipeline_curation_summary",
    "text_token_counts",
    "text_quality_features",
    "text_lang_id",
    "text_fingerprint",
    "multimodal_decode_stub",
    # -- never driver-verified in round 1: engine long tail --
    "s7_sets_build",
    "s7_groupings_build",
    "ctx_grouping_top",
    "ctx_prelive_clamp",
    "ctx_data_min",
    "ctx_top_sets",
    "f1_f3_url_parse",
    "f9_subject_closure",
    "t6_f12_formatting",
    "o4_listing_engine",
    "view_sparkline",
    # -- round-1 hash fails (oracle dtype casts fixed this round) --
    "view_monthly_graph",
    "ctx_set_series",
    "a5_ratio_metric",
    "a6_a7_cumulative_running_avg",
    # -- upgraded from rows-only to value oracles this round --
    "repeat_filter_exact",
    "events_unique_visitors_approx",
    # -- new this round: full-pipeline end-to-end (robots+repeat+fact) --
    "etl_silver_views_fact",
    # -- fill to 50 with representative round-1-green coverage --
    "a1_grouped_sum",
    "a2_sum_all",
    "a3_daily_preagg",
    "j1_fact_join_dim",
    "j2_grouping_join",
    "etl_downloads_fact",
    "geoip_range_join",
    "events_sessionize",
    "robots_filter_outcome",
    "t2_densify",
    "events_asof_prior",
)


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
