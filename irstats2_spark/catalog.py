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
# Round-4 rotation (the set is re-cut each round so driver verification
# CYCLES through the whole catalog instead of freezing on one list):
# - the 15 queries NEW this round: both e2e compositions (pretraining
#   and embed->index->search), the PQ/IVF-PQ/scalar-quant family, the
#   Bloom prefilter, source stats, balanced sampling, the recall audit,
#   snapshot diff, contrastive pairs, and the vote classifier + its
#   top-fraction cut;
# - every query whose implementation changed this round — the
#   contamination family (explode_outer 0.0 rows, no forced broadcast),
#   the IVF/kmeans assignment family (-2.0 NULL-cosine sentinel +
#   centroid materialization), the embed stub (half-up rounding,
#   model_batch_rows), multimodal sniffing (prefix-only hex), and the
#   shingle-family consumers of word_shingles' keep_empty path;
# - ALL 13 queries whose only green row still dates to round 1;
# - two core anchors (A1 grouped sum, exact repeat) so the star-schema
#   spine stays continuously verified;
# - fill to 50 with the oldest r2-gated rows (the 30 displaced r2/r3
#   rows listed below head round 5's cut).
# Rotated out: the r3-green set just verified last round (they keep
# their pytest sf0.01 oracle runs either way).
GATE_PRIORITY: tuple[str, ...] = (
    # -- new in round 4 --
    "pipeline_pretrain_e2e",
    "pipeline_embed_index_search_e2e",
    "similarity_pq_topk",
    # (similarity_pq_fit and similarity_pq_encode ceded their slots to
    # pipeline_select_e2e and dedup_lsh_recall_audit: both stages are
    # replayed inside similarity_pq_topk's full SQL oracle — _pq_cte() +
    # _PQ_ENC — so their own rows are transitive; they keep the pytest
    # sf0.01 oracle runs and head round 5's cut.)
    "similarity_scalar_quant_error",
    "similarity_ivfpq_topk",
    "dedup_bloom_prefilter",
    "corpus_source_stats",
    "sample_balanced_topk",
    "similarity_recall_audit",
    "corpus_snapshot_diff",
    "pairs_contrastive_mining",
    "text_classifier_votes",
    "text_classifier_top_fraction_binned",
    # (text_classifier_top_fraction ceded its slot to
    # dedup_ngram_containment: the binned variant gated above verifies
    # the same cut semantics — exactly floor(frac*N) rows, same
    # above-boundary set — through the scale-path plan; the global-rank
    # form keeps its pytest sf0.01 oracle run and heads round 5's cut.)
    "dedup_embedding_pq_blocking",
    "text_ngram_novelty",
    "dedup_simhash_hamming",
    "select_dsir_weights",
    "bpe_pair_counts",
    "mix_by_temperature",
    "text_lm_nll_score",
    "dedup_ngram_containment",
    "dedup_lsh_recall_audit",
    "pipeline_select_e2e",
    "embedding_random_projection",
    "similarity_rp_topk",
    "text_chunk_windows",
    "pipeline_rag_index_e2e",
    # -- implementation changed this round: re-verify on today's code --
    "text_decontamination",
    "embed_text_stub",
    "similarity_ivf_topk",
    "similarity_ivf_probe2_topk",
    "similarity_kmeans_ivf_topk",
    # (similarity_ivf_assign and similarity_kmeans_fit ceded their slots
    # to the two random-projection queries: the assign fold is replayed
    # inside similarity_ivf_topk's oracle and the Lloyd fit inside
    # similarity_kmeans_ivf_topk's {kmeans_cte} — their sentinel-change
    # re-verification rides those gated full-chain replays; both keep
    # their pytest sf0.01 oracle runs and head round 5's cut.)
    "dedup_embedding_ivf",
    "dedup_embedding_ivf_probe2",
    "pipeline_curation_neardup",
    "pipeline_curation_summary",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    # (multimodal_decode_stub and dedup_minhash_signatures ceded their
    # slots to the new mix_by_temperature / text_lm_nll_score entries:
    # multimodal's round-4 change is plan-only — the prefix-hex sniff is
    # value-identical and its r3 row verified the same computed-byte
    # oracle; minhash signatures are an interior stage of the still-gated
    # dedup_minhash_lsh. Both keep their pytest sf0.01 oracle runs.)
    # -- r1-stale: only green row dates to round 1 --
    "p5_datafilter_eq",
    "t1_month_trunc",
    "o2_limit_offset",
    "a9_minmax_dates",
    "a10_top_values",
    "o4_alpha_listing",
    "t5_period_compare",
    "agg_cube_status_priority",
    "ctx_single_eprint",
    "browser_classification",
    "referrer_classification",
    # (a8_count_rows and anon_md5_values — the two most trivial r1-stale
    # entries, implementations untouched since r1 — ceded their refresh
    # slots to first-ever rows for text_chunk_windows and
    # pipeline_rag_index_e2e: a brand-new operator with NO driver row
    # outranks re-verifying an unchanged COUNT/md5 one-liner. Both keep
    # their r1 rows + pytest sf0.01 oracle runs and head round 5's cut.)
    # -- continuously-verified core anchor --
    "a1_grouped_sum",
)
# (repeat_filter_exact stepped out of the anchor pair for one round to make
# room for bpe_pair_counts: its r3 row is on unchanged code. bpe_train_merges
# is registered but ungated — its driver check would be rows-only, while the
# pytest suite verifies the full merge sequence against a sequential
# reference; the gate slot is better spent on a value-hashed query.)
# (The r2 fillers a2_sum_all / a3_daily_preagg cycled out when
# dedup_simhash_hamming and select_dsir_weights landed: their r2 rows stand,
# their implementations are unchanged, and a3's components were re-verified
# inside the r3 etl_* fact rows.)
# ROUND 5 MUST GATE FIRST (registered this round with NO driver row yet —
# their oracle runs live only in pytest until then): bpe_train_merges
# (rows-only), corpus_shard_manifest, mix_with_epochs,
# text_dedup_chunks_inplace, and the three transitively-verified interior
# stages similarity_pq_fit, similarity_pq_encode,
# text_classifier_top_fraction; plus dedup_cluster_quality_keepers and
# dedup_ngram_idf_jaccard (landed after the cut).
#
# Displaced to stay at 50 (r2-green, implementation unchanged since;
# they head round 5's cut): j1_fact_join_dim, j2_grouping_join, t2_densify,
# a6_a7_cumulative_running_avg, a5_ratio_metric,
# events_sessionize, events_asof_prior,
# events_unique_visitors_approx,
# etl_downloads_fact,
# robots_filter_outcome (its filter also
# re-verified this round inside etl_silver_views_fact),
# geoip_range_join, view_monthly_graph, ctx_set_series,
# ctx_top_sets, ctx_grouping_top, ctx_prelive_clamp, ctx_data_min,
# view_sparkline, s7_sets_build, s7_groupings_build,
# f9_subject_closure, f1_f3_url_parse, o4_listing_engine,
# t6_f12_formatting, dedup_exact, dedup_clusters, sample_split_assign,
# sample_stratified, dedup_simhash, text_token_counts,
# text_quality_features, text_lang_id, text_fingerprint.


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
