"""Benchmark harness: runs the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line with per-query wall-clock seconds.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from irstats2_spark import catalog
from irstats2_spark.session import get_spark

HEADLINE = [
    # core star-schema operator shapes
    "a1_grouped_sum",
    "a3_daily_preagg",
    "j1_fact_join_dim",
    "j2_grouping_join",
    "p7_semi_join",
    "t2_densify",
    "o3_topn",
    "a6_a7_cumulative_running_avg",
    # irstats2 engine paths (ETL + Context compilation + views)
    "etl_downloads_fact",
    "etl_silver_views_fact",
    "ctx_daily_series",
    "ctx_top_eprints",
    "ctx_set_series",
    "ctx_grouping_top",
    "view_monthly_graph",
    "view_sparkline",
    "repeat_filter_exact",
    "robots_filter_outcome",
    "search_term_extraction",
    "geoip_range_join",
    # training-data pipeline
    "dedup_exact",
    "dedup_clusters",
    "sample_split_assign",
    "sample_stratified",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_embedding_ivf",
    "similarity_bruteforce_topk",
    "similarity_ivf_assign",
    "similarity_ivf_topk",
    "similarity_kmeans_fit",
    "similarity_kmeans_ivf_topk",
    "similarity_hyperplane_sig",
    "similarity_hyperplane_topk",
    "text_quality_features",
    "text_lang_id",
    "pipeline_curation_summary",
    "text_pii_scrub",
    "pipeline_curation_neardup",
    "sample_weighted",
    "dedup_exact_incremental",
    "dedup_minhash_incremental",
    # extensions (rollup, sessionization, distinct agg, chunk dedup, vocab)
    "agg_rollup_monthly",
    "events_sessionize",
    "events_unique_visitors",
    "text_chunk_dedup",
    "text_vocab_topk",
    "events_asof_prior",
    "agg_argmax_order",
    "agg_topk_per_group",
    "agg_pivot_monthly",
    "join_anti_no_purchase",
    "text_tfidf_top_term",
    "join_salted_skew",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("irstats2_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")
    all_queries = catalog.queries()
    names = [n for n in HEADLINE if n in all_queries]
    # warm the JVM + parquet footers + Python/Arrow workers once so
    # per-query numbers measure the plans, not process startup
    all_queries[names[0]](spark, sf_dir).count()
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, schema="id long").count()

    # Three passes per query, report the fastest: pass 1 absorbs one-time
    # costs (janino codegen compile, JVM JIT, Python worker spawn) that
    # local-mode restarts repay on every process but a long-lived cluster
    # pays once; later passes are the steady-state plan cost we're tuning.
    # Best-of-3 (vs round 1's best-of-2) because this VM shows up to 2x
    # run-to-run variance — round-over-round deltas need the extra sample.
    per_query: dict[str, float] = {}
    failed: list[str] = []
    for name in names:
        best = None
        try:
            for _ in range(3):
                t0 = time.perf_counter()
                df = all_queries[name](spark, sf_dir)
                df.collect()
                elapsed = time.perf_counter() - t0
                best = elapsed if best is None else min(best, elapsed)
        except Exception as exc:  # one broken query must not zero the run
            print(f"bench: {name} FAILED: {exc}", file=sys.stderr)
            failed.append(name)
            continue
        per_query[name] = round(best, 4)

    total = round(sum(per_query.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
                **({"failed": failed} if failed else {}),
            }
        )
    )


if __name__ == "__main__":
    main()
