"""The pipeline.lifecycle contract (round-6 verdict ask #3): audit
operators release every DataFrame pin before returning, and composable
operators release theirs under ``materialize=True`` with identical
results to the default lazy form.

The assertion target is the SQL CacheManager (``persist()``/``cache()``
entries), not ``getPersistentRDDs()``: ``localCheckpoint`` blocks also
appear in the RDD-level view but are ContextCleaner-managed (released
when the result DataFrame is garbage collected), while CacheManager
entries are held by the manager itself until an explicit unpersist —
the long-lived-service leak the contract exists to prevent.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from irstats2_spark.pipeline import curate, dedup, pq, suffix, textstats

SF = "/root/testdata/sf0.001"


def _cache_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


@pytest.fixture()
def docs(spark):
    spark.catalog.clearCache()
    d = spark.read.parquet(f"{SF}/documents.parquet").limit(120)
    yield d
    spark.catalog.clearCache()


def test_audits_release_their_pins(spark, docs):
    audits = [
        lambda: dedup.lsh_recall_audit(docs, k=3, threshold=0.5),
        lambda: dedup.minhash_containment_audit(docs, k=3),
        lambda: dedup.simhash_quality_audit(docs, k=3, threshold=0.5),
        lambda: dedup.lsh_band_sweep_audit(docs, k=3),
        lambda: curate.source_shingle_overlap(docs, k=3),
    ]
    for build in audits:
        out = build()
        assert out.count() >= 0
        assert _cache_empty(spark), f"{build} left a CacheManager entry"


def test_materialize_true_releases_and_matches_lazy(spark, docs):
    cases = [
        lambda m: dedup.minhash_lsh_dedup(docs, threshold=0.5, materialize=m),
        lambda m: dedup.ngram_idf_jaccard_pairs(docs, threshold=0.3, materialize=m),
        lambda m: dedup.ngram_jaccard_pairs(docs, threshold=0.3, materialize=m),
        lambda m: dedup.ngram_containment_pairs(docs, threshold=0.5, materialize=m),
        lambda m: textstats.tfidf_top_term(docs, materialize=m),
        lambda m: textstats.duplicate_span_coverage(docs, materialize=m),
        lambda m: textstats.remove_corpus_frequent_chunks(docs, materialize=m),
        lambda m: textstats.remove_cdc_frequent_chunks(docs, materialize=m),
        lambda m: suffix.repeated_substrings(
            docs, min_len=4, max_span=8, materialize=m
        ),
        lambda m: suffix.exact_substring_coverage(
            docs, min_len=4, max_span=8, materialize=m
        ),
    ]
    for build in cases:
        lazy = build(False)
        want = sorted(map(tuple, lazy.collect()))
        assert not _cache_empty(spark), f"{build}: lazy form should pin"
        spark.catalog.clearCache()  # caller-owned release, per the contract

        eager = build(True)
        assert _cache_empty(spark), f"{build}: materialize=True left a pin"
        assert sorted(map(tuple, eager.collect())) == want


def test_ivfpq_topk_materialize_releases_residual_pin(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(80)
    spark.catalog.clearCache()
    cents = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    dim = len(emb.select("embedding").first()[0])
    out = pq.ivfpq_topk(
        emb, cents, queries, dim=dim, m=4, n_codes=4, k=3, materialize=True
    )
    assert out.count() > 0
    assert _cache_empty(spark)


def test_e2e_queries_leave_nothing_pinned(spark):
    from irstats2_spark import catalog

    qs = catalog.queries()
    spark.catalog.clearCache()
    for name in ("pipeline_embed_index_search_e2e", "pipeline_rag_index_e2e"):
        assert qs[name](spark, SF).count() > 0
        assert _cache_empty(spark), f"{name} left a CacheManager entry"
