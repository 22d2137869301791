"""Benchmark decontamination: n-gram overlap between a training corpus and
an evaluation/benchmark set.

Before training, every serious pipeline checks the corpus for documents
that leak evaluation data (the eval set's questions/answers appearing
verbatim or near-verbatim in a crawled page) and drops or flags them.
The standard detector is k-gram overlap: shingle both sides into k-word
n-grams over normalized text, and score each training document by the
fraction of its shingles that appear anywhere in the benchmark set.

Scale shape (the corpus is huge, the benchmark side is small — thousands
of eval documents against billions of training docs):

- shingling is the same map-side array expression as the dedup family
  (``dedup.word_shingles``: sequence+slice, no shuffle to build);
- the benchmark's DISTINCT shingle set is the build side of a BROADCAST
  join — the corpus is never shuffled; each corpus shingle probes the
  broadcast hash relation map-side;
- the per-doc rollup groups by doc_id over (doc_id, shingle-hit) rows —
  ONE shuffle, carrying only ids and booleans, never text.

A LEFT join + conditional count (rather than a semi-join + re-join)
keeps docs with zero overlap in the output in the same single pass —
the decision predicate (``contamination_frac >= tau``) needs every doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from irstats2_spark.pipeline.dedup import word_shingles


def contamination_scores(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Per-document benchmark-overlap scores.

    Output: (doc_id, n_shingles, n_contaminated, contamination_frac) —
    frac = |doc's distinct k-gram shingles found in the benchmark| /
    |doc's distinct k-gram shingles|. Docs too short to shingle (< k
    words) emit a (doc_id, 0, 0, 0.0) row — the decision predicate
    downstream needs every doc, and an unshingleable doc cannot be
    flagged; ``keep_empty`` shingling (explode_outer) preserves them as
    a NULL-shingle row that the conditional counts below score as zero.
    """
    doc_sh = word_shingles(docs, text_col, id_col, k=k, keep_empty=True)
    bench_sh = (
        word_shingles(
            benchmark.select(F.col(bench_text_col).alias("text"), F.lit(0).alias("bid")),
            "text",
            "bid",
            k=k,
        )
        .select("shingle")
        .distinct()
    )
    hits = doc_sh.join(
        F.broadcast(bench_sh.withColumn("__hit", F.lit(1))), "shingle", "left"
    )
    # count("shingle") skips the NULL row a shingle-less doc carries, so
    # it lands at (0, 0); try_divide makes the 0/0 ratio NULL (not an
    # ANSI error) -> coalesced to the documented 0.0
    return hits.groupBy(F.col("doc_id")).agg(
        F.count("shingle").alias("n_shingles"),
        F.count("__hit").alias("n_contaminated"),
        F.coalesce(
            F.round(F.try_divide(F.count("__hit"), F.count("shingle")), 6),
            F.lit(0.0),
        ).alias("contamination_frac"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    tau: float = 0.1,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop documents whose contamination fraction reaches ``tau``.

    Docs too short to produce a shingle are KEPT (they score 0.0; they
    cannot leak a k-gram). Returns the surviving docs; the anti-join
    back to the doc table is on doc_id with NO forced broadcast hint:
    AQE picks a broadcast anti-join at runtime when the flagged set is
    small (the common case), and degrades to a key-only shuffle — which
    never carries text on the flagged side — when a heavily contaminated
    corpus pushes the flagged set past the broadcast threshold. (A
    forced F.broadcast() here would OOM in exactly the case the size
    guard on embedding_cosine_dups exists to prevent.)
    """
    scores = contamination_scores(
        docs, benchmark, k=k, text_col=text_col, id_col=id_col
    )
    flagged = scores.filter(F.col("contamination_frac") >= tau).select(
        F.col("doc_id").alias("__flagged_id")
    )
    return docs.join(
        flagged,
        docs[id_col] == F.col("__flagged_id"),
        "left_anti",
    )
