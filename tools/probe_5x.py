"""5x scaling probe for the two sweep audits (r11 verdict #5): build
the 5x corpus as id-shifted copies (the skyline/suffix probe recipe),
then measure

- similarity_ivf_probe_sweep's ivf_probe_sweep_audit at 1x vs 5x:
  the SHIPPED shape (since the second r12 pass: candidates scored once
  at p_max, branches derived by probe-rank filter) vs the superseded
  per-branch shape (persisted corpus assignment + one ivf_topk pass
  per probe count), with an output-equality check;
- dedup_lsh_band_sweep's lsh_band_sweep_audit at 1x vs 5x (its shared
  scans are explicitly cached since the r12 single-explode rework —
  the 5x point documents the wall-clock growth).

Usage: python -m tools.probe_5x [--passes 3]
"""

from __future__ import annotations

import argparse
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    from irstats2_spark.pipeline.dedup import lsh_band_sweep_audit
    from irstats2_spark.pipeline.similarity import ivf_probe_sweep_audit
    from irstats2_spark.session import get_spark
    from irstats2_spark.sources.testdata import load_table

    spark = get_spark("probe_5x")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"

    def times5(df: DataFrame, id_col: str) -> DataFrame:
        parts = [
            df.withColumn(id_col, F.col(id_col) + F.lit(i * 10_000_000))
            for i in range(5)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.localCheckpoint()  # pin the 5x input so the probe
        # times the operator, not the synthetic-union scan

    emb1 = load_table(spark, "embeddings", sf).localCheckpoint()
    emb5 = times5(load_table(spark, "embeddings", sf), "vec_id")
    docs1 = load_table(spark, "documents", sf).localCheckpoint()
    docs5 = times5(load_table(spark, "documents", sf), "doc_id")

    def cents_queries(emb):
        cents = emb.filter(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("centroid_vec"),
        )
        queries = emb.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        return cents, queries

    def bench(label, fn):
        best = None
        for _ in range(args.passes):
            t0 = time.perf_counter()
            rows = fn().collect()
            e = time.perf_counter() - t0
            best = e if best is None else min(best, e)
        print(f"{label:55s} {best:7.3f}s  ({len(rows)} rows)")
        return best, rows

    def sweep(emb):
        c, q = cents_queries(emb)
        return ivf_probe_sweep_audit(emb, c, q)

    def sweep_persisted(emb):
        from irstats2_spark.pipeline.similarity import (
            brute_force_topk,
            ivf_assign,
            ivf_probe_assign,
            ivf_topk,
        )
        from functools import reduce

        c, q = cents_queries(emb)
        bf = brute_force_topk(emb, q, k=5).select("query_id", "vec_id").persist()
        assigned = ivf_assign(emb, c).persist()
        branches = []
        for p in (1, 2, 3, 4):
            qa = ivf_probe_assign(q, c, n_probe=p)
            approx = ivf_topk(assigned, qa, k=5).select("query_id", "vec_id")
            joined = bf.alias("b").join(
                approx.alias("i"),
                (F.col("b.query_id") == F.col("i.query_id"))
                & (F.col("b.vec_id") == F.col("i.vec_id")),
                "left",
            )
            branches.append(
                joined.agg(
                    F.count(F.lit(1)).cast("long").alias("n_exact"),
                    F.sum(
                        F.when(F.col("i.vec_id").isNotNull(), 1).otherwise(0)
                    ).cast("long").alias("n_hit"),
                ).select(
                    F.lit(p).cast("int").alias("n_probes"),
                    "n_exact",
                    "n_hit",
                    F.round(F.col("n_hit") / F.col("n_exact"), 6).alias(
                        "recall_at_5"
                    ),
                )
            )
        out = reduce(lambda a, b: a.unionByName(b), branches).localCheckpoint()
        bf.unpersist()
        assigned.unpersist()
        return out

    b1, r1 = bench("probe_sweep 1x (shipped single-scoring)", lambda: sweep(emb1))
    b5, r5 = bench("probe_sweep 5x (shipped single-scoring)", lambda: sweep(emb5))
    p1, pr1 = bench("probe_sweep 1x (superseded per-branch persist)", lambda: sweep_persisted(emb1))
    p5, pr5 = bench("probe_sweep 5x (superseded per-branch persist)", lambda: sweep_persisted(emb5))
    same1 = sorted(map(tuple, r1)) == sorted(map(tuple, pr1))
    same5 = sorted(map(tuple, r5)) == sorted(map(tuple, pr5))
    print(f"probe_sweep: 5x/1x shipped={b5 / b1:.2f}  per-branch={p5 / p1:.2f}  "
          f"shipped-vs-per-branch at 5x: {b5 / p5:.2f}x  outputs equal: {same1 and same5}")

    l1, _ = bench("band_sweep 1x", lambda: lsh_band_sweep_audit(docs1))
    l5, _ = bench("band_sweep 5x", lambda: lsh_band_sweep_audit(docs5))
    print(f"band_sweep: 5x/1x = {l5 / l1:.2f}")


if __name__ == "__main__":
    main()
