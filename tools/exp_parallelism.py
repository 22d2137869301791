"""Scratch experiment (r12): measure per-query sensitivity to
(a) the ensure_parallelism repartition target and
(b) AQE coalescePartitions.parallelismFirst,
on a fixed representative query subset. Run in a fresh process per
configuration:

    python -m tools.exp_parallelism [--min-parts N] [--pfirst-false] \
        [--names q1,q2,...]
"""

from __future__ import annotations

import argparse
import os
import time

NAMES = [
    "select_dsir_weights",
    "dedup_ngram_idf_jaccard",
    "text_minhash_containment_asym",
    "dedup_lsh_band_sweep",
    "pipeline_embed_index_search_e2e",
    "bpe_train_merges",
    "similarity_ivf_probe_sweep",
    "pipeline_semdedup_e2e",
    "text_lm_nll_score",
    "pack_sequences_offsets",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-parts", type=int, default=None)
    ap.add_argument("--pfirst-false", action="store_true")
    ap.add_argument("--names", default=None)
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()
    names = args.names.split(",") if args.names else NAMES

    extra = {}
    if args.pfirst_false:
        extra["spark.sql.adaptive.coalescePartitions.parallelismFirst"] = (
            "false"
        )

    from irstats2_spark import catalog, parallel
    from irstats2_spark.session import get_spark

    if args.min_parts is not None:
        orig = parallel.ensure_parallelism

        def patched(df, min_partitions=None):
            return orig(df, min_partitions or args.min_parts)

        parallel.ensure_parallelism = patched
        # call sites import the symbol at call time from the module, but
        # some import at module import time — patch those too
        import irstats2_spark.pipeline.dedup as _d
        import irstats2_spark.pipeline.embed as _e
        import irstats2_spark.pipeline.similarity as _s
        import irstats2_spark.pipeline.textstats as _t

        for mod in (_d, _e, _s, _t):
            if hasattr(mod, "ensure_parallelism"):
                mod.ensure_parallelism = patched

    spark = get_spark("exp_parallelism", extra_conf=extra or None)
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = catalog.queries()
    qs[list(qs)[0]](spark, sf_dir).count()
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, schema="id long").count()

    label = (
        f"min_parts={args.min_parts} pfirst_false={args.pfirst_false}"
    )
    total = 0.0
    for name in names:
        best = None
        for _ in range(args.passes):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).collect()
            e = time.perf_counter() - t0
            best = e if best is None else min(best, e)
        total += best
        print(f"  {name:42s} {best:7.3f}")
    print(f"EXP [{label}] subset_total={total:.3f}")


if __name__ == "__main__":
    main()
