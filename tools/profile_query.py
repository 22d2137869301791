"""Per-query profiling harness for the optimization rounds.

Usage:
    python -m tools.profile_query NAME [NAME ...] [--passes 3] [--plan DIR/suffix]
        [--noop] [--sf-dir DIR]

Runs each named catalog query with the same session settings as bench.py,
reports per-pass wall seconds + Spark job/stage/task counts (from the
status tracker), and optionally writes `.explain("formatted")` to
plans/r12/<name>_<suffix>.txt. `--noop` times the computation against the
noop sink (guide §1.4) instead of collect(); bench methodology stays
collect(), so report both when they differ.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--plan", default=None,
                    help="write plans/<round>/<name>_<PLAN>.txt explain output")
    ap.add_argument("--plan-round", default="r13",
                    help="plans/ subdirectory the --plan output lands in")
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from irstats2_spark import catalog
    from irstats2_spark.session import get_spark

    spark = get_spark("irstats2_profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = catalog.queries()
    # same warmup as bench.py
    qs[list(qs)[0]](spark, args.sf_dir).count()
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, schema="id long").count()

    st = spark.sparkContext.statusTracker()
    for name in args.names:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"profile:{name}")
        times = []
        jobs0 = len(st.getJobIdsForGroup(None) or [])
        for i in range(args.passes):
            j0 = set(st.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf_dir)
            tb = time.perf_counter() - t0  # construction (plan build +
            # any bounded eager collects inside the operator)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            e = time.perf_counter() - t0
            j1 = set(st.getJobIdsForGroup(None) or [])
            times.append((e, tb, len(j1 - j0)))
        del jobs0
        t = ", ".join(f"{e:.3f}s(b{tb:.2f})/{n}j" for e, tb, n in times)
        best = min(e for e, _, _ in times)
        print(f"{name:45s} best={best:7.3f}  [{t}]")
        if args.plan:
            df = qs[name](spark, args.sf_dir)
            out = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            path = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "plans", args.plan_round, f"{name}_{args.plan}.txt")
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "w") as fh:
                fh.write(out)
            print(f"  plan -> {path}")


if __name__ == "__main__":
    main()
