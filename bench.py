"""Benchmark harness: runs EVERY catalog query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line with per-query wall-clock seconds.

The query list is the catalog itself (gate order) — no hand-maintained
headline list, so per-query perf history survives gate rotation and a new
operator is benchmarked the moment it registers.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from irstats2_spark import catalog
from irstats2_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("irstats2_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # events-ts freshness probe: the driver's events.parquet ts encoding
    # has changed across data generations (nanos-as-long, then us/NTZ —
    # both normalized by sources.testdata.load_table). A THIRD encoding
    # must fail loudly HERE at calibration time, not as dozens of
    # cryptic per-query failures mid-run.
    from irstats2_spark.sources.testdata import load_table

    ts_dtype = dict(load_table(spark, "events", sf_dir).dtypes).get("ts")
    if ts_dtype != "timestamp":
        raise SystemExit(
            f"bench: events.ts normalized to {ts_dtype!r}, expected "
            "'timestamp' — the testdata generation likely changed its "
            "parquet ts encoding again; extend sources/testdata.py's "
            "_TS_COLS normalization (see verify skill gotchas)"
        )

    all_queries = catalog.queries()
    names = list(all_queries)
    # warm the JVM + parquet footers + Python/Arrow workers once so
    # per-query numbers measure the plans, not process startup
    all_queries[names[0]](spark, sf_dir).count()
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, schema="id long").count()

    # VM-contention calibration (r8 verdict: same-code driver runs span
    # 128-253 s on this VM, so round-over-round totals need a
    # normalizer recorded IN the artifact, not re-derived later from
    # per-query ratios): a fixed CPU-bound reference job, best-of-3,
    # plus the host load average. Contention scales calib_sec roughly
    # like it scales every query; grade rounds on total/calib or on
    # per-query ratios against the committed idle baseline.
    calib = None
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(64_000_000).selectExpr(
            "sum(id * 3 + 1) AS s"
        ).collect()
        e = time.perf_counter() - t0
        calib = e if calib is None else min(calib, e)
    calib = round(calib, 4)
    # Second probe, I/O-and-memory-bandwidth-shaped (r10: three refresh
    # attempts ran 1.2-1.3x slower on the common query set while
    # calib_sec was NORMAL, so whatever contended was invisible to a
    # cache-resident CPU loop): scan+decode a real parquet table and
    # hash-aggregate it, best-of-3. Slow calib_io with normal calib =>
    # storage/memory-bandwidth pressure, not CPU.
    calib_io = None
    for _ in range(3):
        t0 = time.perf_counter()
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).groupBy(
            "l_returnflag"
        ).agg({"l_extendedprice": "sum"}).collect()
        e = time.perf_counter() - t0
        calib_io = e if calib_io is None else min(calib_io, e)
    calib_io = round(calib_io, 4)
    try:
        loadavg = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        loadavg = None

    # Three passes per query, report the fastest: pass 1 absorbs one-time
    # costs (janino codegen compile, JVM JIT, Python worker spawn) that
    # local-mode restarts repay on every process but a long-lived cluster
    # pays once; later passes are the steady-state plan cost we're tuning.
    # Best-of-3 (vs round 1's best-of-2) because this VM shows up to 2x
    # run-to-run variance — round-over-round deltas need the extra sample.
    per_query: dict[str, float] = {}
    first_pass: dict[str, float] = {}
    failed: list[str] = []
    for name in names:
        best = None
        first = None
        try:
            for _ in range(3):
                t0 = time.perf_counter()
                df = all_queries[name](spark, sf_dir)
                df.collect()
                elapsed = time.perf_counter() - t0
                first = elapsed if first is None else first
                best = elapsed if best is None else min(best, elapsed)
        except Exception as exc:  # one broken query must not zero the run
            print(f"bench: {name} FAILED: {exc}", file=sys.stderr)
            failed.append(name)
            continue
        per_query[name] = round(best, 4)
        first_pass[name] = round(first, 4)

    total = round(sum(per_query.values()), 4)
    # Persist the COMPLETE per-query map in-repo: the driver's BENCH_r*.json
    # stores only a truncated tail, and the r4/r5 truncations didn't even
    # overlap — so round-over-round per-query comparison was impossible from
    # the artifacts alone. Artifacts are SPLIT BY PRODUCER (r6 verdict #6):
    # the committed idle baseline BENCH_DETAIL.json is written only when
    # SPARK_GRAFT_BENCH_DETAIL names it (the builder's idle best-of-3 run);
    # any other invocation (the driver's per-round pass, ad-hoc probes)
    # writes BENCH_DETAIL_LAST_RUN.json so it can't clobber the committed
    # baseline. Every run also APPENDS one line to BENCH_HISTORY.jsonl, so
    # per-query trends are diffable without cross-file archaeology.
    here = os.path.dirname(__file__)
    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL",
        os.path.join(here, "BENCH_DETAIL_LAST_RUN.json"),
    )
    # first_pass exists because `queries` is a best-of-3 MIN: memoized
    # cross-query prefixes (the graph tier's kNN edges, the SimHash
    # banded pairs) are built on pass 1 of their tier's first query and
    # HIT on passes 2-3, so the min excludes the build for every query.
    # A prefix-build regression is only visible in first_pass of the
    # tier's first query — diff both maps round-over-round.
    payload = {
        "sf": sf,
        "unit": "sec",
        "calib_sec": calib,
        "calib_io_sec": calib_io,
        "loadavg": loadavg,
        "n_queries": len(per_query),
        "failed": failed,
        "total": total,
        "total_first_pass": round(sum(first_pass.values()), 4),
        "queries": per_query,
        "first_pass": first_pass,
    }
    try:
        with open(detail_path, "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
            fh.write("\n")
        with open(os.path.join(here, "BENCH_HISTORY.jsonl"), "a") as fh:
            fh.write(
                json.dumps(
                    {
                        "ts": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
                        # "builder-idle" ONLY when the run actually wrote
                        # the committed baseline file; an ad-hoc
                        # SPARK_GRAFT_BENCH_DETAIL target records its own
                        # filename so noisy probe runs can't masquerade
                        # as the idle baseline producer.
                        "producer": (
                            "builder-idle"
                            if os.path.abspath(detail_path)
                            == os.path.abspath(
                                os.path.join(here, "BENCH_DETAIL.json")
                            )
                            else (
                                os.path.basename(detail_path)
                                if "SPARK_GRAFT_BENCH_DETAIL" in os.environ
                                else "unlabeled"
                            )
                        ),
                        **payload,
                    },
                    sort_keys=True,
                )
                + "\n"
            )
    except OSError as exc:  # read-only checkout must not fail the bench
        print(f"bench: could not write bench artifacts: {exc}", file=sys.stderr)
    # Key order matters: the driver's tail capture can truncate this
    # (now 100+ entry) line from the FRONT, so the big `queries` map goes
    # first and the headline total/sf/failed go LAST where they survive
    # (BENCH_r03.json lost its header to the old ordering). A short
    # summary-only second line is printed too, as a belt-and-braces copy.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "queries": per_query,
                **({"failed": failed} if failed else {}),
                "unit": "sec",
                "sf": sf,
                "value": total,
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_queries": len(per_query),
                "n_failed": len(failed),
                "calib_sec": calib,
                "calib_io_sec": calib_io,
                "loadavg": loadavg,
            }
        )
    )


if __name__ == "__main__":
    main()
