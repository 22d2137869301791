"""Per-query core-count scaling table (r12 verdict #1).

The driver benches the same HEAD at 32 and 8 cores, but its artifacts
keep only a truncated tail of the per-query line, so PERF_r12's scaling
block came out empty and no per-query serial offender could be named.
This tool builds that table from two full bench artifacts the builder
runs itself:

    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_DETAIL=/tmp/b_c32.json python bench.py
    SPARK_GRAFT_CPUS=8  SPARK_GRAFT_BENCH_DETAIL=/tmp/b_c8.json  python bench.py
    python -m tools.scaling_compare /tmp/b_c8.json /tmp/b_c32.json \
        --out SCALING_r13.json

For each query it reports low/high = t_low_cores / t_high_cores:
  - ratio >> 1: the query actually uses the extra cores (data-parallel);
  - ratio ~= 1: core-count-invariant — fixed-cost-bound locally
    (driver actions, scheduling latency, plan construction);
  - ratio  < 1: MORE cores is slower — scheduling/contention overhead
    exceeds the parallel win at this scale factor.
The summary buckets those so the next optimization round can rank
serial offenders without re-deriving the table by hand.
"""

from __future__ import annotations

import argparse
import json
import statistics


def _load(path: str) -> dict:
    with open(path) as fh:
        return json.load(fh)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("low", help="bench detail artifact at the LOW core count")
    ap.add_argument("high", help="bench detail artifact at the HIGH core count")
    ap.add_argument("--cpus-low", type=int, default=8)
    ap.add_argument("--cpus-high", type=int, default=32)
    ap.add_argument("--out", default=None, help="write the table as JSON here")
    ap.add_argument("--top", type=int, default=12)
    args = ap.parse_args()

    lo, hi = _load(args.low), _load(args.high)
    lq = {k: float(v) for k, v in lo["queries"].items()}
    hq = {k: float(v) for k, v in hi["queries"].items()}
    common = sorted(set(lq) & set(hq))
    per_query = {
        k: {
            "low": lq[k],
            "high": hq[k],
            "low_over_high": round(lq[k] / hq[k], 3) if hq[k] > 0 else None,
        }
        for k in common
    }
    ratios = sorted(
        (v["low_over_high"], k)
        for k, v in per_query.items()
        if v["low_over_high"] is not None and v["high"] > 0.05
    )
    vals = [r for r, _ in ratios]
    summary = {
        "cpus_low": args.cpus_low,
        "cpus_high": args.cpus_high,
        "n_common": len(common),
        "total_low": round(sum(lq[k] for k in common), 2),
        "total_high": round(sum(hq[k] for k in common), 2),
        "ratio_median": round(statistics.median(vals), 3) if vals else None,
        "calib_sec_low": lo.get("calib_sec"),
        "calib_sec_high": hi.get("calib_sec"),
        "calib_io_sec_low": lo.get("calib_io_sec"),
        "calib_io_sec_high": hi.get("calib_io_sec"),
    }
    print(json.dumps(summary, indent=1))
    print(f"\nmost core-hungry (low/high ratio, top {args.top}) — these "
          "genuinely parallelize:")
    for r, k in ratios[-args.top:][::-1]:
        print(f"  {k}: {r:.2f}  ({per_query[k]['high']:.2f}s @"
              f"{args.cpus_high}c -> {per_query[k]['low']:.2f}s @{args.cpus_low}c)")
    print(f"\nmost core-averse (ratio < 1, top {args.top}) — scheduling-"
          "bound locally, slower WITH more cores:")
    for r, k in ratios[: args.top]:
        print(f"  {k}: {r:.2f}  ({per_query[k]['high']:.2f}s @"
              f"{args.cpus_high}c -> {per_query[k]['low']:.2f}s @{args.cpus_low}c)")
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(
                {"summary": summary, "per_query": per_query},
                fh, indent=1, sort_keys=True,
            )
            fh.write("\n")
        print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
