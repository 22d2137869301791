"""Per-query bench comparison against the committed idle baseline.

Driver bench totals on this VM swing with background contention
(same-code idle runs have spanned 128-253 s), so round-over-round
grading needs per-query RATIOS against the committed idle baseline
(BENCH_DETAIL.json) — the analysis the r7/r8 verdicts derived by hand
from BENCH_HISTORY.jsonl. This tool scripts it:

    python -m tools.bench_compare                        # latest history row vs baseline
    python -m tools.bench_compare --run BENCH_r08.json   # a driver artifact vs baseline
    python -m tools.bench_compare --top 15               # widest regressions/improvements

Reads the run's per-query map (a BENCH_HISTORY.jsonl row, a
BENCH_DETAIL*.json, or a driver BENCH_r*.json — whichever fields are
present) and prints summary stats: total ratio, median/p90 per-query
ratio, the calib_sec ratio when both sides carry one (a ratio ~equal to
the calibration ratio means VM contention, not code), and the largest
per-query deltas. Uniform ratios across all queries = environment;
a lone outlier = a code regression worth chasing.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _queries_of(payload: dict) -> dict[str, float]:
    q = payload.get("queries")
    if not isinstance(q, dict) or not q:
        raise SystemExit("no per-query map in this artifact")
    return {k: float(v) for k, v in q.items()}


def _load_run(path: str | None) -> dict:
    if path is None:
        hist = os.path.join(HERE, "BENCH_HISTORY.jsonl")
        with open(hist) as fh:
            lines = [ln for ln in fh if ln.strip()]
        if not lines:
            raise SystemExit("BENCH_HISTORY.jsonl is empty")
        return json.loads(lines[-1])
    with open(path if os.path.exists(path) else os.path.join(HERE, path)) as fh:
        payload = json.load(fh)
    if "tail" in payload and "parsed" in payload:
        # a driver BENCH_r*.json: the per-query map lives in the
        # (front-truncated) captured tail — regex out whole pairs; a
        # partial first pair is dropped by the word boundary
        import re

        q = {
            m.group(1): float(m.group(2))
            for m in re.finditer(
                r'"([A-Za-z0-9_]+)": ([0-9]+\.[0-9]+)', payload["tail"]
            )
        }
        parsed = payload.get("parsed") or {}
        # summary fields share the tail's "key": float shape — not queries
        for k in ("value", "sf", "calib_sec", "calib_io_sec", "total",
                  "total_first_pass"):
            q.pop(k, None)
        return {
            "queries": q,
            "sf": parsed.get("sf"),
            "calib_sec": parsed.get("calib_sec"),
            "calib_io_sec": parsed.get("calib_io_sec"),
            "producer": f"driver r{payload.get('n')}",
        }
    return payload


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default=None,
                    help="artifact to compare (default: latest "
                    "BENCH_HISTORY.jsonl row)")
    ap.add_argument("--baseline", default="BENCH_DETAIL.json")
    ap.add_argument("--top", type=int, default=8,
                    help="how many widest deltas to print per direction")
    args = ap.parse_args()

    run = _load_run(args.run)
    base = _load_run(args.baseline)
    rsf, bsf = run.get("sf"), base.get("sf")
    if rsf is not None and bsf is not None and rsf != bsf:
        print(f"WARNING: scale factors differ (run sf={rsf}, baseline "
              f"sf={bsf}) — ratios below compare different workloads")
    rq, bq = _queries_of(run), _queries_of(base)
    common = sorted(set(rq) & set(bq))
    only_run = sorted(set(rq) - set(bq))
    only_base = sorted(set(bq) - set(rq))

    rsum = sum(rq[k] for k in common)
    bsum = sum(bq[k] for k in common)
    ratios = sorted(rq[k] / bq[k] for k in common if bq[k] > 0.05)
    print(f"common queries: {len(common)}"
          + (f"  (run-only: {len(only_run)}, baseline-only: "
             f"{len(only_base)})" if only_run or only_base else ""))
    print(f"total over common: {rsum:.1f}s vs baseline {bsum:.1f}s "
          f"-> ratio {rsum / bsum:.2f}")
    if ratios:
        p90 = ratios[int(0.9 * (len(ratios) - 1))]
        print(f"per-query ratio: median {statistics.median(ratios):.2f}, "
              f"p90 {p90:.2f}, max {ratios[-1]:.2f}")
    rc, bc = run.get("calib_sec"), base.get("calib_sec")
    if rc and bc:
        print(f"calib_sec ratio: {rc / bc:.2f}  (per-query ratios near "
              "this value = VM contention, not code)")
    ri, bi = run.get("calib_io_sec"), base.get("calib_io_sec")
    if ri and bi:
        print(f"calib_io_sec ratio: {ri / bi:.2f}  (high with a normal "
              "calib_sec = storage/memory-bandwidth pressure, not CPU)")
    producer = run.get("producer")
    if producer:
        print(f"run producer: {producer}")

    deltas = sorted(((rq[k] - bq[k], k) for k in common), reverse=True)
    print(f"widest regressions (run - baseline, top {args.top}):")
    for d, k in deltas[: args.top]:
        print(f"  {k}: {bq[k]:.2f} -> {rq[k]:.2f}  (+{d:.2f})")
    print(f"widest improvements (top {args.top}):")
    for d, k in deltas[-args.top:][::-1]:
        print(f"  {k}: {bq[k]:.2f} -> {rq[k]:.2f}  ({d:+.2f})")

    # first_pass diff (r12 verdict #8): the best-of-3 `queries` map
    # excludes the memoized cross-query prefix builds (kNN edges,
    # SimHash banded pairs, suffix index — built on pass 1, hit on
    # passes 2-3), so a prefix-build regression is invisible above.
    # Diff the first-pass maps too so that cost stays audited.
    rf, bf = run.get("first_pass"), base.get("first_pass")
    if isinstance(rf, dict) and isinstance(bf, dict) and rf and bf:
        fcommon = sorted(set(rf) & set(bf))
        rfs = sum(float(rf[k]) for k in fcommon)
        bfs = sum(float(bf[k]) for k in fcommon)
        print(f"first_pass total over common: {rfs:.1f}s vs baseline "
              f"{bfs:.1f}s -> ratio {rfs / bfs:.2f}")
        fdeltas = sorted(
            ((float(rf[k]) - float(bf[k]), k) for k in fcommon), reverse=True
        )
        print(f"widest first_pass regressions (top {args.top}) — prefix "
              "builds live here:")
        for d, k in fdeltas[: args.top]:
            print(f"  {k}: {float(bf[k]):.2f} -> {float(rf[k]):.2f}  (+{d:.2f})")
    elif rf or bf:
        print("first_pass map present on only one side — prefix-build "
              "diff skipped")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # `| head` is a normal way to use this
        pass
