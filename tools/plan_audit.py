"""Static plan audit across the whole catalog: build every query's
physical plan (no execution beyond what construction itself runs) and
tabulate shape signals the optimization guide flags —

- n_exchange / n_reused_exchange (guide §2: shuffles);
- per-table parquet scan counts (a table scanned repeatedly in one plan
  without a ReusedExchange/InMemoryRelation covering it is a candidate
  double-evaluated subtree, the r12 top_fraction/DSIR bug class);
- BatchEvalPython / ArrowEvalPython nodes (guide §4: the Python boundary);
- CartesianProduct / BroadcastNestedLoopJoin (guide §3).

Usage: python -m tools.plan_audit [--sf-dir DIR] [--only NAME ...]
Prints one line per query sorted by (dup-scan signal, exchanges).
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from collections import Counter


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    from irstats2_spark import catalog
    from irstats2_spark.session import get_spark

    spark = get_spark("irstats2_plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = catalog.queries()
    names = args.only or list(qs)

    rows = []
    for name in names:
        try:
            df = qs[name](spark, args.sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — audit must not die
            print(f"!! {name}: {type(exc).__name__}: {exc}", file=sys.stderr)
            continue
        # \bExchange\b already excludes ReusedExchange (no word boundary
        # between 'd' and 'E') and BroadcastExchange — no subtraction
        # (the old one double-counted and could go negative, r12 ADVICE)
        n_ex = len(re.findall(r"\bExchange\b", plan))
        n_reuse = len(re.findall(r"ReusedExchange", plan))
        n_inmem = len(re.findall(r"InMemoryTableScan", plan))
        scans = Counter(
            m.group(1)
            for m in re.finditer(r"FileScan parquet \[?[^\[\]]*\]? ?"
                                 r"Batched.*?Location.*?\[file:[^\]]*/"
                                 r"([a-z_0-9]+)\.parquet", plan)
        )
        if not scans:
            scans = Counter(
                m.group(1)
                for m in re.finditer(r"/([a-z_0-9]+)\.parquet", plan)
            )
        n_py = len(re.findall(r"BatchEvalPython", plan))
        n_arrow = len(re.findall(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", plan))
        n_cart = len(re.findall(r"CartesianProduct", plan))
        n_bnlj = len(re.findall(r"BroadcastNestedLoopJoin", plan))
        dup = {t: c for t, c in scans.items() if c > 1}
        rows.append(
            (name, n_ex, n_reuse, n_inmem, dict(scans), dup, n_py,
             n_arrow, n_cart, n_bnlj)
        )

    rows.sort(key=lambda r: (-max(r[5].values(), default=0), -r[1]))
    for (name, n_ex, n_reuse, n_inmem, scans, dup, n_py, n_arrow,
         n_cart, n_bnlj) in rows:
        flags = []
        if dup:
            flags.append("DUPSCAN " + ",".join(f"{t}x{c}" for t, c in dup.items()))
        if n_py:
            flags.append(f"PYEVAL x{n_py}")
        if n_cart:
            flags.append(f"CARTESIAN x{n_cart}")
        if n_bnlj:
            flags.append(f"BNLJ x{n_bnlj}")
        print(
            f"{name:45s} ex={n_ex:2d} reuse={n_reuse} inmem={n_inmem} "
            f"arrow={n_arrow} {' '.join(flags)}"
        )


if __name__ == "__main__":
    main()
