"""Quick ambient-contention probe: the same two calibration jobs
bench.py records (CPU-bound reference + parquet scan/agg), best-of-3,
plus loadavg. Run before trusting any timing measurement; the committed
idle baseline was taken at calib_sec ~0.15 / calib_io ~0.27."""

from __future__ import annotations

import os
import time


def main() -> None:
    from irstats2_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("calib_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()  # warm
    calib = None
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(64_000_000).selectExpr("sum(id * 3 + 1) AS s").collect()
        e = time.perf_counter() - t0
        calib = e if calib is None else min(calib, e)
    calib_io = None
    for _ in range(3):
        t0 = time.perf_counter()
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).groupBy(
            "l_returnflag"
        ).agg({"l_extendedprice": "sum"}).collect()
        e = time.perf_counter() - t0
        calib_io = e if calib_io is None else min(calib_io, e)
    try:
        load = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        load = None
    print(
        f"calib_sec={calib:.4f} calib_io_sec={calib_io:.4f} loadavg={load} "
        f"(idle reference: 0.15 / 0.27)"
    )


if __name__ == "__main__":
    main()
