"""Parallelism guard for CPU-bound per-row operators.

Columnar scans of small-but-CPU-heavy inputs (a single parquet file under
``spark.sql.files.maxPartitionBytes`` with one row group) arrive as ONE
input partition, so regex/shingling/fold stages run on one core no matter
how many the cluster has. ``ensure_parallelism`` repartitions such inputs
up to the default parallelism before the map-heavy work; at real scale
(inputs already split into >= cores partitions) it is a no-op, so no
extra shuffle appears in the 100 TB plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Partition-count probe memo (r12, guide §1.2 "don't compute things you
# throw away"): df.rdd.getNumPartitions() forces a full physical plan +
# Python-RDD conversion per call, and the hot query-build path probes the
# SAME scan-plus-narrow-projection subtree across hundreds of catalog
# queries. The partition count of a semantically identical plan is
# session-deterministic (files x split conf), so it is PLAN METADATA —
# like load_table's inferred-schema memo — not a result cache: no query
# output or data-dependent value is stored. Keyed by (session, semantic
# hash); bounded and reset wholesale if it ever grows past _MEMO_CAP
# (distinct probed subtrees number in the dozens here).
_PARTS_MEMO: dict[tuple[int, int], int] = {}
_MEMO_CAP = 4096


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    if df.isStreaming:
        # partition inspection is illegal on a streaming DataFrame, and
        # micro-batch parallelism is the source's concern — a no-op lets
        # map-side operators (simhash64, shingle_array consumers) run on
        # streams unchanged
        return df
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    try:
        key = (id(spark._jsparkSession), df.semanticHash())
    except Exception:  # pragma: no cover - defensive: probe anew
        key = None
    n = _PARTS_MEMO.get(key) if key is not None else None
    if n is None:
        n = df.rdd.getNumPartitions()
        if key is not None:
            if len(_PARTS_MEMO) >= _MEMO_CAP:
                _PARTS_MEMO.clear()
            _PARTS_MEMO[key] = n
    if n < target:
        return df.repartition(target)
    return df
