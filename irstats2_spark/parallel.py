"""Parallelism guard for CPU-bound per-row operators.

Columnar scans of small-but-CPU-heavy inputs (a single parquet file under
``spark.sql.files.maxPartitionBytes``) arrive as ONE input partition, so
regex/shingling/fold stages run on one core no matter how many the
cluster has. ``ensure_parallelism`` repartitions such inputs up to the
default parallelism before the map-heavy work; at real scale (inputs
already split into >= cores partitions) it is a no-op, so no extra
shuffle appears in the 100 TB plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    if df.isStreaming:
        # partition inspection is illegal on a streaming DataFrame, and
        # micro-batch parallelism is the source's concern — a no-op lets
        # map-side operators (simhash64, shingle_array consumers) run on
        # streams unchanged
        return df
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
