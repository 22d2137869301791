"""Interval-overlap join: which rows of one interval table overlap rows
of another — by TIME-BUCKET EXPANSION, the standard Spark answer to a
join predicate Catalyst can only plan as a cartesian product.

A naive ``a.start <= b.end AND a.end >= b.start`` join has no equi-key,
so Spark plans BroadcastNestedLoopJoin/CartesianProduct — quadratic at
scale. The bucketed form explodes each interval into the fixed-width
buckets it covers and equi-joins on the bucket id:

- the join becomes a plain hash-partitioned equi-join (AQE-splittable,
  skew-safe),
- each interval expands into ceil(duration/bucket) rows — bounded when
  durations are bounded (sessions are, by the inactivity gap; incident
  windows are fixed-width by construction),
- a pair overlapping several shared buckets is emitted once per shared
  bucket, so the join is followed by a DISTINCT on the pair key — state
  proportional to true overlap pairs, like every candidate-pair op in
  pipeline/dedup.py.

The same shape generalizes to any 1-D range join (IP ranges:
functions/geo.py uses the prefix-bucket variant; numeric bands bucket
by value). Pick ``bucket_seconds`` ~ the typical interval length:
too small inflates the expansion, too large inflates bucket collision
fan-in; either way results are identical (the equi-join plus the exact
overlap refilter is semantics-free — buckets only PRUNE candidates).

No reference analog (IRStats2 has no interval join; its closest is the
GeoIP range lookup, Plugin/Stats/Processor/Access/GeoIP.pm's IP-range
table) — this is the engine-native generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    bucket_seconds: int,
    left_start: str = "start_us",
    left_end: str = "end_us",
    right_start: str = "start_us",
    right_end: str = "end_us",
    suffix: str = "_r",
) -> DataFrame:
    """All (left, right) row pairs whose [start_us, end_us] intervals
    overlap (inclusive bounds, microsecond columns).

    Plan: explode both sides into covered bucket ids, equi-join on the
    bucket, DISTINCT the pair key columns, then re-check the exact
    overlap predicate (buckets are a superset filter). Right-side
    columns that collide with left names get ``suffix``.
    """
    bucket_us = int(bucket_seconds) * 1_000_000

    def bucketed(df: DataFrame, start: str, end: str) -> DataFrame:
        # floor, not cast: (x / b).cast('long') truncates toward zero, so
        # negative endpoints (pre-1970 timestamps, numeric bands) would
        # start one bucket too high and silently drop overlapping pairs.
        return df.withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col(start) / bucket_us).cast("long"),
                    F.floor(F.col(end) / bucket_us).cast("long"),
                )
            ),
        )

    lcols = left.columns
    rename = {c: c + suffix for c in right.columns if c in set(lcols)}
    r = right
    for old, new in rename.items():
        r = r.withColumnRenamed(old, new)
    r_start = rename.get(right_start, right_start)
    r_end = rename.get(right_end, right_end)

    joined = bucketed(left, left_start, left_end).join(
        bucketed(r, r_start, r_end), "__bucket"
    )
    overlap = (F.col(left_start) <= F.col(r_end)) & (
        F.col(left_end) >= F.col(r_start)
    )
    return joined.filter(overlap).drop("__bucket").distinct()
