"""Cache-lifecycle contract for composable operators.

Pure-DataFrame-returning operators sometimes ``persist()`` a shared
intermediate that the returned LAZY plan consumes more than once (a
shingle scan feeding both a pair expansion and a per-doc size rollup).
The pin is correct for one evaluation, but once the function returns it
is owned by nobody: in a long-lived job server, repeated invocations
accumulate pinned partitions until LRU pressure starts evicting hot
data. Every such operator in this package now states its policy via
the shared ``materialize`` keyword:

- ``materialize=False`` (the default; zero plan change): the returned
  plan references the pinned intermediate(s) and the CALLER owns the
  cache — evaluate the result, then ``spark.catalog.clearCache()`` (or
  unpersist) between pipeline stages of a long-lived app. Pins use the
  default MEMORY_AND_DISK level and are LRU-evictable, so a one-shot
  job may simply ignore them.
- ``materialize=True``: the operator eagerly evaluates its result
  (``localCheckpoint`` — the in-cluster stand-in for the inter-stage
  parquet write a production pipeline does) and unpersists every
  intermediate it pinned before returning. Nothing is left pinned and
  the returned DataFrame has O(1) lineage.

Audit operators (recall / containment / band-sweep audits) default to
eager release: their outputs are pair-set-sized, they are terminal by
nature (nobody composes a plan on top of an audit), and a leaked
corpus-sized pin per audit run is exactly the long-lived-service leak
this contract exists to prevent.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame


def release_after(
    result: DataFrame, pins: Iterable[DataFrame], materialize: bool
) -> DataFrame:
    """Apply the contract above: lazily return ``result`` (caller owns
    ``pins``) or eagerly ``localCheckpoint`` it and unpersist every pin."""
    if not materialize:
        return result
    out = result.localCheckpoint()
    for p in pins:
        p.unpersist()
    return out
