"""Incremental-scan checkpoints (SURVEY §2.9a).

The reference tracks ETL progress per dataset in the `irstats2_internal`
KV table as `current_<key_field>` rows, and scans each dataset with
`key_field >= checkpoint` (Processor.pm:52-53,88-105,140-144;
Handler.pm:41-78). The Spark-native equivalent is a tiny JSON checkpoint
file per dataset next to the gold tables — the streaming path uses Spark's
own checkpointLocation instead (streaming/ingest.py), and the reference's
`<dataset>.lock` rows are unnecessary under Spark's one-writer job model.

Driver-side file I/O on a KB-sized file — never on the data path.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class Checkpoint:
    """KV checkpoint: `get`/`advance` per (dataset, key_field)."""

    def __init__(self, root: str):
        self.path = os.path.join(root, "_checkpoints.json")

    def _load(self) -> dict:
        if os.path.exists(self.path):
            with open(self.path) as fh:
                return json.load(fh)
        return {}

    def get(self, dataset: str, key_field: str):
        return self._load().get(f"{dataset}.current_{key_field}")

    def advance(self, dataset: str, key_field: str, value) -> None:
        state = self._load()
        state[f"{dataset}.current_{key_field}"] = value
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(state, fh)
        os.replace(tmp, self.path)


def incremental_scan(
    df: DataFrame, key_col: str, checkpoint: Checkpoint, dataset: str
) -> DataFrame:
    """Rows with key beyond the stored checkpoint (Processor.pm:94-105).
    The predicate is a plain pushdown-able filter — on a key-sorted or
    partitioned source this prunes files/row groups, the distributed
    analog of the reference's indexed range scan."""
    cur = checkpoint.get(dataset, key_col)
    return df if cur is None else df.filter(F.col(key_col) > cur)


def advance_to_max(
    df: DataFrame, key_col: str, checkpoint: Checkpoint, dataset: str
) -> None:
    """After a successful batch: store max(key) as the new checkpoint
    (Processor.pm:140-144). One tiny agg job."""
    row = df.agg(F.max(key_col).alias("m")).head()
    if row and row.m is not None:
        checkpoint.advance(dataset, key_col, row.m)
