"""Deterministic sampling / dataset-split operators for training pipelines.

Spark's built-in ``sample``/``sampleBy`` draw from a seeded RNG whose
stream depends on partitioning — results change under repartition, AQE,
or engine version. Training pipelines need the opposite: a row's
assignment must be a pure function of its key, stable across reruns,
engines, and cluster layouts (so a later incremental run never moves a
document from train to test). These operators derive everything from
md5(key) — engine-portable, seedless, and reproducible bit-for-bit in
the DuckDB oracles.

Scale: all map-side column expressions — no shuffle, no UDF, no state.
A filter on the hash bucket pushes down like any other predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column, buckets: int = 10_000, salt: str = "") -> Column:
    """Uniform deterministic bucket in [0, buckets): the first 8 hex chars
    of md5(salt || key) as a 32-bit int, mod buckets. Change ``salt`` to
    draw an independent assignment from the same keys (split vs sample
    vs shard must not correlate)."""
    s = key.cast("string")
    if salt:
        s = F.concat(F.lit(salt), s)
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long") % buckets


def split_assign(
    df: DataFrame,
    id_col: str,
    splits: dict[str, float] | None = None,
    buckets: int = 10_000,
    salt: str = "split:",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hash bucket.

    splits: name -> fraction (must sum to <= 1; the remainder, if any,
    falls into the last split). Order matters: fractions carve
    consecutive bucket ranges, so growing one split later keeps earlier
    assignments stable for rows that stay in their range."""
    splits = splits or {"train": 0.9, "val": 0.05, "test": 0.05}
    b = hash_bucket(F.col(id_col), buckets, salt)
    expr = None
    upper = 0.0
    names = list(splits)
    for name in names[:-1]:
        upper += splits[name]
        cond = b < int(round(upper * buckets))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(names[-1])
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str,
    default_fraction: float = 0.0,
    buckets: int = 10_000,
    salt: str = "sample:",
) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows: a row survives
    iff hash_bucket(id) < fraction(stratum) * buckets. Repeated runs (or
    a larger fraction later) return supersets — never resampled churn.

    ``fractions`` is inlined as a literal map (fine for the usual handful
    of strata; for high-cardinality strata join a fractions DataFrame —
    broadcast — instead)."""
    default_limit = F.lit(int(round(default_fraction * buckets)))
    if fractions:
        pairs: list[Column] = []
        for k, v in fractions.items():
            pairs.append(F.lit(k))
            pairs.append(F.lit(int(round(v * buckets))))
        limit = F.coalesce(F.create_map(*pairs)[F.col(strata_col)], default_limit)
    else:
        limit = default_limit
    return df.filter(hash_bucket(F.col(id_col), buckets, salt) < limit)


def weighted_sample(
    df: DataFrame,
    weight: Column,
    id_col: str,
    buckets: int = 10_000,
    salt: str = "wsample:",
) -> DataFrame:
    """Keep each row with probability = its own ``weight`` column (in
    [0, 1]) — per-ROW importance sampling, the data-mixing primitive
    (e.g. keep-probability from a quality score, so low-quality text is
    downweighted instead of hard-dropped).

    Deterministic like the other samplers: a row survives iff
    hash_bucket(id) < weight * buckets, a pure function of (id, weight)
    — stable across reruns/partitionings, and monotone: raising a row's
    weight can only add it, never remove it. Map-side filter, no
    shuffle."""
    return df.filter(
        hash_bucket(F.col(id_col), buckets, salt) < weight * buckets
    )
