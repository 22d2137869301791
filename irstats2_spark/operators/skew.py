"""Skew-handling join/aggregation shapes for hot fact keys.

The reference's fact joins (J1/J2, Handler.pm:483-649) group and join on
set/grouping values whose real-world distribution is Zipfian — one hot
eprint or one hot country can own a double-digit share of a 100 TB fact
table, and a plain hash-partitioned join lands that whole share on one
reducer.

Three lines of defense, in preference order:
1. broadcast the dimension (plans/builder.py already does — no fact
   shuffle at all, skew irrelevant);
2. AQE skew-join (spark.sql.adaptive.skewJoin, on by default in
   session.get_spark): splits oversized shuffle partitions at runtime for
   sort-merge joins — asserted by tests/test_plan_quality.py;
3. explicit salting (this module) for when the dimension is too big to
   broadcast AND the shuffle join's skew must be bounded a priori
   (e.g. a fact x fact join keyed by a hot entity).

Salting trades an R-fold replication of the RIGHT side for an R-way split
of every hot left key: left rows spread over (key, salt in 0..R-1), right
rows replicate to all R salt values, so the join result is IDENTICAL to
the unsalted join while no reducer sees more than ~1/R of a hot key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    buckets: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join with an R-way salt on the (potentially skewed) left side.

    ``left`` gets a uniform salt in [0, buckets); ``right`` is exploded
    ``buckets``-fold (one copy per salt value) so every (key, salt) pair
    finds its match. Result columns and rows equal ``left.join(right, on,
    how)`` exactly — the salt never escapes. Supported ``how``: inner /
    left / left_semi (shapes where replicating the right side cannot
    duplicate or lose matches for a left row; a right join would need the
    salt on the other side).

    The salt value is irrelevant to correctness (right matches ALL salts),
    so a seeded per-row rand() is fine — and unlike a hash of the join
    key, it splits a single hot KEY, which is the entire point.

    Cost model: right side scans/shuffles R times larger — use only when
    right is far smaller than the hot key's row share and too big to
    broadcast. AQE's skew-join handles the common cases without the
    replication cost; this is the a-priori bound for the rest.
    """
    assert how in ("inner", "left", "left_semi"), (
        "salted_join replicates the right side; only left-preserving "
        f"equi-joins are salt-safe, got how={how!r}"
    )
    keys = [on] if isinstance(on, str) else list(on)
    salt = (F.rand(seed) * buckets).cast("int")
    left_s = left.withColumn("__salt", salt)
    right_s = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    out = left_s.join(right_s, keys + ["__salt"], how)
    return out.drop("__salt")


def salted_grouped_sum(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, str | Column],
    buckets: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Two-phase grouped sum with a salted first phase.

    Spark's hash aggregate already combines map-side, which defuses most
    group-key skew; the remaining pathology is a hot key whose FINAL
    merge partition overflows (billions of partial rows from tens of
    thousands of map tasks). Salting phase 1 to (keys, salt) caps any
    reducer at ~1/R of a hot key's partials; phase 2 merges the R salted
    partials per key — |keys| x R rows, trivially small.

    ``sums`` maps output alias -> input column NAME or Column expression
    (a bare string is resolved as a column name, so COUNT is
    ``F.lit(1)``, not the string ``'1'``).
    """
    salt = (F.rand(seed) * buckets).cast("int")
    phase1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[F.sum(c).alias(a) for a, c in sums.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[F.sum(a).alias(a) for a in sums]
    )
