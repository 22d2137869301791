"""As-of join: for every left row, the temporally closest preceding right
row with the same key.

The reference has no as-of/range joins (SURVEY §2.3: equality joins only)
— this is a beyond-reference operator for event-stream enrichment
("which click preceded this purchase", "which config version was live at
this timestamp").

Spark has no built-in as-of join, and the naive formulations collapse at
scale: a range-condition join explodes to |left|x|right| per key before
filtering, and a per-key collect is driver-bound. The scalable shape is a
TAGGED UNION + ONE WINDOW:

    union(left tagged 1, right tagged 0)
      -> window partitionBy(key) orderBy(ts, tag, tiebreak)
      -> last(right-payload, ignoreNulls) over rowsBetween(-inf, 0)
      -> keep tagged-left rows

One shuffle (hash by key), one partition-local sort, zero row explosion;
the window state per key is a single struct. Pandas' merge_asof does the
same merge single-node; this is its distributed equivalent.

Tie semantics (all deterministic):
- inclusive=True: a right row AT the left timestamp matches (tag orders
  right before left at equal ts); inclusive=False excludes it.
- several right rows at the same ts: the greatest tiebreak column wins
  (they sort ascending; `last` takes the latest).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_prior(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: Sequence[str] = ("event_id",),
    tiebreak: str = "event_id",
    inclusive: bool = True,
) -> DataFrame:
    """Left-outer as-of join. Returns every left row plus an ``asof``
    struct column of (``ts_us`` microseconds + ``payload`` columns) from
    the matched right row, or NULL when the key has no preceding right row.
    """
    on = list(on)
    pay_struct = F.struct(
        F.unix_micros(F.col(right_ts)).alias("ts_us"),
        *[F.col(c) for c in payload],
    )
    pay_type = dict(
        right.select(pay_struct.alias("_pay")).dtypes
    )["_pay"]
    l2 = left.select(
        *on,
        F.unix_micros(F.col(left_ts)).alias("_ts_us"),
        F.lit(1 if inclusive else 0).alias("_tag"),
        F.lit(0).cast("long").alias("_tb"),
        F.lit(None).cast(pay_type).alias("_pay"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
    )
    r2 = right.select(
        *on,
        F.unix_micros(F.col(right_ts)).alias("_ts_us"),
        F.lit(0 if inclusive else 1).alias("_tag"),
        F.col(tiebreak).cast("long").alias("_tb"),
        pay_struct.alias("_pay"),
        F.lit(None).cast(dict(l2.dtypes)["_lrow"]).alias("_lrow"),
    )
    unioned = l2.unionByName(r2)
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts_us", "_tag", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    left_tag = 1 if inclusive else 0
    out = (
        unioned.withColumn("asof", F.last("_pay", ignorenulls=True).over(w))
        .filter(F.col("_tag") == left_tag)
        .select("_lrow.*", "asof")
    )
    return out
