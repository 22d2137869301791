"""Sessionization: split each user's event stream into sessions at
inactivity gaps.

The reference has no session concept — its Repeat filter
(plugins/EPrints/Plugin/Stats/Filter/Repeat.pm:63-102) is the closest
relative (per-key time-window state) — but sessionization is the standard
log-analytics companion op, so the engine exposes it as a first-class
operator.

Scale design (100 TB posture):
- ONE shuffle: the window partitions by user_id; both window expressions
  (lag + running sum) share the same partitioning AND ordering, so Spark
  plans a single Exchange + single Sort.
- The per-session and per-user aggregations that follow group on
  (user_id, ...) — hash partitioning on user_id already satisfies their
  clustering requirement, so Catalyst plans them WITHOUT further
  exchanges (asserted in tests/test_plan_quality.py).
- Gap comparison is integer microseconds (unix_micros), never float
  epoch seconds: exact, portable, and codegen-friendly.
- Skew note: a bot user with 10^8 events lands in one partition. The
  window itself is unavoidable per-key state; at cluster scale pair this
  with the robots filter upstream (operators/filters.py) which removes
  exactly those keys, or pre-split pathological keys by day and accept
  session breaks at day boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Assign a per-user session number to every event.

    A new session starts at the first event and whenever the gap since
    the PREVIOUS event exceeds ``gap_seconds`` (strictly greater, matching
    the Repeat filter's `> timeout` comparison at Repeat.pm:89-95).
    Returns the input plus ``session_no`` (1-based, per user).
    """
    gap_us = int(gap_seconds) * 1_000_000
    w = Window.partitionBy(user_col).orderBy("_ts_us", tiebreak_col)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("_ts_us").over(w)
    new_sess = (
        prev.isNull() | (F.col("_ts_us") - prev > F.lit(gap_us))
    ).cast("int")
    return (
        events.withColumn("_ts_us", F.unix_micros(F.col(ts_col)))
        .withColumn("session_no", F.sum(new_sess).over(run))
        .drop("_ts_us")
    )


def session_stats(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-user session summary: session count, event count, and the
    largest single-session event count.

    Both groupBys run on the partitioning the sessionize window already
    established (user_id) — no additional exchanges.
    """
    sess = sessionize(events, gap_seconds, user_col, ts_col, tiebreak_col)
    per_session = sess.groupBy(user_col, "session_no").agg(
        F.count(F.lit(1)).alias("_n")
    )
    return per_session.groupBy(user_col).agg(
        F.max("session_no").alias("n_sessions"),
        F.sum("_n").alias("n_events"),
        F.max("_n").alias("max_session_events"),
    )


def top_paths(
    events: DataFrame,
    prefix_len: int = 3,
    k: int = 20,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Top-k session-opening paths: the first ``prefix_len`` event types
    of each session, joined with '>', counted across sessions.

    The classic "where do journeys start" funnel input (no reference
    analog; IRStats2's nearest is its referrer breakdown). Plan shape:
    the prefix rank rides the SAME (user, time) window partitioning the
    sessionize pass already established — one exchange total before the
    path count, whose shuffle carries (path, 1) pairs with map-side
    combine. The final top-k is a TakeOrdered, never a full sort.
    """
    sess = sessionize(events, gap_seconds, user_col, ts_col, tiebreak_col)
    w = Window.partitionBy(user_col, "session_no").orderBy(
        F.unix_micros(F.col(ts_col)), tiebreak_col
    )
    prefixed = (
        sess.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= prefix_len)
        .groupBy(user_col, "session_no")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("_rn"), F.col(type_col)))
                    ),
                    lambda s: s[type_col],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        prefixed.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(k)
    )


def covisit_lift(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Within-session co-occurrence lift for unordered event-type pairs.

    For each pair (a < b): sessions containing both, and
    lift = P(a,b) / (P(a) * P(b)) = n_ab * n_sessions / (n_a * n_b).
    All counts are exact integers; the single float division happens
    once at the end, so the value hash is stable.

    Scale: the pair expansion is a self-join of DISTINCT (session, type)
    rows — per-session distinct types are bounded by the type vocabulary
    (not session length), and skewed popular types stream through the
    join (the banded-self-join lesson from pipeline/dedup.py's SimHash
    rewrite) instead of collecting into one aggregation row. Totals are
    a broadcast-sized per-type frame.
    """
    sess = sessionize(events, gap_seconds, user_col, ts_col, tiebreak_col)
    st = sess.select(
        F.concat_ws(":", F.col(user_col), F.col("session_no")).alias("sid"),
        F.col(type_col).alias("t"),
    ).distinct()
    # lazy 1-row aggregate broadcast in (the oracle's `tot` CTE shape) —
    # an eager .count() here would execute the sessionize chain twice and
    # bake a stale literal into the plan.
    tot = st.agg(F.count_distinct("sid").alias("__n_sessions"))
    per_type = st.groupBy("t").agg(F.count(F.lit(1)).alias("n_t"))
    a = st.select("sid", F.col("t").alias("ta"))
    b = st.select("sid", F.col("t").alias("tb"))
    pairs = (
        a.join(b, "sid")
        .filter(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    return (
        pairs.join(
            F.broadcast(per_type.select(F.col("t").alias("ta"), F.col("n_t").alias("n_a"))),
            "ta",
        )
        .join(
            F.broadcast(per_type.select(F.col("t").alias("tb"), F.col("n_t").alias("n_b"))),
            "tb",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "ta",
            "tb",
            "n_ab",
            "n_a",
            "n_b",
            F.round(
                F.col("n_ab").cast("double")
                * F.col("__n_sessions")
                / F.col("n_a")
                / F.col("n_b"),
                9,
            ).alias("lift"),
        )
        .orderBy("ta", "tb")
    )
