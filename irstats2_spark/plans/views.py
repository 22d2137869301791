"""View-layer post-processing (SURVEY §2.5, §3.1 step 7): the reference's
Google::Graph / Spark(line) / Compare / Table / KeyFigures views as
DataFrame transformations over compiled Context results.

All of these operate on day-grain aggregates (|days| rows), so the
single-partition ordered windows are intentional — the expensive work
happened in the Context compilation underneath.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import replace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from irstats2_spark.functions.dates import get_dates
from irstats2_spark.operators.timeseries import (
    trim_leading_zeros,
    with_cumulative_and_average,
)
from irstats2_spark.plans.builder import StatsStore, compile_context
from irstats2_spark.plans.context import Context, QueryOptions


def _densify_int_dates(
    spark: SparkSession,
    daily: DataFrame,
    from_i: int,
    to_i: int,
    resolution: str = "day",
) -> DataFrame:
    """T2 over int YYYYMMDD keys: left-merge onto the complete calendar
    (Utils.pm:135-215), zero-filling gaps. Returns (datestamp, count)."""
    keys = get_dates(from_i, to_i, resolution)
    calendar = spark.createDataFrame([(k,) for k in keys], "datestamp int")
    return (
        calendar.join(daily, "datestamp", "left")
        .withColumn("count", F.coalesce(F.col("count"), F.lit(0)))
        .select("datestamp", "count")
    )


def _bucket_resolution(df: DataFrame, resolution: str) -> DataFrame:
    """T1: bucket int-date rows to month (YYYYMM) or year (YYYY) keys by
    integer division — the reference's string-prefix bucketing
    (Graph.pm:105-150) on int dates."""
    if resolution == "day":
        return df
    div = 100 if resolution == "month" else 10000
    return (
        df.withColumn("datestamp", (F.col("datestamp") / div).cast("int"))
        .groupBy("datestamp")
        .agg(F.sum("count").alias("count"))
    )


def graph_series(
    spark: SparkSession,
    store: StatsStore,
    ctx: Context,
    resolution: str = "day",
    cumulative: bool = False,
    show_average: bool = False,
    today: dt.date | None = None,
) -> DataFrame:
    """View::Google::Graph (Graph.pm:44-192): densified time series with
    optional cumulative / running-average columns.

    For '_ALL_' the window snaps to the dataset bounds (min/max scan,
    A9 done in one pass instead of the reference's six queries)."""
    from_i, to_i = ctx.resolved_dates(today=today)
    daily = compile_context(
        store, ctx, QueryOptions(fields=("datestamp",)), today=today
    )
    if from_i is None or to_i is None:
        bounds = daily.agg(
            F.min("datestamp").alias("lo"), F.max("datestamp").alias("hi")
        ).head()
        if bounds.lo is None:
            return daily.select("datestamp", "count")
        from_i = from_i or bounds.lo
        to_i = to_i or bounds.hi
    dense = _densify_int_dates(spark, daily, from_i, to_i, "day")
    out = _bucket_resolution(dense, resolution)
    if cumulative or show_average:
        out = with_cumulative_and_average(out, "datestamp", "count")
        keep = ["datestamp", "count"]
        if cumulative:
            keep.append("cumulative")
        if show_average:
            keep.append("running_avg")
        out = out.select(*keep)
    return out


def sparkline_series(
    spark: SparkSession,
    store: StatsStore,
    ctx: Context,
    today: dt.date | None = None,
) -> DataFrame:
    """View::Google::Spark (Spark.pm:16-83): last-6-months daily series,
    leading all-zero rows trimmed, ordered DESC."""
    ctx6 = replace(ctx, range="6m", from_date=None, to_date=None)
    series = graph_series(spark, store, ctx6, "day", today=today)
    trimmed = trim_leading_zeros(series, "datestamp", "count")
    return trimmed.orderBy(F.col("datestamp").desc())


def compare_years(
    spark: SparkSession,
    store: StatsStore,
    ctx: Context,
    today: dt.date | None = None,
) -> DataFrame:
    """View::Compare (Compare.pm:21-93): per-year monthly series from the
    dataset min to max year — ONE grouped scan pivoted to
    (year, month, count), not one query per year."""
    monthly = compile_context(
        store,
        replace(ctx, range="_ALL_", from_date=None, to_date=None),
        QueryOptions(fields=("datestamp",)),
        today=today,
    )
    return (
        monthly.withColumn("year", (F.col("datestamp") / 10000).cast("int"))
        .withColumn("month", ((F.col("datestamp") / 100) % 100).cast("int"))
        .groupBy("year", "month")
        .agg(F.sum("count").alias("count"))
    )


def key_figures(
    store: StatsStore,
    metrics: dict[str, Context],
    ratios: dict[str, tuple[str, str]] | None = None,
    today: dt.date | None = None,
) -> dict[str, int]:
    """View::KeyFigures (KeyFigures.pm:58-99,141-167): named grand totals
    plus ratio metrics round(100*a/b) with 0-guard."""
    from irstats2_spark.plans.builder import sum_all

    values: dict[str, int] = {}
    for name, ctx in metrics.items():
        row = sum_all(compile_context(store, ctx, today=today)).head()
        values[name] = int(row["count"] or 0)
    for name, (num, den) in (ratios or {}).items():
        d = values.get(den, 0)
        values[name] = int(round(100.0 * values.get(num, 0) / d)) if d else 0
    return values


def set_listing(
    store: StatsStore,
    set_name: str,
    q: str | None = None,
) -> DataFrame:
    """O4 (Handler.pm:778-821): alphabetical distinct (set_value, rendered)
    listing with optional case-insensitive contains filter."""
    if store.rendered is None:
        raise ValueError("no rendered dimension loaded")
    out = store.rendered.filter(F.col("set_name") == set_name).select(
        "set_value", "rendered_set_value"
    ).distinct()
    if q:
        out = out.filter(
            F.lower(F.col("rendered_set_value")).contains(q.lower())
        )
    return out.orderBy(F.lower(F.col("rendered_set_value")))


def valid_set_value(store: StatsStore, set_name: str, set_value: str) -> bool:
    """Context.pm:272-289 / Handler.pm:1011-1041: existence probe."""
    if store.sets is None:
        return False
    return not store.sets.filter(
        (F.col("set_name") == set_name) & (F.col("set_value") == set_value)
    ).isEmpty()
