"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (monthly event counts, densified —
the reference's default `main` report headline, SURVEY.md §7.2) at sf0.001;
``queries()``/``oracle_sql()`` expose the full operator catalog from
``irstats2_spark.catalog`` for the DuckDB correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from irstats2_spark import catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001 (SURVEY §7.2: monthly
    downloads, whole repository, all time, densified — through the full
    adapter -> processor -> Context -> Graph-view path)."""
    return catalog.queries()["view_monthly_graph"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    return catalog.oracle_sql()
