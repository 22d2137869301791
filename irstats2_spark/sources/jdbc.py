"""JDBC source for the reference's access-table import (SURVEY §2.1 S3).

The reference bypasses its ORM and hand-pages `SELECT ... LIMIT 100000
OFFSET n` over "10's of millions" of access rows
(bin/stats/import_access_table:98-359). Spark's JDBC source replaces the
hand paging with predicate partitioning: N concurrent range scans on the
numeric key, each executor reading its own slice — no OFFSET re-scans,
no driver bottleneck.

Untestable in this container (no database); the option-construction is
pure and unit-tested, the reader call is one line.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ACCESS_COLUMNS = (
    "accessid",
    "datestamp_year", "datestamp_month", "datestamp_day",
    "datestamp_hour", "datestamp_minute", "datestamp_second",
    "requester_id", "requester_user_agent",
    "referring_entity_id", "service_type_id",
    "referent_id", "referent_docid",
)  # the 13 columns of the reference's SELECT (import_access_table:219-236)


def jdbc_scan_options(
    url: str,
    table: str,
    key_col: str = "accessid",
    lower: int = 0,
    upper: int = 1 << 31,
    num_partitions: int = 64,
    fetch_size: int = 100_000,
) -> dict[str, str]:
    """Reader options for a partitioned range scan on the key column.
    `fetch_size` mirrors the reference's 100k page as the JDBC cursor
    batch; `num_partitions` concurrent slices replace serial OFFSET pages.
    """
    return {
        "url": url,
        "dbtable": table,
        "partitionColumn": key_col,
        "lowerBound": str(lower),
        "upperBound": str(upper),
        "numPartitions": str(num_partitions),
        "fetchsize": str(fetch_size),
    }


def read_access_table(
    spark: SparkSession,
    url: str,
    table: str = "access",
    from_accessid: int | None = None,
    **kwargs,
) -> DataFrame:
    """S3: distributed scan of the reference's `access` table; the
    optional from_accessid checkpoint becomes a pushed-down predicate
    (import_access_table:241-318's resume logic)."""
    reader = spark.read.format("jdbc")
    for k, v in jdbc_scan_options(url, table, **kwargs).items():
        reader = reader.option(k, v)
    df = reader.load()
    if from_accessid is not None:
        from pyspark.sql import functions as F

        df = df.filter(F.col("accessid") > from_accessid)
    return df


def tranche_bounds(
    last_id: int, first_id: int = 1, tranche: int = 10_000_000
) -> list[tuple[int, int]]:
    """The (min_accessid, max_accessid) windows of the reference's
    tranche driver (bin/stats/import_access_table_tranches:1-12): a
    bash loop invoking one import per 10M-id window so a failed import
    of "10's of millions" of rows resumes at window, not table,
    granularity. Inclusive bounds, exactly the shell arithmetic
    (maxid = i + tranche - 1)."""
    return [
        (i, i + tranche - 1) for i in range(first_id, last_id + 1, tranche)
    ]


def read_access_table_tranches(
    spark: SparkSession,
    url: str,
    last_id: int,
    first_id: int = 1,
    tranche: int = 10_000_000,
    table: str = "access",
    **kwargs,
):
    """S3 tranche import: yields one bounded DataFrame per id window —
    the caller runs (and checkpoints) each tranche independently, the
    Spark analog of import_access_table_tranches' per-window process.
    Each tranche is ITSELF a partitioned range scan (its window bounds
    become the JDBC lowerBound/upperBound, so executors slice within
    the tranche); the window filter stays pushed down."""
    from pyspark.sql import functions as F

    for lo, hi in tranche_bounds(last_id, first_id, tranche):
        df = read_access_table(
            spark, url, table, lower=lo, upper=hi + 1, **kwargs
        ).filter(F.col("accessid").between(lo, hi))
        yield lo, hi, df
