"""Local mirror of the driver's DuckDB-oracle comparison: row count +
column names + pandas DTYPES + order-insensitive value comparison.

The dtype check mirrors the driver's dtype-sensitive value hash (round 1's
only hash failures were identical values with DuckDB HUGEINT/BIGINT vs
Spark int64/int32 dtypes), so a dtype drift fails here before it fails at
the gate: compare ``spark_df.toPandas()`` dtypes against DuckDB ``.df()``
dtypes column by column.
"""

from __future__ import annotations

import math

import duckdb

SF_ORACLE = "/root/testdata/sf0.01"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str = SF_ORACLE) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    return v


def assert_matches_oracle(spark_df, sql: str, sf_dir: str = SF_ORACLE) -> None:
    con = duckdb_conn(sf_dir)
    opdf = con.execute(sql).df()
    spdf = spark_df.toPandas()
    oracle_cols, spark_cols = list(opdf.columns), list(spdf.columns)

    assert sorted(spark_cols) == sorted(oracle_cols), (
        f"column mismatch: spark={spark_cols} oracle={oracle_cols}"
    )
    assert len(spdf) == len(opdf), (
        f"row count mismatch: spark={len(spdf)} oracle={len(opdf)}"
    )
    dtype_diffs = [
        f"{c}: spark={spdf[c].dtype} oracle={opdf[c].dtype}"
        for c in oracle_cols
        if str(spdf[c].dtype) != str(opdf[c].dtype)
    ]
    assert not dtype_diffs, (
        "dtype mismatch (driver hash is dtype-sensitive): "
        + "; ".join(dtype_diffs)
    )
    # reorder spark columns to oracle order, normalize, compare as multisets
    s_norm = sorted(
        tuple(_norm(v) for v in row)
        for row in spdf[oracle_cols].itertuples(index=False, name=None)
    )
    o_norm = sorted(
        tuple(_norm(v) for v in row)
        for row in opdf.itertuples(index=False, name=None)
    )
    for i, (a, b) in enumerate(zip(s_norm, o_norm)):
        assert a == b, f"value mismatch at sorted row {i}: spark={a} oracle={b}"
