"""Local mirror of the driver's DuckDB-oracle comparison: row count +
column names + order-insensitive value comparison, with float tolerance."""

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
    oracle_rows = con.execute(sql).fetchall()
    oracle_cols = [d[0] for d in con.execute(sql).description]
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = spark_df.columns

    assert sorted(spark_cols) == sorted(oracle_cols), (
        f"column mismatch: spark={spark_cols} oracle={oracle_cols}"
    )
    assert len(spark_rows) == len(oracle_rows), (
        f"row count mismatch: spark={len(spark_rows)} oracle={len(oracle_rows)}"
    )
    # reorder spark columns to oracle order, normalize, compare as multisets
    idx = [spark_cols.index(c) for c in oracle_cols]
    s_norm = sorted(
        tuple(_norm(r[i]) for i in idx) for r in spark_rows
    )
    o_norm = sorted(tuple(_norm(v) for v in r) for r in oracle_rows)
    for i, (a, b) in enumerate(zip(s_norm, o_norm)):
        assert a == b, f"value mismatch at sorted row {i}: spark={a} oracle={b}"
