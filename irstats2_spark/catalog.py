"""Query catalog: one named entry per implemented operator (SURVEY.md §2).

Each entry pairs a Spark DataFrame implementation with an equivalent ANSI-SQL
oracle string that DuckDB runs over the same parquet tables. The driver
compares row-count + schema + order-insensitive value-hash, so:

- every computed column is aliased identically on both sides;
- money/measure aggregates go through exact DECIMAL arithmetic and are cast
  to DOUBLE only at the end (sum order must not change the value);
- dates/timestamps are emitted as formatted strings (no tz/type ambiguity).

Implementations live in the operator modules; this file only wires them to
the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = QuerySpec(spark=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: spec.spark for name, spec in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {n: s.oracle for n, s in _REGISTRY.items() if s.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers catalog entries."""
    global _LOADED
    if _LOADED:
        return
    # Imports are for their registration side effects.
    from irstats2_spark import queries_core  # noqa: F401
    from irstats2_spark import queries_ext  # noqa: F401
    from irstats2_spark import queries_irstats  # noqa: F401
    from irstats2_spark import queries_pipeline  # noqa: F401

    _LOADED = True


def main() -> None:
    """`python -m irstats2_spark.catalog`: list the operator catalog."""
    # run-as-__main__ gets its own module instance; use the canonical one
    from irstats2_spark import catalog as _canonical

    _canonical._ensure_loaded()
    reg = _canonical._REGISTRY
    width = max(len(n) for n in reg)
    for name, spec in sorted(reg.items()):
        gate = "oracle" if spec.oracle else "rows-only"
        print(f"{name:<{width}}  [{gate:>9}]  {spec.doc}")
    print(f"\n{len(reg)} queries, "
          f"{sum(1 for s in reg.values() if s.oracle)} with SQL oracles")


if __name__ == "__main__":
    main()
