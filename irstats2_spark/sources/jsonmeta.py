"""Heterogeneous JSON metadata sidecars as first-class columns (VARIANT).

Large training corpora carry per-document sidecars — crawl headers,
license tags, pipeline provenance — whose shape drifts across dumps and
sources. Two ingestion strategies, both columnar and shuffle-free:

- **VARIANT** (`with_variant_meta`): parse once into Spark's VARIANT type
  (binary semi-structured encoding, Spark 4+). Fields stay un-projected
  until read; `extract_meta_fields` pulls typed values with
  `try_variant_get` path expressions (malformed/missing/mistyped ->
  NULL, never a failed job — the right default when one bad sidecar in
  10^10 must not kill the pass). Heterogeneous keys coexist without any
  declared schema.
- **fixed schema** (`with_struct_meta`): `from_json` into a declared
  StructType when the shape IS known — columns prune and predicates can
  reach the reader, which VARIANT paths only partially enjoy.

Both are pure per-row expressions: parsing fuses into the scan stage, no
shuffle, no Python. At 100 TB the sidecar column rides the same parquet
scan as the text; extraction cost is proportional to bytes actually
touched (VARIANT stores a field index, not re-parsed text, per access).

No reference-engine counterpart (the reference's metadata is fixed
relational columns); this covers the lakehouse surface a modern pipeline
expects on top of it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def with_variant_meta(
    df: DataFrame, json_col: str, out_col: str = "meta", strict: bool = False
) -> DataFrame:
    """Parse a JSON-string sidecar column into a VARIANT column.

    ``strict=False`` (default) uses try_parse_json: malformed sidecars
    become NULL variants instead of failing the job."""
    parse = F.parse_json if strict else F.try_parse_json
    return df.withColumn(out_col, parse(F.col(json_col)))


def meta_field(meta: Column, path: str, dtype: str) -> Column:
    """One typed field out of a VARIANT: ``try_variant_get`` — NULL on a
    missing path or an uncastable value. ``path`` is a JSONPath like
    ``$.source.rank`` or ``$.tags[0]``."""
    return F.try_variant_get(meta, path, dtype)


def extract_meta_fields(
    df: DataFrame,
    fields: dict[str, tuple[str, str]],
    meta_col: str = "meta",
    keep: list[str] | None = None,
) -> DataFrame:
    """Project typed columns out of a VARIANT metadata column.

    ``fields`` maps output name -> (JSONPath, spark type string), e.g.
    ``{"site": ("$.source.site", "string"), "rank": ("$.source.rank",
    "int")}``. ``keep`` lists pass-through columns (default: all except
    the variant itself)."""
    keep = keep if keep is not None else [c for c in df.columns if c != meta_col]
    meta = F.col(meta_col)
    return df.select(
        *keep,
        *[meta_field(meta, p, t).alias(name) for name, (p, t) in fields.items()],
    )


def with_struct_meta(
    df: DataFrame, json_col: str, schema: T.StructType | str, out_col: str = "meta"
) -> DataFrame:
    """Fixed-schema alternative: ``from_json`` into a declared struct.
    Unlisted fields drop; listed-but-absent fields are NULL; a malformed
    document yields a NULL struct (from_json PERMISSIVE default)."""
    return df.withColumn(out_col, F.from_json(F.col(json_col), schema))
