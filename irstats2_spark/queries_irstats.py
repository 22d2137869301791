"""IRStats2-semantics queries over the driver tables (filled in as the
engine's ETL + Context layers land). See queries_core for primitives."""

from __future__ import annotations
