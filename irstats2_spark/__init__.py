"""irstats2_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of EPrints IRStats2 (reference: eprints/irstats2).

Architecture (SURVEY.md §7): medallion layout over Parquet —
bronze (raw access events), silver (filtered events + conformed dimensions),
gold (daily-grain fact tables) — plus a Context-driven query layer that
compiles the reference's two SQL shapes into DataFrame plans, and a set of
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) beyond the reference's own surface.

Everything is declarative DataFrame/SQL so Catalyst supplies predicate
pushdown, column pruning, partition pruning, broadcast joins and AQE.
"""

__version__ = "0.1.0"
