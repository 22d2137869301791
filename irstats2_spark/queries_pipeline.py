"""Training-data-pipeline queries (dedup / similarity / text analysis)
over documents + embeddings. Filled in as pipeline operators land."""

from __future__ import annotations
