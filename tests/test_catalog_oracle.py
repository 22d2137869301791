"""Run every catalog query against the DuckDB oracle at sf0.01 — the local
mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from irstats2_spark import catalog
from tests.oracle_utils import SF_ORACLE, assert_matches_oracle


def _names():
    catalog._ensure_loaded()
    return sorted(catalog._REGISTRY)


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, name):
    spec = catalog._REGISTRY[name]
    df = spec.spark(spark, SF_ORACLE)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only check, mirrors the driver
    else:
        assert_matches_oracle(df, spec.oracle)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_oracle_keys_subset():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) > 0


def test_readme_counts_match_catalog():
    """The README's 'N of the M catalog queries carry a value oracle'
    claim is derived from the catalog here so it can't drift again (it
    sat three versions stale before this check existed)."""
    import re
    from pathlib import Path

    readme = (Path(__file__).parent.parent / "README.md").read_text()
    m = re.search(r"(\d+) of\s*\n?the (\d+) catalog queries", readme)
    assert m, "README no longer states the oracle-coverage counts"
    catalog._ensure_loaded()
    n_oracled = sum(
        1 for s in catalog._REGISTRY.values() if s.oracle is not None
    )
    assert (int(m.group(1)), int(m.group(2))) == (
        n_oracled,
        len(catalog._REGISTRY),
    ), "update README's catalog-query counts"


def test_gate_priority_names_all_registered_and_exactly_50():
    """Every GATE_PRIORITY name must resolve to a registered query (a
    typo would silently shrink the driver-verified set) and the pinned
    gate must be exactly the driver's 50-slot window."""
    catalog._ensure_loaded()
    missing = [n for n in catalog.GATE_PRIORITY if n not in catalog._REGISTRY]
    assert missing == [], missing
    assert len(catalog.GATE_PRIORITY) == 50
    first50 = list(catalog.queries())[:50]
    assert first50 == list(catalog.GATE_PRIORITY)


def test_gate_priority_is_prefix_and_fully_oracled():
    """Gate hygiene: GATE_PRIORITY must be exactly the head of queries()
    (the driver checks the FIRST 50), every name must resolve, and every
    gated entry must carry a value oracle — round 5 spent a gate slot to
    learn that a rows-only entry yields err:"no_oracle" instead of a
    verification, so a rows-only name in the gate head is a bug."""
    catalog._ensure_loaded()
    names = list(catalog.queries())
    gate = list(catalog.GATE_PRIORITY)
    assert len(gate) == len(set(gate)), "duplicate gate entries"
    missing = [n for n in gate if n not in catalog._REGISTRY]
    assert not missing, f"gate names not registered: {missing}"
    assert names[: len(gate)] == gate
    oracled = catalog.oracle_sql()
    rows_only = [n for n in names[:50] if n not in oracled]
    assert not rows_only, f"rows-only entries in the driver's gate: {rows_only}"
