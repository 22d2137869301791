"""The gate-rotation discipline as a failing test (r8 verdict #5).

The driver verifies only the first 50 catalog queries per round, so
GATE_PRIORITY must rotate: every oracled query needs a fresh driver row
at least every AGREED_WINDOW rounds. `tools.gate_ledger --check N`
encodes the rule (stale-or-never-gated AND not scheduled in the
upcoming cut => violation); this test runs it so a forgotten rotation
fails the suite instead of surviving as a comment.

No Spark session needed — the ledger reads CORRECTNESS_r*.json and the
catalog registry only.
"""

from __future__ import annotations

import subprocess
import sys

from tools import gate_ledger

AGREED_WINDOW = 6  # rounds a query may go without a driver row


def test_rotation_discipline_holds():
    bad = gate_ledger.check(AGREED_WINDOW)
    assert bad == [], (
        f"{len(bad)} queries would exceed {AGREED_WINDOW} rounds without "
        f"a driver row and hold no slot in the upcoming GATE_PRIORITY "
        f"cut — rotate them in (catalog.py): {bad}"
    )


def test_cli_check_exit_codes():
    # run from the repo root the module itself resolves, not a literal
    # path, so the test works on any checkout location
    ok = subprocess.run(
        [sys.executable, "-m", "tools.gate_ledger", "--check",
         str(AGREED_WINDOW)],
        capture_output=True, text=True, cwd=gate_ledger.HERE,
    )
    assert ok.returncode == 0, ok.stdout + ok.stderr
    # an impossibly tight window must trip the nonzero exit path
    tight = subprocess.run(
        [sys.executable, "-m", "tools.gate_ledger", "--check", "0"],
        capture_output=True, text=True, cwd=gate_ledger.HERE,
    )
    assert tight.returncode == 1, tight.stdout + tight.stderr
    assert "too stale" in tight.stdout


def test_gate_priority_names_are_registered():
    """A typo'd GATE_PRIORITY name silently wastes a driver slot (the
    ordering helper skips unknown names) — catch it here instead."""
    from irstats2_spark import catalog

    catalog._ensure_loaded()
    unknown = [n for n in catalog.GATE_PRIORITY if n not in catalog._REGISTRY]
    assert unknown == [], unknown


def test_gate_priority_fills_every_slot():
    """The cut must spend its whole budget: fewer names than slots means
    the tail falls to registration order, which is how the removal
    family went unverified for a round."""
    from irstats2_spark import catalog

    assert len(catalog.GATE_PRIORITY) == gate_ledger.GATE_SLOTS
    assert len(set(catalog.GATE_PRIORITY)) == len(catalog.GATE_PRIORITY)
