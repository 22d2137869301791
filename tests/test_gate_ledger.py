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


def test_simulate_next_covers_staged_window():
    """The end-of-round dry run: with the committed NEXT_CUT staged, no
    query may fall past the window once GATE_CUT_ROUND's artifact lands
    — this is the live assertion that the staging in catalog.py is
    complete (the synthetic-race test below covers the mechanism)."""
    bad = gate_ledger.check_simulated_next(AGREED_WINDOW)
    assert bad == [], (
        f"staged NEXT_CUT leaves {len(bad)} queries past the window "
        f"after the round's artifact lands — extend NEXT_CUT: {bad}"
    )


def test_simulate_next_cli_flags_incomplete_staging(monkeypatch):
    from irstats2_spark import catalog

    catalog._ensure_loaded()
    monkeypatch.setattr(catalog, "NEXT_CUT", ())
    # with nothing staged, window 1 flags every query whose newest row
    # predates the previous round — but never the just-verified active
    # cut (staleness exactly 1 after the simulated artifact)
    bad = gate_ledger.check_simulated_next(1)
    active = set(list(catalog.queries())[:gate_ledger.GATE_SLOTS])
    assert bad and not set(bad) & active


def test_gate_priority_names_are_registered():
    """A typo'd GATE_PRIORITY name silently wastes a driver slot (the
    ordering helper skips unknown names) — catch it here instead.
    NEXT_CUT names are held to the same bar: a typo there would leave
    a query unscheduled exactly when the check consults the staging."""
    from irstats2_spark import catalog

    catalog._ensure_loaded()
    unknown = [n for n in catalog.GATE_PRIORITY if n not in catalog._REGISTRY]
    assert unknown == [], unknown
    unknown_next = [n for n in catalog.NEXT_CUT if n not in catalog._REGISTRY]
    assert unknown_next == [], unknown_next
    assert len(set(catalog.NEXT_CUT)) == len(catalog.NEXT_CUT)


def test_staged_next_cut_bridges_the_artifact_race(monkeypatch, tmp_path):
    """r10 verdict #5: the driver writes CORRECTNESS_r{N} AFTER round
    N's final commit, advancing 'upcoming' past the round GATE_PRIORITY
    was cut for — which made the suite red at HEAD every round. With a
    staged NEXT_CUT, check() must be green BOTH before the artifact
    lands (GATE_PRIORITY active) and after (NEXT_CUT active); with
    nothing staged, the post-artifact state must fail as before."""
    import json

    from irstats2_spark import catalog

    catalog._ensure_loaded()
    names = sorted(catalog._REGISTRY)
    oracled = [n for n in names if catalog._REGISTRY[n].oracle is not None]
    cut_round = 7
    # synthetic ledger: every oracled query verified at r1 (very stale),
    # except the GATE_PRIORITY cut's names which r6 verified
    pre = {n: {"rows_match": True, "schema_match": True,
               "hash_match": True, "err": None} for n in oracled}
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(pre))
    monkeypatch.setattr(gate_ledger, "HERE", str(tmp_path))
    monkeypatch.setattr(catalog, "GATE_CUT_ROUND", cut_round)

    active_cut = list(catalog.queries())[:gate_ledger.GATE_SLOTS]
    oracled_cut = [n for n in active_cut
                   if catalog._REGISTRY[n].oracle is not None]
    # PRE-artifact (latest < cut_round): GATE_PRIORITY is the schedule
    # and NEXT_CUT must be IGNORED even if present. At window 0 every
    # oracled query is stale, so exactly the unscheduled ones violate.
    monkeypatch.setattr(catalog, "NEXT_CUT", tuple(oracled))
    pre_bad = set(gate_ledger.check(0))
    assert pre_bad == {n for n in oracled if n not in active_cut}
    assert not pre_bad & set(oracled_cut)  # scheduled => never flagged
    # POST-artifact: r{cut_round-1} refreshed everything except a small
    # stale handful, then CORRECTNESS for cut_round lands verifying the
    # active cut; upcoming becomes cut_round+1 and only the handful is
    # past the window
    stale = [n for n in oracled if n not in active_cut][:5]
    refresh = {n: {"rows_match": True, "schema_match": True,
                   "hash_match": True, "err": None}
               for n in oracled if n not in stale}
    (tmp_path / f"CORRECTNESS_r{cut_round - 1:02d}.json").write_text(
        json.dumps(refresh)
    )
    post = {n: {"rows_match": True, "schema_match": True,
                "hash_match": True, "err": None} for n in active_cut}
    (tmp_path / f"CORRECTNESS_r{cut_round:02d}.json").write_text(
        json.dumps(post)
    )
    # nothing staged -> the stale handful violates (old behavior)
    monkeypatch.setattr(catalog, "NEXT_CUT", ())
    assert set(gate_ledger.check(cut_round - 2)) == set(stale)
    # staging the stale handful bridges the race -> green
    monkeypatch.setattr(catalog, "NEXT_CUT", tuple(stale))
    assert gate_ledger.check(cut_round - 2) == []
    # a partial staging still flags what it leaves out
    monkeypatch.setattr(catalog, "NEXT_CUT", tuple(stale[:1]))
    assert set(gate_ledger.check(cut_round - 2)) == set(stale[1:])
    # FORGOTTEN PROMOTION (r11 ADVICE medium): a LATER artifact lands
    # (latest > cut_round) while NEXT_CUT was never moved into
    # GATE_PRIORITY — the driver gated the stale first-50, not the
    # staged names, so the staging must STOP counting as scheduled and
    # the stale handful must flag again instead of staying silenced.
    later = {n: {"rows_match": True, "schema_match": True,
                 "hash_match": True, "err": None} for n in active_cut}
    (tmp_path / f"CORRECTNESS_r{cut_round + 1:02d}.json").write_text(
        json.dumps(later)
    )
    monkeypatch.setattr(catalog, "NEXT_CUT", tuple(stale))
    assert set(gate_ledger.check(cut_round - 1)) == set(stale)


def test_gate_priority_fills_every_slot():
    """The cut must spend its whole budget: fewer names than slots means
    the tail falls to registration order, which is how the removal
    family went unverified for a round."""
    from irstats2_spark import catalog

    assert len(catalog.GATE_PRIORITY) == gate_ledger.GATE_SLOTS
    assert len(set(catalog.GATE_PRIORITY)) == len(catalog.GATE_PRIORITY)
