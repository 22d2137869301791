"""Gate-rotation ledger: when was each catalog query last driver-verified?

Reads every CORRECTNESS_r*.json in the repo root and prints, per
registered query, the most recent round whose driver row verified it
(and whether that row was green). This turns the "every driver row is
<= N rounds old" discipline from a hand-maintained comment in
catalog.py into something a script can check — run it when cutting the
next round's GATE_PRIORITY:

    python -m tools.gate_ledger            # full table, oldest first
    python -m tools.gate_ledger --debt 30  # the 30 stalest queries
    python -m tools.gate_ledger --check 6  # ENFORCE the rotation

``--check N`` makes the discipline a failing test, not a comment
(tests/test_gate_ledger.py runs it with N=6): exit nonzero when any
registered oracled query would end the UPCOMING round (max recorded
round + 1) more than N rounds stale — i.e. its newest driver row is
older than that, or it was never gated — AND it holds no slot in the
upcoming GATE_PRIORITY cut. A stale query that IS in the cut passes:
the cut is exactly the mechanism that refreshes it.

Queries never gated (new registrations) sort first with round 0.
Rows-only entries (no SQL oracle) are marked; they cannot take a gate
slot (the driver records err:"no_oracle" instead of a verification).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def last_verified() -> dict[str, tuple[int, bool]]:
    """query -> (latest round with a driver row, that row was green)."""
    seen: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            green = bool(
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and row.get("err") is None
            )
            prev = seen.get(name)
            if prev is None or rnd >= prev[0]:
                seen[name] = (rnd, green)
    return seen


GATE_SLOTS = 50  # the driver verifies the first 50 queries() entries


def check_simulated_next(max_age: int) -> list[str]:
    """``check`` as if the driver had just written the artifact for
    ``catalog.GATE_CUT_ROUND`` verifying the active GATE_PRIORITY cut —
    the end-of-round dry run for the staged NEXT_CUT: names that would
    violate the window at round GATE_CUT_ROUND + 1 with only NEXT_CUT
    scheduled. Run it before the round's final commit; a non-empty
    result means the staging is incomplete."""
    from irstats2_spark import catalog

    catalog._ensure_loaded()
    rows = last_verified()
    cut_round = getattr(catalog, "GATE_CUT_ROUND", None)
    if cut_round is None:
        return []
    upcoming = cut_round + 1
    active = list(catalog.queries())[:GATE_SLOTS]
    staged = set(tuple(getattr(catalog, "NEXT_CUT", ()))[:GATE_SLOTS])
    bad = []
    for name, spec in catalog._REGISTRY.items():
        if spec.oracle is None or name in staged:
            continue
        rnd = cut_round if name in active else rows.get(name, (0, False))[0]
        if rnd == 0 or upcoming - rnd > max_age:
            bad.append(name)
    return sorted(bad)


def check(max_age: int) -> list[str]:
    """Names that violate the rotation discipline at window ``max_age``:
    oracled, registered, (would-be) more than ``max_age`` rounds stale
    after the upcoming round, and NOT scheduled in the upcoming cut.

    The upcoming cut is GATE_PRIORITY while that cut is still pending
    (no artifact for GATE_CUT_ROUND yet); once the driver has written
    the artifact GATE_PRIORITY was cut for (``latest == cut_round``,
    EXACTLY), the consumed cut no longer counts as "scheduled" and the
    STAGED ``catalog.NEXT_CUT`` (if non-empty) takes its place — so a
    round's final commit can land artifacts + next cut together
    without the suite flashing red in the artifact-after-final-commit
    window (r10 verdict #5). If a LATER artifact lands without a
    promotion (``latest > cut_round``: a whole round went by and
    nobody moved NEXT_CUT into GATE_PRIORITY), the staged cut is NOT
    honored — the driver gates on queries() order, i.e. the stale
    GATE_PRIORITY, so pretending NEXT_CUT is scheduled would silence
    the red-suite reminder in exactly the forgotten-promotion case
    (r11 ADVICE medium). An empty NEXT_CUT keeps the old behavior: a
    consumed cut with nothing staged fails the check, which is the
    reminder to recut."""
    from irstats2_spark import catalog

    catalog._ensure_loaded()
    rows = last_verified()
    latest = max((r for r, _ in rows.values()), default=0)
    upcoming = latest + 1
    cut_round = getattr(catalog, "GATE_CUT_ROUND", None)
    staged = tuple(getattr(catalog, "NEXT_CUT", ()))
    if cut_round is not None and latest == cut_round and staged:
        cut = set(staged[:GATE_SLOTS])
    else:
        cut = set(list(catalog.queries())[:GATE_SLOTS])
    bad = []
    for name, spec in catalog._REGISTRY.items():
        if spec.oracle is None or name in cut:
            continue
        rnd, _green = rows.get(name, (0, False))
        if rnd == 0 or upcoming - rnd > max_age:
            bad.append(name)
    return sorted(bad)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--debt", type=int, default=None, metavar="N",
                    help="print only the N stalest queries")
    ap.add_argument("--check", type=int, default=None, metavar="N",
                    help="exit nonzero if any registered oracled query "
                    "would exceed N rounds without a driver row and "
                    "holds no slot in the upcoming gate cut")
    ap.add_argument("--simulate-next", type=int, default=None, metavar="N",
                    help="dry-run the staged NEXT_CUT: exit nonzero if, "
                    "after GATE_CUT_ROUND's artifact lands verifying the "
                    "active cut, any query would exceed N rounds without "
                    "a slot in NEXT_CUT")
    args = ap.parse_args()

    if args.simulate_next is not None:
        bad = check_simulated_next(args.simulate_next)
        if bad:
            print(
                f"gate_ledger --simulate-next {args.simulate_next}: "
                f"{len(bad)} quer{'y' if len(bad) == 1 else 'ies'} would "
                f"be too stale with only NEXT_CUT staged:"
            )
            for name in bad:
                print(f"  {name}")
            raise SystemExit(1)
        print(
            f"gate_ledger --simulate-next {args.simulate_next}: staged "
            f"NEXT_CUT covers the post-artifact window"
        )
        return

    if args.check is not None:
        bad = check(args.check)
        if bad:
            print(
                f"gate_ledger --check {args.check}: {len(bad)} quer"
                f"{'y' if len(bad) == 1 else 'ies'} too stale and not "
                f"in the upcoming cut:"
            )
            for name in bad:
                print(f"  {name}")
            raise SystemExit(1)
        print(f"gate_ledger --check {args.check}: rotation discipline holds")
        return

    from irstats2_spark import catalog

    catalog._ensure_loaded()
    rows = last_verified()
    table = []
    for name, spec in catalog._REGISTRY.items():
        rnd, green = rows.get(name, (0, False))
        table.append((rnd, name, green, spec.oracle is not None))
    table.sort(key=lambda t: (t[0], t[1]))
    if args.debt:
        table = table[: args.debt]
    width = max(len(t[1]) for t in table)
    for rnd, name, green, oracled in table:
        status = ("never-gated" if rnd == 0
                  else f"r{rnd} {'green' if green else 'RED'}")
        extra = "" if oracled else "  [rows-only: cannot take a gate slot]"
        print(f"{name:<{width}}  {status}{extra}")


if __name__ == "__main__":
    main()
