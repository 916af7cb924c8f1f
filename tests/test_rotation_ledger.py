"""Grading-window rotation cadence guard (round-5 verdict item 6).

The driver grades only the first 50 ``queries()`` entries per round and
sometimes skips recording a round entirely (round 4 recorded no
CORRECTNESS/BENCH artifacts, silently aging a 22-entry cohort).
ROTATION_LEDGER.json commits the planned window for every recorded
round — r1–r5 reconstructed from CORRECTNESS_r0N.json keys, the current
round appended by the builder when it rotates ``queries()``.

Invariants:
1. The ledger's latest window is exactly the first 50 ``queries()``
   keys — the ledger can't drift from the contract file.
2. Every entry appears in the union of the last FOUR recorded windows
   (4 × 50 = 200 slots ≥ the 111-entry surface), so no cohort can go
   more than ~3 recorded rounds without a driver grade. Counting
   RECORDED rounds (ledger entries), not round numbers, makes a
   driver-skipped round age nothing.
3. Windows are exactly DRIVER_WINDOW entries with no duplicates, and
   every windowed name is a real ``queries()`` entry (historical
   windows may reference since-renamed entries only if the rename is
   recorded by keeping the old name in the ledger — currently none).
"""

from __future__ import annotations

import json
from pathlib import Path

import __spark_entry__ as entrymod

DRIVER_WINDOW = 50
MAX_WINDOWS_BACK = 4

_LEDGER = Path(__file__).resolve().parent.parent / "ROTATION_LEDGER.json"


def _rounds() -> list[dict]:
    return json.loads(_LEDGER.read_text())["rounds"]


def test_latest_window_matches_queries_ordering():
    rounds = _rounds()
    latest = rounds[-1]
    actual = list(entrymod.queries())[:DRIVER_WINDOW]
    assert latest["window"] == actual, (
        "ROTATION_LEDGER.json round "
        f"{latest['round']} window does not match the first {DRIVER_WINDOW} "
        "queries() entries — update the ledger when rotating the window"
    )


def test_every_entry_windowed_within_last_four_recorded_rounds():
    rounds = _rounds()
    recent = rounds[-MAX_WINDOWS_BACK:]
    covered = set()
    for rnd in recent:
        covered.update(rnd["window"])
    stale = sorted(set(entrymod.queries()) - covered)
    assert not stale, (
        f"entries with no driver grade in the last {len(recent)} recorded "
        f"rounds ({[r['round'] for r in recent]}): {stale} — rotate them "
        "into the next window"
    )


def test_windows_are_well_formed():
    names = set(entrymod.queries())
    rounds = _rounds()
    assert rounds == sorted(rounds, key=lambda r: r["round"])
    for rnd in rounds:
        win = rnd["window"]
        assert len(win) == DRIVER_WINDOW, (rnd["round"], len(win))
        assert len(set(win)) == len(win), f"dup entries in round {rnd['round']}"
        unknown = sorted(set(win) - names)
        assert not unknown, (
            f"round {rnd['round']} window references unknown entries: {unknown}"
        )


def test_cadence_against_driver_recorded_rounds():
    """Close the ledger loophole: the other cadence test counts LEDGER
    windows, which only exist when the builder appends them — an idle
    builder ages entries invisibly (rounds 8-9 recorded driver grades
    with no ledger entry). Check against the driver's OWN artifacts:
    every entry must either have a grade within the last four recorded
    CORRECTNESS rounds, or sit in the current window (= graded next
    recorded round)."""
    root = Path(__file__).resolve().parent.parent
    files = sorted(root.glob("CORRECTNESS_r*.json"))
    if not files:  # fresh clone without driver artifacts
        return
    last_grade: dict[str, int] = {}
    rounds = []
    for f in files:
        rnd = int(f.stem.split("_r")[1])
        rounds.append(rnd)
        for k in json.loads(f.read_text()):
            last_grade[k] = max(last_grade.get(k, 0), rnd)
    floor = sorted(set(rounds))[-MAX_WINDOWS_BACK:][0]
    window = set(list(entrymod.queries())[:DRIVER_WINDOW])
    stale = sorted(
        k for k in entrymod.queries()
        if last_grade.get(k, 0) < floor and k not in window
    )
    assert not stale, (
        f"entries last driver-graded before round {floor} and not in the "
        f"current window: {stale} — rotate them in"
    )


def test_structured_cohort_fields():
    """Round-14 verdict finding #1: hand-written grade-round claims go
    stale (the r14 window comment said pmi_collocations was
    "r13-graded"; its last grade was r12). Ledger rounds that carry the
    structured fields (r15+) pin the cohort claim mechanically: the
    cohort must equal the windowed entries whose recomputed latest
    grade — using ONLY the CORRECTNESS rounds that existed when the
    window was generated (``generated_from_rounds``) — is
    ``cohort_latest_grade``, and slack = window - cohort - flagship."""
    root = Path(__file__).resolve().parent.parent
    for rnd in _rounds():
        if "cohort_latest_grade" not in rnd:
            continue  # pre-r15 rounds predate the structured fields
        latest: dict[str, int] = {}
        for src_round in rnd["generated_from_rounds"]:
            f = root / f"CORRECTNESS_r{src_round:02d}.json"
            for k in json.loads(f.read_text()):
                latest[k] = max(latest.get(k, 0), src_round)
        window = rnd["window"]
        expected_cohort = sorted(
            k for k in window if latest.get(k) == rnd["cohort_latest_grade"]
        )
        assert rnd["cohort"] == expected_cohort, (
            f"round {rnd['round']} ledger cohort does not match the "
            f"mechanical recompute from rounds {rnd['generated_from_rounds']}"
        )
        expected_slack = sorted(
            k for k in window
            if k not in set(expected_cohort) and k != "q1_pricing_summary"
        )
        assert rnd["slack"] == expected_slack, (
            f"round {rnd['round']} ledger slack mismatch: {rnd['slack']} != "
            f"{expected_slack}"
        )
