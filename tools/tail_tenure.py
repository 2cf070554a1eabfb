"""Tail-tenure summary (VERDICT r9 ask #5): one line for CHECK_LOCAL.

Derived live from the CORRECTNESS_r*.json archive, the registry,
tests.test_update_check._ROTATION_HISTORY, and git history (the round a
query's name first landed in the repo, resolved exactly against the
driver's "round N:" boundary commits), so the never-driver-graded
backlog stays visible each round instead of being rediscovered by each
judge.  Prints:

  - how many oracle-backed queries have NEVER appeared in any round's
    graded window (split: rotating into the window THIS round vs still
    parked in the tail),
  - the longest-parked never-graded entries with the round each was
    introduced,
  - rounds-to-burn-down at the BACKLOG pace of the latest rotation —
    only rotated-in names older than the rotation's own round count
    toward the pace (same-round additions are inflow, not burn-down).
"""

from __future__ import annotations

import glob
import json
import re
import subprocess
import sys

sys.path.insert(0, "/root/repo")


def _round_boundaries() -> list[tuple[int, int]]:
    """[(round, unix_ts_of_its_end-of-round driver commit)], ascending."""
    out = subprocess.run(
        ["git", "-C", "/root/repo", "log", "--format=%ct %s"],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    bounds: dict[int, int] = {}
    for line in out.splitlines():
        m = re.match(r"(\d+) round (\d+): verdict/", line)
        if m:
            ts, rnd = int(m.group(1)), int(m.group(2))
            bounds[rnd] = max(bounds.get(rnd, 0), ts)
    return sorted(bounds.items())


def _first_seen_round(name: str, bounds: list[tuple[int, int]]) -> int:
    """Round in which ``name`` first appeared as a quoted string anywhere
    in the repo (first -S commit's timestamp vs the round boundaries; a
    name introduced after the last boundary belongs to the current,
    still-unjudged round)."""
    out = subprocess.run(
        [
            "git",
            "-C",
            "/root/repo",
            "log",
            "--reverse",
            "--format=%ct",
            "-S",
            f'"{name}"',
        ],
        capture_output=True,
        text=True,
        check=True,
    ).stdout.split()
    if not out:
        return bounds[-1][0] + 1
    ts = int(out[0])
    for rnd, bts in bounds:
        if ts <= bts:
            return rnd
    return bounds[-1][0] + 1


def summarize() -> str:
    import __spark_entry__ as e
    from tests.test_update_check import _ROTATION_HISTORY

    graded: set[str] = set()
    for f in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        graded |= set(json.load(open(f)))
    qs = list(e.queries())
    ors = e.oracle_sql()
    window = set(qs[:50])
    never = [n for n in qs if n in ors and n not in graded]
    entering = sorted(set(never) & window)
    parked = sorted(set(never) - window)
    bounds = _round_boundaries()
    current = bounds[-1][0] + 1  # the round being built now
    first_seen = {n: _first_seen_round(n, bounds) for n in never}
    oldest = sorted(parked, key=lambda n: (first_seen[n], n))[:3]
    # backlog pace: rotated-in names introduced BEFORE this round;
    # same-round additions (e.g. the r9 twins entering at r10 count,
    # fresh r10 ones would not) are inflow, not burn-down
    pace = sum(1 for n in _ROTATION_HISTORY[-1][1] if first_seen.get(n, current) < current)
    rounds_left = -(-len(parked) // pace) if pace else 0
    return (
        f"tail tenure: {len(never)} of {len(ors)} oracle-backed queries"
        f" never driver-graded — {len(entering)} rotate into the window"
        f" this round ({', '.join(entering)}), {len(parked)} stay parked;"
        f" longest-parked: "
        + ", ".join(f"{n} (since r{first_seen[n]})" for n in oldest)
        + f"; at this rotation's backlog pace ({pace}/round, new-query"
        f" inflow excluded) the parked backlog burns down in"
        f" ~{rounds_left} rounds."
    )


if __name__ == "__main__":
    print(summarize())
