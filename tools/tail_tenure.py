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
    only rotated-in names introduced before that rotation's own round
    count toward the pace (same-round additions are inflow, not
    burn-down) — and the projected zero-backlog round if that pace
    holds (VERDICT r10 ask #6, so later rotations are pre-committed
    instead of re-litigated).

The pace is computed from first-seen rounds resolved for the rotation's
rotated-in names REGARDLESS of their graded status (ADVICE r10: deriving
it from the never-graded set alone made the pace collapse to 0 the
moment the round's CORRECTNESS file landed).
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
# rotation_plan lives beside this file; when tail_tenure is imported
# (rather than run as a script) tools/ is not on sys.path.
_TOOLS_DIR = os.path.dirname(os.path.abspath(__file__))
if _TOOLS_DIR not in sys.path:
    sys.path.insert(0, _TOOLS_DIR)


def _round_boundaries() -> list[tuple[int, int]]:
    """[(round, unix_ts_of_its_end-of-round driver commit)], ascending."""
    out = subprocess.run(
        ["git", "-C", _REPO_ROOT, "log", "--format=%ct %s"],
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
    if not bounds:
        raise SystemExit(
            "tail_tenure: no 'round N: verdict/...' boundary commits found in"
            f" the git history of {_REPO_ROOT} — run this from a full clone"
            " of the driver-managed repo (round tenure cannot be derived"
            " from a fresh or shallow checkout)."
        )
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
            _REPO_ROOT,
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

    # Shared archive loader (review r14): tail_tenure's own glob had no
    # scratch-file filter, so a CORRECTNESS_r11_retry.json copy would
    # count here but not in rotation_plan/test_update_check — the exact
    # divergence the shared loader exists to prevent.
    from rotation_plan import load_archive

    graded: set[str] = set()
    for recs in load_archive(_REPO_ROOT).values():
        graded |= set(recs)
    qs = list(e.queries())
    ors = e.oracle_sql()
    window = set(qs[:50])
    never = [n for n in qs if n in ors and n not in graded]
    entering = sorted(set(never) & window)
    parked = sorted(set(never) - window)
    bounds = _round_boundaries()
    # first-seen rounds for the parked backlog AND the latest rotation's
    # rotated-in names — the latter independent of graded status, so the
    # pace survives the round's own CORRECTNESS file landing (ADVICE r10)
    rot_label, rotated_in, rotated_out = _ROTATION_HISTORY[-1]
    rot_round = int(rot_label.lstrip("r"))
    # anchor the projection to the CURRENT round (one past the last
    # "round N: verdict" boundary), not the latest rotation row's round —
    # otherwise a round that passes without a rotation leaves the
    # projected zero-backlog round stale/understated (code-review r11)
    current_round = max(rot_round, bounds[-1][0] + 1)
    first_seen = {
        n: _first_seen_round(n, bounds) for n in set(never) | set(rotated_in)
    }
    oldest = sorted(parked, key=lambda n: (first_seen[n], n))[:3]
    # backlog pace: rotated-in names introduced BEFORE the rotation's own
    # round (e.g. the r9 twins entering at r10 count; fresh r10 additions
    # would not — they are inflow, not burn-down)
    pace = sum(1 for n in rotated_in if first_seen[n] < rot_round)
    if pace:
        rounds_left = -(-len(parked) // pace)
        # if the current round's rotation hasn't landed yet
        # (current_round > rot_round), the cadence assumption means the
        # CURRENT round's rotation burns the first batch — so the zero
        # round is one earlier than naive anchor+rounds_left
        # (code-review r11)
        zero_round = current_round + rounds_left - (
            1 if current_round > rot_round else 0
        )
        burn = (
            f"at this rotation's backlog pace ({pace}/round, new-query"
            f" inflow excluded) the parked backlog burns down in"
            f" ~{rounds_left} rounds — projected zero-backlog round:"
            f" r{zero_round} if the {len(rotated_in)}-in/"
            f"{len(rotated_out)}-out cadence holds"
        )
    else:
        burn = (
            f"the {rot_label} rotation retired no pre-existing backlog"
            " (burn-down pace n/a this round)"
        )
    return (
        f"tail tenure: {len(never)} of {len(ors)} oracle-backed queries"
        f" never driver-graded — {len(entering)} rotate into the window"
        f" this round ({', '.join(entering)}), {len(parked)} stay parked;"
        f" longest-parked: "
        + ", ".join(f"{n} (since r{first_seen[n]})" for n in oldest)
        + f"; {burn}."
    )


if __name__ == "__main__":
    print(summarize())
