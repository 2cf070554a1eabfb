"""Steady-state grading-rotation planner (VERDICT r13 ask #2).

With the never-driver-graded backlog at zero (r14), the rotation's
purpose shifts from "first grade for everyone" to "refresh the oldest
driver evidence". The policy, applied each round from r15 on:

  IN-set  (pre-committed by name, enforced by test): the STEADY_SWAP
          oracle-backed TAIL queries whose most recent driver grade is
          oldest — ordered by (last_graded_round, name) ascending, so
          the list is deterministic given the committed CORRECTNESS
          archive. Every candidate is continuously check_oracle- and
          bitwise-probe-verified in the tail, so rotating in is a
          refresh, not a risk.
  OUT-set (contingent, never pre-committed): the same number of
          longest-tenured in-window queries — ordered by
          (current_stint_start_round, name) — SKIPPING family anchors
          (a family's sole graded representative never rotates out) and
          any query not green in the immediately preceding
          CORRECTNESS file (failures never rotate out red; the
          test_rotation_never_retires_ungraded invariant).

Run: python tools/rotation_plan.py  — prints the planned next IN-set
and the tenure-ordered OUT-candidates with anchor annotations.

tests/test_update_check.py::test_steady_state_rotation_plan pins that
PLANNED_NEXT_IN below equals the policy's computation over the
committed archive, so the pre-committed list can never drift from the
documented ordering.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

# How many queries each steady-state rotation refreshes.
STEADY_SWAP = 10

# The pre-committed r15 IN-set: the 10 oldest-evidence tail queries
# (all last driver-graded in round 1; alphabetical tie-break).
# vocab_stats — the 11th r1-evidence query — heads the r16 queue.
PLANNED_NEXT_ROUND = "r15"
PLANNED_NEXT_IN = [
    "doc_fingerprint",
    "except_intersect_all",
    "frame_sample",
    "lang_id_heuristic",
    "merge_upsert_orders",
    "ngram_jaccard_pairs",
    "percentile_summary",
    "rollup_agg",
    "sentinel_dup_check",
    "unpivot_long",
]

# Families whose SOLE in-window graded representative is exempt from
# rotating out (VERDICT r13 ask #2 "family anchors exempt"). Kept as an
# explicit name -> family map so the out-candidate listing can annotate
# and the per-round analysis can update it when a sibling joins the
# window and un-soles an anchor.
FAMILY_ANCHORS = {
    "interval_join_attribution": "banded join",
    "decontaminate_pairs": "decontamination",
    "json_props_extract": "JSON/map extraction",
    "approx_quantile_calibration": "sketch",
    "dq_checks_orders": "declarative rules / reconcile",
    "dedup_incremental_bloom": "near-dup",
    "stateful_session_paths": "streaming engine",
    "quantile_normalize": "distributed rank",
    "kmeans_calibration": "iterative calibration",
    "irls_stats_calibration": "iterative calibration (classifier)",
    "embedding_centroids": "embedding/similarity",
}


def load_archive(root: str = _ROOT) -> dict[int, dict]:
    archive: dict[int, dict] = {}
    for f in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", f)
        if m is None:  # scratch copies
            continue
        with open(f) as fh:
            archive[int(m.group(1))] = json.load(fh)
    return archive


def last_graded(archive: dict[int, dict]) -> dict[str, int]:
    out: dict[str, int] = {}
    for rnd, recs in archive.items():
        for name in recs:
            out[name] = max(out.get(name, 0), rnd)
    return out


def first_of_current_stint(name: str, archive: dict[int, dict]) -> int:
    """First round of the query's CURRENT uninterrupted grading stint
    (a query graded r1-r4, rotated out, and graded again r10-r13 has
    stint start 10, not 1)."""
    rounds = sorted(r for r, recs in archive.items() if name in recs)
    if not rounds:
        return 10**9  # never graded: treat as newest possible
    start = rounds[-1]
    for r in reversed(rounds[:-1]):
        if r == start - 1:
            start = r
        else:
            break
    return start


def planned_in(tail: list[str], archive: dict[int, dict],
               n: int = STEADY_SWAP) -> list[str]:
    """The next IN-set: the n tail queries with the oldest most-recent
    driver grade, (last_graded_round, name)-ordered. Window/tail
    disjointness is the registry's invariant (queries() ordering), not
    this function's — it ranks only what it is given."""
    lg = last_graded(archive)
    ranked = sorted(tail, key=lambda q: (lg.get(q, 0), q))
    return ranked[:n]


def record_is_green(rec) -> bool:
    """Driver-green per the retirement invariant: no error, schema not
    explicitly regressed, hash matched when hash-backed, rows matched
    otherwise (ADVICE r11: a rows-only record with schema_match False
    must not count). Shared by the planner's out-candidate analysis and
    tests/test_update_check.py::test_rotation_never_retires_ungraded so
    the two can't diverge."""
    if not isinstance(rec, dict):
        return bool(rec)
    if rec.get("err") or rec.get("schema_match") is False:
        return False
    if rec.get("hash_match") is not None:
        return bool(rec["hash_match"])
    return bool(rec.get("rows_match"))


def out_candidates(window: list[str], archive: dict[int, dict]) -> list[tuple]:
    latest = max(archive) if archive else None
    prev = archive.get(latest, {}) if latest is not None else {}

    rows = []
    for q in window:
        stint = first_of_current_stint(q, archive)
        anchor = FAMILY_ANCHORS.get(q)
        # Three states, because the retirement invariant treats them
        # differently: "green" (eligible to rotate out), "red" (graded
        # and failing — NEVER rotates out), "ungraded" (no record in
        # the latest CORRECTNESS — e.g. just rotated in; not eligible
        # yet, but not failing either). Review r14: collapsing the last
        # two mislabeled every fresh rotated-in query as not-green.
        if q not in prev:
            status = "ungraded"
        else:
            status = "green" if record_is_green(prev[q]) else "red"
        rows.append((stint, q, anchor, status))
    rows.sort(key=lambda r: (r[0], r[1]))
    return rows


def main() -> None:
    import __spark_entry__ as e

    qs, ors = e.queries(), e.oracle_sql()
    names = list(qs)
    window = names[:50]
    tail = [n for n in names[50:] if n in ors]
    archive = load_archive()

    plan = planned_in(tail, archive)
    lg = last_graded(archive)
    print(f"policy: swap the {STEADY_SWAP} oldest-evidence tail queries in"
          " each round; family anchors and non-green queries never rotate"
          " out.")
    print(f"\nplanned {PLANNED_NEXT_ROUND} IN-set (computed):")
    for q in plan:
        print(f"  {q} (last graded r{lg.get(q, 0)})")
    if plan != PLANNED_NEXT_IN:
        print("\nWARNING: computed IN-set differs from the pre-committed"
              f" PLANNED_NEXT_IN: {PLANNED_NEXT_IN}")
    print("\nOUT-candidates, tenure-first (anchor/green annotations;"
          " final set contingent on the next CORRECTNESS being green):")
    shown = 0
    for stint, q, anchor, status in out_candidates(window, archive):
        tag = f" [ANCHOR: {anchor}]" if anchor else ""
        if status == "red":
            tag += " [NOT GREEN LAST ROUND]"
        elif status == "ungraded":
            tag += " [NO GRADE YET]"
        print(f"  stint r{stint}+: {q}{tag}")
        shown += 1
        if shown >= 2 * STEADY_SWAP:
            break


if __name__ == "__main__":
    main()
