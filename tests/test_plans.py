"""Physical-plan regression tests: pin the shuffle budget and join
strategy of headline queries. A new Exchange node or a lost broadcast is
a scale regression even when results stay correct — catch it here, not
in a 100 TB run.

Counts mirror tools/plan_audit.py (regenerates PLANS.md); keep the two
in sync when a plan legitimately changes.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as em
from tests.conftest import SF_DIR, count_exchanges, plan_string

QUERIES = em.queries()

# query -> (max Exchange nodes, must-contain plan fragment or None)
PLAN_BUDGET = {
    "pricing_summary": (1, None),
    "flagship_cross_level": (1, "BroadcastHashJoin"),
    "join_inner": (1, "BroadcastHashJoin"),
    "top1_per_group": (1, None),
    "rowid_join": (1, None),
    "dedup_exact": (1, None),
    "asof_join": (1, None),
    "token_count": (0, None),
    "train_test_split": (0, None),
    "winnowing_fingerprint": (0, None),
    "cube_agg": (1, "Expand"),
    "tumbling_window": (1, None),
    "segment_window_counts": (1, "BroadcastHashJoin"),
    "top_unshipped_orders": (1, "TakeOrderedAndProject"),
}


@pytest.mark.parametrize("name", sorted(PLAN_BUDGET))
def test_plan_budget(spark, name):
    max_exchanges, fragment = PLAN_BUDGET[name]
    plan = plan_string(QUERIES[name](spark, SF_DIR))
    n_exchange = count_exchanges(plan)
    assert n_exchange <= max_exchanges, (
        f"{name}: {n_exchange} shuffles (budget {max_exchanges})"
    )
    if fragment:
        assert fragment in plan, f"{name}: expected {fragment} in plan"
