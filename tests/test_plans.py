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
    # round-2 additions
    "duplicate_spans": (2, None),  # exact COUNT(DISTINCT doc) is two-phase: (gram,doc) partial + gram final
    "value_histogram": (1, None),  # one bucket-keyed agg shuffle
    "cohort_retention": (3, None),  # first-event agg + join + distinct-count
    "rollup_maintenance": (3, None),  # stored agg + batch agg + merge agg
    "tfidf_topk": (4, "BroadcastHashJoin"),  # tf + df + window; df broadcast back
    "importance_weights": (4, "BroadcastHashJoin"),  # vocab agg + 1-row totals agg + score agg; ratios broadcast
    "scd2_asof_lookup": (4, None),  # dim build (full-outer) + fact join
    # round-5 additions
    "boilerplate_prune": (4, "BroadcastHashJoin"),  # DF agg + cut agg + rebuild join; bp set MUST broadcast
    "training_shuffle_order": (0, None),  # rank pass pre-materialized; returned frame is pure column math
    "json_props_extract": (1, None),  # one conditional-agg shuffle, extraction in the scan projection
    "source_overlap_matrix": (2, None),  # gram->source-set agg + pair agg; a gram self-join would blow this budget
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


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    from dhs_to_database_spark.plans.compaction import (
        compact_parquet,
        parquet_bytes,
    )
    from dhs_to_database_spark.sources.tables import load_table
    from tests.conftest import SF_DIR
    import glob

    docs = load_table(spark, SF_DIR, "documents")
    frag = str(tmp_path / "frag")
    docs.repartition(32).write.parquet(frag)
    assert len(glob.glob(frag + "/part-*")) == 32
    before = {r["doc_id"]: r["text"] for r in spark.read.parquet(frag).collect()}

    total = parquet_bytes(spark, frag)
    n = compact_parquet(spark, frag, target_bytes=total // 2 + 1)
    assert n == 2
    assert len(glob.glob(frag + "/part-*")) == 2
    after = {r["doc_id"]: r["text"] for r in spark.read.parquet(frag).collect()}
    assert after == before


def test_compact_parquet_partitioned_keeps_hive_layout(spark, tmp_path):
    from dhs_to_database_spark.plans.compaction import compact_parquet
    from dhs_to_database_spark.sources.tables import load_table
    from tests.conftest import SF_DIR
    import glob

    docs = load_table(spark, SF_DIR, "documents")
    p = str(tmp_path / "bylang")
    docs.repartition(16).write.partitionBy("lang").parquet(p)
    n_before = len(glob.glob(p + "/lang=*/part-*"))
    before = spark.read.parquet(p).count()
    compact_parquet(spark, p, target_bytes=1 << 30, partition_by=["lang"])
    files = glob.glob(p + "/lang=*/part-*")
    assert glob.glob(p + "/lang=*")  # hive layout preserved
    assert len(files) < n_before
    assert spark.read.parquet(p).count() == before
