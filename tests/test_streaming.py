"""Batch-stream equivalence tests for the streaming surface (§2.D)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dhs_to_database_spark.streaming.events import (
    deduped_stream,
    read_events_stream,
    run_to_memory,
    session_counts,
    sliding_counts,
    tumbling_counts,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events_stream(spark):
    return read_events_stream(spark, SF_DIR)


def _batch_events(spark):
    from dhs_to_database_spark.sources.tables import load_table

    return load_table(spark, SF_DIR, "events")


def test_tumbling_stream_matches_batch(spark, events_stream):
    run_to_memory(tumbling_counts(events_stream), "t_tumble", output_mode="complete")
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.table("t_tumble").collect()
    }
    want = {
        (r["w"]["start"], r["event_type"]): r["n"]
        for r in _batch_events(spark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_sliding_stream_matches_batch(spark, events_stream):
    run_to_memory(sliding_counts(events_stream), "t_slide", output_mode="complete")
    got = {r["window_start"]: r["n_events"] for r in spark.table("t_slide").collect()}
    want = {
        r["w"]["start"]: r["n"]
        for r in _batch_events(spark)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_session_stream_matches_batch_islands(spark, events_stream):
    """session_window stream vs the gaps-and-islands batch formulation:
    same number of sessions and same per-session event counts per user."""
    run_to_memory(session_counts(events_stream), "t_sess", output_mode="complete")
    got = sorted(
        (r["user_id"], r["session_start"], r["n_events"])
        for r in spark.table("t_sess").collect()
    )
    from dhs_to_database_spark.operators.windows import session_windows

    want = sorted(
        (r["user_id"], r["session_start"], r["n_events"])
        for r in session_windows(spark, SF_DIR).collect()
    )
    assert got == want


def test_dedup_within_watermark(spark, events_stream):
    run_to_memory(deduped_stream(events_stream), "t_dedup")
    n = spark.table("t_dedup").count()
    assert n == _batch_events(spark).select("event_id").distinct().count()
