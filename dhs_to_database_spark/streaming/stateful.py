"""Custom stateful streaming operator — SURVEY.md §2.D extension surface.

``applyInPandasWithState`` sessionizer: per-user sessions closed by a gap of
inactivity, emitting one summary row per CLOSED session (start, end,
n_events, total value, first/last event type). The first/last-type "session
path" is what Spark's native ``session_window`` aggregation cannot express —
it can merge counts/sums but not order-dependent fields — which is exactly
the case the custom-stateful escape hatch exists for.

Mechanics:
- State per user: the single open (most recent) session as a tuple of
  primitives. Sessions older than the newest event close *within* the batch
  and are emitted immediately; only the trailing open session is carried.
- An event-time timeout is registered at (watermark + gap); when it fires
  the open session is emitted and state cleared — so state is bounded by
  the watermark exactly like ``dropDuplicatesWithinWatermark``.
- Late events (before the open session) are folded into the open session
  conservatively; events later than watermark-gap are the normal path.

Scale: state per key is O(1) (six primitives), shuffle is one exchange on
user_id, and the pandas function sees Arrow batches — no per-row Python.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from ..operators.registry import query

GAP_US = 30 * 60 * 1_000_000  # 30 minutes, matching windows.session_windows

OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, total_value double, first_type string, last_type string"
)
STATE_SCHEMA = (
    "start_ms bigint, last_ms bigint, n_events bigint, total_value double, "
    "first_type string, last_type string"
)


def _us(ts: Any) -> int:
    # microseconds: full TimestampType precision, so gap/ordering decisions
    # are bit-identical to the batch gaps-and-islands twin
    return int(pd.Timestamp(ts).value // 1_000)


def sessionize(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    closed: list[tuple] = []

    def emit(s: tuple) -> None:
        closed.append(
            (
                user_id,
                pd.Timestamp(s[0], unit="us"),
                pd.Timestamp(s[1], unit="us"),
                s[2],
                s[3],
                s[4],
                s[5],
            )
        )

    if state.hasTimedOut:
        if state.exists:
            emit(tuple(state.get))
        state.remove()
    else:
        open_s = tuple(state.get) if state.exists else None
        events: list[tuple] = []
        for pdf in pdfs:
            for row in pdf.itertuples(index=False):
                events.append((_us(row.ts), str(row.event_type), float(row.value)))
        events.sort()
        for ts, etype, value in events:
            if open_s is None:
                open_s = (ts, ts, 1, value, etype, etype)
            elif ts - open_s[1] > GAP_US:
                emit(open_s)
                open_s = (ts, ts, 1, value, etype, etype)
            else:
                open_s = (
                    open_s[0],
                    max(ts, open_s[1]),
                    open_s[2] + 1,
                    open_s[3] + value,
                    open_s[4],
                    etype,
                )
        if open_s is not None:
            state.update(open_s)
            # close the open session once the watermark passes its gap
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max((open_s[1] + GAP_US) // 1000, wm_ms + 1))

    if closed:
        yield pd.DataFrame(
            closed,
            columns=[
                "user_id",
                "session_start",
                "session_end",
                "n_events",
                "total_value",
                "first_type",
                "last_type",
            ],
        )


def session_paths(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Per-user session summaries with order-dependent first/last event type.

    Emits one row per closed session (append mode); the open session per
    user closes via event-time timeout when the watermark passes its gap.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            sessionize,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )


@query("stateful_session_paths")  # streaming custom stateful op: rows-only check
def stateful_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drains the sessionizer with availableNow and returns the emitted
    (closed) sessions. Registered without an oracle: incremental
    emit-on-close semantics over a stream are not SQL-expressible — the
    batch-equivalence proof lives in tests/test_streaming.py."""
    from .events import read_events_stream, run_to_memory

    stream = read_events_stream(spark, sf_dir)
    run_to_memory(session_paths(stream), "stateful_session_paths_out")
    return spark.table("stateful_session_paths_out")
