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
user_id, and the pandas function sees Arrow batches. The in-batch session
split is vectorized numpy gaps-and-islands (diff > GAP → cumsum islands →
reduceat aggregates); Python touches only the O(#sessions) boundary fold
that merges island 0 with the carried open-session state.
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np
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


def sessionize(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    # r14 (guide §4.2): emitted sessions stay as primitive tuples; the
    # yielded frame is assembled ONCE from typed numpy columns at the
    # bottom. The old per-yield pd.DataFrame(list-of-tuples with
    # pd.Timestamp cells) went through pandas' object-array inference —
    # ~1.3 ms per KEY, i.e. the dominant cost of the whole drain once
    # the state store was right-sized (profiled: 2.3 ms/key Python vs
    # ~0.4 ms/key everything-else). Same values bit-for-bit: int64
    # microseconds -> datetime64[us] is exactly what pd.Timestamp(unit=
    # "us") encoded, floats pass through np.float64 unchanged.
    closed: list[tuple] = []
    emit = closed.append

    if state.hasTimedOut:
        if state.exists:
            emit(tuple(state.get))
        state.remove()
    else:
        open_s = tuple(state.get) if state.exists else None
        parts = [pdf for pdf in pdfs if len(pdf)]
        n = sum(len(p) for p in parts)
        if n:
            batch = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
            # Sort by (ts, event_type, value) exactly like the scalar fold's
            # tuple sort; stable multi-key lexsort gives the same order.
            # Arrow always decodes ts as datetime64, so the to_numpy view
            # is free; the to_datetime fallback keeps any exotic input on
            # the old (identical-value) path.
            ts_col = batch["ts"]
            if ts_col.dtype.kind != "M":
                ts_col = pd.to_datetime(ts_col)
            u_raw = (
                ts_col.to_numpy()
                .astype("datetime64[us]", copy=False)
                .astype(np.int64, copy=False)
            )
            # values are already Python str from Arrow; lexsort compares
            # object-dtype str cells exactly like the former astype(str).
            # NULL cells are not comparable under lexsort, so a batch
            # containing any falls back to the old astype(str) coercion
            # (None -> 'None') — same ordering the original code gave.
            et_col = batch["event_type"]
            if et_col.isna().any():
                et_col = et_col.astype(str)
            et_raw = et_col.to_numpy()
            v_raw = batch["value"].to_numpy(dtype=np.float64)
            order = np.lexsort((v_raw, et_raw, u_raw))
            u, et, v = u_raw[order], et_raw[order], v_raw[order]

            # Gap breaks. For i>=1 the previous session's last_ms is
            # max(u[i-1], open_last): before any break the open session's
            # carried last_ms can still exceed u[i-1] (late events); after a
            # break every ts already exceeds open_last + GAP, so the max is
            # u[i-1] either way — the vectorized test is exact.
            brk = np.empty(n, dtype=bool)
            if open_s is None:
                brk[0] = True
                if n > 1:
                    brk[1:] = (u[1:] - u[:-1]) > GAP_US
            else:
                brk[0] = (u[0] - open_s[1]) > GAP_US
                if n > 1:
                    brk[1:] = (u[1:] - np.maximum(u[:-1], open_s[1])) > GAP_US

            starts = np.concatenate(([0], np.flatnonzero(brk[1:]) + 1))
            ends = np.concatenate((starts[1:], [n])) - 1
            seg_n = np.diff(np.concatenate((starts, [n])))
            seg_sum = np.add.reduceat(v, starts)
            sessions: list[tuple] = [
                (
                    int(u[starts[k]]),
                    int(u[ends[k]]),
                    int(seg_n[k]),
                    float(seg_sum[k]),
                    str(et[starts[k]]),
                    str(et[ends[k]]),
                )
                for k in range(len(starts))
            ]
            if open_s is not None:
                if brk[0]:
                    sessions.insert(0, open_s)
                else:
                    s0 = sessions[0]
                    sessions[0] = (
                        open_s[0],
                        max(open_s[1], s0[1]),
                        open_s[2] + s0[2],
                        open_s[3] + s0[3],
                        open_s[4],
                        s0[5],
                    )
            for s in sessions[:-1]:
                emit(s)
            open_s = sessions[-1]
        if open_s is not None:
            state.update(open_s)
            # close the open session once the watermark passes its gap
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max((open_s[1] + GAP_US) // 1000, wm_ms + 1))

    if closed:
        k = len(closed)
        yield pd.DataFrame(
            {
                # object fallback keeps a NULL grouping key a NULL output
                # cell (np.full would raise on None), as the old
                # object-dtype frame did
                "user_id": (
                    np.full(k, user_id, dtype=np.int64)
                    if user_id is not None
                    else [None] * k
                ),
                "session_start": np.fromiter(
                    (s[0] for s in closed), dtype=np.int64, count=k
                ).astype("datetime64[us]"),
                "session_end": np.fromiter(
                    (s[1] for s in closed), dtype=np.int64, count=k
                ).astype("datetime64[us]"),
                "n_events": np.fromiter(
                    (s[2] for s in closed), dtype=np.int64, count=k
                ),
                "total_value": np.fromiter(
                    (s[3] for s in closed), dtype=np.float64, count=k
                ),
                "first_type": [s[4] for s in closed],
                "last_type": [s[5] for s in closed],
            }
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


# Oracle (r4, upgrading this query from rows-only to hash-verified): the
# availableNow drain's emitted set IS deterministic and SQL-expressible.
# events.parquet is one file -> ONE data batch processed at watermark 0
# (nothing dropped, no mid-stream timeouts), then Spark's no-data batch
# runs with the final watermark wm = max(ts) - 2h and fires event-time
# timeouts. So the emitted rows are exactly:
#   * every session with a successor session for the same user (closed
#     by the gap rule inside the batch), plus
#   * each user's trailing session iff its timeout timestamp
#     floor((end_us + GAP)/1000) ms lies strictly before wm (ms) — the
#     sessionizer's setTimeoutTimestamp arithmetic, mirrored in integer
#     epoch math below.
# The oracle reproduces the sessionizer bit-for-bit: same (ts,
# event_type, value) sort tie-break, same 30-min strict-gap rule, and
# total_value rounded at 2 decimals on BOTH sides (the Python float sum
# and DuckDB's double sum agree after rounding because event values
# carry 2 decimals, so true sums sit far from rounding boundaries).
# Validated empirically: 9520/9520 emitted rows value-identical at
# sf0.01, 943/943 at sf0.001.
@query(
    "stateful_session_paths",
    oracle=f"""
    WITH e AS (SELECT user_id, ts, event_type, value FROM events),
    mx AS (SELECT (epoch_us(max(ts)) // 1000) - 7200000 AS wm_ms FROM e),
    lagged AS (
      SELECT user_id, ts, event_type, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTES
                  THEN 1 ELSE 0 END AS brk
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type, value)
    ),
    isl AS (
      SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_type, value
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM lagged
    ),
    sess AS (
      SELECT user_id, sid,
             CAST(MIN(ts) AS TIMESTAMP) AS session_start,
             CAST(MAX(ts) AS TIMESTAMP) AS session_end,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(ROUND(SUM(value), 2) AS DOUBLE) AS total_value,
             first(event_type ORDER BY ts, event_type, value) AS first_type,
             last(event_type ORDER BY ts, event_type, value) AS last_type
      FROM isl GROUP BY user_id, sid
    ),
    marked AS (
      SELECT s.*, sid = MAX(sid) OVER (PARTITION BY user_id) AS is_trailing
      FROM sess s
    )
    SELECT user_id, session_start, session_end, n_events, total_value,
           first_type, last_type
    FROM marked, mx
    WHERE NOT is_trailing
       OR (epoch_us(session_end) + {GAP_US}) // 1000 < wm_ms
    """,
)
def stateful_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drains the sessionizer with availableNow through the foreachBatch
    parquet harness and returns the emitted (closed) sessions —
    hash-verified against the deterministic-drain oracle above (the
    incremental path's batch-equivalence proof additionally lives in
    tests/test_streaming.py)."""
    from pyspark.sql import functions as F

    from .events import drain_to_parquet, read_events_stream

    stream = read_events_stream(spark, sf_dir)
    landed = drain_to_parquet(session_paths(stream), output_mode="append")
    return landed.withColumn(
        "total_value", F.round("total_value", 2).cast("double")
    )
