"""Custom stateful streaming operator: gap-based sessionization.

The batch engine sessionizes with a window + lag-gap rule
(``__spark_entry__._q_sessionize``); this is its Structured-Streaming
twin as a CUSTOM STATEFUL OPERATOR — per-user session state carried
across micro-batches with ``applyInPandasWithState`` (Arrow-batched).

Semantics (identical to the batch rule, microsecond precision):
- events for a user belong to one session while consecutive gaps are
  ≤ ``gap_seconds``; a gap > ``gap_seconds`` splits sessions;
- events may arrive OUT OF EVENT-TIME ORDER across micro-batches, so a
  session is only emitted once it is FINAL: no event that could still
  arrive (ts ≥ watermark) can extend it, i.e.
  ``session_end + gap < watermark``. Until then its events stay
  buffered in state. Eager emission on a locally-observed gap would be
  wrong — a later batch can deliver the bridging event.
- an idle user's buffered sessions finalize via event-time timeout
  once the watermark passes ``first_pending_end + gap``;
- events older than the watermark are dropped by Spark upstream (the
  standard late-data trade; size the watermark delay accordingly).

Scale: state per key = the event timestamps inside the non-final
horizon (≈ gap + watermark delay), NOT the full history — bounded by
per-user event rate × horizon. Grouping shuffles each micro-batch once
on user_id; no driver participation. Each emitted session appears
exactly once (append mode).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id string, session_start timestamp, session_end timestamp, "
    "n_events long"
)
STATE_SCHEMA = "pending array<bigint>"

_US = 1_000_000


def _sessions(ts_sorted: list[int], gap_us: int) -> list[tuple[int, int, int]]:
    """Gap rule over sorted event times → [(start_us, end_us, n)]."""
    out = []
    start = last = ts_sorted[0]
    n = 1
    for t in ts_sorted[1:]:
        if t - last > gap_us:
            out.append((start, last, n))
            start, last, n = t, t, 1
        else:
            last, n = t, n + 1
    out.append((start, last, n))
    return out


def _session_func(gap_seconds: int):
    gap_us = gap_seconds * _US

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        pend: list[int] = list(state.get[0]) if state.exists else []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            # normalize to ns first: Arrow may hand pandas either
            # datetime64[ns] or [us], and int64-of-[us] // 1000 would
            # be milliseconds
            ts_us = (
                pd.to_datetime(pdf["ts"])
                .astype("datetime64[ns]")
                .astype("int64")
                // 1_000
            )
            pend.extend(int(t) for t in ts_us)
        if not pend:
            if state.exists:
                state.remove()
            return
        pend.sort()
        wm_us = state.getCurrentWatermarkMs() * 1_000

        sessions = _sessions(pend, gap_us)
        # session ends are nondecreasing, so finality (end + gap < wm)
        # holds for a prefix of the session list
        n_final = 0
        for s in sessions:
            if s[1] + gap_us < wm_us:
                n_final += 1
            else:
                break
        final, open_ = sessions[:n_final], sessions[n_final:]

        if open_:
            keep_from = open_[0][0]  # first event of first open session
            state.update(([t for t in pend if t >= keep_from],))
            # wake when the earliest open session can finalize; must be
            # strictly above the current watermark
            first_close_ms = (open_[0][1] + gap_us) // 1_000 + 1
            state.setTimeoutTimestamp(
                max(first_close_ms, wm_us // 1_000 + 1)
            )
        else:
            state.remove()

        if final:
            yield pd.DataFrame(
                {
                    "user_id": user_id,
                    "session_start": [
                        pd.Timestamp(s, unit="us") for s, _, _ in final
                    ],
                    "session_end": [
                        pd.Timestamp(e, unit="us") for _, e, _ in final
                    ],
                    "n_events": [c for _, _, c in final],
                }
            )

    return update


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Event stream → closed-session stream (append mode).

    ``events`` must be a streaming DataFrame with ``user_id`` and an
    event-time ``ts`` column. Returns one row per FINALIZED session
    (no event at-or-after the watermark can extend it), exactly once.
    """
    from pyspark.sql import functions as F

    stream = events.select(
        F.col(user_col).cast("string").alias("user_id"),
        F.col(ts_col).cast("timestamp").alias("ts"),
    ).withWatermark("ts", watermark)
    return stream.groupBy("user_id").applyInPandasWithState(
        _session_func(gap_seconds),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
