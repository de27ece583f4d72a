"""Custom stateful streaming operator: cross-batch sessionization via
applyInPandasWithState (the escape hatch for semantics the built-in
windowed aggregations can't express — SURVEY.md §2.7 ST10 note: the
reference has no cross-batch state at all; this is the modern
equivalent of what updateStateByKey/mapWithState would have given it).

State is per-user (session_start, last_ts, n); a gap > gap_seconds
closes the current session and emits it.  Open sessions survive in the
state store across micro-batches (and restarts, via the checkpoint).

Scale: state is partitioned by the group key across executors; each
micro-batch touches only the keys present in the batch plus timed-out
keys, so state size tracks |active users|, not |events|.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT_SCHEMA = (
    "user_id bigint, session_start_s bigint, session_end_s bigint, "
    "n_events bigint, closed_by string"
)
SESSION_STATE_SCHEMA = "session_start bigint, last_ts bigint, n bigint"


def sessionize_stateful(
    events: DataFrame,
    gap_seconds: int = 1800,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming sessionization over (user_id, ts) with custom state.

    Emits one row per *closed* session: closed by a later event after a
    gap ("gap") or by processing-time timeout ("timeout").  The batch
    twin (same semantics, lag+cumsum) is plans/relational.q_sessionize
    — oracle-checked; this operator's tests assert agreement with it.
    """

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator,
        state: GroupState,
    ) -> Iterator:
        import pandas as pd

        (user_id,) = key
        closed: list[tuple] = []
        if state.hasTimedOut:
            sess_start, last_ts, n = state.get
            closed.append((user_id, sess_start, last_ts, n, "timeout"))
            state.remove()
        else:
            sess_start, last_ts, n = (
                state.get if state.exists else (None, None, 0)
            )
            ts_values: list[int] = []
            for pdf in pdfs:
                ts_values.extend(
                    int(t.timestamp()) for t in pdf["ts"]
                )
            for t in sorted(ts_values):
                if last_ts is not None and t - last_ts > gap_seconds:
                    closed.append((user_id, sess_start, last_ts, n, "gap"))
                    sess_start, n = None, 0
                if sess_start is None:
                    sess_start = t
                last_ts = t
                n += 1
            state.update((sess_start, last_ts, n))
            if idle_timeout_ms is not None:
                state.setTimeoutDuration(idle_timeout_ms)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id",
                    "session_start_s",
                    "session_end_s",
                    "n_events",
                    "closed_by",
                ],
            )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.select(
        "user_id", events["ts"].cast("timestamp").alias("ts")
    ).groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
