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


# ---------------------------------------------------------------------------
# transformWithStateInPandas — Spark 4 stateful-processing v2
# ---------------------------------------------------------------------------

RUNNING_STATS_OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, mean_value double"
)


def running_user_stats(events: DataFrame) -> DataFrame:
    """Cross-batch per-user running aggregate on the NEW stateful API
    (``transformWithStateInPandas``, Spark 4 stateful processing v2 —
    the successor to ``applyInPandasWithState`` used by
    ``sessionize_stateful`` above): a ``StatefulProcessor`` with a
    typed ``ValueState`` accumulator, emitting the updated
    (n, total, mean) per user per micro-batch.

    This is the accumulate-across-batches shape the reference's DStream
    consumer could only fake by re-reading (no state API in its code at
    all); here state lives in the per-key state store — RocksDB-backed
    and changelog-checkpointed on a real cluster — so state size tracks
    |users|, not |events|, and the operator survives restarts.

    v1 vs v2 in this repo: v1 (above) shows timeout-driven session
    close; v2 adds composable typed state (Value/List/Map), per-key
    timers, and optional state TTL — use it for new operators.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState(
                "agg", "n bigint, total double"
            )

        def handleInputRows(self, key, rows, timer_values):
            (user_id,) = key
            n, total = (
                tuple(self._agg.get()) if self._agg.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._agg.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "total_value": [total],
                    "mean_value": [total / n if n else None],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.select("user_id", events["value"].cast("double").alias("value"))
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningStats(),
            outputStructType=RUNNING_STATS_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
