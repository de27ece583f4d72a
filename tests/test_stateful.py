"""applyInPandasWithState sessionization: state must survive across
micro-batches, and closed sessions must agree with the batch
(lag+cumsum) sessionizer."""

from __future__ import annotations

import datetime

from projetbigdatastreaming_spark.streaming.stateful import (
    sessionize_stateful,
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz"
    ).coalesce(1).write.mode("append").parquet(path)


def test_sessions_close_across_batches(spark, tmp_path):
    src = str(tmp_path / "ev")
    t0 = datetime.datetime(2024, 1, 1, 8, 0, 0)
    m = datetime.timedelta(minutes=1)
    # batch 1: user 1 two events 1 min apart; user 2 one event
    _write_batch(spark, src, [(1, t0), (1, t0 + m), (2, t0)])
    # batch 2 (same files dir, second file): user 1 returns after 2h →
    # closes session A; user 2 event 5 min later → same open session
    _write_batch(
        spark, src,
        [(1, t0 + datetime.timedelta(hours=2)), (2, t0 + 5 * m)],
    )
    stream = (
        spark.readStream.schema("user_id long, ts timestamp_ntz")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = sessionize_stateful(stream, gap_seconds=1800)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_mem")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql(
        "SELECT * FROM sessions_mem ORDER BY user_id"
    ).collect()
    # exactly one closed session: user 1's first (2 events, closed by gap);
    # user 2's session and user 1's second are still open (in state)
    assert len(rows) == 1
    r = rows[0]
    assert r.user_id == 1
    assert r.n_events == 2
    assert r.closed_by == "gap"
    assert r.session_end_s - r.session_start_s == 60


def test_running_stats_accumulate_across_batches(spark, tmp_path):
    """transformWithStateInPandas: ValueState accumulator must carry
    totals across micro-batches and agree with the exact batch
    aggregate.

    Environmental gate: the v2 state-server protocol needs
    ``google.protobuf`` on the worker (shipped in Spark distributions'
    `python/lib` deps, absent in this container).  The plan still
    BUILDS without protobuf — only execution needs it — so plan
    construction is asserted unconditionally before the skip."""
    import pytest

    from projetbigdatastreaming_spark.streaming.stateful import (
        running_user_stats,
    )

    src = str(tmp_path / "ev2")

    def write(rows):
        spark.createDataFrame(
            rows, "user_id long, value double"
        ).coalesce(1).write.mode("append").parquet(src)

    write([(1, 10.0), (1, 20.0), (2, 5.0)])
    write([(1, 30.0), (2, 5.0), (3, 7.0)])
    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    # operator wiring (analysis) must always succeed; only the state
    # server needs protobuf, so execution is gated below
    out = running_user_stats(stream)
    assert [f.name for f in out.schema.fields] == [
        "user_id", "n_events", "total_value", "mean_value",
    ]

    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        pytest.skip("transformWithState worker protocol needs protobuf")

    q = (
        out
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("running_mem")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # Update mode: keep the LAST emission per user (memory sink appends)
    rows = spark.sql(
        """
        SELECT user_id, n_events, total_value, mean_value
        FROM (SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY n_events DESC) rk
              FROM running_mem) WHERE rk = 1 ORDER BY user_id
        """
    ).collect()
    got = {r.user_id: (r.n_events, r.total_value, r.mean_value) for r in rows}
    assert got == {
        1: (3, 60.0, 20.0),
        2: (2, 10.0, 5.0),
        3: (1, 7.0, 7.0),
    }
