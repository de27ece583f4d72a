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
