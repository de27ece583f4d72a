"""StreamingQueryListener observability test."""

from __future__ import annotations

from projetbigdatastreaming_spark.streaming import monitoring


def test_listener_captures_batch_progress(spark, tmp_path):
    listener = monitoring.attach(spark)
    try:
        df = spark.createDataFrame([(i,) for i in range(10)], "n long")
        src = str(tmp_path / "src")
        df.write.parquet(src)
        stream = spark.readStream.schema("n long").parquet(src)
        q = (
            stream.groupBy().count()
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("mon_test")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener callbacks are async; wait for delivery
        import time

        for _ in range(50):
            if "mon_test" in listener.progress:
                break
            time.sleep(0.2)
        assert "mon_test" in listener.started or listener.started
        prog = listener.progress.get("mon_test")
        assert prog is not None
        assert prog["num_input_rows"] == 10
        assert "Memory" in prog["sink"] or "memory" in prog["sink"].lower()
    finally:
        monitoring.detach(spark, listener)


def test_listener_captures_query_failure(spark, tmp_path):
    """E5 parity: a failing batch surfaces through the listener's
    terminated-with-exception path (the reference's try/catch +
    param-dump logging, KafkaStreaming.scala:130-135)."""
    import time

    from projetbigdatastreaming_spark.streaming.runner import (
        run_foreach_batch,
    )

    listener = monitoring.attach(spark)
    try:
        df = spark.createDataFrame([(1,)], "n long")
        src = str(tmp_path / "src2")
        df.write.parquet(src)
        stream = spark.readStream.schema("n long").parquet(src)

        def boom(batch_df, batch_id):
            raise RuntimeError("injected batch failure")

        q = run_foreach_batch(
            stream, boom, str(tmp_path / "ckpt2"),
            available_now=True, query_name="failing_q",
        )
        try:
            q.awaitTermination(120)
        except Exception:
            pass  # expected: the stream fails
        for _ in range(50):
            if listener.terminated:
                break
            time.sleep(0.2)
        assert listener.terminated
        qid, exc = listener.terminated[-1]
        assert exc is not None and "injected batch failure" in str(exc)
    finally:
        monitoring.detach(spark, listener)
