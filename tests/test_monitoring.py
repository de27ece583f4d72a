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
