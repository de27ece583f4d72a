"""Streaming observability (E4/E5 + the K2 producer ack-metadata
parity).

The reference logs per-record producer ack metadata (offset / topic /
partition / timestamp) in an async Callback (KafkaStreaming.scala:
245-276) and wraps every stage in try/catch with parameter-dump
diagnostics (:130-135, :207-218).  Structured Streaming's equivalent is
the StreamingQueryListener: per-batch source offsets, row counts,
processing rates, and sink commit info — without user code on the hot
path.
"""

from __future__ import annotations

import logging

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener

logger = logging.getLogger("projetbigdatastreaming_spark.monitoring")


class ProgressLoggingListener(StreamingQueryListener):
    """Logs one structured line per micro-batch and keeps the latest
    progress per query for programmatic assertions (tests/dashboards).
    """

    def __init__(self) -> None:
        self.progress: dict[str, dict] = {}
        self.started: list[str] = []
        self.terminated: list[tuple[str, str | None]] = []

    def onQueryStarted(self, event) -> None:
        self.started.append(event.name or event.id)
        logger.info("query started: name=%s id=%s", event.name, event.id)

    def onQueryProgress(self, event) -> None:
        p = event.progress
        info = {
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "input_rows_per_second": p.inputRowsPerSecond,
            "processed_rows_per_second": p.processedRowsPerSecond,
            "sink": p.sink.description,
        }
        self.progress[p.name or str(p.id)] = info
        logger.info(
            "batch %s: rows=%s in=%.1f/s proc=%.1f/s sink=%s",
            info["batch_id"],
            info["num_input_rows"],
            info["input_rows_per_second"] or 0.0,
            info["processed_rows_per_second"] or 0.0,
            info["sink"],
        )

    def onQueryTerminated(self, event) -> None:
        self.terminated.append((str(event.id), event.exception))
        if event.exception:
            logger.error("query %s failed: %s", event.id, event.exception)
        else:
            logger.info("query %s terminated cleanly", event.id)

    def onQueryIdle(self, event) -> None:
        logger.debug("query %s idle", event.id)


def attach(spark: SparkSession) -> ProgressLoggingListener:
    listener = ProgressLoggingListener()
    spark.streams.addListener(listener)
    return listener


def detach(spark: SparkSession, listener: ProgressLoggingListener) -> None:
    spark.streams.removeListener(listener)
