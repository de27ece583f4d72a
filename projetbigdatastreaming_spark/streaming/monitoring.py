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


def index_status(spark: SparkSession, index_dir: str):
    """Operational status of a streaming index/state directory: one
    row per state family — (family, n_rows, n_batch_partitions,
    compacted) — plus a ``tombstones`` row with the pending-retraction
    count.  The view an operator checks before/after `maintain
    compact-*` / `retract-*`: is the partition count creeping (time to
    compact past the redelivery horizon), are tombstones pending
    (retractions not yet physical).

    Works for every family layout in the repo: near-dup ``bands``/
    ``sigs``, ANN ``codes``/``bqwords`` (each a parquet root
    partitioned by batch_id), the one-shot ``model`` relations, and
    the ``tombstones`` append dir.  Driver-side work is one listdir +
    one count per family — bounded by family count, never data size.
    """
    import os

    from .sketches import BASE_ID
    from .tombstones import pending_tombstone_files, read_tombstone_ids

    rows = []
    for fam in sorted(os.listdir(index_dir)):
        path = os.path.join(index_dir, fam)
        if not os.path.isdir(path):
            continue
        if fam == "tombstones":
            files = pending_tombstone_files(path)
            tombs = read_tombstone_ids(spark, files)
            rows.append(
                (fam, int(tombs.count()) if tombs is not None else 0, 0, False)
            )
            continue
        if fam == "model":
            for sub in sorted(os.listdir(path)):
                rel = spark.read.parquet(os.path.join(path, sub))
                rows.append((f"model/{sub}", int(rel.count()), 0, True))
            continue
        parts = [
            n for n in os.listdir(path) if n.startswith("batch_id=")
        ]
        rel = spark.read.parquet(path)
        rows.append(
            (
                fam,
                int(rel.count()),
                len(parts),
                parts == [f"batch_id={BASE_ID}"],
            )
        )
    return spark.createDataFrame(
        rows,
        "family string, n_rows long, n_batch_partitions int,"
        " compacted boolean",
    ).orderBy("family")
