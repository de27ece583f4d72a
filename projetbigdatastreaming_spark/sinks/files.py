"""File and console sinks (K4-K6).

K4 — CSV overwrite marker (`coalesce(1).write.mode(Overwrite)`,
IndicateursStreaming.scala:69-75).  The reference used the Spark-1.x
`com.databricks.spark.csv` package name; CSV has been built in since
Spark 2.0.
K5 — CSV append KPI output (`repartition(1).mode(Append)`,
IndicateursStreaming.scala:84-88).
K6 — console sink (`df.show()` per batch,
ConsommationStreaming.scala:92).

`single_file=True` reproduces the reference's deliberate
`coalesce(1)`/`repartition(1)` single-output-file choice; at scale you
almost never want it (it serializes the write through one task) — the
default keeps the write parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "append",
    single_file: bool = False,
    header: bool = True,
) -> None:
    """K4/K5 batch CSV write."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
) -> None:
    """Columnar output — the scale-appropriate default for analytics
    results (the reference's CSV-on-HDFS choice kept for parity above)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def stream_to_csv(
    df: DataFrame,
    path: str,
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """K5 streaming form: append-mode CSV file sink (exactly-once via
    the sink's transaction log + checkpoint)."""
    writer = (
        df.writeStream.format("csv")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .option("header", "true")
        .outputMode("append")
    )
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def stream_to_console(
    df: DataFrame, num_rows: int = 20, truncate: bool = False
) -> StreamingQuery:
    """K6: console sink."""
    return (
        df.writeStream.format("console")
        .option("numRows", str(num_rows))
        .option("truncate", str(truncate).lower())
        .start()
    )


def stream_to_memory(
    df: DataFrame, name: str, output_mode: str = "append"
) -> StreamingQuery:
    """Memory sink for tests: results queryable as table ``name``."""
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )


def overwrite_partitions(
    df: DataFrame, path: str, partition_by: list[str]
) -> None:
    """Idempotent partition restatement: overwrite ONLY the partitions
    present in ``df``, leaving all others untouched (dynamic partition
    overwrite — the reprocess-one-day pattern).

    With Spark's default static overwrite mode, re-running yesterday's
    backfill would DELETE the whole table first; the dynamic mode makes
    a batch rewrite idempotent per partition, which is what a
    foreachBatch sink or a daily restatement job needs for effectively-
    exactly-once output on top of at-least-once execution.

    The conf is set per-write via the writer option (not globally), so
    concurrent static-overwrite writers in the same session are
    unaffected.
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(path)
    )
