"""File sources: CSV spool-dir (S7), JSON, parquet, JDBC (S8),
in-memory literal (S9), rate (test/load-gen).

S7 — the reference's Kafka-Connect spool-dir connector
(spooldir-kafka-connect-source.properties:1-18) watched a directory for
CSV files with an explicit schema; Spark's file streaming source does
directory spooling natively (new files per micro-batch, exactly-once
through the checkpoint's file log), so the connector collapses to
``spark.readStream.csv`` with the same schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..schemas import INVOICE_SCHEMA


def csv_spooldir_stream(
    spark: SparkSession,
    directory: str,
    schema: StructType = INVOICE_SCHEMA,
    header: bool = True,
    sep: str = ",",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """S7: streaming CSV directory watcher.  Explicit schema is
    mandatory (the reference also declares its key/value schemas
    explicitly; inference was considered and commented out,
    spooldir-kafka-connect-source.properties:14-15).
    """
    reader = (
        spark.readStream.format("csv")
        .schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(directory)


def csv_batch(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    return (
        spark.read.format("csv")
        .schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .load(path)
    )


def json_stream(
    spark: SparkSession, directory: str, schema: StructType
) -> DataFrame:
    """Streaming JSON directory source (each line one document)."""
    return spark.readStream.format("json").schema(schema).load(directory)


def parquet_stream(
    spark: SparkSession, directory: str, schema: StructType
) -> DataFrame:
    """Streaming parquet directory source — the test stand-in for Kafka
    (same envelope idea: rows arrive as files land)."""
    return spark.readStream.format("parquet").schema(schema).load(directory)


#: the binaryFile source's fixed schema — streaming requires it
#: declared explicitly (no inference on a stream)
BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def binary_file_stream(
    spark: SparkSession,
    directory: str,
    path_glob: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming binary-file directory watcher — the media-lake ingest
    mouth: raw image/audio/video files land in a directory (or object
    store prefix) and arrive as (path, modificationTime, length,
    content) rows, exactly-once through the file-source checkpoint
    log, ready for the Arrow codec operators
    (`operators/multimodal.decode_images` etc.) in foreachBatch.

    Scale: the binary payload is read by executors at scan time (one
    task per file batch); `pathGlobFilter` prunes non-media files
    before any byte is read, and `maxFilesPerTrigger` bounds per-batch
    memory — content bytes never land on the driver.
    """
    reader = spark.readStream.format("binaryFile").schema(
        BINARY_FILE_SCHEMA
    )
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(directory)


def jdbc_batch(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 3,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """S8: JDBC bulk source.  The reference's connector ran bulk-mode
    dumps with tasks.max=3 (mysql-kafka-connect-source.properties:3,9);
    the Spark equivalent parallelizes the scan with
    partitionColumn/numPartitions bounds instead of connector tasks.
    """
    reader = (
        spark.read.format("jdbc").option("url", url).option("dbtable", table)
    )
    if partition_column:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partitioned JDBC scans need lowerBound/upperBound"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def literal_source(
    spark: SparkSession, rows: list[tuple], schema: str | StructType
) -> DataFrame:
    """S9: in-memory literal DataFrame (the reference's
    Seq(...).toDF("libellé") empty-window marker,
    IndicateursStreaming.scala:66-68)."""
    return spark.createDataFrame(rows, schema)


def rate_stream(
    spark: SparkSession, rows_per_second: int = 100
) -> DataFrame:
    """Synthetic load-generator stream (timestamp, value) — the
    test/benchmark stand-in for a live Kafka feed."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )


def socket_stream(
    spark: SparkSession,
    host: str,
    port: int,
    include_timestamp: bool = False,
) -> DataFrame:
    """Raw TCP line stream — the second source family the north star
    names ("Kafka/socket sources") and the S4-class receiver analogue
    (a push-based feed like the reference's Twitter receiver,
    `TwitterKafkaStreaming.scala:176`, minus the OAuth client).

    One ``value: string`` row per newline-terminated line (plus
    ``timestamp`` when requested).  Test/dev source: like the
    reference's receiver it is NOT replayable, so it offers
    at-most-once delivery on failure — production pipelines put Kafka
    in front (S1) for replay.
    """
    reader = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", str(port))
    )
    if include_timestamp:
        reader = reader.option("includeTimestamp", "true")
    return reader.load()
