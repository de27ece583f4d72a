"""Kafka source wrappers (S1-S3) and connection-parameter factories (E3).

The reference's three consumer-param factories
(`KafkaStreaming.scala:35-51`, `ConsumerKafka_prod.scala:16-27`,
`ConsumerKafkaSpark_Prod.scala:39-51`) become option-dict builders; the
direct-stream creation (`KafkaUtils.createDirectStream`,
`KafkaStreaming.scala:80-84`) becomes `spark.readStream.format("kafka")`.
Structured Streaming's Kafka source is receiver-less with one task per
Kafka partition and offsets tracked in the checkpoint — the properties
the reference's comments call out at KafkaStreaming.scala:77-79 —
so the raw poll-loop consumer (S3) and manual commitAsync (ST3/ST4)
have no equivalent code here: the source owns polling and offsets.

No broker ships in the test container, so tests exercise option
plumbing and plan construction; the schema of the resulting stream is
the standard Kafka envelope (schemas.KAFKA_ENVELOPE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def consumer_options(
    bootstrap_servers: str,
    topics: list[str] | str,
    starting_offsets: str = "latest",
    group_id_prefix: str | None = None,
    max_offsets_per_trigger: int | None = None,
    security: dict[str, str] | None = None,
) -> dict[str, str]:
    """Kafka-source options mirroring getKafkaConsumerParams
    (KafkaStreaming.scala:35-51): bootstrap, subscription, read order
    (earliest/latest), and the optional SASL/Kerberos block (:47-48).

    ``maxOffsetsPerTrigger`` bounds per-micro-batch intake — the
    Structured Streaming knob that replaces DStream backpressure.
    """
    if not isinstance(topics, str):
        topics = ",".join(topics)
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topics,
        "startingOffsets": starting_offsets,
    }
    if group_id_prefix:
        opts["groupIdPrefix"] = group_id_prefix
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    if security:
        opts.update({f"kafka.{k}": v for k, v in security.items()})
    return opts


def prod_consumer_options(bootstrap_servers: str) -> dict[str, str]:
    """The hardcoded prod variant (S2): topic `orderline`, earliest
    (ConsumerKafkaSpark_Prod.scala:39-51, group `gbi03`)."""
    return consumer_options(
        bootstrap_servers,
        ["orderline"],
        starting_offsets="earliest",
        group_id_prefix="gbi03",
    )


def read_stream(spark: SparkSession, options: dict[str, str]) -> DataFrame:
    """S1: the Kafka micro-batch stream as a DataFrame with the native
    envelope columns (key, value, topic, partition, offset, timestamp)."""
    reader = spark.readStream.format("kafka")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def read_batch(spark: SparkSession, options: dict[str, str]) -> DataFrame:
    """Batch read of a topic range (the reconciliation / backfill path)."""
    reader = spark.read.format("kafka")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
