"""Kafka producer sinks (K1-K3) and producer-parameter factories (E3).

The reference's three producer configurations:
- plain at-least-once (`acks=all`, KafkaStreaming.scala:158-167) → K1
- exactly-once/idempotent (`enable.idempotence=true, retries=3,
  max.in.flight=3, min.insync.replicas=2`, KafkaStreaming.scala:170-187)
  → K2
- prod-tuned throughput (`batch.size=16384, linger.ms=100,
  compression.type=gzip`, ProducerKafa_Prod.scala:58-69) → K2 variant

The per-partition producer pattern (K3,
TwitterKafkaStreaming.scala:196-211) is owned by Spark's Kafka sink,
which pools one producer per executor; the ack-metadata callback
(KafkaStreaming.scala:245-276) maps to StreamingQueryListener /
query.lastProgress sink metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def producer_options_at_least_once(bootstrap_servers: str) -> dict[str, str]:
    """K1 parity: acks=all (KafkaStreaming.scala:162)."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "kafka.acks": "all",
    }


def producer_options_exactly_once(bootstrap_servers: str) -> dict[str, str]:
    """K2 parity: idempotent producer (KafkaStreaming.scala:177-183)."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "kafka.acks": "all",
        "kafka.enable.idempotence": "true",
        "kafka.retries": "3",
        "kafka.max.in.flight.requests.per.connection": "3",
    }


def producer_options_prod(bootstrap_servers: str) -> dict[str, str]:
    """K2 prod-tuned variant (ProducerKafa_Prod.scala:58-69)."""
    return producer_options_exactly_once(bootstrap_servers) | {
        "kafka.batch.size": "16384",
        "kafka.linger.ms": "100",
        "kafka.compression.type": "gzip",
    }


def to_kafka_payload(
    df: DataFrame, value_cols: list[str] | None = None, key_col: str | None = None
) -> DataFrame:
    """Shape an arbitrary DataFrame into the Kafka sink contract
    (key/value binary-or-string columns): value = JSON of the selected
    columns, key = the given column (the reference uses a fixed key "1",
    KafkaStreaming.scala:204 — pass key_col=None for keyless round-robin,
    which partitions far better at scale)."""
    value = F.to_json(
        F.struct(*(value_cols or df.columns))
    ).alias("value")
    if key_col:
        return df.select(F.col(key_col).cast("string").alias("key"), value)
    return df.select(value)


def write_stream(
    payload: DataFrame,
    topic: str,
    options: dict[str, str],
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """K1/K2 streaming write."""
    writer = (
        payload.writeStream.format("kafka")
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def write_batch(payload: DataFrame, topic: str, options: dict[str, str]) -> None:
    writer = payload.write.format("kafka").option("topic", topic)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()
