"""Streaming OHLC bars — the mergeable-partial-aggregate pattern
lifted across micro-batches.

The batch query `plans/timeseries.q_ohlc_bars` computes daily candles
(open/high/low/close + count + exact-cents volume) in one pass.  Its
streaming twin cannot wait for a day to close before emitting, and a
foreachBatch sink must stay replay-safe — so each micro-batch reduces
to PARTIAL candles per (event_type, day) carrying enough state to
merge: the open/close VALUES plus their (ts, event_id) keys.  OHLC is
a classic mergeable aggregate (exactly what Spark's map-side combine
does within a query, made explicit across batches):

    merge(a, b).open  = the open whose first_key is smaller
    merge(a, b).close = the close whose last_key is larger
    high/low/n/volume = max/min/sum — plain semigroup folds

Replay contract: the writer restates its OWN ``batch_id`` partition
(dynamic partition overwrite, the module-wide rule), so at-least-once
redelivery rewrites rather than double-counts; the reader's fold over
all partitions equals the one-pass batch query over the union of the
ingested batches EXACTLY — pinned by test against `q_ohlc_bars`.

Scale: per batch one map-side-combined hash-agg to ≤|types|·|days|
rows; the reader folds a bounded-width state relation (one row per
(type, day, batch)) with a single hash-agg — the raw events never
land in state.  Determinism: (ts, event_id) is a total order, so
min_by/max_by never tie; volume is BIGINT cents.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks.files import overwrite_partitions

#: partial-candle state schema (read with an explicit schema so an
#: empty dir folds to an empty frame instead of erroring)
OHLC_STATE_SCHEMA = (
    "event_type string, day date,"
    " first_key struct<ts: timestamp_ntz, event_id: bigint>,"
    " open double,"
    " last_key struct<ts: timestamp_ntz, event_id: bigint>,"
    " close double, high double, low double,"
    " n_events bigint, volume_cents bigint, batch_id int"
)


def ohlc_partials(batch_df: DataFrame) -> DataFrame:
    """Reduce raw events to mergeable partial candles per
    (event_type, day) — shared by the writer and any ad-hoc caller."""
    key = F.struct(
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        F.col("event_id").alias("event_id"),
    )
    return (
        batch_df.select(
            "event_type",
            F.to_date("ts").alias("day"),
            "value",
            key.alias("k"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(
            F.min("k").alias("first_key"),
            F.expr("min_by(value, k)").alias("open"),
            F.max("k").alias("last_key"),
            F.expr("max_by(value, k)").alias("close"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.count("*").cast("bigint").alias("n_events"),
            F.sum("cents").cast("bigint").alias("volume_cents"),
        )
    )


def ohlc_batch_writer(
    state_dir: str,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch sink: restate this batch's partial candles under
    its own batch_id partition (replay-safe restatement)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        partials = ohlc_partials(batch_df).withColumn(
            "batch_id", F.lit(int(batch_id))
        )
        overwrite_partitions(partials, state_dir, ["batch_id"])

    return write


def read_ohlc(spark: SparkSession, state_dir: str) -> DataFrame:
    """Fold every batch's partial candles into the corpus-so-far daily
    bars — column-identical to `plans/timeseries.q_ohlc_bars` over the
    union of the ingested batches (pinned by test)."""
    st = spark.read.schema(OHLC_STATE_SCHEMA).parquet(state_dir)
    return (
        st.groupBy("event_type", "day")
        .agg(
            F.expr("min_by(open, first_key)").alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.expr("max_by(close, last_key)").alias("close"),
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("volume_cents").cast("bigint").alias("volume_cents"),
        )
        .select(
            "event_type",
            "day",
            "open",
            "high",
            "low",
            "close",
            "n_events",
            "volume_cents",
        )
        .orderBy("event_type", "day")
    )
