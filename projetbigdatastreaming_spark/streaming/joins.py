"""Streaming joins: watermarked stream-stream interval join and
stream-static broadcast enrichment.

The reference joins only within one stream's micro-batch; these give
the engine the two join shapes a production event pipeline needs:

- **interval_join_streams**: correlate two live streams (e.g. ad
  impressions with clicks that follow within N minutes).  Both sides
  carry watermarks and the join condition bounds event time on both
  ends, which is exactly what lets Spark EVICT join state: a buffered
  left row can be dropped once the right watermark passes
  ``left.ts + max_delay``.  Without both constraints, stream-stream
  state grows forever (Spark refuses the append-mode query).
- **enrich_stream**: join a stream against a small static dimension.
  The dim side is broadcast, so enrichment is map-only per
  micro-batch — no shuffle of the stream, no state at all.

Scale: interval-join state is hash-partitioned by the equi-join key
across executors and bounded by (watermark delay + interval) × rate;
the time-range predicate keeps each key's buffer a sliding slice, not
the full history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "10 minutes",
    watermark: str = "30 minutes",
    prefixes: tuple[str, str] = ("l_", "r_"),
) -> DataFrame:
    """Inner join ``left`` and ``right`` streams on ``key`` where the
    right event lands in ``[left_ts, left_ts + max_delay]``.

    Output columns are prefix-disambiguated (``l_ts``/``r_ts`` etc.),
    key kept once.  Works identically on batch DataFrames (the batch
    twin used for oracle-style tests).
    """
    lp, rp = prefixes
    lt = F.col(f"{lp}{left_ts}")
    rt = F.col(f"{rp}{right_ts}")

    # event-time watermarks require TIMESTAMP (with local zone); the
    # parquet fixtures carry TIMESTAMP_NTZ, so cast the event-time cols
    def _side(df, prefix, ts_col, key_alias):
        cols = [
            (
                F.col(c).cast("timestamp")
                if c == ts_col
                else F.col(c)
            ).alias(f"{prefix}{c}")
            for c in df.columns
            if c != key
        ]
        return df.select(F.col(key).alias(key_alias), *cols)

    l = _side(left, lp, left_ts, key).withWatermark(
        f"{lp}{left_ts}", watermark
    )
    r = _side(right, rp, right_ts, "__rkey").withWatermark(
        f"{rp}{right_ts}", watermark
    )
    return l.join(
        r,
        (F.col(key) == F.col("__rkey"))
        & (rt >= lt)
        & (rt <= lt + F.expr(f"INTERVAL {max_delay}")),
        "inner",
    ).drop("__rkey")


def interval_join_streams_outer(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "10 minutes",
    watermark: str = "30 minutes",
    prefixes: tuple[str, str] = ("l_", "r_"),
) -> DataFrame:
    """LEFT OUTER variant of ``interval_join_streams``: every left
    event emits — matched rows as soon as the match arrives, unmatched
    rows null-padded ONLY once the watermark proves no match can still
    come (right watermark past ``left_ts + max_delay``).

    That deferred null-padding is the semantic difference from a batch
    left join: correctness requires knowing the right stream is
    complete up to a point, which is exactly what the watermark
    asserts — so the same condition that lets Spark evict state is
    what licenses the outer row.  The impression-without-click shape
    (conversion-failure analytics) needs this; an inner join silently
    drops exactly the rows it is about.

    State/eviction bounds are identical to the inner form.  Works on
    batch DataFrames too (plain left join — the batch twin tests
    assert agreement once all data is in).
    """
    lp, rp = prefixes
    lt = F.col(f"{lp}{left_ts}")
    rt = F.col(f"{rp}{right_ts}")

    def _side(df, prefix, ts_col, key_alias):
        cols = [
            (
                F.col(c).cast("timestamp")
                if c == ts_col
                else F.col(c)
            ).alias(f"{prefix}{c}")
            for c in df.columns
            if c != key
        ]
        return df.select(F.col(key).alias(key_alias), *cols)

    l = _side(left, lp, left_ts, key).withWatermark(
        f"{lp}{left_ts}", watermark
    )
    r = _side(right, rp, right_ts, "__rkey").withWatermark(
        f"{rp}{right_ts}", watermark
    )
    return l.join(
        r,
        (F.col(key) == F.col("__rkey"))
        & (rt >= lt)
        & (rt <= lt + F.expr(f"INTERVAL {max_delay}")),
        "left_outer",
    ).drop("__rkey")


def enrich_stream(
    stream: DataFrame, dim: DataFrame, on: str, how: str = "left"
) -> DataFrame:
    """Broadcast-enrich a stream with a static dimension table —
    map-only per micro-batch (stateless; the dim is shipped once per
    executor, re-broadcast only when the batch plan is re-created)."""
    return stream.join(F.broadcast(dim), on, how)


def versioned_enrich_writer(
    out_dir: str,
    dim_table_dir: str,
    on: str,
    how: str = "left",
    broadcast_dim: bool = True,
):
    """foreachBatch sink: enrich each micro-batch against a VERSIONED
    dimension table, pinning the dimension VERSION per batch so the
    enrichment is exactly reproducible — the feature-pipeline
    contract ("which dim did this training row see?") that a plain
    stream-static join cannot give once the dim mutates.

    Pinning protocol: the dim version used is recorded as a column of
    the output partition; on an at-least-once REDELIVERY the writer
    finds its own existing ``batch_id`` partition, reads back the
    recorded version, and restates the partition against THAT version
    — not the current latest — so replay output is bit-identical even
    if the publisher advanced the dimension in between (versions are
    immutable, so re-reading one is deterministic).

    Scale: the join is one equi-join per batch (dim broadcast when
    ``broadcast_dim``; flip off for fact-scale dims and let AQE pick);
    the version pin is one manifest-list metadata read, no data scan.
    """
    import os

    from pyspark.sql import functions as F

    from ..sinks.files import overwrite_partitions
    from ..sinks.versioned import list_versions, read_version

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        part_dir = os.path.join(out_dir, f"batch_id={int(batch_id)}")
        pinned: int | None = None
        if os.path.isdir(part_dir):
            prior = spark.read.parquet(part_dir).select(
                "dim_version"
            ).limit(1).collect()
            if prior:
                pinned = int(prior[0][0])
        if pinned is None:
            pinned = list_versions(dim_table_dir)[-1]
        dim = read_version(spark, dim_table_dir, pinned)
        if broadcast_dim:
            dim = F.broadcast(dim)
        enriched = (
            batch_df.join(dim, on, how)
            .withColumn("dim_version", F.lit(int(pinned)))
            .withColumn("batch_id", F.lit(int(batch_id)))
        )
        overwrite_partitions(enriched, out_dir, ["batch_id"])

    return write


def read_enriched(spark, out_dir: str) -> DataFrame:
    """All enriched rows so far, each carrying the dim_version it was
    joined against."""
    return spark.read.parquet(out_dir)


def interval_join_streams_semi(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """LEFT SEMI stream-stream interval join: each left event emits
    (once, original columns) iff SOME right event lands in
    ``[left_ts, left_ts + max_delay]`` — the "was this impression
    clicked at all?" existence screen, without materializing the
    match rows or duplicating a left row that matched twice.  One of
    the supported stream-stream join types (inner / outer family /
    left semi); the state story is the inner join's — both sides'
    buffers evict past watermark + interval.

    Works identically on batch DataFrames (the batch twin is the
    oracle in tests)."""
    lt = F.col(f"__l_{left_ts}")
    rt = F.col(f"__r_{right_ts}")
    l = left.select(
        F.col(key),
        F.col(left_ts).cast("timestamp").alias(f"__l_{left_ts}"),
        *[c for c in left.columns if c not in (key, left_ts)],
    ).withWatermark(f"__l_{left_ts}", watermark)
    r = right.select(
        F.col(key).alias("__rkey"),
        F.col(right_ts).cast("timestamp").alias(f"__r_{right_ts}"),
    ).withWatermark(f"__r_{right_ts}", watermark)
    out = l.join(
        r,
        (F.col(key) == F.col("__rkey"))
        & (rt >= lt)
        & (rt <= lt + F.expr(f"INTERVAL {max_delay}")),
        "left_semi",
    )
    return out.withColumnRenamed(f"__l_{left_ts}", left_ts)
