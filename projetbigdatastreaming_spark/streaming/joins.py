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
