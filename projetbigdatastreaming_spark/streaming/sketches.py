"""Streaming count-min sketch: fold per-batch grids into a persistent
CMS so heavy-hitter estimates stay queryable while the stream runs.

The CMS merges by elementwise ADD, so the stream state is just the
per-batch grids, parquet-partitioned by ``batch_id`` and written with
dynamic partition overwrite — an at-least-once replay rewrites its own
partition instead of double-counting (the ``neardup.py`` /
``restatement_batch_writer`` replay-safety contract).  Readers fold
all partitions with one ≤ d·w·|batches|-row groupBy — by mergeability
this equals the grid a single batch pass over the full history would
build, which the test asserts EXACTLY.

Scale: each micro-batch writes ≤ d·w rows regardless of batch size;
the reader's fold input grows only with batch COUNT (compact
periodically by rewriting the fold as a single batch_id if that ever
matters).  No per-key state store — the whole point of a sketch at
the ingest boundary.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketches import cms_cells
from ..sinks.files import overwrite_partitions


def cms_batch_writer(
    state_dir: str, key_col: str
) -> Callable[[DataFrame, int], None]:
    """foreachBatch sink: reduce the batch to its CMS grid and
    restate the batch's own partition."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        cells = cms_cells(batch_df.select(key_col), key_col).withColumn(
            "batch_id", F.lit(int(batch_id))
        )
        overwrite_partitions(cells, state_dir, ["batch_id"])

    return write


def read_cms(spark: SparkSession, state_dir: str) -> DataFrame:
    """Fold every batch's grid into the current CMS: (d, b, cnt)."""
    return (
        spark.read.parquet(state_dir)
        .groupBy("d", "b")
        .agg(F.sum("cnt").alias("cnt"))
    )
