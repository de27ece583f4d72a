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


def compact_cms(spark: SparkSession, state_dir: str) -> int:
    """Fold the accumulated per-batch grids into a single base grid
    (written as partition ``batch_id=-1``), dropping the per-batch
    partitions — the read-side fold input goes from d·w·|batches| rows
    back to ≤ d·w.  Returns the number of cells in the compacted grid.

    Correctness: the CMS merge is associative, so pre-folding history
    commutes with the reader's fold — `read_cms` returns the identical
    grid before and after (asserted in tests).  Replay interaction:
    compaction consumes historical batch partitions, so only compact
    past the stream's redelivery horizon (e.g. the checkpoint's
    committed offset) — a replay of an ALREADY-COMPACTED batch_id
    would otherwise double-count into the base grid.
    """
    import shutil
    import tempfile

    folded = read_cms(spark, state_dir).withColumn(
        "batch_id", F.lit(-1)
    )
    # stage to a temp dir first: the fold READS state_dir, so writing
    # over it in-place would consume inputs mid-scan
    tmp = tempfile.mkdtemp(prefix="cms_compact_")
    try:
        folded.coalesce(1).write.mode("overwrite").parquet(tmp)
        staged = spark.read.parquet(tmp)
        n = staged.count()
        staged.coalesce(1).write.mode("overwrite").partitionBy(
            "batch_id"
        ).parquet(state_dir)
        return n
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
