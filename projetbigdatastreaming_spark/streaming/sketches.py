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

Compaction is crash-safe through an intent file: a kill between the
base-grid commit and the partition deletes leaves the folded batches
on disk, which a naive reader would then DOUBLE-count into the new
base.  The intent records which batch ids were folded and a content
hash of the base grid they produced; both the reader and the next
compaction can therefore tell exactly which side of the commit the
crash fell on and either exclude the already-folded partitions or
discard the aborted attempt.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketches import cms_cells
from ..sinks.files import overwrite_partitions

_INTENT = "_COMPACT_INTENT.json"


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


def _base_hash(spark: SparkSession, state_dir: str) -> str:
    """Content hash of the batch_id=-1 base grid (order-independent:
    sorted (d, b, cnt) rows).  ≤ d·w rows — cheap."""
    base = os.path.join(state_dir, "batch_id=-1")
    if not os.path.isdir(base):
        return "empty"
    rows = sorted(
        (r.d, r.b, r.cnt)
        for r in spark.read.parquet(base).select("d", "b", "cnt").collect()
    )
    return hashlib.sha256(str(rows).encode()).hexdigest()[:16]


def _read_intent(state_dir: str) -> dict | None:
    p = os.path.join(state_dir, _INTENT)
    if not os.path.exists(p):
        return None
    try:
        with open(p) as fh:
            return json.load(fh)
    except (OSError, json.JSONDecodeError):
        return None


def _folded_but_undeleted(
    spark: SparkSession, state_dir: str
) -> list[int]:
    """Batch ids an interrupted compaction already folded into the
    committed base grid but did not get to delete (the double-count
    hazard).  Empty when no intent exists or the base commit never
    happened."""
    intent = _read_intent(state_dir)
    if intent is None:
        return []
    if _base_hash(spark, state_dir) != intent.get("folded_hash"):
        return []  # crash BEFORE the base commit: nothing was folded
    return [int(i) for i in intent.get("ids", [])]


def read_cms(spark: SparkSession, state_dir: str) -> DataFrame:
    """Fold every batch's grid into the current CMS: (d, b, cnt).

    Crash-consistent: partitions an interrupted compaction already
    folded into the committed base (per the intent file) are excluded
    from the fold, so the reader never double-counts them.
    """
    df = spark.read.parquet(state_dir)
    stale = _folded_but_undeleted(spark, state_dir)
    if stale:
        df = df.where(~F.col("batch_id").isin(stale))
    return df.groupBy("d", "b").agg(F.sum("cnt").alias("cnt"))


def compact_cms(spark: SparkSession, state_dir: str) -> int:
    """Fold the accumulated per-batch grids into a single base grid
    (written as partition ``batch_id=-1``), dropping the per-batch
    partitions — the read-side fold input goes from d·w·|batches| rows
    back to ≤ d·w.  Returns the number of cells in the compacted grid.

    Correctness: the CMS merge is associative, so pre-folding history
    commutes with the reader's fold — `read_cms` returns the identical
    grid before and after (asserted in tests).

    Safe while the stream runs: the set of batch partitions to fold
    is SNAPSHOT up front; the fold reads only that set, the base grid
    is written with dynamic partition overwrite (touching only
    ``batch_id=-1``), and only the snapshot partitions are deleted —
    a batch the live stream lands between the snapshot and the delete
    is neither consumed nor removed, just left for the next
    compaction.  (The previous implementation rewrote the WHOLE
    directory with a static overwrite, silently deleting any
    concurrently-written batch — the round-3 ADVICE finding.)

    Crash-safe via the intent protocol (round-4 review finding: a
    kill between the base commit and the deletes silently
    double-counted every folded batch): BEFORE committing the base,
    an intent file records the folded ids and the new base's content
    hash.  On entry, an existing intent is resolved — base hash
    matches ⇒ the commit happened, so finish the deletes; no match ⇒
    the attempt aborted before commit, so discard the intent.
    `read_cms` applies the same rule read-only.

    Replay interaction (unchanged, and the one remaining caveat):
    compaction consumes historical batch partitions, so only compact
    past the stream's redelivery horizon (e.g. the checkpoint's
    committed offset) — a replay of an ALREADY-COMPACTED batch_id
    would otherwise double-count into the base grid.

    State lives on a local filesystem path (the repo's sink contract);
    the partition delete uses local fs ops.
    """
    import tempfile

    # a stream that has not written yet simply has nothing to compact
    if not os.path.isdir(state_dir):
        return 0

    # resolve any interrupted prior attempt first
    stale = _folded_but_undeleted(spark, state_dir)
    for bid in stale:
        if bid != -1:
            shutil.rmtree(
                os.path.join(state_dir, f"batch_id={bid}"),
                ignore_errors=True,
            )
    intent_path = os.path.join(state_dir, _INTENT)
    if os.path.exists(intent_path):
        os.remove(intent_path)

    # snapshot the partitions to fold (directory listing, not a scan:
    # batch_id is the partition column)
    ids = sorted(
        int(name.split("=", 1)[1])
        for name in os.listdir(state_dir)
        if name.startswith("batch_id=")
    )
    if not ids:
        return 0
    folded = (
        spark.read.parquet(state_dir)
        .where(F.col("batch_id").isin(ids))
        .groupBy("d", "b")
        .agg(F.sum("cnt").alias("cnt"))
        .withColumn("batch_id", F.lit(-1))
    )
    # stage to a temp dir first: the fold READS the state_dir base
    # grid, so overwriting batch_id=-1 in-place would consume an
    # input mid-scan
    tmp = tempfile.mkdtemp(prefix="cms_compact_")
    try:
        folded.coalesce(1).write.mode("overwrite").parquet(tmp)
        staged = spark.read.parquet(tmp)
        rows = sorted(
            (r.d, r.b, r.cnt)
            for r in staged.select("d", "b", "cnt").collect()
        )
        n = len(rows)
        folded_hash = hashlib.sha256(str(rows).encode()).hexdigest()[:16]
        # intent BEFORE the commit: whichever side a crash lands on,
        # recovery can tell (hash match ⇔ base committed)
        tmp_intent = intent_path + ".tmp"
        with open(tmp_intent, "w") as fh:
            json.dump(
                {
                    "ids": [bid for bid in ids if bid != -1],
                    "folded_hash": folded_hash,
                },
                fh,
            )
        os.replace(tmp_intent, intent_path)
        overwrite_partitions(staged, state_dir, ["batch_id"])
        for bid in ids:
            if bid != -1:
                shutil.rmtree(
                    os.path.join(state_dir, f"batch_id={bid}"),
                    ignore_errors=True,
                )
        os.remove(intent_path)
        return n
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
