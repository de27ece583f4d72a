"""Document retraction (takedown / right-to-erasure) for the
id-keyed streaming index states.

A real training-data pipeline must be able to RETRACT a document:
without it, a removed document's LSH bands / ANN codes / curation
feature rows keep matching every future batch forever.  The streaming
state families split into two classes:

- **id-keyed states** — near-dup ``bands``/``sigs`` (doc_id), the ANN
  ``codes`` index (vec_id), the curation substring/DSIR feature rows
  (doc_id): every state row carries its document's id, so retraction
  is expressible as data.  A retraction appends ``(id)`` tombstone
  rows to a tombstone directory; every reader anti-joins the pending
  tombstones (retraction is IMMEDIATELY effective, under the same
  idempotent-reader rule that makes compaction dual states safe), and
  the next ``compact_*`` run past the stream's redelivery horizon
  physically drops the tombstoned rows and consumes exactly the
  tombstone files it applied.
- **additive sketches** — Bloom bitmaps, CMS grids, HLL registers,
  KMV bottom-k: they fold by bit_or / sum / min-k and
  information-theoretically cannot delete (a set bit or a counter
  increment may be shared by any number of documents).  These are
  explicitly NON-retractable — see SCALING.md "Retraction" — and the
  production answer is periodic sketch rebuild from the
  retraction-capable base relations.

Lifecycle and crash-safety:

- ``write_tombstones`` APPENDS a parquet part file.  Appends are
  idempotent by read semantics — duplicates change nothing because
  every consumer distinct-anti-joins — so a crashed-and-retried
  retract is safe.
- Readers apply ALL pending tombstones on every read, so a kill at
  any point between retract and compaction leaves the retracted
  document invisible.
- Compaction snapshots the pending tombstone FILES first, applies
  those ids to the rewrite, and deletes exactly that snapshot after
  the promote — a tombstone that lands mid-compaction survives to the
  next run; a kill after promote but before the snapshot delete
  leaves already-applied tombstones pending, which readers and the
  next compaction absorb (anti-join of absent ids is a no-op).
- Consuming tombstones at compaction gives retraction its production
  semantics: a tombstone retracts what was ingested BEFORE it.  A
  document re-ingested while its tombstone is still pending stays
  suppressed (retract → compact → resubmit if that matters); a
  re-ingest after the tombstone was consumed is a new document and
  becomes visible — a later lawful resubmission must not be
  black-holed by an old takedown.

Scale: tombstone volume is takedown volume — vanishingly small next
to the corpus — so every application is a BROADCAST anti-join: the
corpus-sized state is filtered in place and never shuffles.  (If a
jurisdiction-scale purge ever outgrew a broadcast, drop the hint and
let AQE pick a shuffle join; the semantics don't change.)

No reference analogue: the reference keeps no state at all
(`/root/reference/src/main/scala/KafkaStreaming.scala` recomputes
per micro-batch); this is the 100 TB pipeline's own bar.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOMBSTONE_SCHEMA = "id long"


def write_tombstones(
    spark: SparkSession, tomb_dir: str, ids: list[int]
) -> int:
    """Append ``(id)`` tombstone rows for the given document/vector
    ids.  Returns the number of ids written.  Idempotent under retry
    (duplicate tombstones are absorbed by the distinct anti-join)."""
    ids = [int(i) for i in ids]
    if not ids:
        return 0
    spark.createDataFrame(
        [(i,) for i in ids], TOMBSTONE_SCHEMA
    ).coalesce(1).write.mode("append").parquet(tomb_dir)
    return len(ids)


def pending_tombstone_files(tomb_dir: str) -> list[str]:
    """The parquet part files currently holding tombstones — the
    snapshot unit compaction applies and then deletes.  Files that
    appear after this call are NOT in the snapshot and survive."""
    if not os.path.isdir(tomb_dir):
        return []
    return sorted(
        os.path.join(tomb_dir, name)
        for name in os.listdir(tomb_dir)
        if name.endswith(".parquet") and not name.startswith(".")
    )


def read_tombstone_ids(
    spark: SparkSession, files: list[str]
) -> DataFrame | None:
    """The distinct pending ids in a file snapshot (None when none —
    callers skip the anti-join entirely rather than joining empty)."""
    if not files:
        return None
    return (
        spark.read.schema(TOMBSTONE_SCHEMA).parquet(*files).distinct()
    )


def read_pending_tombstones(
    spark: SparkSession, tomb_dir: str
) -> DataFrame | None:
    """All pending tombstone ids — what every state READER applies."""
    return read_tombstone_ids(spark, pending_tombstone_files(tomb_dir))


def apply_tombstones(
    df: DataFrame, tombs: DataFrame | None, id_col: str
) -> DataFrame:
    """Drop ``df`` rows whose ``id_col`` is tombstoned — a broadcast
    anti-join, so the (corpus-sized) left side never shuffles."""
    if tombs is None:
        return df
    return df.join(
        F.broadcast(tombs.select(F.col("id").alias(id_col))),
        id_col,
        "left_anti",
    )


def delete_tombstone_files(files: list[str]) -> None:
    """Consume a snapshot after its ids were physically compacted
    away.  Missing files are fine (a retried consume)."""
    for path in files:
        try:
            os.remove(path)
        except FileNotFoundError:
            pass


def compact_tombstones(spark: SparkSession, tomb_dir: str) -> tuple[int, int]:
    """Fold the pending tombstone part files into ONE (distinct ids
    preserved).  Returns (files_folded, distinct_ids).

    Why: ``write_tombstones`` appends one part file per call — right
    for takedown latency, but a high-frequency retraction stream
    grows the pending-file count until the next state compaction
    consumes them, and every reader's anti-join build side pays a
    file-listing + small-file scan per read.  This fold bounds it:
    run from the maintenance CLI (``maintain compact-tombstones``) on
    whatever cadence keeps the pending set at O(1) files.  The
    bounded-file invariant: between folds the file count grows only
    by retraction calls since the last fold; each fold returns it
    to 1.

    Crash-safe by the same snapshot-consume protocol as state
    compaction: the fold writes the snapshot's distinct ids as a NEW
    appended part file (not in the snapshot), then deletes exactly
    the snapshot — a kill between the two leaves duplicate ids, which
    every consumer's ``distinct`` absorbs and the next fold removes;
    a tombstone written mid-fold is not in the snapshot and
    survives untouched."""
    files = pending_tombstone_files(tomb_dir)
    if len(files) <= 1:
        return (0, 0)
    ids = read_tombstone_ids(spark, files)
    n = ids.count()
    ids.coalesce(1).write.mode("append").parquet(tomb_dir)
    delete_tombstone_files(files)
    return (len(files), n)
