"""Streaming twins for the two headline curation operators —
cross-document substring dedup and DSIR importance scoring — so both
stay queryable while a document firehose is ingesting.

Both follow the replay-safe fold contract established by
``streaming/sketches.py`` and ``streaming/neardup.py``: each
micro-batch reduces its documents to a bounded-width feature relation
and restates its OWN ``batch_id`` parquet partition (dynamic partition
overwrite), so an at-least-once replay rewrites instead of
double-counting.  Readers fold all partitions and — by construction —
reuse the exact scoring/profile functions the batch queries are built
from (`plans/llmdata.substring_profile` / `dsir_score`), so
stream-fold == one-pass batch EXACTLY, which the tests pin.

State relations (never the text — the corpus-sized payload column
stays map-side in the writer, only fingerprints/bucket counts land on
disk):

- substring: ``(doc_id, fp char16, cnt)`` per batch — the CDC-window
  fingerprint counts.  ~one row per 10 tokens per doc.
- DSIR: ``(doc_id, lang, bucket, tf)`` per batch — the hashed-unigram
  feature relation of Xie et al. 2023 (the paper's precomputed
  n-gram feature store).  ≤64 buckets per doc.  The corpus bucket
  distributions the importance weights need are a ≤64-row aggregate
  over this fold; keeping the doc grain is what lets the reader
  rescore EVERY document under the latest distributions (a
  distributions-only fold could score new docs but would freeze old
  scores at their ingest-time distributions).

Scale: per-batch work is the same map-side extraction the batch
operators use, on batch-sized input; state grows linearly with corpus
token count at bounded row width, partitioned by batch_id (compact by
rewriting the fold as one partition if batch-count file overhead ever
matters, as `streaming/sketches.compact_cms` does for grids).  The
reader's two keyed exchanges match the batch plan's.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.llmdata import (
    dsir_doc_bucket_tf,
    dsir_score,
    substring_doc_fp_counts,
    substring_profile,
)
from ..sinks.files import overwrite_partitions

SUBSTRING_STATE_SCHEMA = "doc_id long, fp string, cnt bigint, batch_id int"
DSIR_STATE_SCHEMA = (
    "doc_id long, lang string, bucket int, tf bigint, batch_id int"
)


def substring_fp_batch_writer(
    state_dir: str,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch sink: reduce the batch's documents to their
    (doc_id, fp, cnt) window-fingerprint counts and restate the
    batch's own partition."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        rows = substring_doc_fp_counts(batch_df).withColumn(
            "batch_id", F.lit(int(batch_id))
        )
        overwrite_partitions(rows, state_dir, ["batch_id"])

    return write


def read_substring_profile(
    spark: SparkSession, state_dir: str
) -> DataFrame:
    """Fold all batch partitions into the corpus-wide per-doc
    duplication profile — row-identical to running the batch
    ``substring_dedup`` over the union of every ingested batch."""
    state = spark.read.schema(SUBSTRING_STATE_SCHEMA).parquet(state_dir)
    return substring_profile(state.select("doc_id", "fp", "cnt"))


def dsir_batch_writer(state_dir: str) -> Callable[[DataFrame, int], None]:
    """foreachBatch sink: reduce the batch's documents to their
    (doc_id, lang, bucket, tf) DSIR features and restate the batch's
    own partition."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        rows = dsir_doc_bucket_tf(batch_df).withColumn(
            "batch_id", F.lit(int(batch_id))
        )
        overwrite_partitions(rows, state_dir, ["batch_id"])

    return write


def read_dsir_importance(spark: SparkSession, state_dir: str) -> DataFrame:
    """Fold all batch partitions and rescore every document under the
    corpus-so-far bucket distributions — row-identical to the batch
    ``dsir_importance`` over the union of every ingested batch."""
    state = spark.read.schema(DSIR_STATE_SCHEMA).parquet(state_dir)
    return dsir_score(state.select("doc_id", "lang", "bucket", "tf"))


def read_dsir_distributions(
    spark: SparkSession, state_dir: str
) -> DataFrame:
    """The ≤DSIR_BUCKETS-row source/target bucket distributions from
    the folded state — the monitoring view (the per-doc scores above
    are the selection output)."""
    state = spark.read.schema(DSIR_STATE_SCHEMA).parquet(state_dir)
    return (
        state.groupBy("bucket")
        .agg(
            F.sum("tf").alias("s_cnt"),
            F.sum(
                F.when(F.col("lang") == "en", F.col("tf")).otherwise(0)
            ).alias("t_cnt"),
        )
        .orderBy("bucket")
    )
