"""Streaming embedding ANN index — IVFADC at the ingest boundary.

The embedding twin of `streaming/neardup.py`: a document/embedding
firehose is encoded batch-by-batch under a FROZEN IVFADC model
(`operators/similarity.ivfpq_model`, trained once — the production
shape: codebooks are trained on a corpus sample, then every later
shard is encoded under the same model so codes stay comparable), each
incoming batch is ADC-probed against the corpus-so-far code index,
and then folded into the index.

State layout (same replay-safety contract as the near-dup index —
dynamic partition overwrite restates a redelivered batch's own
partition):

- ``<index_dir>/model/cents``:    (list_id, cvec, cnrm) — written ONCE
- ``<index_dir>/model/codebook``: (cid, cvec)           — written ONCE
- ``<index_dir>/codes``: (vec_id, list_id, cids, batch_id) — m small
  ints per ingested vector, the ADC scan layout
- ``<flags_dir>``: (qid, vec_id, adc_q4, rk, batch_id) — for each new
  vector (qid), its top-k approximate neighbors among EARLIER vectors
  (batch-vs-corpus semantics, like `exact_dedup_screen_writer`)

Scale: per-batch work is the map-only encode (broadcast model) plus
an ADC probe that touches only the probed lists' codes via a
broadcast equi-join on list_id — the corpus index is never rescanned
whole, and nothing ever shuffles an embedding.  Index rows are unique
per vec_id (natural key), so `curation.compact_state` folds the
per-batch partitions crash-safely with no new machinery, exactly as
for the near-dup index (`maintain compact-neardup` precedent).
"""

from __future__ import annotations

import logging
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    bq_adc_search,
    bq_pack,
    ivfpq_encode,
    ivfpq_model,
    ivfpq_search,
)
from ..sinks.files import overwrite_partitions
from .neardup import _read_or_none

logger = logging.getLogger(__name__)

CODES_STATE_SCHEMA = (
    "vec_id long, list_id long, cids array<int>, batch_id int"
)
BQWORDS_STATE_SCHEMA = "vec_id long, words array<long>, batch_id int"


def build_ann_model(
    embeddings: DataFrame,
    index_dir: str,
    n_lists: int = 16,
    k: int = 8,
) -> None:
    """Train and persist the frozen IVFADC model (centroids + shared
    residual codebook) from a training corpus — run once before the
    stream starts.  Overwrites any existing model: changing the model
    invalidates every stored code, so re-training implies re-encoding
    (the same contract as any production ANN index rebuild)."""
    cents, cb = ivfpq_model(embeddings, n_lists, k)
    cents.coalesce(1).write.mode("overwrite").parquet(
        f"{index_dir}/model/cents"
    )
    cb.select(F.explode("__cents").alias("c")).select(
        "c.cid", "c.cvec"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{index_dir}/model/codebook"
    )


def load_ann_model(
    spark: SparkSession, index_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(cents, cb) in the shapes `ivfpq_encode`/`ivfpq_search` take;
    cb is rebuilt into the 1-row `__cents` form (sort_array on the
    struct array orders by cid, matching `_pq_cent_row`)."""
    cents = spark.read.parquet(f"{index_dir}/model/cents")
    cb = (
        spark.read.parquet(f"{index_dir}/model/codebook")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("cid", "cvec"))
            ).alias("__cents")
        )
    )
    return cents, cb


def retract_vectors(
    spark: SparkSession, index_dir: str, vec_ids: list[int]
) -> int:
    """Takedown for the ANN code index: append vec_id tombstones at
    ``<index_dir>/tombstones``.  Retracted vectors stop appearing as
    neighbors on the very next micro-batch (the probe's corpus side
    anti-joins pending tombstones) and in `read_ann_codes`;
    `compact_ann_index` physically drops their code rows and consumes
    the tombstones.  See `streaming/tombstones.py`."""
    from .tombstones import write_tombstones

    return write_tombstones(spark, f"{index_dir}/tombstones", vec_ids)


def ann_ingest_writer(
    index_dir: str,
    flags_dir: str,
    k_top: int = 10,
    nprobe: int = 4,
    m: int = 4,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch stage: encode the batch under the frozen model,
    flag each new vector's top-k approximate neighbors among the
    corpus-so-far, then fold the batch's codes into the index.

    Batch-vs-corpus semantics: within-batch neighbor pairs are NOT
    flagged (mirror of `exact_dedup_screen_writer`) — the flags
    answer "what already-ingested vectors does this new one sit
    near", the ingest-time question (near-dup routing, cluster
    assignment, novelty scoring).  A replayed batch excludes its own
    prior index partition so a vector never matches its earlier
    delivery; the `dropDuplicates(vec_id)` fold absorbs the
    compaction kill-point dual state, and the search's qid<>vec_id
    guard shields replays of already-compacted batches from
    self-pairs (the near-dup index contract, verbatim).
    """

    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        cents, cb = load_ann_model(spark, index_dir)
        codes_new = ivfpq_encode(
            batch_df.select("vec_id", "embedding"), cents, cb, m
        )

        codes_old = _read_or_none(
            spark, f"{index_dir}/codes", CODES_STATE_SCHEMA
        )
        if codes_old is not None:
            from .tombstones import (
                apply_tombstones,
                read_pending_tombstones,
            )

            corpus = (
                apply_tombstones(
                    codes_old.where(F.col("batch_id") != batch_id),
                    read_pending_tombstones(
                        spark, f"{index_dir}/tombstones"
                    ),
                    "vec_id",
                )
                .dropDuplicates(["vec_id"])
                .select("vec_id", "list_id", "cids")
            )
            flags = ivfpq_search(
                corpus,
                batch_df.select("vec_id", "embedding"),
                cents,
                cb,
                k_top,
                nprobe,
                m,
            ).withColumn("batch_id", F.lit(int(batch_id)))
        else:
            flags = spark.createDataFrame(
                [],
                "qid long, vec_id long, adc_q4 long, rk int, batch_id int",
            )
        overwrite_partitions(flags, flags_dir, ["batch_id"])
        overwrite_partitions(
            codes_new.withColumn("batch_id", F.lit(int(batch_id))),
            f"{index_dir}/codes",
            ["batch_id"],
        )
        logger.info("batch %s: ann index updated", batch_id)

    return _fn


def bq_ann_ingest_writer(
    index_dir: str,
    flags_dir: str,
    k_top: int = 10,
    m: int = 4,
    shortlist: int = 50,
) -> Callable[[DataFrame, int], None]:
    """Two-stage ingest: the `ann_ingest_writer` contract with the
    batch's probe upgraded to BQ-shortlist + ADC-rescore
    (`operators/similarity.bq_adc_search`) — the production pattern
    where the cheap popcount scan generates candidates from ANY
    inverted list (recall no longer bounded by nprobe) and the ADC
    integer math runs only on the ≤|Q|·shortlist survivors.

    The index dir gains a ``bqwords`` state family — (vec_id, words,
    batch_id), the packed sign bits stored ALONGSIDE the IVFADC
    codes — folded, tombstoned, and compacted by exactly the
    machinery the codes use (unique per vec_id, deduping readers, one
    tombstone snapshot across both tables).  Same replay safety:
    batch-vs-corpus semantics, own-partition exclusion, restating
    writes."""

    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        cents, cb = load_ann_model(spark, index_dir)
        batch = batch_df.select("vec_id", "embedding")
        codes_new = ivfpq_encode(batch, cents, cb, m)
        words_new = bq_pack(batch)

        codes_old = _read_or_none(
            spark, f"{index_dir}/codes", CODES_STATE_SCHEMA
        )
        words_old = _read_or_none(
            spark, f"{index_dir}/bqwords", BQWORDS_STATE_SCHEMA
        )
        if codes_old is not None and words_old is not None:
            from .tombstones import (
                apply_tombstones,
                read_pending_tombstones,
            )

            tombs = read_pending_tombstones(
                spark, f"{index_dir}/tombstones"
            )
            corpus_codes = (
                apply_tombstones(
                    codes_old.where(F.col("batch_id") != batch_id),
                    tombs,
                    "vec_id",
                )
                .dropDuplicates(["vec_id"])
                .select("vec_id", "list_id", "cids")
            )
            corpus_words = (
                apply_tombstones(
                    words_old.where(F.col("batch_id") != batch_id),
                    tombs,
                    "vec_id",
                )
                .dropDuplicates(["vec_id"])
                .select("vec_id", "words")
            )
            flags = bq_adc_search(
                corpus_codes,
                corpus_words,
                batch,
                cents,
                cb,
                k_top,
                shortlist,
                m,
            ).withColumn("batch_id", F.lit(int(batch_id)))
        else:
            flags = spark.createDataFrame(
                [],
                "qid long, vec_id long, adc_q4 long, rk int, batch_id int",
            )
        overwrite_partitions(flags, flags_dir, ["batch_id"])
        overwrite_partitions(
            codes_new.withColumn("batch_id", F.lit(int(batch_id))),
            f"{index_dir}/codes",
            ["batch_id"],
        )
        overwrite_partitions(
            words_new.withColumn("batch_id", F.lit(int(batch_id))),
            f"{index_dir}/bqwords",
            ["batch_id"],
        )
        logger.info("batch %s: two-stage ann index updated", batch_id)

    return _fn


def read_ann_words(spark: SparkSession, index_dir: str) -> DataFrame:
    """The corpus-so-far packed sign-bit words, deduped and with
    pending retractions applied — stage 1's scan relation."""
    from .tombstones import apply_tombstones, read_pending_tombstones

    return (
        apply_tombstones(
            spark.read.schema(BQWORDS_STATE_SCHEMA).parquet(
                f"{index_dir}/bqwords"
            ),
            read_pending_tombstones(spark, f"{index_dir}/tombstones"),
            "vec_id",
        )
        .dropDuplicates(["vec_id"])
        .select("vec_id", "words")
    )


def read_ann_codes(spark: SparkSession, index_dir: str) -> DataFrame:
    """The corpus-so-far code index, deduped by natural key and with
    pending retractions applied — the relation `ivfpq_search` queries
    run against (and the fold `compact_state` rewrites)."""
    from .tombstones import apply_tombstones, read_pending_tombstones

    return (
        apply_tombstones(
            spark.read.schema(CODES_STATE_SCHEMA).parquet(
                f"{index_dir}/codes"
            ),
            read_pending_tombstones(spark, f"{index_dir}/tombstones"),
            "vec_id",
        )
        .dropDuplicates(["vec_id"])
        .select("vec_id", "list_id", "cids")
    )


def compact_ann_index(spark: SparkSession, index_dir: str) -> int:
    """Fold the per-batch code partitions — and, when the two-stage
    writer is in use, the ``bqwords`` partitions — into single base
    partitions; `curation.compact_state` verbatim (rows unique per
    vec_id, readers dedup).  Returns the compacted CODE row count.
    Tombstone-aware: ONE pending vec_id tombstone snapshot is applied
    across both state tables, then consumed once (the
    `compact_neardup` sequence — a kill between the two compactions
    leaves the tombstones pending for every reader and the rerun).
    Same operational rule: compact past the stream's redelivery
    horizon."""
    from .curation import compact_state
    from .tombstones import (
        delete_tombstone_files,
        pending_tombstone_files,
        read_tombstone_ids,
    )

    files = pending_tombstone_files(f"{index_dir}/tombstones")
    tombs = read_tombstone_ids(spark, files)
    n = compact_state(spark, f"{index_dir}/codes", tombs, "vec_id")
    compact_state(spark, f"{index_dir}/bqwords", tombs, "vec_id")
    delete_tombstone_files(files)
    return n
