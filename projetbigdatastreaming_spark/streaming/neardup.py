"""Streaming near-duplicate detection — MinHash-LSH at the ingest
boundary.

Extends the dedup family's batch operators (`operators/dedup.py`) to
the document-firehose case the reference's pipelines imply (SURVEY.md
§2.7: per-batch imperative processing via foreachRDD → foreachBatch):
each micro-batch is signed once, probed against the *corpus-so-far*
LSH band index, exact-verified, and then added to the index.

State layout (two parquet tables, both partitioned by ``batch_id`` and
written with dynamic partition overwrite so an at-least-once replay
rewrites its own partition instead of duplicating index rows — the
same replay-safety contract as ``restatement_batch_writer``):

- ``<index_dir>/bands``: (doc_id, band, bh)  — the LSH probe keys
- ``<index_dir>/sigs``:  (doc_id, shingles)  — for exact verification
- ``<flags_dir>``:       (doc_a, doc_b, jaccard) near-dup pairs where
  ``doc_b`` is the incoming document and ``doc_a`` the earlier one
  (or the within-batch pair, doc_a < doc_b)

Scale: the per-batch cost is |batch| signature computation (map-only)
plus an equi-join of the batch's 16 band keys per doc against the
band index — candidate volume tracks near-dup density exactly as in
the batch operator; nothing rescans the corpus.  The band index is
~16 rows × 24 bytes per corpus document; at 10⁹ docs that's a ~400 GB
parquet table joined on (band, bh) — a shuffle join AQE can skew-split,
with the batch side small enough to broadcast.
"""

from __future__ import annotations

import logging
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    band_keys,
    jaccard_verify,
    lsh_candidate_pairs,
    minhash_signatures,
    shingle_rel,
)
from ..sinks.files import overwrite_partitions

logger = logging.getLogger(__name__)


def _read_or_none(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame | None:
    """Missing-path-tolerant state read, shared by the streaming
    index families (near-dup bands/sigs, the ANN code index)."""
    reader = spark.read.schema(schema) if schema else spark.read
    try:
        return reader.parquet(path)
    except Exception:  # AnalysisException: path does not exist yet
        return None


def retract_docs(
    spark: SparkSession, index_dir: str, doc_ids: list[int]
) -> int:
    """Takedown for the near-dup index: append doc_id tombstones at
    ``<index_dir>/tombstones``.  The retracted documents stop matching
    incoming batches on the very next micro-batch (the writer
    anti-joins pending tombstones when it probes the corpus-so-far);
    `compact_neardup` physically drops their band/sig rows and
    consumes the tombstones.  See `streaming/tombstones.py`."""
    from .tombstones import write_tombstones

    return write_tombstones(spark, f"{index_dir}/tombstones", doc_ids)


def near_dup_batch_writer(
    index_dir: str,
    flags_dir: str,
    threshold: float = 0.8,
    text_col: str = "text",
) -> Callable[[DataFrame, int], None]:
    """foreachBatch stage: flag near-dups of each micro-batch against
    the corpus-so-far, then fold the batch into the index.

    Within-batch pairs are found with the same banded self-join as the
    batch operator; batch-vs-corpus pairs probe the persisted band
    index.  Every candidate is exact-Jaccard-verified before flagging
    (probabilistic pruning, deterministic output — the dedup-family
    invariant).
    """

    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        # round 14: per-batch signatures via the codegen explode+agg
        # kernel (operators/dedup.minhash_signatures) — identical
        # values to the HOF fold, minus its interpreted cold-start
        # tax, which a STREAM pays on every micro-batch
        sh = shingle_rel(batch_df, text_col)
        sh.persist()
        try:
            sigs = minhash_signatures(sh)
            bands_new = band_keys(sigs)

            # within-batch candidates (doc_a < doc_b)
            pairs = lsh_candidate_pairs(sigs)
            sig_store = sh

            bands_old = _read_or_none(spark, f"{index_dir}/bands")
            if bands_old is not None:
                from .tombstones import (
                    apply_tombstones,
                    read_pending_tombstones,
                )

                sigs_old = spark.read.parquet(f"{index_dir}/sigs")
                # corpus-vs-batch candidates: old doc is doc_a, new doc
                # is doc_b (replayed batches exclude their own prior
                # index partition so a replay can't pair a doc with
                # itself)
                bands_old = bands_old.where(F.col("batch_id") != batch_id)
                sigs_old = sigs_old.where(F.col("batch_id") != batch_id)
                # retracted documents stop matching IMMEDIATELY —
                # pending tombstones anti-join the corpus side here,
                # compaction makes the drop physical later
                tombs = read_pending_tombstones(
                    spark, f"{index_dir}/tombstones"
                )
                bands_old = apply_tombstones(bands_old, tombs, "doc_id")
                sigs_old = apply_tombstones(sigs_old, tombs, "doc_id")
                cross = (
                    bands_old.alias("a")
                    .join(
                        bands_new.alias("b"),
                        (F.col("a.band") == F.col("b.band"))
                        & (F.col("a.bh") == F.col("b.bh"))
                        # a doc never pairs with itself — also shields a
                        # replay of an already-COMPACTED batch (whose
                        # rows now live in the base partition, so the
                        # batch_id exclusion above can't see them) from
                        # emitting self-pairs
                        & (F.col("a.doc_id") != F.col("b.doc_id")),
                    )
                    .select(
                        F.col("a.doc_id").alias("doc_a"),
                        F.col("b.doc_id").alias("doc_b"),
                    )
                    .distinct()
                )
                pairs = pairs.unionAll(cross)
                # one sig row per doc: absorbs the compact_neardup
                # kill-point state where a doc's row exists BOTH in the
                # promoted base and in a not-yet-deleted source
                # partition (the idempotent-reader contract that makes
                # compaction crash-safe without an intent file)
                sig_store = sig_store.unionAll(
                    sigs_old.select("doc_id", "shingles")
                ).dropDuplicates(["doc_id"])

            flags = jaccard_verify(pairs, sig_store, threshold).withColumn(
                "batch_id", F.lit(batch_id)
            )
            overwrite_partitions(flags, flags_dir, ["batch_id"])

            # fold the batch into the index (replay overwrites in place)
            overwrite_partitions(
                bands_new.withColumn("batch_id", F.lit(batch_id)),
                f"{index_dir}/bands",
                ["batch_id"],
            )
            overwrite_partitions(
                sh.select("doc_id", "shingles").withColumn(
                    "batch_id", F.lit(batch_id)
                ),
                f"{index_dir}/sigs",
                ["batch_id"],
            )
            logger.info("batch %s: near-dup index updated", batch_id)
        finally:
            sh.unpersist()

    return _fn


def build_benchmark_index(
    spark: SparkSession,
    benchmark: DataFrame,
    index_dir: str,
    text_col: str = "text",
) -> None:
    """Sign and band the held-out benchmark suite ONCE — the frozen
    side of streaming fuzzy decontamination (the `build_ann_model`
    contract: benchmarks change rarely; re-building implies
    re-screening).  Writes ``<index_dir>/bench_bands`` (doc_id, band,
    bh) and ``<index_dir>/bench_sigs`` (doc_id, shingles).  Benchmark
    suites are tiny next to the corpus, so both relations broadcast
    at probe time."""
    from ..operators.dedup import band_keys as _bk

    sh = shingle_rel(benchmark, text_col)
    sh.persist()
    try:
        _bk(minhash_signatures(sh)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{index_dir}/bench_bands")
        sh.select("doc_id", "shingles").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{index_dir}/bench_sigs")
    finally:
        sh.unpersist()


def benchmark_screen_writer(
    index_dir: str,
    flags_dir: str,
    threshold: float = 0.8,
    text_col: str = "text",
) -> Callable[[DataFrame, int], None]:
    """foreachBatch stage: streaming FUZZY DECONTAMINATION — flag each
    incoming document that near-duplicates a benchmark document, so
    contaminated docs are caught at the ingest boundary instead of
    after they land in training shards.  The streaming twin of
    `plans/llmdata.q_decontaminate_fuzzy` (`operators/dedup.
    minhash_cross_near_duplicates`): each batch is signed once, its
    band keys probe the FROZEN broadcast benchmark bands, candidates
    are exact-Jaccard verified, and flags restate the batch's own
    partition (replay-safe, like every writer in this module).

    Because the benchmark side is frozen, batches screen
    independently — the streamed flag fold equals the one-pass batch
    operator over the union of every ingested batch EXACTLY (no
    cross-batch state at all), which the tests pin.  Output rows:
    (doc_a = incoming doc, doc_b = benchmark doc, jaccard, batch_id).

    The verify is BIPARTITE, matching the batch twin: corpus and
    benchmark doc_id spaces may overlap (each side's ids only need to
    be unique within that side), so the band probe keeps self-id
    pairs and ``jaccard_verify`` resolves doc_a shingles from the
    batch and doc_b shingles from the frozen benchmark store — an
    incoming doc whose doc_id happens to collide with a benchmark
    doc_id is screened like any other.
    """

    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        from ..operators.dedup import band_keys as _bk

        sh = shingle_rel(batch_df, text_col)
        sh.persist()
        try:
            bench_bands = spark.read.parquet(f"{index_dir}/bench_bands")
            bench_sigs = spark.read.parquet(f"{index_dir}/bench_sigs")
            pairs = (
                _bk(minhash_signatures(sh))
                .alias("a")
                .join(
                    F.broadcast(bench_bands).alias("b"),
                    (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.bh") == F.col("b.bh")),
                )
                .select(
                    F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                )
                .distinct()
            )
            flags = jaccard_verify(
                pairs, sh, threshold, signed_b=bench_sigs
            ).withColumn("batch_id", F.lit(int(batch_id)))
            overwrite_partitions(flags, flags_dir, ["batch_id"])
            logger.info("batch %s: benchmark screen flags written", batch_id)
        finally:
            sh.unpersist()

    return _fn


def compact_neardup(spark: SparkSession, index_dir: str) -> tuple[int, int]:
    """Fold the per-batch ``bands``/``sigs`` partitions of a streaming
    near-dup index into single base partitions (``batch_id=-1``) —
    without this, a long-running ingest accumulates one parquet
    partition per micro-batch that the probe join must enumerate
    (small-files pressure at 10⁹ docs, the problem ``compact-cms``
    solves for the sketch family).  Returns (band_rows, sig_rows).

    Tombstone-aware (see `retract_docs`): ONE snapshot of the pending
    doc_id tombstones is applied across BOTH state tables, then
    consumed once — a kill between the two compactions leaves the
    tombstones pending, which every reader keeps anti-joining, so the
    retraction stays effective and the next run converges.

    Reuses ``curation.compact_state`` verbatim: like the curation
    relations, index rows are unique per natural key — (doc_id, band)
    for bands, doc_id for sigs — not additive, so compaction is a
    pure distinct-rewrite, and the stage→promote→delete sequence is
    readable-correct at every kill point because the probe path
    dedups (the cross-join ``distinct`` for bands, the
    ``dropDuplicates([doc_id])`` sig fold in the writer).  Same
    operational rule as ``compact_cms``: only compact past the
    stream's redelivery horizon — a replayed batch whose rows were
    compacted into the base restates a fresh partition the base
    already covers (the readers absorb it; the next compaction folds
    it away), and its cross-probe is self-pair-guarded.
    """
    from .curation import compact_state
    from .tombstones import (
        delete_tombstone_files,
        pending_tombstone_files,
        read_tombstone_ids,
    )

    files = pending_tombstone_files(f"{index_dir}/tombstones")
    tombs = read_tombstone_ids(spark, files)
    out = (
        compact_state(spark, f"{index_dir}/bands", tombs, "doc_id"),
        compact_state(spark, f"{index_dir}/sigs", tombs, "doc_id"),
    )
    delete_tombstone_files(files)
    return out
