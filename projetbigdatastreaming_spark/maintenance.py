"""Table maintenance: small-file compaction with optional clustering.

A streaming sink or over-parallel job writing a partition per task
leaves thousands of tiny parquet files; at 100 TB the resulting
scan-planning and open() overhead dominates query time long before the
bytes do.  Compaction rewrites a directory to ~``target_mb`` files,
optionally range-clustering rows by a column so min/max footer stats
prune whole files for range predicates.

Driver work here is FILE METADATA only (a directory listing to size
the output); rows never pass through the driver.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

#: suffixes of merge_upsert's staged-promotion protocol (full-rewrite
#: fallback); see _recover_merge for the state machine
_MERGE_STAGING = ".__merge_staging__"
_MERGE_OLD = ".__merge_old__"


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_mb: int = 256,
    cluster_by: str | None = None,
) -> int:
    """Rewrite ``src_dir``'s parquet files into ``dst_dir`` at
    ~``target_mb`` per file; returns the number of files written.

    Without ``cluster_by``: a round-robin ``repartition(n)`` — even
    file sizes, one shuffle whose width is the output file count.
    With ``cluster_by``: ``repartitionByRange(n, col)`` +
    ``sortWithinPartitions`` — same shuffle, but each output file
    covers a disjoint range of the cluster column, so parquet
    min/max stats skip whole files for selective range scans (the
    poor man's clustered index; at a real deployment this is the
    Delta/Iceberg OPTIMIZE ... ZORDER equivalent for one column).

    Sizing note: output is sized from the *source* compressed bytes;
    a different compression ratio after re-sorting shifts file sizes
    by that ratio, which is fine for the "not thousands of tiny
    files" goal.
    """
    # heal a mid-swap merge crash on the source before reading (see
    # repair_table): without this, a kill between merge_upsert's two
    # promotion renames makes every compaction fail path-not-found
    # until the NEXT merge call repairs it
    _recover_merge(src_dir)
    n_files = max(1, math.ceil(_dir_bytes(src_dir) / (target_mb << 20)))
    df: DataFrame = spark.read.parquet(src_dir)
    if cluster_by is None:
        out = df.repartition(n_files)
    else:
        out = df.repartitionByRange(n_files, cluster_by).sortWithinPartitions(
            cluster_by
        )
    out.write.mode("overwrite").parquet(dst_dir)
    return sum(
        1
        for f in os.listdir(dst_dir)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )


def repair_table(table_path: str) -> bool:
    """Reader-side heal for a mid-swap merge crash (round-5 review
    finding): `_recover_merge` used to run only at the START of the
    next `merge_upsert`, so a kill between the two promotion renames
    left the table directory absent until that next merge — every
    other reader (registered queries, `compact_parquet`,
    `zorder_write`) failed with path-not-found in the meantime.
    Durable, but not available.  Any reader can now call this (and
    `compact_parquet` does) to finish or roll back the swap first —
    the same co-operation `read_cms`/`_resolve_intent` have in
    `streaming/sketches.py`.  Idempotent and cheap when there is
    nothing to repair.  Returns True iff the table directory exists
    afterwards."""
    _recover_merge(table_path)
    return os.path.isdir(table_path.rstrip("/"))


def _recover_merge(table_path: str) -> None:
    """Repair an interrupted full-rewrite merge (staged-promotion
    protocol; see `merge_upsert`).  States a kill can leave:

    - staging partial/complete, table intact (died before the swap):
      drop the staging — the table was never touched.
    - table renamed to .old, staging complete (died mid-swap): finish
      the promotion (staging → table, drop .old).
    - table renamed to .old, staging incomplete (cannot happen in
      order — the swap only starts after the staging write returns —
      but repairable anyway): restore .old → table, drop staging.
    - new table in place, .old leftover (died before cleanup): drop
      .old and any stale staging.

    Completeness of a staging dir is Spark's own job-commit marker
    (``_SUCCESS``): present only after every task committed.
    """
    table = table_path.rstrip("/")
    staging = table + _MERGE_STAGING
    old = table + _MERGE_OLD
    if os.path.isdir(table):
        # table present: any siblings are stale artifacts
        shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(staging, ignore_errors=True)
        return
    if os.path.isdir(old):
        if os.path.exists(os.path.join(staging, "_SUCCESS")):
            os.rename(staging, table)
            shutil.rmtree(old, ignore_errors=True)
        else:
            shutil.rmtree(staging, ignore_errors=True)
            os.rename(old, table)


def merge_upsert(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_by: list[str] | None = None,
    delete_keys: DataFrame | None = None,
) -> None:
    """Copy-on-write MERGE (upsert) into a parquet table: rows whose
    ``key_cols`` match an update are replaced, new keys are inserted,
    everything else is untouched.  ``delete_keys`` (a key-columns-only
    relation) extends it to full MERGE semantics: matching rows are
    DROPPED in the same rewrite — what a CDC change feed's deletes
    need (`sinks/versioned.replicate_versioned`).

    Without a transactional format (Delta/Iceberg jars absent in this
    environment), MERGE on parquet is copy-on-write.  The scale lever
    is ``partition_by``: only partitions PRESENT in the update batch
    are read (partition pruning via the values filter) and rewritten
    (dynamic partition overwrite); a 1-partition update against a
    100 TB table touches one partition, not the table.  Unpartitioned
    tables fall back to a full rewrite — correct, but the caller is
    choosing the expensive path.

    The merged partition content is (target ANTI-JOIN updates) UNION
    updates — an equi-join on the key columns, no driver-side rows.

    The full-rewrite fallback is crash-safe via staged promotion
    (round-4 review finding: the old ``cache(); overwrite same path``
    pattern could lose the table to a cache eviction mid-overwrite or
    a crash mid-write).  The merge is written to a STAGING sibling
    directory while the source files are still intact — no cache, the
    write job reads them directly — then promoted by two atomic
    renames (table → .old, staging → table) and the old copy dropped.
    `_recover_merge` repairs any kill point on the next call: a
    complete staging (_SUCCESS present) wins, anything else restores
    the old table; at no instant is the only copy of the data a
    non-durable artifact.
    """
    from pyspark.sql import functions as F

    from .sinks.files import overwrite_partitions

    _recover_merge(table_path)
    target = spark.read.parquet(table_path)
    cols = target.columns
    if partition_by:
        # prune target read to the partitions the batch touches — the
        # scale lever.  Deletes participate in the pruning too: a
        # delete whose row lives in a partition no update touches
        # would otherwise be silently skipped (the pruned target never
        # reads it), so delete_keys MUST carry the partition columns —
        # their values extend the pruning set, and the combination is
        # rejected loudly when they don't.
        pvals = updates.select(*partition_by).distinct()
        if delete_keys is not None:
            missing = [
                c for c in partition_by if c not in delete_keys.columns
            ]
            if missing:
                raise ValueError(
                    "merge_upsert: partitioned merge with delete_keys "
                    f"requires the partition columns {missing} in "
                    "delete_keys — without them, deletes in partitions "
                    "the updates don't touch would be silently skipped "
                    "(pass them, or use the unpartitioned path)"
                )
            pvals = pvals.unionByName(
                delete_keys.select(*partition_by)
            ).distinct()
        target = target.join(F.broadcast(pvals), partition_by, "left_semi")
    gone = updates.select(*key_cols)
    if delete_keys is not None:
        gone = gone.unionByName(delete_keys.select(*key_cols))
    kept = target.join(gone, key_cols, "left_anti")
    merged = kept.select(*cols).unionByName(updates.select(*cols))
    if partition_by:
        emptied = []
        if delete_keys is not None:
            # a delete that empties a partition leaves no rows for the
            # dynamic overwrite to restate — find those partitions NOW
            # (the overwrite replaces the files this lineage reads, so
            # this must run before it; bounded: the emptied set is a
            # subset of the touched-partition values, never a table
            # scan) and drop their directories after the write
            emptied = [
                r.asDict()
                for r in pvals.join(
                    merged.select(*partition_by).distinct(),
                    partition_by,
                    "left_anti",
                ).collect()
            ]
        overwrite_partitions(merged, table_path, partition_by)
        for vals in emptied:
            sub = "/".join(f"{c}={vals[c]}" for c in partition_by)
            shutil.rmtree(
                os.path.join(table_path, sub), ignore_errors=True
            )
    else:
        # full copy-on-write via staged promotion: write the merge to
        # a sibling dir (source files still intact — the job reads
        # them directly, nothing pinned in cache), then swap in with
        # atomic renames.  Every kill point is repaired by
        # _recover_merge on the next call.
        staging = table_path.rstrip("/") + _MERGE_STAGING
        old = table_path.rstrip("/") + _MERGE_OLD
        shutil.rmtree(staging, ignore_errors=True)
        merged.write.mode("overwrite").parquet(staging)
        os.rename(table_path.rstrip("/"), old)
        os.rename(staging, table_path.rstrip("/"))
        shutil.rmtree(old, ignore_errors=True)


def zorder_write(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    bits: int = 10,
    n_files: int = 8,
) -> None:
    """OPTIMIZE-ZORDER-style layout rewrite: cluster rows along the
    Morton curve of two filter columns so every output file covers a
    small RECTANGLE of the (x, y) space — per-file min/max column
    stats then prune scans on EITHER dimension (a plain sort clusters
    only its leading column; see `plans/advanced.q_zorder_layout` for
    the audit query over the same curve).

    The z-key is an unrolled shift/mask fold (codegen, no UDF);
    ``repartitionByRange`` range-partitions on it (sampled bounds —
    the one shuffle), and the within-file sort keeps each row group's
    stats tight too.  Column values are bucketed to ``bits`` bits with
    non-negative modulo, so negative/huge keys are safe.
    """
    n = 1 << bits
    terms = []
    for i in range(bits):
        terms.append(f"(((__zx >> {i}) & 1) << {2 * i})")
        terms.append(f"(((__zy >> {i}) & 1) << {2 * i + 1})")
    z = "(" + " + ".join(terms) + ")"
    keyed = df.selectExpr(
        "*",
        f"(((CAST({x_col} AS BIGINT) % {n}) + {n}) % {n}) AS __zx",
        f"(((CAST({y_col} AS BIGINT) % {n}) + {n}) % {n}) AS __zy",
    ).selectExpr("*", f"{z} AS __z")
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__zx", "__zy", "__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def rebuild_sketches(
    spark,
    base,
    state_dir: str,
    kind: str,
    *,
    tomb_dir: str | None = None,
    id_col: str = "doc_id",
    column: str | None = None,
    group_col: str = "event_type",
    k: int | None = None,
):
    """Rebuild a sketch state family from a retraction-capable base
    relation — the additive-sketch takedown answer SCALING.md's
    "Retraction" section promises: Bloom bits / CMS counts / histogram
    bins / KMV bottom-k cannot delete a document's contribution, so a
    takedown's effect on them comes from periodically REBUILDING the
    sketch over the tombstone-filtered base relation.

    ``base``: the id-keyed relation the sketch summarizes (curation
    fingerprints, the corpus table, an events slice).  When
    ``tomb_dir`` is given, pending tombstones are applied to ``base``
    first (broadcast anti-join on ``id_col``) — so one call does
    filter + rebuild.  ``column`` is the sketched column (CMS key,
    Bloom fingerprint, KMV key, histogram value).  Returns the rebuilt
    state's row count.

    Safe while the stream keeps appending: the state dir's partitions
    are snapshot before the rebuilt grid is staged, so a micro-batch
    landing mid-rebuild survives and keeps folding alongside the new
    base (the idempotent-reader protocol — see
    `streaming/sketches.rebuild_additive` / `rebuild_idempotent` for
    the kill-point story).  Horizon contract: ``base`` must cover
    every document in the snapshot partitions (rebuild from the state
    family the stream feeds, past the redelivery horizon) — the same
    operational rule as compaction.

    HLL has no streaming state family in this engine (its batch query
    `hll_rollup_union` recomputes registers from base data directly),
    so a takedown needs no rebuild there.

    Scale: one pass over the base relation into a bounded grid
    (≤ d·w cells / ≤ bits/63 words / ≤ bins / ≤ k·|groups| rows) —
    the same cost as the sketch's original construction, amortized
    over the takedown cadence rather than paid per batch.
    """
    from pyspark.sql import functions as F

    from .streaming.tombstones import (
        apply_tombstones,
        read_pending_tombstones,
    )

    if tomb_dir is not None:
        base = apply_tombstones(
            base, read_pending_tombstones(spark, tomb_dir), id_col
        )

    if kind == "cms":
        from .operators.sketches import cms_cells
        from .streaming.sketches import rebuild_additive

        cells = cms_cells(base.select(column), column)
        return rebuild_additive(
            spark, state_dir, ("d", "b"), "d int, b bigint, cnt bigint",
            cells,
        )
    if kind == "hist":
        from .plans.sketches import hist_bin_counts
        from .streaming.sketches import rebuild_additive

        counts = hist_bin_counts(
            base.select(F.col(column).alias("value"))
        )
        return rebuild_additive(
            spark, state_dir, ("bin",), "bin int, cnt bigint", counts
        )
    if kind == "bloom":
        from .operators.sketches import bloom_cells
        from .streaming.sketches import rebuild_idempotent

        return rebuild_idempotent(
            spark, state_dir, bloom_cells(base, column)
        )
    if kind == "kmv":
        from pyspark.sql.window import Window

        from .operators.sampling import _portable_hash
        from .streaming.sketches import KMV_K, rebuild_idempotent

        kk = KMV_K if k is None else int(k)
        hashed = base.select(
            F.col(group_col).alias("event_type"),
            _portable_hash(F.col(column), "kmv0").alias("h"),
        ).distinct()
        w = Window.partitionBy("event_type").orderBy("h")
        state = (
            hashed.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= kk)
            .select("event_type", "h")
        )
        return rebuild_idempotent(spark, state_dir, state)
    raise ValueError(f"unknown sketch kind: {kind!r}")


def mv_cdc_refresh(
    spark,
    mv_df,
    table_dir: str,
    v_from: int,
    v_to: int,
    key_cols: list[str],
    group_cols: list[str],
    value_col: str,
):
    """Delete/update-aware incremental materialized-view maintenance,
    driven by the versioned table's CDC diff: given the MV (counts +
    exact-integer sums per ``group_cols``) as of version ``v_from``,
    return the MV as of ``v_to`` WITHOUT rescanning the fact table —
    only the changed keys' old and new rows are read.

    `mv_incremental_refresh` (plans/timeseries.py) handles the
    append-only case; this closes the general one: deletes subtract,
    updates subtract-then-add, groups whose count reaches zero drop
    out entirely (the algebraic-MV condition for distributive
    aggregates under retraction).

    Scale plan: `version_changes` is one key+hash-wide full-outer
    join; the changed-key VALUE reads are semi-joins of each snapshot
    against the (change-volume-bounded, broadcastable) changed-key
    set; the delta collapses to ≤|changed groups| rows before the
    final |view|-row merge.  Nothing scans unchanged data — at 100 TB
    the difference between touching a day's churn and the table.
    """
    from pyspark.sql import functions as F

    from .sinks.versioned import read_version, version_changes

    changes = version_changes(
        spark, table_dir, v_from, v_to, key_cols
    )
    old_keys = changes.where(
        F.col("change").isin("delete", "update")
    ).select(*key_cols)
    new_keys = changes.where(
        F.col("change").isin("insert", "update")
    ).select(*key_cols)

    def grouped(df, sign):
        return df.groupBy(*group_cols).agg(
            (F.count(F.lit(1)) * sign).cast("bigint").alias("n"),
            (F.sum(value_col) * sign).cast("bigint").alias("sum_v"),
        )

    removed = grouped(
        read_version(spark, table_dir, v_from).join(
            F.broadcast(old_keys), key_cols, "left_semi"
        ),
        -1,
    )
    added = grouped(
        read_version(spark, table_dir, v_to).join(
            F.broadcast(new_keys), key_cols, "left_semi"
        ),
        1,
    )
    return (
        mv_df.select(*group_cols, "n", "sum_v")
        .unionByName(removed)
        .unionByName(added)
        .groupBy(*group_cols)
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("sum_v").cast("bigint").alias("sum_v"),
        )
        .where(F.col("n") > 0)
    )
