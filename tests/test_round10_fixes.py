"""Round-10 verdict/advice closures: optimistic versioned commits,
attribution retirement + base compaction, the in-sync CDC fast path,
bipartite streaming decontamination under colliding doc_id spaces,
empty-state sketch rebuild, partitioned merge deletes, and the
drift/BM25 gates at the ingest boundary."""

from __future__ import annotations

import json
import os
import threading

import pytest
from pyspark.sql import functions as F

from projetbigdatastreaming_spark.sinks.versioned import (
    _read_manifest,
    changes_since,
    compact_versioned,
    list_versions,
    read_version,
    versioned_append,
    versioned_append_batch,
    versioned_overwrite,
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _df(spark, ids):
    return spark.createDataFrame(
        [(i, f"d{i}") for i in ids], "id long, v string"
    ).coalesce(1)


# ---------------------------------------------------------------------------
# Optimistic concurrency (VERDICT r09 item 4)
# ---------------------------------------------------------------------------


def test_interleaved_commit_retries_and_loses_nothing(spark, tmp_path):
    """Deterministic two-writer interleave: writer A's compose step is
    interrupted by writer B committing first.  A's create-exclusive
    link on vN must fail, A must retry against B's manifest, and the
    final lineage must contain BOTH appends — no commit silently
    lost (the old rename protocol would have clobbered B's vN)."""
    from projetbigdatastreaming_spark.sinks import versioned

    t = str(tmp_path / "vt_occ")
    versioned_overwrite(_df(spark, [1]), t)

    new_files = versioned._write_files(_df(spark, [2]), t)
    state = {"interleaved": False}

    def compose(versions):
        if not state["interleaved"]:
            state["interleaved"] = True
            # writer B lands a full append AFTER A listed versions
            versioned_append(_df(spark, [3]), t)
        batches = versioned._parent_batches(t, versions)
        batches["__base__"] = list(batches.get("__base__", [])) + new_files
        return [f for fs in batches.values() for f in fs], batches

    v = versioned._commit(t, None, "append", compose=compose)
    # B claimed v2; A retried as v3 with B's files folded in
    assert v == 3 and list_versions(t) == [1, 2, 3]
    assert _rows(read_version(spark, t, 3)) == _rows(_df(spark, [1, 2, 3]))
    assert _rows(read_version(spark, t, 2)) == _rows(_df(spark, [1, 3]))


def test_concurrent_append_threads_all_commit(spark, tmp_path):
    """Four racing appenders: every row set must appear in the final
    version and version numbers must be a contiguous 1..5."""
    t = str(tmp_path / "vt_race")
    versioned_overwrite(_df(spark, [0]), t)

    def appender(i):
        versioned_append(_df(spark, [100 + i]), t)

    threads = [
        threading.Thread(target=appender, args=(i,)) for i in range(4)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert list_versions(t) == [1, 2, 3, 4, 5]
    assert _rows(read_version(spark, t)) == _rows(
        _df(spark, [0, 100, 101, 102, 103])
    )


# ---------------------------------------------------------------------------
# Attribution retirement + base compaction (VERDICT r09 item 5)
# ---------------------------------------------------------------------------


def test_retire_attributions_bounds_map():
    from projetbigdatastreaming_spark.sinks.versioned import (
        _retire_attributions,
    )

    batches = {str(i): [f"data/f{i}.parquet"] for i in range(200)}
    out = _retire_attributions(batches, 199, 10)
    # ids 0..189 fold into __base__, 190..199 stay attributed
    assert set(out) == {"__base__"} | {str(i) for i in range(190, 200)}
    assert sorted(out["__base__"]) == sorted(
        f"data/f{i}.parquet" for i in range(190)
    )
    # nothing lost: every file still referenced exactly once
    assert sorted(f for fs in out.values() for f in fs) == sorted(
        f for fs in batches.values() for f in fs
    )


def test_long_stream_manifest_plateaus_and_replays(spark, tmp_path):
    """60 batch commits with retire_horizon=5 and a base compaction
    every 15: the manifest's attribution map stays ≤ horizon+1
    entries and its byte size PLATEAUS (late-stream manifests are no
    bigger than mid-stream ones) instead of growing with stream
    lifetime; a redelivery within the horizon still restates."""
    t = str(tmp_path / "vt_long")
    sizes = {}
    for b in range(60):
        versioned_append_batch(
            _df(spark, [b]), t, b, retire_horizon=5
        )
        if (b + 1) % 15 == 0:
            compact_versioned(spark, t, target_mb=128)
        latest = list_versions(t)[-1]
        m = _read_manifest(t, latest)
        assert len([k for k in m["batches"] if k != "__base__"]) <= 5
        sizes[b] = os.path.getsize(
            os.path.join(t, "_versions", f"v{latest}.json")
        )
    # plateau: the post-compaction manifest at batch 59 is no bigger
    # than the one at batch 29 (both are horizon+1-base shaped)
    assert sizes[59] <= sizes[29] * 1.2
    assert _rows(read_version(spark, t)) == _rows(_df(spark, range(60)))

    # redelivery INSIDE the horizon restates (no duplication)
    versioned_append_batch(_df(spark, [59]), t, 59, retire_horizon=5)
    assert _rows(read_version(spark, t)) == _rows(_df(spark, range(60)))


def test_compact_versioned_preserves_content_and_history(spark, tmp_path):
    t = str(tmp_path / "vt_cmp")
    for b in range(8):
        versioned_append_batch(
            _df(spark, [b]), t, b, retire_horizon=2
        )
    before = _rows(read_version(spark, t))
    pre_v = list_versions(t)[-1]
    pre_base = len(
        _read_manifest(t, pre_v)["batches"].get("__base__", [])
    )
    assert pre_base > 1
    v, n = compact_versioned(spark, t, target_mb=128)
    assert v == pre_v + 1 and n == pre_base
    m = _read_manifest(t, v)
    assert len(m["batches"]["__base__"]) < pre_base
    assert _rows(read_version(spark, t, v)) == before
    # time travel unbroken: the pre-compaction version still reads
    assert _rows(read_version(spark, t, pre_v)) == before
    # attributed recent batches survived untouched
    assert {k for k in m["batches"] if k != "__base__"} == {"6", "7"}


# ---------------------------------------------------------------------------
# In-sync CDC fast path (ADVICE r09 item 5)
# ---------------------------------------------------------------------------


def test_changes_since_in_sync_is_empty_and_scan_free(spark, tmp_path):
    t = str(tmp_path / "vt_sync")
    versioned_overwrite(_df(spark, [1, 2]), t)
    feed, latest = changes_since(spark, t, 1, ["id"])
    assert latest == 1 and feed.count() == 0
    assert feed.columns == ["id", "change"]
    assert dict(feed.dtypes)["change"] == "string"
    # the fast path must not build the self full-outer diff
    assert "Join" not in feed._jdf.queryExecution().optimizedPlan().toString()


# ---------------------------------------------------------------------------
# Bipartite streaming decontamination (ADVICE r09 item 1)
# ---------------------------------------------------------------------------


def test_benchmark_screen_flags_colliding_doc_id(spark, tmp_path):
    """An incoming doc whose doc_id COLLIDES with a benchmark doc_id
    must still be flagged — the band probe keeps self-id pairs and
    the verify resolves each side's shingles from its own store
    (stream twin of the bipartite batch fix)."""
    from projetbigdatastreaming_spark.streaming.neardup import (
        benchmark_screen_writer,
        build_benchmark_index,
    )

    bench_text = " ".join(f"benchword{i}" for i in range(40))
    benchmark = spark.createDataFrame(
        [(7, bench_text)], "doc_id long, text string"
    )
    index_dir = str(tmp_path / "ix")
    flags_dir = str(tmp_path / "flags")
    build_benchmark_index(spark, benchmark, index_dir)

    # same doc_id=7, near-duplicate text (one word edited)
    batch = spark.createDataFrame(
        [
            (7, bench_text.replace("benchword3", "EDITED", 1)),
            (8, "totally unrelated words that share no shingles at all"),
        ],
        "doc_id long, text string",
    )
    benchmark_screen_writer(index_dir, flags_dir, threshold=0.8)(batch, 0)
    flags = spark.read.parquet(flags_dir).collect()
    assert {(r.doc_a, r.doc_b) for r in flags} == {(7, 7)}
    assert all(r.jaccard >= 0.8 for r in flags)


# ---------------------------------------------------------------------------
# Empty-state rebuild (ADVICE r09 item 2)
# ---------------------------------------------------------------------------


def test_rebuild_idempotent_empty_state_lands(spark, tmp_path):
    """A takedown that retracts EVERY document must still complete:
    the rebuild promotes an EMPTY base (zero rows) and the bloom
    probe reports nothing — previously the staging dir was never
    materialized and the rebuild raised after renaming the old base
    aside."""
    from projetbigdatastreaming_spark.maintenance import rebuild_sketches
    from projetbigdatastreaming_spark.operators.sketches import bloom_probe
    from projetbigdatastreaming_spark.streaming.sketches import (
        bloom_batch_writer,
        read_bloom,
    )

    state = str(tmp_path / "bloom")
    docs = spark.createDataFrame(
        [(i, f"fp{i}") for i in range(5)], "doc_id long, fp string"
    )
    bloom_batch_writer(state)(docs, 0)

    empty_base = docs.where("doc_id < 0")  # retraction took everything
    n = rebuild_sketches(spark, empty_base, state, "bloom", column="fp")
    assert n == 0
    assert os.path.isdir(os.path.join(state, "batch_id=-1"))
    probe = spark.createDataFrame([("fp1",)], "fp string")
    got = bloom_probe(probe, read_bloom(spark, state)).collect()
    assert [r.bloom_hit for r in got] == [0]

    # the stream keeps appending afterwards — state dir still valid
    bloom_batch_writer(state)(docs.where("doc_id = 1"), 1)
    got2 = bloom_probe(probe, read_bloom(spark, state)).collect()
    assert [r.bloom_hit for r in got2] == [1]


# ---------------------------------------------------------------------------
# Partitioned merge deletes (ADVICE r09 item 3)
# ---------------------------------------------------------------------------


def test_merge_upsert_partitioned_delete_requires_partition_cols(
    spark, tmp_path
):
    from projetbigdatastreaming_spark.maintenance import merge_upsert

    t = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "k long, p string, v double"
    )
    base.write.partitionBy("p").parquet(t)
    with pytest.raises(ValueError, match="partition columns"):
        merge_upsert(
            spark,
            t,
            spark.createDataFrame([(1, "a", 11.0)], base.schema),
            ["k"],
            partition_by=["p"],
            delete_keys=spark.createDataFrame([(2,)], "k long"),
        )


def test_merge_upsert_partitioned_delete_untouched_partition(
    spark, tmp_path
):
    """Deletes whose rows live in partitions NO update touches must
    still land (the delete's partition values extend the pruning
    set), including a delete that EMPTIES its partition."""
    from projetbigdatastreaming_spark.maintenance import merge_upsert

    t = str(tmp_path / "tbl2")
    base = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "b"), (4, 40.0, "c")],
        "k long, v double, p string",
    )
    base.write.partitionBy("p").parquet(t)

    merge_upsert(
        spark,
        t,
        spark.createDataFrame([(1, 11.0, "a")], base.schema),
        ["k"],
        partition_by=["p"],
        # delete 2 (partition b — untouched by updates) and 4
        # (partition c — emptied entirely by the delete)
        delete_keys=spark.createDataFrame(
            [(2, "b"), (4, "c")], "k long, p string"
        ),
    )
    got = sorted(
        (r.k, r.v, r.p) for r in spark.read.parquet(t).collect()
    )
    assert got == [(1, 11.0, "a"), (3, 30.0, "b")]
    assert not os.path.isdir(os.path.join(t, "p=c"))


# ---------------------------------------------------------------------------
# Drift + BM25 gates at the ingest boundary (VERDICT r09 item 7)
# ---------------------------------------------------------------------------


def _gate_docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", f"src{i % 2}", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )


def test_ingest_gates_quarantine_drift_and_hold_low_bm25(
    spark, tmp_path
):
    """A distribution-shifted batch quarantines with the offending
    PSI metric attached (and pollutes no corpus state); the next
    clean batch publishes; docs under the BM25 bar are held like
    dups; the CDC subscriber sees only admitted rows."""
    from projetbigdatastreaming_spark.sinks.versioned import (
        consume_changes,
    )
    from projetbigdatastreaming_spark.streaming.curation import (
        build_bm25_stats,
        build_drift_reference,
    )
    from projetbigdatastreaming_spark.streaming.ingest import (
        full_ingest_writer,
    )
    from projetbigdatastreaming_spark.streaming.neardup import (
        build_benchmark_index,
    )

    d = lambda n: str(tmp_path / n)
    benchmark = spark.createDataFrame(
        [(900, " ".join(f"benchword{i}" for i in range(40)))],
        "doc_id long, text string",
    )
    build_benchmark_index(spark, benchmark, d("bench_idx"))
    # reference: english docs, mid-length (n_chars bin 1), containing
    # the fixed BM25 query terms so the frozen stats carry nonzero df
    reference = _gate_docs(
        spark,
        [
            (
                500 + i,
                f"reference document {i} about stream processing "
                + "filler words here " * 5,
            )
            for i in range(20)
        ],
    )
    build_drift_reference(reference, d("drift_ref"))
    build_bm25_stats(reference, d("bm25_ref"))

    write = full_ingest_writer(
        checks={"long_enough": "length(text) >= 20"},
        good_path=d("good"),
        quarantine_path=d("quarantine"),
        dedup_state_dir=d("dedup_state"),
        dups_dir=d("dups"),
        benchmark_index_dir=d("bench_idx"),
        contam_flags_dir=d("contam"),
        drift_ref_dir=d("drift_ref"),
        drift_metric_dir=d("drift_metrics"),
        bm25_ref_dir=d("bm25_ref"),
        bm25_scores_dir=d("bm25_scores"),
        neardup_index_dir=d("nd_idx"),
        neardup_flags_dir=d("nd_flags"),
        cms_state_dir=d("cms"),
        table_dir=d("published"),
        psi_alert_threshold=0.25,
        drift_quarantine_dir=d("drift_quarantine"),
        min_bm25=1e-9,
    )

    # batch 0: distribution-shifted (all docs a different language and
    # wildly longer than the reference) → PSI over the bar
    shifted = spark.createDataFrame(
        [
            (i, "mots francais differents " * 40, "fr", "srcX",
             len("mots francais differents " * 40))
            for i in range(3)
        ],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    write(shifted, 0)
    assert not os.path.isdir(d("published"))  # publish skipped
    assert not os.path.isdir(d("nd_idx"))  # corpus state unpolluted
    # the dedup fingerprint fold is corpus state too: a quarantined
    # batch must not make later batches flag as dups of never-admitted
    # docs (round-10 reorder: the gate runs before every stateful stage)
    assert not os.path.isdir(d("dedup_state"))
    q = spark.read.parquet(d("drift_quarantine"))
    assert q.count() == 3
    first = q.select("drift_feature", "psi").first()
    assert first.psi > 0.25 and first.drift_feature

    # batch 1: clean docs matching the reference (same length bin,
    # same lang, query-term hits) + one zero-relevance doc that stays
    # in the reference's length bin but shares no BM25 query term
    clean = _gate_docs(
        spark,
        [
            (
                10,
                "reference document ten about stream processing "
                + "filler words here " * 5,
            ),
            (
                11,
                "clean document eleven with a vector inside it "
                + "filler words here " * 5,
            ),
            (12, "zzz qqq xxx vvv " * 8),
        ],
    )
    write(clean, 1)
    published = read_version(spark, d("published"))
    assert {r.doc_id for r in published.collect()} == {10, 11}
    scores = {
        r.doc_id: r.bm25
        for r in spark.read.parquet(d("bm25_scores")).collect()
    }
    assert scores[12] < 1e-9 <= scores[10]

    # subscriber baselines at the earliest version (batch 1's publish)
    feed, latest, commit = consume_changes(
        spark, d("published"), ["doc_id"], d("cursor")
    )
    assert feed.count() == 0
    commit()

    # batch 2: one admitted doc + one held-for-relevance doc — the
    # feed subscriber sees ONLY the admitted row
    write(
        _gate_docs(
            spark,
            [
                (
                    13,
                    "reference document thirteen about stream things "
                    + "filler words here " * 5,
                ),
                (14, "yyy www uuu ooo " * 8),
            ],
        ),
        2,
    )
    feed, latest, commit = consume_changes(
        spark, d("published"), ["doc_id"], d("cursor")
    )
    assert {(r.doc_id, r.change) for r in feed.collect()} == {
        (13, "insert")
    }
    commit()

    # redelivery of the shifted batch re-quarantines, still no publish
    write(shifted, 0)
    assert {
        r.doc_id
        for r in read_version(spark, d("published")).collect()
    } == {10, 11, 13}
    assert spark.read.parquet(d("drift_quarantine")).count() == 3


def test_continuous_cdc_subscriber_converges(spark, tmp_path):
    """`cdc_subscriber_writer` runs the CDC replica sync as a real
    streaming consumer (foreachBatch over a ticking rate stream):
    interleaved publishes and ticks — including a multi-version gap
    and a delete-heavy republish — end with the replica BIT-IDENTICAL
    to the publisher's latest version, and an in-sync tick is a
    no-op."""
    from projetbigdatastreaming_spark.sinks.versioned import (
        cdc_subscriber_writer,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "replica")
    cursor = str(tmp_path / "cursor")
    sync = cdc_subscriber_writer(src, dst, ["id"], cursor)

    def tick():
        q = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", 1)
            .load()
            .writeStream.foreachBatch(sync)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def replica():
        return _rows(spark.read.parquet(dst))

    versioned_overwrite(_df(spark, [1, 2, 3]), src)
    tick()  # bootstrap
    assert replica() == _rows(read_version(spark, src))

    # publisher keeps appending BETWEEN ticks — two versions fold
    # into one diff at the next tick
    versioned_append(_df(spark, [4]), src)
    versioned_append(_df(spark, [5]), src)
    tick()
    assert replica() == _rows(read_version(spark, src))

    # delete-heavy republish (takedown): replica drops the rows
    versioned_overwrite(
        read_version(spark, src).where("id not in (2, 4)"), src
    )
    tick()
    assert replica() == _rows(read_version(spark, src)) == _rows(
        _df(spark, [1, 3, 5])
    )

    # in-sync tick: nothing changes, nothing breaks
    before = replica()
    tick()
    assert replica() == before


def test_ingest_psi_gate_requires_quarantine_dir():
    from projetbigdatastreaming_spark.streaming.ingest import (
        full_ingest_writer,
    )

    with pytest.raises(ValueError, match="drift_quarantine_dir"):
        full_ingest_writer(
            checks={},
            good_path="g",
            quarantine_path="q",
            dedup_state_dir="ds",
            dups_dir="du",
            benchmark_index_dir="bi",
            contam_flags_dir="cf",
            drift_ref_dir="dr",
            drift_metric_dir="dm",
            bm25_ref_dir="br",
            bm25_scores_dir="bs",
            neardup_index_dir="ni",
            neardup_flags_dir="nf",
            cms_state_dir="cs",
            table_dir="t",
            psi_alert_threshold=0.1,
        )


def test_compact_versioned_aborts_on_interleaved_overwrite(
    spark, tmp_path, monkeypatch
):
    """A takedown republish interleaving with a base compaction must
    NOT be resurrected by the compaction's compose merge: when the
    snapshot base has vanished from the winning parent entirely, the
    compaction aborts without committing."""
    from projetbigdatastreaming_spark.sinks import versioned

    t = str(tmp_path / "vt_abort")
    for b in range(4):
        versioned_append_batch(
            _df(spark, [b]), t, b, retire_horizon=1
        )
    pre = list_versions(t)[-1]

    real = versioned._write_files

    def write_then_overwrite(df, table_dir):
        files = real(df, table_dir)
        # takedown republish lands AFTER compaction wrote its files
        # but BEFORE its commit
        monkeypatch.undo()
        versioned_overwrite(_df(spark, [99]), table_dir)
        return files

    monkeypatch.setattr(versioned, "_write_files", write_then_overwrite)
    v, n = compact_versioned(spark, t, target_mb=128)
    assert n == 0  # aborted, nothing compacted
    latest = list_versions(t)[-1]
    assert _rows(read_version(spark, t, latest)) == _rows(
        _df(spark, [99])
    )  # the takedown's content stands; nothing resurrected
    assert pre + 1 == latest  # no extra compact version committed


# ---------------------------------------------------------------------------
# Two-level parallel prefix sum (the global-window rewrite the
# sweep-line/TWAP docstrings promise)
# ---------------------------------------------------------------------------


def test_running_sum_two_level_matches_global_window(spark):
    """The bucketed prefix sum equals the single global window on a
    total order, for several bucket counts (including more buckets
    than rows), and the row-level relation never passes through an
    unpartitioned window."""
    from pyspark.sql import Window

    from projetbigdatastreaming_spark.catalog import load_table
    from projetbigdatastreaming_spark.operators.windows import (
        running_sum_two_level,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    w = Window.orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = {
        r.event_id: r.rs
        for r in ev.withColumn("rs", F.sum("cents").over(w)).collect()
    }
    for nb in (4, 64, 100_000):
        got = {
            r.event_id: r.running_sum
            for r in running_sum_two_level(
                ev, ["ts", "event_id"], "cents", n_buckets=nb
            ).collect()
        }
        assert got == want, nb

    # plan shape: the row-level window is PARTITIONED by the bucket
    # (its windowspecdefinition leads with __bucket as a partition
    # column); the only order-only (global) window spec is the one
    # over the ≤n_buckets __total aggregate rows
    out = running_sum_two_level(ev, ["ts", "event_id"], "cents")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # the row-level prefix sits behind the lineage-truncating
    # checkpoint (a LogicalRDD — exactly the determinism pin the
    # operator documents); the ONLY window in the visible plan is the
    # offset prefix over the ≤n_buckets __total aggregate rows
    assert "sum(__total" in plan
    # sum(cents) appears only as the bucket-total AGGREGATE, never as
    # a window over row-level data
    assert "Window [sum(cents" not in plan
    assert plan.count("windowspecdefinition(") == 1


def test_full_ingest_stream_checkpoint_continuation(spark, tmp_path):
    """The composed ingest boundary driven by a REAL file-source
    stream: availableNow run 1 publishes batch A; a restart from the
    SAME checkpoint processes only the newly arrived file, and the
    exact-dedup screen's cross-batch state catches a batch-B copy of
    a batch-A document across the restart."""
    from projetbigdatastreaming_spark.sinks.versioned import (
        read_version,
    )
    from projetbigdatastreaming_spark.streaming.curation import (
        build_bm25_stats,
        build_drift_reference,
    )
    from projetbigdatastreaming_spark.streaming.ingest import (
        full_ingest_writer,
    )
    from projetbigdatastreaming_spark.streaming.neardup import (
        build_benchmark_index,
    )

    d = lambda n: str(tmp_path / n)
    schema = (
        "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    benchmark = spark.createDataFrame(
        [(900, " ".join(f"benchword{i}" for i in range(40)))],
        "doc_id long, text string",
    )
    build_benchmark_index(spark, benchmark, d("bench_idx"))
    reference = _gate_docs(
        spark,
        [(500 + i, f"ref doc {i} " + "filler words here " * 6)
         for i in range(10)],
    )
    build_drift_reference(reference, d("drift_ref"))
    build_bm25_stats(reference, d("bm25_ref"))

    writer = full_ingest_writer(
        checks={"long_enough": "length(text) >= 20"},
        good_path=d("good"),
        quarantine_path=d("quarantine"),
        dedup_state_dir=d("dedup_state"),
        dups_dir=d("dups"),
        benchmark_index_dir=d("bench_idx"),
        contam_flags_dir=d("contam"),
        drift_ref_dir=d("drift_ref"),
        drift_metric_dir=d("drift_metrics"),
        bm25_ref_dir=d("bm25_ref"),
        bm25_scores_dir=d("bm25_scores"),
        neardup_index_dir=d("nd_idx"),
        neardup_flags_dir=d("nd_flags"),
        cms_state_dir=d("cms"),
        table_dir=d("published"),
    )

    spool = d("spool")
    text_a = "first original document about several topics " * 3
    text_b = "second unrelated body of words for the corpus " * 3
    _gate_docs(spark, [(1, text_a), (2, text_b)]).coalesce(1).write.mode(
        "append"
    ).parquet(spool)

    def run():
        q = (
            spark.readStream.schema(schema)
            .parquet(spool)
            .writeStream.foreachBatch(writer)
            .option("checkpointLocation", d("ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    assert {
        r.doc_id
        for r in read_version(spark, d("published")).collect()
    } == {1, 2}

    # batch B arrives: one fresh doc + one exact copy of doc 1's text
    text_c = "a third clean body of text with plenty of words " * 3
    _gate_docs(spark, [(3, text_c), (4, text_a)]).coalesce(1).write.mode(
        "append"
    ).parquet(spool)
    run()  # restart from the SAME checkpoint — only the new file runs
    assert {
        r.doc_id
        for r in read_version(spark, d("published")).collect()
    } == {1, 2, 3}
    dups = {r.doc_id for r in spark.read.parquet(d("dups")).collect()}
    assert dups == {4}  # cross-batch dedup state survived the restart


def test_reingest_quarantined_after_reference_update(spark, tmp_path):
    """A drift-quarantined batch re-drives through the boundary once
    the operator accepts the shift (reference rebuilt): the re-ingest
    uses the ORIGINAL batch_id, so it publishes as a restatement; a
    batch that still trips the gate just re-quarantines."""
    from projetbigdatastreaming_spark.sinks.versioned import (
        read_version,
    )
    from projetbigdatastreaming_spark.streaming.curation import (
        build_bm25_stats,
        build_drift_reference,
    )
    from projetbigdatastreaming_spark.streaming.ingest import (
        full_ingest_writer,
        reingest_quarantined,
    )
    from projetbigdatastreaming_spark.streaming.neardup import (
        build_benchmark_index,
    )

    d = lambda n: str(tmp_path / n)
    build_benchmark_index(
        spark,
        spark.createDataFrame(
            [(900, " ".join(f"benchword{i}" for i in range(40)))],
            "doc_id long, text string",
        ),
        d("bench_idx"),
    )
    reference = _gate_docs(
        spark,
        [(500 + i, f"ref doc {i} " + "filler words here " * 6)
         for i in range(10)],
    )
    build_drift_reference(reference, d("drift_ref"))
    build_bm25_stats(reference, d("bm25_ref"))

    write = full_ingest_writer(
        checks={},
        good_path=d("good"),
        quarantine_path=d("quarantine"),
        dedup_state_dir=d("dedup_state"),
        dups_dir=d("dups"),
        benchmark_index_dir=d("bench_idx"),
        contam_flags_dir=d("contam"),
        drift_ref_dir=d("drift_ref"),
        drift_metric_dir=d("drift_metrics"),
        bm25_ref_dir=d("bm25_ref"),
        bm25_scores_dir=d("bm25_scores"),
        neardup_index_dir=d("nd_idx"),
        neardup_flags_dir=d("nd_flags"),
        cms_state_dir=d("cms"),
        table_dir=d("published"),
        psi_alert_threshold=0.25,
        drift_quarantine_dir=d("drift_q"),
    )

    shifted = spark.createDataFrame(
        [
            (i, "mots francais differents " * 40, "fr", "srcX",
             len("mots francais differents " * 40))
            for i in range(3)
        ],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    write(shifted, 0)
    assert not os.path.isdir(d("published"))
    # still shifted vs the old reference: re-ingest re-quarantines
    assert reingest_quarantined(spark, d("drift_q"), 0, write) == 3
    assert not os.path.isdir(d("published"))
    assert spark.read.parquet(d("drift_q")).count() == 3

    # operator accepts the new distribution: reference rebuilt from
    # the shifted population, then the held batch re-drives clean
    build_drift_reference(shifted, d("drift_ref"))
    assert reingest_quarantined(spark, d("drift_q"), 0, write) == 3
    assert {
        r.doc_id
        for r in read_version(spark, d("published")).collect()
    } == {0, 1, 2}


def test_vacuum_grace_protects_inflight_commit_files(spark, tmp_path):
    """Under the optimistic protocol a writer's data files exist
    BEFORE any manifest references them; vacuum must not reclaim a
    young unreferenced file (possible in-flight commit), only orphans
    older than the grace window."""
    from projetbigdatastreaming_spark.sinks import versioned

    t = str(tmp_path / "vt_grace")
    versioned_overwrite(_df(spark, [1]), t)
    # an "in-flight" commit: files written, manifest not yet claimed
    inflight = versioned._write_files(_df(spark, [2]), t)

    m, f = versioned.vacuum(t)  # default grace window
    assert f == 0  # young unreferenced files survive
    # ...and the in-flight commit can still complete afterwards
    v = versioned._commit(
        t,
        None,
        "append",
        compose=lambda vs: (
            versioned._parent_batches(t, vs).get("__base__", [])
            + inflight,
            None,
        ),
    )
    assert _rows(read_version(spark, t, v)) == _rows(_df(spark, [1, 2]))

    # age a genuine orphan past the window: it is reclaimed
    orphan = versioned._write_files(_df(spark, [9]), t)
    path = os.path.join(t, orphan[0])
    old = os.path.getmtime(path) - 7200
    os.utime(path, (old, old))
    m, f = versioned.vacuum(t)
    assert f == 1 and not os.path.exists(path)


def test_vacuum_reclaims_stranded_temp_manifests(spark, tmp_path):
    """A crash between the temp-manifest write and its link claim
    strands .tmp_*.json in _versions; vacuum reclaims those past the
    grace window and leaves young ones (possible in-flight commit)."""
    from projetbigdatastreaming_spark.sinks import versioned

    t = str(tmp_path / "vt_tmp")
    versioned_overwrite(_df(spark, [1]), t)
    vdir = os.path.join(t, "_versions")
    young = os.path.join(vdir, ".tmp_young.json")
    stale = os.path.join(vdir, ".tmp_stale.json")
    for p in (young, stale):
        with open(p, "w") as fh:
            fh.write("{}")
    old = os.path.getmtime(stale) - 7200
    os.utime(stale, (old, old))

    versioned.vacuum(t)
    assert os.path.exists(young) and not os.path.exists(stale)
    assert list_versions(t) == [1]  # committed manifests untouched
