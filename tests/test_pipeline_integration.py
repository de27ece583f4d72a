"""End-to-end integration of the round-8 pieces: curate a corpus,
PUBLISH the kept set as a versioned table (the training-data
snapshot a run pins), process a TAKEDOWN, republish — and verify the
pinned old version stays byte-readable while the new version reflects
the retraction, with the change feed naming exactly the removed
docs."""

from __future__ import annotations

from pyspark.sql import functions as F

from projetbigdatastreaming_spark.catalog import load_table
from projetbigdatastreaming_spark.plans.quality import q_curation_pipeline
from projetbigdatastreaming_spark.sinks.versioned import (
    read_version,
    table_history,
    version_changes,
    versioned_overwrite,
)

SF = "/root/testdata/sf0.001"


def test_curate_publish_takedown_republish(spark, tmp_path):
    table = str(tmp_path / "training_corpus")
    docs = load_table(spark, SF, "documents")

    # 1) curate: the audit relation says who survives and why
    audit = q_curation_pipeline(spark, SF)
    kept_ids = audit.where(F.col("status") == "kept").select("doc_id")
    corpus_v1 = docs.join(kept_ids, "doc_id").select(
        "doc_id", "source", "text"
    )
    v1 = versioned_overwrite(corpus_v1, table)
    n_v1 = read_version(spark, table, v1).count()
    assert n_v1 == corpus_v1.count() > 0

    # 2) a takedown arrives for two published docs: republish without
    # them (the versioned twin of the streaming tombstone flow)
    gone = [
        r.doc_id
        for r in read_version(spark, table, v1).limit(2).collect()
    ]
    v2 = versioned_overwrite(
        read_version(spark, table, v1).where(~F.col("doc_id").isin(gone)),
        table,
    )

    # 3) the pinned old version is still exactly readable (a training
    # run that recorded v1 reproduces its corpus), the new one is not
    latest = read_version(spark, table)
    assert latest.count() == n_v1 - len(gone)
    assert read_version(spark, table, v1).count() == n_v1
    assert (
        latest.where(F.col("doc_id").isin(gone)).count() == 0
        and read_version(spark, table, v1)
        .where(F.col("doc_id").isin(gone))
        .count()
        == len(gone)
    )

    # 4) the change feed names exactly the takedown
    changes = {
        (r.doc_id, r.change)
        for r in version_changes(spark, table, v1, v2, ["doc_id"]).collect()
    }
    assert changes == {(g, "delete") for g in gone}
    assert [h["op"] for h in table_history(table)] == [
        "overwrite",
        "overwrite",
    ]


def test_subscriber_follows_published_table_through_takedown(
    spark, tmp_path
):
    """Round-9 extension of the publish/takedown story: a DOWNSTREAM
    SUBSCRIBER (a trainer's data-loading job) follows the versioned
    table through a durable cursor — it sees the initial corpus as
    inserts-from-baseline, sleeps through several publishes, then
    receives the FOLDED diff including the takedown's deletes; a
    crash before commit replays identically."""
    from projetbigdatastreaming_spark.sinks.versioned import (
        consume_changes,
        versioned_append,
    )

    table = str(tmp_path / "published")
    cursor = str(tmp_path / "subscriber.cursor")
    docs = load_table(spark, SF, "documents").select(
        "doc_id", "source", "text"
    )

    v1_rows = docs.where("doc_id % 3 = 0")
    versioned_overwrite(v1_rows, table)

    # subscriber bootstraps: baseline = earliest version, no changes
    ch, latest, commit = consume_changes(spark, table, ["doc_id"], cursor)
    assert latest == 1 and ch.count() == 0
    commit()

    # publisher: appends a batch, then a takedown republish drops two
    added = docs.where("doc_id % 3 = 1").limit(5)
    versioned_append(added, table)
    gone = [r.doc_id for r in v1_rows.limit(2).collect()]
    from projetbigdatastreaming_spark.sinks.versioned import read_version

    versioned_overwrite(
        read_version(spark, table).where(~F.col("doc_id").isin(gone)),
        table,
    )

    # subscriber wakes: ONE folded diff covering both publishes
    ch, latest, commit = consume_changes(spark, table, ["doc_id"], cursor)
    got = {(r.doc_id, r.change) for r in ch.collect()}
    added_ids = {r.doc_id for r in added.collect()}
    assert latest == 3
    assert got == {(i, "insert") for i in added_ids} | {
        (g, "delete") for g in gone
    }

    # crash before commit: identical replay (versions are immutable)
    ch2, _, commit2 = consume_changes(spark, table, ["doc_id"], cursor)
    assert {(r.doc_id, r.change) for r in ch2.collect()} == got
    commit2()
    ch3, _, _ = consume_changes(spark, table, ["doc_id"], cursor)
    assert ch3.count() == 0


def test_full_ingest_boundary_composed(spark, tmp_path):
    """The whole ingest boundary in one foreachBatch: quality gate,
    exact-dedup screen, fuzzy decontamination, drift metric, BM25
    score, near-dup fold, CMS fold, versioned publish of the admitted
    set — and a redelivered batch restates every table it touched."""
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

    def docs(rows):
        return spark.createDataFrame(
            [
                (i, t, "en", f"src{i % 2}", len(t))
                for i, t in rows
            ],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        )

    # 40 DISTINCT words: a repeated phrase collapses to ~8 distinct
    # shingles and a one-word edit then drops jaccard below 0.8
    bench_text = " ".join(f"benchword{i}" for i in range(40))
    benchmark = spark.createDataFrame(
        [(900, bench_text)], "doc_id long, text string"
    )
    build_benchmark_index(spark, benchmark, d("bench_idx"))
    reference = docs(
        [(500 + i, f"ref doc {i} " + "filler words here " * 6)
         for i in range(10)]
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
    )

    text_a = "completely original document about many topics " * 3
    text_b = "another unrelated body of text for the corpus " * 3
    text_c = "a third clean document with plenty of words " * 3
    contaminated = bench_text.replace("benchword7", "EDITED", 1)
    write(docs([(1, text_a), (2, text_b), (3, "short")]), 0)
    write(docs([(4, text_c), (5, text_a), (6, contaminated)]), 1)

    # admitted: 1,2 (batch 0; 3 failed the gate), 4 (batch 1; 5 is an
    # exact dup of 1, 6 near-duplicates the benchmark)
    latest = read_version(spark, d("published"))
    assert {r.doc_id for r in latest.collect()} == {1, 2, 4}

    # the record of WHY: quarantine holds 3, dups holds 5, contam 6
    quarantined = {
        r.doc_id for r in spark.read.parquet(d("quarantine")).collect()
    }
    assert 3 in quarantined
    dups = {r.doc_id for r in spark.read.parquet(d("dups")).collect()}
    assert dups == {5}
    contam = {
        r.doc_a for r in spark.read.parquet(d("contam")).collect()
    }
    assert contam == {6}

    # observability landed: drift metrics for both batches, bm25
    # scores for every gated doc
    from projetbigdatastreaming_spark.streaming.curation import (
        read_bm25_scores,
        read_drift_metrics,
    )

    m = read_drift_metrics(spark, d("drift_metrics"))
    assert {r.batch_id for r in m.collect()} == {0, 1}
    scored = {r.doc_id for r in read_bm25_scores(spark, d("bm25_scores")).collect()}
    assert scored == {1, 2, 4, 5, 6}

    # at-least-once: redeliver batch 1 — every table restates, the
    # published latest version still holds exactly {1, 2, 4}
    write(docs([(4, text_c), (5, text_a), (6, contaminated)]), 1)
    assert {
        r.doc_id for r in read_version(spark, d("published")).collect()
    } == {1, 2, 4}
    assert {
        r.doc_id for r in spark.read.parquet(d("dups")).collect()
    } == {5}
