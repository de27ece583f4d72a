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
