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
