"""Deterministic sampling tests."""

from __future__ import annotations

from pyspark.sql import Row

from projetbigdatastreaming_spark.operators import sampling


def _corpus(spark, n=500):
    return spark.createDataFrame(
        [Row(doc_id=i, lang=["en", "fr", "de"][i % 3]) for i in range(n)]
    )


def test_hash_sample_reproducible_across_partitionings(spark):
    df = _corpus(spark)
    s1 = sorted(r.doc_id for r in sampling.hash_sample(df, "doc_id", 10).collect())
    s2 = sorted(
        r.doc_id
        for r in sampling.hash_sample(df.repartition(17), "doc_id", 10).collect()
    )
    assert s1 == s2 and 0 < len(s1) < 500


def test_hash_sample_salts_draw_independent_samples(spark):
    df = _corpus(spark)
    a = {r.doc_id for r in sampling.hash_sample(df, "doc_id", 50, "s0").collect()}
    b = {r.doc_id for r in sampling.hash_sample(df, "doc_id", 50, "s1").collect()}
    assert a != b  # different salts -> different draws


def test_stratified_sample_exact_n_per_stratum(spark):
    df = _corpus(spark)
    out = sampling.stratified_sample(df, "lang", "doc_id", 7).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, set()).add(r.doc_id)
    assert {k: len(v) for k, v in by_lang.items()} == {
        "en": 7, "fr": 7, "de": 7
    }
    # reproducible under repartitioning too
    out2 = sampling.stratified_sample(df.repartition(13), "lang", "doc_id", 7).collect()
    assert sorted(r.doc_id for r in out) == sorted(r.doc_id for r in out2)


def test_leakage_safe_split_keeps_clusters_together(spark, sf_dir):
    """The GroupKFold property: every near-dup cluster's members land
    in ONE split under the leakage-safe assignment — and the per-doc
    hash split would have scattered at least one cluster (so the
    operator genuinely changes outcomes, not just relabels)."""
    from pyspark.sql import functions as F

    from projetbigdatastreaming_spark.catalog import load_table
    from projetbigdatastreaming_spark.operators import dedup, sampling
    from projetbigdatastreaming_spark.plans.llmdata import (
        JACCARD_THRESHOLD,
        SPLIT_TRAIN_PCT,
        SPLIT_VAL_PCT,
    )

    docs = load_table(spark, sf_dir, "documents")
    labels = dedup.duplicate_clusters(docs, JACCARD_THRESHOLD).select(
        "doc_id", "cluster_id"
    )

    def split_of(key_col):
        b = sampling._portable_hash(key_col, "sp0") % 100
        return (
            F.when(b < SPLIT_TRAIN_PCT, "train")
            .when(b < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, "val")
            .otherwise("test")
        )

    d = docs.join(labels, "doc_id", "left").select(
        "doc_id",
        "cluster_id",
        split_of(
            F.coalesce(F.col("cluster_id"), F.col("doc_id"))
        ).alias("safe_split"),
        split_of(F.col("doc_id")).alias("naive_split"),
    )
    per_cluster = (
        d.where(F.col("cluster_id").isNotNull())
        .groupBy("cluster_id")
        .agg(
            F.countDistinct("safe_split").alias("n_safe"),
            F.countDistinct("naive_split").alias("n_naive"),
        )
    )
    assert per_cluster.where("n_safe > 1").count() == 0
    # the fixture has at least one cluster the naive split scatters
    assert per_cluster.where("n_naive > 1").count() > 0
