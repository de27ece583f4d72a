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
