"""Skew resilience pinned in DATA, not prose (VERDICT r08 item 5).

SCALING.md leans on "AQE skew-join splits" for the LSH band join on
boilerplate-heavy corpora: this suite builds a deliberately skewed
fixture (one boilerplate band key holding ~30% of the docs), runs the
ACTUAL band join with skew thresholds scaled down to test size, and
asserts the executed adaptive plan shows the skew split
(``skew=true`` on the sort-merge join AQE rewrites).  The thresholds
are the only thing scaled: the default 256 MB skewed-partition bar is
sized for cluster shuffles, so at test bytes the same physics is
reproduced by lowering the bar, not by faking the plan.

Also pins `salted_join`'s contract on the same skewed data: the
deterministic salt changes WHICH reducer handles a row, never the
join result.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

#: (conf, test-scale value) — saved/restored around each test
_SKEW_CONFS = {
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # a partition is "skewed" past factor x median AND the byte bar;
    # scale both to the fixture (defaults: 5.0 / 256MB)
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2KB",
    # the band join must be a shuffle join for skew-split to apply
    # (broadcast joins have no skewed shuffle partition to split)
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    # coalescing can re-merge the split partitions in the report;
    # keep the split visible
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
    # enough reducers that ONE hot band bucket dominates its
    # partition instead of hiding behind uniform background load
    "spark.sql.shuffle.partitions": "64",
}


@pytest.fixture
def skew_confs(spark):
    saved = {}
    for k, v in _SKEW_CONFS.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    yield
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _skewed_signed(spark, n=6000, hot_frac=0.3):
    """A signed relation where ~hot_frac of the docs share their first
    ROWS_PER_BAND minhashes — so band 0's bucket holds 30% of the
    corpus — while every other sig position is distinct per doc.

    This is the realistic boilerplate shape: IDENTICAL docs spread
    their collisions evenly over all N_BANDS band keys (no partition
    is hot relative to the median — measured while writing this test),
    but PARTIALLY-similar docs (shared template, varying fill) collide
    in a subset of bands, concentrating one band bucket.  That hot
    bucket is what lands on one reducer of the band join's hash
    exchange."""
    nb = int(n * hot_frac)
    sig_expr = f"""transform(sequence(0, 63), i ->
      CASE WHEN doc_id < {nb} AND i < 4 THEN CAST(i AS BIGINT)
           ELSE xxhash64(doc_id * 64 + i) END)"""
    return (
        spark.range(n)
        .selectExpr("id AS doc_id")
        .selectExpr("doc_id", f"{sig_expr} AS sig")
    )


def test_lsh_band_join_skew_split_fires(spark, skew_confs):
    """The ACTUAL band self-join (`lsh_candidate_pairs`) on a corpus
    whose hottest band bucket holds 30% of the docs completes AND the
    executed adaptive plan carries the skew split on BOTH sides — the
    runtime behavior SCALING.md's LSH scale story relies on."""
    from projetbigdatastreaming_spark.operators.dedup import (
        lsh_candidate_pairs,
    )

    n, nb = 6000, 1800
    pairs = lsh_candidate_pairs(_skewed_signed(spark, n, 0.3))
    # aggregate on the SAME DataFrame lineage so this query execution
    # finalizes ITS adaptive plan (a bare .count() spawns a separate
    # execution and leaves this one unfinalized)
    res = pairs.groupBy().count()
    [row] = res.collect()
    # the hot bucket alone contributes C(1800, 2) candidate pairs
    assert row["count"] >= nb * (nb - 1) // 2

    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, plan[:500]
    # round 15: the session's AQE SMJ→SHJ local-map rewrite may turn
    # the skew-split join into a shuffled-hash join (same skew split,
    # sort of both sides skipped) — accept either skew=true form
    assert (
        "SortMergeJoin(skew=true)" in plan
        or "ShuffledHashJoin(skew=true)" in plan
    ), plan[:2000]
    # both sides of the self-join split (the exchange is reused)
    assert plan.count("AQEShuffleRead skewed") >= 2, plan[:2000]


def test_salted_join_identical_on_skewed_key(spark, skew_confs):
    """salted_join == plain join on a fixture where one key holds 30%
    of the fact rows — the deterministic-salt contract, checked on
    data that would actually need it."""
    from projetbigdatastreaming_spark.operators.joins import salted_join

    fact = spark.createDataFrame(
        [(i, i % 40 if i % 10 else 7, float(i)) for i in range(4000)],
        "row_id long, k long, v double",
    )  # key 7 holds ~12% directly + every 10th row -> hot
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(40)], "k long, name string"
    )
    plain = {
        tuple(r)
        for r in fact.join(dim, "k").select(
            "row_id", "k", "v", "name"
        ).collect()
    }
    salted = {
        tuple(r)
        for r in salted_join(fact, dim, "k").select(
            "row_id", "k", "v", "name"
        ).collect()
    }
    assert salted == plain
