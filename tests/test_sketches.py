"""Invariant tests for the mergeable-sketch operators (plans/sketches):
properties guaranteed by the sketch algorithms themselves, independent
of fixture values — complementing the DuckDB oracle's value check."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entry
from projetbigdatastreaming_spark.catalog import load_table
from projetbigdatastreaming_spark.plans.sketches import (
    CMS_TOPK,
    q_heavy_hitters_cms,
    q_hll_rollup_union,
)


def test_cms_never_undercounts(spark, sf_dir):
    """The count-min one-sided error guarantee: est >= exact, always."""
    rows = q_heavy_hitters_cms(spark, sf_dir).collect()
    assert 0 < len(rows) <= CMS_TOPK
    for r in rows:
        assert r.no_undercount
        assert r.est_cnt >= r.exact_cnt


def test_cms_overcount_bounded_by_collision_mass(spark, sf_dir):
    """est - exact can only come from colliding keys, so it is bounded
    by the total row count minus the key's own count (loose but
    data-independent)."""
    n = load_table(spark, sf_dir, "events").count()
    for r in q_heavy_hitters_cms(spark, sf_dir).collect():
        assert r.est_cnt - r.exact_cnt <= n - r.exact_cnt


def test_hll_union_matches_direct_sketch(spark, sf_dir):
    """Mergeability: unioning daily sketches must estimate within
    tolerance of the exact all-time distinct (the query's own flag),
    and the number of daily sketches merged must equal the number of
    distinct (event_type, day) pairs."""
    rows = q_hll_rollup_union(spark, sf_dir).collect()
    assert rows
    ev = load_table(spark, sf_dir, "events")
    days = (
        ev.select("event_type", F.to_date("ts").alias("day"))
        .distinct()
        .groupBy("event_type")
        .count()
        .collect()
    )
    expected = {r.event_type: r["count"] for r in days}
    for r in rows:
        assert r.within_tol
        assert r.n_daily_sketches == expected[r.event_type]


def test_sketch_queries_registered_with_oracles():
    q = entry.queries()
    o = entry.oracle_sql()
    for name in ("heavy_hitters_cms", "hll_rollup_union"):
        assert name in q and name in o


def test_bottomk_merge_equals_direct(spark, sf_dir):
    """The mergeable path (daily bottom-k → merge) must yield the
    exact same sample as a direct global bottom-k — the defining
    bottom-k sketch property."""
    from pyspark.sql.window import Window

    from projetbigdatastreaming_spark.operators.sampling import (
        _portable_hash,
    )
    from projetbigdatastreaming_spark.plans.sketches import (
        BK_K,
        q_sample_bottomk_mergeable,
    )

    got = [
        (r.event_type, r.rank, r.user_id)
        for r in q_sample_bottomk_mergeable(spark, sf_dir).collect()
    ]
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
    )
    h = _portable_hash(F.col("user_id"), "bk0")
    direct = (
        ev.withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy(
                    h.asc(), F.col("user_id").asc()
                )
            ),
        )
        .where(F.col("rank") <= BK_K)
        .orderBy("event_type", "rank")
        .collect()
    )
    want = [(r.event_type, r.rank, r.user_id) for r in direct]
    assert got == want


def test_bloom_probe_no_false_negatives(spark, sf_dir):
    """Bloom guarantee: every exact duplicate is a bloom hit (no false
    negatives, ever); false positives are allowed but bounded sane at
    this fill factor; bitmap state is <= BLOOM_BITS/32 words."""
    import __spark_entry__ as entry
    from projetbigdatastreaming_spark.plans.sketches import BLOOM_BITS

    rows = entry.queries()["dedup_bloom"](spark, sf_dir).collect()
    assert rows, "incoming batch must be non-empty"
    for r in rows:
        assert r.bloom_hit >= r.exact_dup, r  # no false negatives
    fp_rate = sum(
        1 for r in rows if r.bloom_hit == 1 and r.exact_dup == 0
    ) / len(rows)
    # 4 hashes, <=4*|corpus| set bits in 65536 -> fp rate far below 50%
    assert fp_rate < 0.5, fp_rate


def test_kmv_exact_when_under_k_and_sane_when_over(spark, sf_dir):
    """KMV contract: types with fewer distinct users than k estimate
    EXACTLY (the sample is the distinct set); types above k stay
    within tolerance (asserted by the query itself)."""
    import __spark_entry__ as entry
    from projetbigdatastreaming_spark.plans.sketches import KMV_K

    rows = entry.queries()["kmv_distinct"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.exact_users < KMV_K:
            assert r.est_users == r.exact_users, r
        assert r.within_tol, r
        assert r.est_users > 0


def test_train_split_partitions_every_source(spark, sf_dir):
    """Split contract: per source the split sizes sum to the source's
    doc count (coverage + disjointness at the aggregate grain) and
    proportions are hash-uniform-ish (train is the large split)."""
    import __spark_entry__ as entry
    from projetbigdatastreaming_spark.catalog import load_table
    from pyspark.sql import functions as F

    rows = entry.queries()["train_split"](spark, sf_dir).collect()
    per_source = {}
    for r in rows:
        per_source.setdefault(r.source, {})[r.split] = r.n_docs
    totals = {
        r.source: r.n
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(per_source) == set(totals)
    for src, splits in per_source.items():
        assert sum(splits.values()) == totals[src], src
    n_train = sum(s.get("train", 0) for s in per_source.values())
    n_all = sum(totals.values())
    assert 0.7 <= n_train / n_all <= 0.9  # hash-uniform around 80%
