"""Bucketed/partitioned table tests: the co-located-join and
partition-pruning plan shapes that matter at scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from projetbigdatastreaming_spark.catalog import load_table
from projetbigdatastreaming_spark.sinks import tables


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    tables.write_bucketed_table(li, "li_bucketed", "l_orderkey", 8)
    tables.write_bucketed_table(orders, "ord_bucketed", "l_orderkey", 8)
    yield
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")


def test_bucketed_join_has_no_shuffle(spark, warehouse):
    """Co-bucketed join must plan without any Exchange (the shuffle
    the bucketing paid for at write time)."""
    # disable auto-broadcast so the small fixture doesn't hide the
    # sort-merge path this test is about
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = tables.bucketed_join(
            spark, "li_bucketed", "ord_bucketed", "l_orderkey"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan.replace("BroadcastExchange", "")
        # and the result is right (every lineitem has its order)
        assert joined.count() == spark.table("li_bucketed").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_partitioned_table_prunes(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").withColumn(
        "d", F.to_date("ts")
    )
    tables.write_partitioned_table(ev, "events_part", ["d"])
    try:
        one_day = spark.table("events_part").where(
            F.col("d") == "2024-01-05"
        )
        plan = one_day._jdf.queryExecution().executedPlan().toString()
        # partition filter reaches the scan: no full-table read
        assert "PartitionFilters" in plan
        assert one_day.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS events_part")


def test_analyze_table_feeds_cbo_stats(spark, sf_dir):
    """ANALYZE TABLE lands row-count/size statistics in the catalog
    (the CBO's input for join reordering / broadcast decisions), and
    column-level stats appear for analyzed columns."""
    from projetbigdatastreaming_spark.catalog import load_table
    from projetbigdatastreaming_spark.sinks.tables import (
        analyze_table,
        table_stats,
    )

    load_table(spark, sf_dir, "nation").write.mode("overwrite").saveAsTable(
        "nation_stats_t"
    )
    assert table_stats(spark, "nation_stats_t") == {} or True  # pre-state
    analyze_table(spark, "nation_stats_t")
    stats = table_stats(spark, "nation_stats_t")
    assert "Statistics" in stats and "rows" in stats["Statistics"]
    analyze_table(spark, "nation_stats_t", ["n_nationkey", "n_name"])
    desc = spark.sql(
        "DESCRIBE EXTENDED nation_stats_t n_nationkey"
    ).collect()
    info = {r.info_name: r.info_value for r in desc}
    assert info.get("distinct_count") not in (None, "NULL")
    spark.sql("DROP TABLE nation_stats_t")


def test_dynamic_partition_pruning_fires(spark, sf_dir, tmp_path):
    """Date-partitioned fact + filtered dim join must plan a
    dynamicpruning subquery on the fact scan — at 100 TB this is the
    difference between scanning every date partition and only the
    dates the dim filter selects."""
    from pyspark.sql import functions as F

    from projetbigdatastreaming_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    fact_path = str(tmp_path / "fact_by_day")
    ev.write.mode("overwrite").partitionBy("day").parquet(fact_path)
    days = sorted(r.day for r in ev.select("day").distinct().collect())
    dim = spark.createDataFrame(
        [(d, i % 2) for i, d in enumerate(days)], "day date, flag int"
    )
    dim_path = str(tmp_path / "dim_days")
    dim.write.mode("overwrite").parquet(dim_path)

    fact = spark.read.parquet(fact_path)
    dimr = spark.read.parquet(dim_path).where(F.col("flag") == 1)
    joined = fact.join(dimr, "day").groupBy("day").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    # and the result is correct: only flagged days survive
    flagged = {d for i, d in enumerate(days) if i % 2 == 1}
    got = {r.day for r in joined.collect()}
    assert got == flagged


def test_runtime_bloom_filter_join_fires(spark, sf_dir):
    """Runtime row-level bloom filtering (the DPP sibling for
    unpartitioned keys): a selective dim filter must inject a
    might_contain(bloomfilter(...)) predicate into the fact scan side
    of a shuffle join, pruning shuffle input before it moves.  Local
    fixtures sit under the default 10GB application-side threshold, so
    the test scopes the thresholds down — on a real cluster the
    defaults fire on exactly the 100 TB shapes that need it."""
    from pyspark.sql import functions as F

    from projetbigdatastreaming_spark.catalog import load_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").where(
            F.col("o_totalprice") > 400000
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan.lower()
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
