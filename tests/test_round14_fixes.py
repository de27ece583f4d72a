"""Round-14 optimization-round pins.

Covers the new deterministic-bucket two-level window operators
(`running_max_two_level`, `consecutive_pairs_two_level`) that replace
the range-sample + localCheckpoint machinery for aggregate-only
consumers, and the basket_lift integer-encoding rewrite — each pinned
against the plain global-window / string-keyed reference form so the
optimization cannot drift the results.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from projetbigdatastreaming_spark.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return [tuple(r) for r in df.collect()]


# ---------------------------------------------------------------------------
# running_max_two_level
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("bucket_expr", ["sec DIV 3600", "sec DIV 86400"])
def test_running_max_two_level_matches_global_window(spark, bucket_expr):
    """Per-group max running sum under hour/day buckets equals the
    plain per-group window's max — bucket-width invariance is the
    operator's correctness identity."""
    from projetbigdatastreaming_spark.operators.windows import (
        running_max_two_level,
    )

    ev = load_table(spark, SF_DIR, "events").select(
        "event_type",
        F.unix_timestamp("ts").alias("sec"),
        "event_id",
        F.when(F.col("event_id") % 2 == 0, F.lit(1))
        .otherwise(F.lit(-1))
        .alias("delta"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = _rows(
        ev.withColumn("rs", F.sum("delta").over(w))
        .groupBy("event_type")
        .agg(
            F.max("rs").alias("max_running"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("event_type")
    )
    got = _rows(
        running_max_two_level(
            ev,
            ["sec", "event_id"],
            "delta",
            bucket_col=F.expr(bucket_expr),
            partition_cols=["event_type"],
        ).orderBy("event_type")
    )
    assert got == want and len(want) > 0


def test_running_max_two_level_no_checkpoint_no_global_window(spark):
    """The fused plan has no LogicalRDD (no checkpoint pin needed
    under deterministic buckets) and every row-level window is
    partitioned."""
    from projetbigdatastreaming_spark.operators.windows import (
        running_max_two_level,
    )

    ev = load_table(spark, SF_DIR, "events").select(
        "event_type",
        F.unix_timestamp("ts").alias("sec"),
        "event_id",
        F.lit(1).alias("delta"),
    )
    out = running_max_two_level(
        ev,
        ["sec", "event_id"],
        "delta",
        bucket_col=F.expr("sec DIV 3600"),
        partition_cols=["event_type"],
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" not in plan  # no checkpoint materialization
    for frag in plan.split("Window [")[1:]:
        head = frag.split("\n")[0]
        assert ", [], [" not in head, f"unpartitioned Window: {head}"


# ---------------------------------------------------------------------------
# consecutive_pairs_two_level
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("bucket_expr", ["sec DIV 3600", "sec DIV 86400"])
def test_consecutive_pairs_two_level_matches_plain_lead(
    spark, bucket_expr
):
    """The fused pair relation equals the plain per-group lead with
    the per-group last row dropped — for two bucket widths."""
    from projetbigdatastreaming_spark.operators.windows import (
        consecutive_pairs_two_level,
    )

    ev = load_table(spark, SF_DIR, "events").select(
        "event_type",
        F.unix_timestamp("ts").alias("sec"),
        "event_id",
    )
    w = Window.partitionBy("event_type").orderBy("sec", "event_id")
    key = F.struct(F.col("sec").alias("sec"), F.col("event_id").alias("event_id"))
    want = sorted(
        _rows(
            ev.withColumn("__next", F.lead(key).over(w))
            .where(F.col("__next").isNotNull())
            .select("event_type", "sec", "event_id", "__next.sec", "__next.event_id")
        )
    )
    got = sorted(
        _rows(
            consecutive_pairs_two_level(
                ev,
                ["sec", "event_id"],
                bucket_col=F.expr(bucket_expr),
                partition_cols=["event_type"],
            ).select(
                "event_type", "sec", "event_id", "__next.sec", "__next.event_id"
            )
        )
    )
    assert got == want and len(want) > 0


def test_consecutive_pairs_two_level_no_checkpoint(spark):
    from projetbigdatastreaming_spark.operators.windows import (
        consecutive_pairs_two_level,
    )

    ev = load_table(spark, SF_DIR, "events").select(
        "event_type", F.unix_timestamp("ts").alias("sec"), "event_id"
    )
    out = consecutive_pairs_two_level(
        ev,
        ["sec", "event_id"],
        bucket_col=F.expr("sec DIV 3600"),
        partition_cols=["event_type"],
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" not in plan
    for frag in plan.split("Window [")[1:]:
        head = frag.split("\n")[0]
        assert ", [], [" not in head, f"unpartitioned Window: {head}"


# ---------------------------------------------------------------------------
# basket_lift integer-encoding rewrite
# ---------------------------------------------------------------------------


def test_basket_lift_matches_string_reference(spark):
    """The int-encoded tally form equals the r10 string-keyed
    reference (collect_set of brand strings, struct pair explode,
    string-keyed item counts) row for row, including the
    least/greatest lexicographic pair orientation."""
    from projetbigdatastreaming_spark.plans.advanced import (
        _BASKET_MIN_SUPPORT,
        _BASKET_TOPN,
        q_basket_lift,
    )

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    part = load_table(spark, SF_DIR, "part").select(
        "p_partkey", "p_brand"
    )
    baskets = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("p_brand")).alias("bs"))
    )
    n_orders = baskets.agg(F.count("*").cast("long").alias("n_orders"))
    item = (
        baskets.select(F.explode("bs").alias("brand"))
        .groupBy("brand")
        .agg(F.count("*").cast("long").alias("item_n"))
    )
    pair = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(bs, (x, i) ->"
                    " transform(slice(bs, i + 2, size(bs)),"
                    " y -> struct(x AS brand_a, y AS brand_b))))"
                )
            ).alias("p")
        )
        .groupBy(
            F.col("p.brand_a").alias("brand_a"),
            F.col("p.brand_b").alias("brand_b"),
        )
        .agg(F.count("*").cast("long").alias("support"))
        .where(F.col("support") >= _BASKET_MIN_SUPPORT)
    )
    want = _rows(
        pair.join(
            F.broadcast(
                item.withColumnRenamed("brand", "brand_a")
                .withColumnRenamed("item_n", "n_a")
            ),
            "brand_a",
        )
        .join(
            F.broadcast(
                item.withColumnRenamed("brand", "brand_b")
                .withColumnRenamed("item_n", "n_b")
            ),
            "brand_b",
        )
        .crossJoin(F.broadcast(n_orders))
        .selectExpr(
            "brand_a",
            "brand_b",
            "support",
            "CAST(floor(support / CAST(n_a AS DOUBLE) * 1e6 + 0.5)"
            " AS DOUBLE) / 1e6 AS confidence",
            "CAST(floor(support * n_orders"
            " / CAST(n_a * n_b AS DOUBLE) * 1e6 + 0.5)"
            " AS DOUBLE) / 1e6 AS lift",
        )
        .orderBy(F.desc("lift"), F.asc("brand_a"), F.asc("brand_b"))
        .limit(_BASKET_TOPN)
    )
    got = _rows(q_basket_lift(spark, SF_DIR))
    assert got == want and len(want) > 0
