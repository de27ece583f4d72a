"""As-of / range / salted join operator tests."""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from projetbigdatastreaming_spark.catalog import load_table
from projetbigdatastreaming_spark.operators import joins


def _t(m, s=0):
    return datetime.datetime(2024, 1, 1, 10, m, s)


def test_asof_join_strict_and_inclusive(spark):
    trades = spark.createDataFrame(
        [Row(sym="A", t_ts=_t(5), qty=1), Row(sym="A", t_ts=_t(10), qty=2),
         Row(sym="B", t_ts=_t(5), qty=3)]
    )
    quotes = spark.createDataFrame(
        [Row(sym="A", q_ts=_t(4), px=100.0), Row(sym="A", q_ts=_t(5), px=101.0),
         Row(sym="A", q_ts=_t(9), px=102.0), Row(sym="B", q_ts=_t(6), px=50.0)]
    )
    strict = {
        (r.sym, r.t_ts): r.asof_px
        for r in joins.asof_join(
            trades, quotes, "sym", "t_ts", "q_ts", ["px"], strict=True
        ).collect()
    }
    # strict: the 10:05 quote is NOT visible to the 10:05 trade
    assert strict[("A", _t(5))] == 100.0
    assert strict[("A", _t(10))] == 102.0
    assert strict[("B", _t(5))] is None  # no earlier quote

    inclusive = {
        (r.sym, r.t_ts): r.asof_px
        for r in joins.asof_join(
            trades, quotes, "sym", "t_ts", "q_ts", ["px"], strict=False
        ).collect()
    }
    assert inclusive[("A", _t(5))] == 101.0  # same-instant quote visible


def test_asof_self_join_never_matches_self(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").limit(500)
    out = joins.asof_join(
        events, events, "user_id", "ts", "ts", ["event_id"], strict=True
    )
    bad = out.where(F.col("asof_event_id") == F.col("event_id")).count()
    assert bad == 0
    assert out.count() == 500  # left-join semantics: every left row kept


def test_range_join_matches_theta_join(spark, sf_dir):
    """Bucketized range join must equal the naive theta-join."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    right = ev.withColumnRenamed("event_id", "event_b").withColumnRenamed(
        "ts", "ts_b"
    )
    fast = joins.bucketed_range_join(
        ev, right, "user_id", "ts", "ts_b", max_gap_seconds=300
    ).where(F.col("event_id") < F.col("event_b"))
    slow = (
        ev.alias("a")
        .join(
            right.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_id") < F.col("b.event_b"))
            & (
                F.abs(
                    F.unix_timestamp("a.ts") - F.unix_timestamp("b.ts_b")
                )
                <= 300
            ),
        )
    )
    fast_pairs = {(r.event_id, r.event_b) for r in fast.collect()}
    slow_pairs = {(r.event_id, r.event_b) for r in slow.collect()}
    assert fast_pairs == slow_pairs
    assert fast_pairs  # nonempty at sf0.001


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    salted = (
        joins.salted_join(li, orders, "l_orderkey")
        .groupBy("o_orderpriority")
        .count()
    )
    plain = li.join(orders, "l_orderkey").groupBy("o_orderpriority").count()
    assert {tuple(r) for r in salted.collect()} == {
        tuple(r) for r in plain.collect()
    }


def test_approx_distinct_within_tolerance(spark, sf_dir):
    # exercises the de-registered q_approx_distinct directly (its
    # driver signal lives in approx_distinct_check; the accuracy
    # contract is pinned here, per its docstring)
    from projetbigdatastreaming_spark.plans.advanced import (
        q_approx_distinct,
    )

    events = load_table(spark, sf_dir, "events")
    approx = {
        r.event_type: r.approx_users
        for r in q_approx_distinct(spark, sf_dir).collect()
    }
    exact = {
        r.event_type: r.e
        for r in events.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("e"))
        .collect()
    }
    for et, e in exact.items():
        assert abs(approx[et] - e) / e <= 0.05


def test_salted_hotkeys_routes_and_matches_plain(spark, sf_dir):
    """Hot-key salted join equals the plain join row-for-row, the hot
    list is genuinely small, and both branches carry rows (the route
    predicate actually splits)."""
    from pyspark.sql import functions as F

    from projetbigdatastreaming_spark.catalog import load_table
    from projetbigdatastreaming_spark.operators.joins import (
        salted_join_hotkeys,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey"), "l_quantity"
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand"
    )
    threshold = 30
    counts = li.groupBy("p_partkey").count()
    n_hot = counts.where(F.col("count") > threshold).count()
    n_keys = counts.count()
    assert 0 < n_hot < n_keys  # both branches exercised

    got = salted_join_hotkeys(li, part, "p_partkey", threshold)
    plain = li.join(part, "p_partkey")
    assert got.count() == plain.count()
    assert (
        got.exceptAll(plain).count() == 0
        and plain.exceptAll(got).count() == 0
    )
