"""`choose_join_strategy` (VERDICT r11 item 6): `join_skew_profile`
computes the decision inputs; the chooser turns a profile row into
plain / broadcast / AQE-skew / salted — the look-at-the-data step the
reference performed by hand (SparkBigData.scala:21,28 crossJoin gate)
made an operator with documented thresholds.

Unit tests pin each branch on constructed geometries (the thresholds
are scale numbers — 100 TB geometries don't exist in the fixtures);
the integration tests run the REAL `key_skew_profile` plan: the toy
fixtures' near-uniform keys must choose plain at honest thresholds,
and the `join_salted_hotkeys` fixture geometry (one dominant key)
must choose salted once the absolute floors are scaled to the toy
row count.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from projetbigdatastreaming_spark.catalog import load_table
from projetbigdatastreaming_spark.operators.joins import (
    choose_join_strategy,
    key_skew_profile,
)


def _profile(**kw) -> dict:
    base = {
        "key_name": "t.k",
        "n_keys": 1_000_000,
        "n_rows": 60_000_000,
        "max_freq": 10,
        "p50_freq": 5,
        "p99_freq": 9,
        "top1_share_ppm": 0,
        "skew_ratio": 2.0,
    }
    base.update(kw)
    return base


def test_broadcast_wins_when_dim_is_small():
    # a monster key on the fact side is irrelevant if the dim
    # broadcasts — no shuffle happens at all
    p = _profile(max_freq=6_000_000, p99_freq=40)
    assert choose_join_strategy(p, dim_rows=200_000) == "broadcast"


def test_uniform_keys_choose_plain():
    # the l_orderkey geometry scaled to sf10: max multiplicity 13 on
    # 60 M rows — nothing exceeds any task budget
    p = _profile(max_freq=13, p50_freq=4, p99_freq=9)
    assert choose_join_strategy(p, dim_rows=15_000_000) == "plain"


def test_single_monster_key_chooses_salted():
    # the join_salted_hotkeys fixture geometry at scale: one key
    # holding 10% of a 60 M-row fact (p99 of the other keys is 40) —
    # monster_ratio and salt_share_ppm both fire
    p = _profile(max_freq=6_000_000, p50_freq=20, p99_freq=40)
    assert choose_join_strategy(p) == "salted"


def test_broad_hot_tail_chooses_aqe_skew():
    # many moderately-hot keys, no monster: max is only 1.25x the p99
    # key and under 5% of rows — AQE's runtime split beats salting
    # (zero dim replication)
    p = _profile(max_freq=2_500_000, p50_freq=100, p99_freq=2_000_000)
    assert choose_join_strategy(p) == "aqe_skew"


def test_absolute_floor_blocks_mitigation_at_small_rows():
    # ratio-wise extreme (1000x median) but only 50k rows in the
    # hottest key: below skew_min_rows every mitigation is overhead
    p = _profile(
        n_rows=2_000_000, max_freq=50_000, p50_freq=50, p99_freq=500
    )
    assert choose_join_strategy(p) == "plain"


def test_real_profile_toy_scale_chooses_plain(spark, sf_dir):
    """The committed fixtures' join keys are near-uniform; at honest
    (unscaled) thresholds the chooser must not over-trigger."""
    li = load_table(spark, sf_dir, "lineitem")
    row = key_skew_profile(li, "l_orderkey", "lineitem.l_orderkey").first()
    assert choose_join_strategy(row, shuffle_partitions=32) == "plain"


def test_real_hotkey_geometry_chooses_salted(spark, sf_dir):
    """Route 30% of lineitem onto ONE part key — the geometry
    `salted_join_hotkeys` exists for — profile it with the real plan,
    and scale the absolute floors to the toy row count: the chooser
    must pick salted, and the same thresholds on the unmodified
    column must still pick plain."""
    li = load_table(spark, sf_dir, "lineitem")
    hot = li.withColumn(
        "k",
        F.when(F.col("l_linenumber") <= 2, F.lit(1)).otherwise(
            F.col("l_partkey")
        ),
    )
    row = key_skew_profile(hot, "k", "hot.k").first()
    scaled = dict(
        shuffle_partitions=32, skew_min_rows=100, skew_factor=1.0
    )
    assert choose_join_strategy(row, **scaled) == "salted"
    uniform = key_skew_profile(li, "l_orderkey", "li.l_orderkey").first()
    assert choose_join_strategy(uniform, **scaled) == "plain"


def test_strategy_advice_column_matches_python_chooser(spark, sf_dir):
    """The query's CASE column, the DuckDB oracle text, and the
    Python chooser are three renderings of ONE decision — pin the
    Spark column equal to choose_join_strategy on every profiled
    row (same default thresholds, no dim_rows)."""
    from projetbigdatastreaming_spark.plans.advanced import (
        q_join_strategy_advice,
    )

    for row in q_join_strategy_advice(spark, sf_dir).collect():
        assert row.strategy == choose_join_strategy(row), row


def test_case_expr_matches_chooser_under_degenerate_thresholds(spark):
    """ADVICE r12: the SQL CASE now renders the same GREATEST(1.0, …)
    per-task clamp as the Python chooser, so the two stay literally
    equivalent even where n_rows < shuffle_partitions and the floor
    is set below one row (unreachable at module defaults)."""
    from projetbigdatastreaming_spark.operators.joins import (
        strategy_case_expr,
    )

    # n_rows=10 with 200 partitions: unclamped per_task = 0.05, so a
    # max_freq of 1 would read as "skewed" without the clamp once the
    # floor is degenerate.  The Python chooser clamps to 1.0 → plain.
    profiles = [
        # (n_rows, max_freq, p99_freq, top1_share_ppm)
        (10, 1, 1, 100_000),
        (10, 2, 1, 200_000),
        (150, 3, 1, 20_000),
        (1_000_000, 900_000, 10, 900_000),
    ]
    df = spark.createDataFrame(
        profiles, "n_rows long, max_freq long, p99_freq long,"
        " top1_share_ppm long"
    )
    got = {
        (r.n_rows, r.max_freq): r.strategy
        for r in df.selectExpr(
            "*", f"{strategy_case_expr()} AS strategy"
        ).collect()
    }
    for n_rows, max_freq, p99, ppm in profiles:
        want = choose_join_strategy(
            {
                "n_rows": n_rows,
                "max_freq": max_freq,
                "p99_freq": p99,
                "top1_share_ppm": ppm,
            },
            skew_min_rows=0,  # degenerate floor: the clamp decides
        )
        got_sql = {
            (r.n_rows, r.max_freq): r.strategy
            for r in df.selectExpr(
                "*",
                "CASE WHEN max_freq <= GREATEST(0.0, 4.0 *"
                " GREATEST(1.0, CAST(n_rows AS DOUBLE) / 200.0))"
                " THEN 'plain'"
                " WHEN max_freq >= 10.0 * GREATEST(1, p99_freq)"
                " OR top1_share_ppm >= 50000 THEN 'salted'"
                " ELSE 'aqe_skew' END AS strategy",
            ).collect()
        }
        assert got_sql[(n_rows, max_freq)] == want, (n_rows, max_freq)
    # and at module defaults the shipped expression still agrees
    for n_rows, max_freq, p99, ppm in profiles:
        want_default = choose_join_strategy(
            {
                "n_rows": n_rows,
                "max_freq": max_freq,
                "p99_freq": p99,
                "top1_share_ppm": ppm,
            }
        )
        assert got[(n_rows, max_freq)] == want_default, (n_rows, max_freq)
