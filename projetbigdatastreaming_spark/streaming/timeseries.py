"""Streaming OHLC bars — the mergeable-partial-aggregate pattern
lifted across micro-batches.

The batch query `plans/timeseries.q_ohlc_bars` computes daily candles
(open/high/low/close + count + exact-cents volume) in one pass.  Its
streaming twin cannot wait for a day to close before emitting, and a
foreachBatch sink must stay replay-safe — so each micro-batch reduces
to PARTIAL candles per (event_type, day) carrying enough state to
merge: the open/close VALUES plus their (ts, event_id) keys.  OHLC is
a classic mergeable aggregate (exactly what Spark's map-side combine
does within a query, made explicit across batches):

    merge(a, b).open  = the open whose first_key is smaller
    merge(a, b).close = the close whose last_key is larger
    high/low/n/volume = max/min/sum — plain semigroup folds

Replay contract: the writer restates its OWN ``batch_id`` partition
(dynamic partition overwrite, the module-wide rule), so at-least-once
redelivery rewrites rather than double-counts; the reader's fold over
all partitions equals the one-pass batch query over the union of the
ingested batches EXACTLY — pinned by test against `q_ohlc_bars`.

Scale: per batch one map-side-combined hash-agg to ≤|types|·|days|
rows; the reader folds a bounded-width state relation (one row per
(type, day, batch)) with a single hash-agg — the raw events never
land in state.  Determinism: (ts, event_id) is a total order, so
min_by/max_by never tie; volume is BIGINT cents.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks.files import overwrite_partitions

#: partial-candle state schema (read with an explicit schema so an
#: empty dir folds to an empty frame instead of erroring)
OHLC_STATE_SCHEMA = (
    "event_type string, day date,"
    " first_key struct<ts: timestamp_ntz, event_id: bigint>,"
    " open double,"
    " last_key struct<ts: timestamp_ntz, event_id: bigint>,"
    " close double, high double, low double,"
    " n_events bigint, volume_cents bigint, batch_id int"
)


def ohlc_partials(batch_df: DataFrame) -> DataFrame:
    """Reduce raw events to mergeable partial candles per
    (event_type, day) — shared by the writer and any ad-hoc caller."""
    key = F.struct(
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        F.col("event_id").alias("event_id"),
    )
    return (
        batch_df.select(
            "event_type",
            F.to_date("ts").alias("day"),
            "value",
            key.alias("k"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(
            F.min("k").alias("first_key"),
            F.expr("min_by(value, k)").alias("open"),
            F.max("k").alias("last_key"),
            F.expr("max_by(value, k)").alias("close"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.count("*").cast("bigint").alias("n_events"),
            F.sum("cents").cast("bigint").alias("volume_cents"),
        )
    )


def ohlc_batch_writer(
    state_dir: str,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch sink: restate this batch's partial candles under
    its own batch_id partition (replay-safe restatement)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        partials = ohlc_partials(batch_df).withColumn(
            "batch_id", F.lit(int(batch_id))
        )
        overwrite_partitions(partials, state_dir, ["batch_id"])

    return write


#: daily-cents partial schema for the CUSUM monitor state
CUSUM_STATE_SCHEMA = (
    "event_type string, day date, cents bigint, batch_id int"
)


def cusum_batch_writer(
    state_dir: str,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch sink for the level-shift monitor: reduce the batch
    to per-(event_type, day) cents partials and restate its own
    batch_id partition.  Daily sums are ADDITIVE across batches (like
    the histogram/CMS families), so replay safety comes from the
    restatement, and the reader's fold equals the one-pass daily
    relation exactly."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        partials = (
            batch_df.select(
                "event_type",
                F.to_date("ts").alias("day"),
                F.floor(F.col("value") * 100 + F.lit(0.5))
                .cast("bigint")
                .alias("cents"),
            )
            .groupBy("event_type", "day")
            .agg(F.sum("cents").cast("bigint").alias("cents"))
            .withColumn("batch_id", F.lit(int(batch_id)))
        )
        overwrite_partitions(partials, state_dir, ["batch_id"])

    return write


def read_cusum(spark: SparkSession, state_dir: str) -> DataFrame:
    """Fold the daily partials and run the CUSUM prefix identity over
    them — column-identical to `plans/timeseries.q_cusum_changepoints`
    over the union of the ingested batches (pinned by test).  The
    level-shift alarm stays queryable while the stream runs, the
    sequential companion to the drift monitor's distributional PSI."""
    from pyspark.sql import Window

    from ..plans.timeseries import (
        CUSUM_THETA_DEN,
        CUSUM_THETA_NUM,
    )

    daily = (
        spark.read.schema(CUSUM_STATE_SCHEMA)
        .parquet(state_dir)
        .groupBy("event_type", "day")
        .agg(F.sum("cents").cast("bigint").alias("cents"))
    )
    stats = daily.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("total"),
    )
    w_p = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    p = (
        daily.join(F.broadcast(stats), "event_type")
        .withColumn("dev", F.col("cents") * F.col("n") - F.col("total"))
        .withColumn("pfx", F.sum("dev").over(w_p))
        .withColumn("pmin", F.min("pfx").over(w_p))
    )
    s = "(pfx - LEAST(pmin, 0))"
    return p.selectExpr(
        "event_type",
        "day",
        f"CAST(FLOOR(({s} / (n * 100.0)) * 1e6 + 0.5) AS DOUBLE) / 1e6"
        " AS cusum_dollars",
        f"{CUSUM_THETA_DEN} * {s} > {CUSUM_THETA_NUM} * n * total"
        " AS is_shift",
    ).orderBy("event_type", "day")


def read_ohlc(spark: SparkSession, state_dir: str) -> DataFrame:
    """Fold every batch's partial candles into the corpus-so-far daily
    bars — column-identical to `plans/timeseries.q_ohlc_bars` over the
    union of the ingested batches (pinned by test)."""
    st = spark.read.schema(OHLC_STATE_SCHEMA).parquet(state_dir)
    return (
        st.groupBy("event_type", "day")
        .agg(
            F.expr("min_by(open, first_key)").alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.expr("max_by(close, last_key)").alias("close"),
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("volume_cents").cast("bigint").alias("volume_cents"),
        )
        .select(
            "event_type",
            "day",
            "open",
            "high",
            "low",
            "close",
            "n_events",
            "volume_cents",
        )
        .orderBy("event_type", "day")
    )


#: OLS sufficient-statistics state schema (additive sums; syy rides
#: DECIMAL to survive Σcents² past int64 — same bound analysis as the
#: batch query's docstring)
OLS_STATE_SCHEMA = (
    "l_returnflag string, n bigint, sx1 bigint, sx2 bigint, sy bigint,"
    " s11 bigint, s12 bigint, s22 bigint, s1y bigint, s2y bigint,"
    " syy decimal(38,0), batch_id int"
)


def ols_partials_writer(
    state_dir: str,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch sink for the streaming regression: reduce the
    batch of lineitem-shaped rows to the ten exact sufficient
    statistics per return flag and restate this batch's partition.

    Sums are ADDITIVE across batches, so the fold in `read_ols` equals
    the one-pass batch aggregate exactly (no approximation, no decay),
    and replay safety is the module-wide restatement rule: an
    at-least-once redelivery rewrites its own ``batch_id`` partition
    instead of double-counting — double-counted sums would bias every
    coefficient toward the redelivered batch's regime.

    Scale: the state grows one ≤|flags|-row partition per batch; raw
    rows never land in state.  The model is always queryable mid-
    stream — `read_ols` is a hash-agg over the bounded state relation
    plus a ≤|flags|-row scalar solve.
    """
    from ..plans.advanced import ols_sufficient_stats

    def write(batch_df: DataFrame, batch_id: int) -> None:
        partials = ols_sufficient_stats(batch_df).withColumn(
            "batch_id", F.lit(int(batch_id))
        )
        overwrite_partitions(partials, state_dir, ["batch_id"])

    return write


def read_ols(spark: SparkSession, state_dir: str) -> DataFrame:
    """Fold the per-batch sufficient statistics and run the shared OLS
    expression program — column-identical to
    `plans/advanced.q_linreg_ols` over the union of the ingested
    batches (pinned by test)."""
    from ..plans.advanced import ols_solve

    stats = (
        spark.read.schema(OLS_STATE_SCHEMA)
        .parquet(state_dir)
        .groupBy("l_returnflag")
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            *[
                F.sum(c).cast("bigint").alias(c)
                for c in ("sx1", "sx2", "sy", "s11", "s12", "s22",
                          "s1y", "s2y")
            ],
            F.sum("syy").cast("decimal(38,0)").alias("syy"),
        )
    )
    return ols_solve(stats)


#: value-histogram state schema (additive counts per cents bucket —
#: width bounded by the VALUE DOMAIN, not the stream length)
HIST_STATE_SCHEMA = (
    "event_type string, cents bigint, c bigint, batch_id int"
)


def hist_partials_writer(
    state_dir: str,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch sink for streaming robust statistics: reduce the
    batch to the per-(event_type, cents) value histogram and restate
    this batch's partition.  Histogram counts are ADDITIVE, so the
    fold in `read_robust_stats` reproduces the batch operator's
    percentile bounds and means EXACTLY — streaming percentiles
    without t-digest approximation, possible because the value domain
    (not the stream) bounds the state width."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        partials = (
            batch_df.select(
                "event_type",
                F.floor(F.col("value") * 100 + F.lit(0.5))
                .cast("bigint")
                .alias("cents"),
            )
            .groupBy("event_type", "cents")
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
            .withColumn("batch_id", F.lit(int(batch_id)))
        )
        overwrite_partitions(partials, state_dir, ["batch_id"])

    return write


def read_robust_stats(spark: SparkSession, state_dir: str) -> DataFrame:
    """Fold the histogram partials and run the exact-quantile
    winsorized/truncated pipeline — column-identical to
    `plans/advanced.q_robust_trimmed_stats` over the union of the
    ingested batches (pinned by test)."""
    from ..plans.advanced import robust_stats_from_hist

    hist = (
        spark.read.schema(HIST_STATE_SCHEMA)
        .parquet(state_dir)
        .groupBy("event_type", "cents")
        .agg(F.sum("c").cast("bigint").alias("c"))
    )
    return robust_stats_from_hist(hist)


#: bootstrap replicate-partial state (additive: Σ w·cents and Σ w per
#: (type, replicate); weights are deterministic per (event_id, rep),
#: so replays restate identical partials)
BOOT_STATE_SCHEMA = (
    "event_type string, rep int, swc bigint, sw bigint,"
    " sc bigint, n bigint, batch_id int"
)


def bootstrap_partials_writer(
    state_dir: str,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch sink for the streaming bootstrap-CI monitor: the
    batch explodes to its 64 deterministic hash-Poisson replicates and
    reduces to per-(type, replicate) weighted sums — ADDITIVE, because
    each event's weight depends only on (event_id, rep), never on
    which batch delivered it.  So the fold in `read_bootstrap_ci` is
    EXACTLY the batch query over the union of ingested batches —
    uncertainty quantification on a stream with exact replay, no
    approximate merging of intervals."""
    from ..plans.advanced import _BOOT_B, _poisson_weight_sql
    from ..operators.sampling import _portable_hash

    def write(batch_df: DataFrame, batch_id: int) -> None:
        reps = batch_df.select(
            "event_type",
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
            F.explode(
                F.sequence(F.lit(0), F.lit(_BOOT_B - 1))
            ).alias("rep"),
            "event_id",
        ).select(
            "event_type",
            "rep",
            "cents",
            (
                _portable_hash(
                    F.concat_ws("#", "event_id", "rep"), "boot"
                )
                / F.lit(float(2**60))
            ).alias("u"),
        )
        w = F.expr(_poisson_weight_sql("u")).cast("bigint")
        partials = (
            reps.select(
                "event_type",
                "rep",
                (w * F.col("cents")).alias("wc"),
                w.alias("w"),
                "cents",
            )
            .groupBy("event_type", "rep")
            .agg(
                F.sum("wc").cast("bigint").alias("swc"),
                F.sum("w").cast("bigint").alias("sw"),
                F.sum("cents").cast("bigint").alias("sc"),
                F.count(F.lit(1)).cast("bigint").alias("n"),
            )
            .withColumn("batch_id", F.lit(int(batch_id)))
        )
        overwrite_partitions(partials, state_dir, ["batch_id"])

    return write


def read_bootstrap_ci(spark: SparkSession, state_dir: str) -> DataFrame:
    """Fold the replicate partials into the corpus-so-far bootstrap
    interval — column-identical to `plans/advanced.q_bootstrap_ci`
    over the union of the ingested batches (pinned by test)."""
    from pyspark.sql import Window

    from ..plans.advanced import _BOOT_B

    st = (
        spark.read.schema(BOOT_STATE_SCHEMA)
        .parquet(state_dir)
        .groupBy("event_type", "rep")
        .agg(
            F.sum("swc").cast("bigint").alias("swc"),
            F.sum("sw").cast("bigint").alias("sw"),
            F.sum("sc").cast("bigint").alias("sc"),
            F.sum("n").cast("bigint").alias("n"),
        )
    )
    rep_means = st.selectExpr(
        "event_type",
        "CAST(swc AS DOUBLE) / CAST(sw AS DOUBLE) AS rep_mean",
        "sc",
        "n",
    )
    wr = Window.partitionBy("event_type").orderBy("rep_mean")
    ranked = rep_means.withColumn("rk", F.row_number().over(wr))
    lo_rk = max(1, int(0.025 * _BOOT_B))
    hi_rk = int(0.975 * _BOOT_B) + 1
    det6 = "CAST(FLOOR(({x}) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS {n}"
    base = st.groupBy("event_type").agg(
        F.first("sc").alias("sc"), F.first("n").alias("n")
    )
    return (
        ranked.where(F.col("rk").isin(lo_rk, hi_rk))
        .groupBy("event_type")
        .agg(
            F.min("rep_mean").alias("lo_raw"),
            F.max("rep_mean").alias("hi_raw"),
        )
        .join(base, "event_type")
        .selectExpr(
            "event_type",
            "n",
            det6.format(
                x="CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)",
                n="mean_cents",
            ),
            det6.format(x="lo_raw", n="ci_lo_cents"),
            det6.format(x="hi_raw", n="ci_hi_cents"),
        )
        .orderBy("event_type")
    )


#: daily event-count partial schema for the burstiness monitor —
#: additive like the CUSUM daily-cents state
BURST_STATE_SCHEMA = (
    "event_type string, day date, y bigint, batch_id int"
)


def burstiness_batch_writer(
    state_dir: str,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch sink for the burstiness monitor: reduce the batch
    to per-(event_type, day) event-count partials and restate its own
    batch_id partition.  Daily counts are ADDITIVE across batches
    (the CUSUM state shape), so the fold in `read_burstiness` equals
    the one-pass daily relation exactly and replay safety is the
    module-wide restatement rule."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        partials = (
            batch_df.select(
                "event_type", F.to_date("ts").alias("day")
            )
            .groupBy("event_type", "day")
            .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
            .withColumn("batch_id", F.lit(int(batch_id)))
        )
        overwrite_partitions(partials, state_dir, ["batch_id"])

    return write


def read_burstiness(spark: SparkSession, state_dir: str) -> DataFrame:
    """Fold the daily-count partials and run the shared burstiness
    solve — column-identical to `plans/timeseries.q_burstiness` over
    the union of the ingested batches (pinned by test).  The
    Fano/Goh–Barabási panel stays queryable mid-stream, completing
    the stat-monitor family (CUSUM level shifts, OLS trend, robust
    stats, bootstrap CI)."""
    from ..plans.timeseries import burstiness_from_daily

    return burstiness_from_daily(_fold_daily(spark, state_dir))


#: time-bounded funnel state: per (user, day, stage) the SORTED
#: intra-day timestamps.  Mins alone are NOT enough for exact replay:
#: t2 = min view >= t1, and on day(t1) a view EARLIER than t1 would
#: mask the true in-window minimum — the intra-day array keeps the
#: fold exact under ANY batch split.  State rows are bounded by
#: users x active-days x 3 stages (never per-event rows in the
#: store); array width is bounded by a user's single-day activity —
#: the sessionization-state bound, not the stream length.
FUNNEL_STATE_SCHEMA = (
    "user_id bigint, day date, event_type string,"
    " tss array<timestamp_ntz>, batch_id int"
)

FUNNEL_STAGES = ("signup", "view", "purchase")


def funnel_partials(batch_df: DataFrame) -> DataFrame:
    """Reduce raw events to per-(user, day, stage) sorted timestamp
    arrays — only the three funnel stages ever land in state."""
    return (
        batch_df.where(F.col("event_type").isin(*FUNNEL_STAGES))
        .select(
            "user_id",
            "event_type",
            F.col("ts").cast("timestamp_ntz").alias("ts"),
        )
        .withColumn("day", F.to_date("ts"))
        .groupBy("user_id", "day", "event_type")
        .agg(F.sort_array(F.collect_list("ts")).alias("tss"))
    )


def funnel_batch_writer(
    state_dir: str,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch sink for the time-bounded funnel monitor:
    restate this batch's per-(user, day, stage) partials under its
    own batch_id partition (replay-safe restatement)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        partials = funnel_partials(batch_df).withColumn(
            "batch_id", F.lit(int(batch_id))
        )
        overwrite_partitions(partials, state_dir, ["batch_id"])

    return write


def read_window_funnel(spark: SparkSession, state_dir: str) -> DataFrame:
    """Fold the funnel state into the depth census — column-identical
    to `plans/advanced.q_window_funnel` over the union of the
    ingested batches (pinned by test), because the per-day arrays
    preserve exact intra-day timestamps for every stage.

    Scale plan: the batch query's chained-conditional-min discipline
    over the (user, day, stage) state relation — day-range predicates
    prune each stage's scan to the 8-day funnel window before the
    intra-array filter runs; every join is a user_id equi-join that
    reuses one partitioning down the chain."""
    from ..plans.advanced import _FUNNEL_WINDOW_DAYS as W

    st = spark.read.schema(FUNNEL_STATE_SCHEMA).parquet(state_dir)
    s1 = (
        st.where(F.col("event_type") == "signup")
        .select("user_id", F.expr("array_min(tss)").alias("t"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t1"))
    )
    in_window = (
        "array_min(filter(tss,"
        f" v -> v >= {{lo}} AND v <= t1 + INTERVAL {W} DAYS))"
    )
    day_prune = (
        f"day >= to_date({{anchor}}) AND "
        f"day <= to_date(t1 + INTERVAL {W} DAYS)"
    )
    s2 = (
        st.where(F.col("event_type") == "view")
        .join(s1, "user_id")
        .where(F.expr(day_prune.format(anchor="t1")))
        .select(
            "user_id",
            "t1",
            F.expr(in_window.format(lo="t1")).alias("cand"),
        )
        .where(F.col("cand").isNotNull())
        .groupBy("user_id")
        .agg(F.min("cand").alias("t2"), F.first("t1").alias("t1"))
    )
    s3 = (
        st.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.expr(day_prune.format(anchor="t2")))
        .select(
            "user_id",
            F.expr(in_window.format(lo="t2")).alias("cand"),
        )
        .where(F.col("cand").isNotNull())
        .groupBy("user_id")
        .agg(F.min("cand").alias("t3"))
    )
    depth = (
        s1.join(s2.select("user_id", "t2"), "user_id", "left")
        .join(s3.select("user_id", "t3"), "user_id", "left")
        .selectExpr(
            "CASE WHEN t3 IS NOT NULL THEN 3"
            " WHEN t2 IS NOT NULL THEN 2 ELSE 1 END AS depth"
        )
    )
    return (
        depth.groupBy("depth")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy("depth")
    )


def _fold_daily(spark, state_dir: str):
    """Fold the burstiness monitor's daily-count partials back to the
    (event_type, day, y) relation — the shared front end of the four
    daily-series monitors (burstiness, PACF, STL, Hurst): ONE state
    stream feeds all four read paths."""
    return (
        spark.read.schema(BURST_STATE_SCHEMA)
        .parquet(state_dir)
        .groupBy("event_type", "day")
        .agg(F.sum("y").cast("bigint").alias("y"))
    )


def read_pacf(spark: SparkSession, state_dir: str) -> DataFrame:
    """PACF over the folded daily-count state — column-identical to
    `plans/timeseries.q_pacf_lags` over the union of the ingested
    batches (pinned by test)."""
    from ..plans.timeseries import pacf_from_daily

    return pacf_from_daily(_fold_daily(spark, state_dir))


def read_stl_decompose(spark: SparkSession, state_dir: str) -> DataFrame:
    """Trend/seasonal/residual decomposition over the folded daily
    state — column-identical to `plans/timeseries.q_stl_decompose`
    over the union of the ingested batches (pinned by test)."""
    from ..plans.timeseries import stl_from_daily

    return stl_from_daily(_fold_daily(spark, state_dir))


def read_hurst(spark: SparkSession, state_dir: str) -> DataFrame:
    """R/S Hurst exponent over the folded daily state —
    column-identical to `plans/timeseries.q_hurst_exponent` over the
    union of the ingested batches (pinned by test)."""
    from ..plans.timeseries import hurst_from_daily

    return hurst_from_daily(_fold_daily(spark, state_dir))


#: per-type exact power-sum partials for the moments monitors
#: (anova_oneway, jarque_bera) — additive DECIMAL accumulators, the
#: `stats_agg` discipline lifted across batches
MOMENTS_STATE_SCHEMA = (
    "event_type string, n bigint, s1 decimal(38,0), s2 decimal(38,0),"
    " s3 decimal(38,0), s4 decimal(38,0), batch_id int"
)


def moments_batch_writer(
    state_dir: str,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch sink for the moments monitors: reduce the batch
    to per-type exact power sums Σc..Σc⁴ (`plans/advanced.
    moments_by_type` — the SAME relation the batch queries
    aggregate) and restate them under this batch's partition.  Power
    sums are ADDITIVE integers, so the reader's fold equals the
    one-pass relation exactly under any batch split, and ANOVA's F
    and Jarque–Bera's S/K/JB come out bit-identical to batch."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        from ..plans.advanced import moments_by_type

        partials = moments_by_type(batch_df).withColumn(
            "batch_id", F.lit(int(batch_id))
        )
        overwrite_partitions(partials, state_dir, ["batch_id"])

    return write


def _fold_moments(spark: SparkSession, state_dir: str) -> DataFrame:
    """Fold the power-sum partials back to the per-type moments
    relation — the shared front end of the two moment monitors (one
    state stream, both read paths)."""
    return (
        spark.read.schema(MOMENTS_STATE_SCHEMA)
        .parquet(state_dir)
        .groupBy("event_type")
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("s1").cast("decimal(38,0)").alias("s1"),
            F.sum("s2").cast("decimal(38,0)").alias("s2"),
            F.sum("s3").cast("decimal(38,0)").alias("s3"),
            F.sum("s4").cast("decimal(38,0)").alias("s4"),
        )
    )


def read_anova_oneway(spark: SparkSession, state_dir: str) -> DataFrame:
    """One-way ANOVA over the folded moments state — column-identical
    to `plans/advanced.q_anova_oneway` over the union of the ingested
    batches (pinned by test)."""
    from ..plans.advanced import anova_from_moments

    return anova_from_moments(_fold_moments(spark, state_dir))


def read_jarque_bera(spark: SparkSession, state_dir: str) -> DataFrame:
    """Jarque–Bera normality panel over the folded moments state —
    column-identical to `plans/advanced.q_jarque_bera` over the union
    of the ingested batches (pinned by test)."""
    from ..plans.advanced import jarque_bera_from_moments

    return jarque_bera_from_moments(_fold_moments(spark, state_dir))


def read_welch_anova(spark: SparkSession, state_dir: str) -> DataFrame:
    """Welch's heteroscedastic ANOVA over the folded moments state —
    the THIRD consumer of the one moments state stream (ANOVA, JB,
    now Welch); column-identical to `plans/advanced.q_welch_anova`
    over the union of the ingested batches (pinned by test)."""
    from ..plans.advanced import welch_from_moments

    return welch_from_moments(_fold_moments(spark, state_dir))


def read_holt(spark: SparkSession, state_dir: str) -> DataFrame:
    """Holt linear forecast over the folded daily state — the FIFTH
    consumer of the one daily-count state stream (burstiness, PACF,
    STL, Hurst, now Holt); column-identical to
    `plans/timeseries.q_holt_linear_forecast` over the union of the
    ingested batches (pinned by test)."""
    from ..plans.timeseries import holt_from_daily

    return holt_from_daily(_fold_daily(spark, state_dir))


def read_theta(spark: SparkSession, state_dir: str) -> DataFrame:
    """Theta-method forecast over the folded daily state — the SIXTH
    consumer of the one daily-count state stream; column-identical to
    `plans/timeseries.q_theta_forecast` over the union of the
    ingested batches (pinned by test).  Daily counts are additive, so
    the folded relation equals the batch `_daily_counts` under any
    batch split, and the OLS integer sums + SES fold come out
    bit-identical."""
    from ..plans.timeseries import theta_from_daily

    return theta_from_daily(_fold_daily(spark, state_dir))


def read_forecast_backtest(spark: SparkSession, state_dir: str) -> DataFrame:
    """Naive-1 / naive-7 / Holt bake-off over the folded daily state
    — the SEVENTH consumer of the one daily-count state stream;
    column-identical to `plans/timeseries.q_forecast_backtest` over
    the union of the ingested batches (pinned by test)."""
    from ..plans.timeseries import backtest_from_daily

    return backtest_from_daily(_fold_daily(spark, state_dir))


def read_holt_winters(spark: SparkSession, state_dir: str) -> DataFrame:
    """Additive Holt–Winters over the folded daily state — the EIGHTH
    consumer of the one daily-count state stream; column-identical to
    `plans/timeseries.q_holt_winters_forecast` over the union of the
    ingested batches (pinned by test)."""
    from ..plans.timeseries import hw_from_daily

    return hw_from_daily(_fold_daily(spark, state_dir))


def read_seasonal_strength(
    spark: SparkSession, state_dir: str
) -> DataFrame:
    """FPP seasonal/trend strength over the folded daily state — the
    NINTH consumer of the one daily-count state stream;
    column-identical to `plans/timeseries.q_stl_seasonal_strength`
    over the union of the ingested batches (pinned by test)."""
    from ..plans.timeseries import strength_from_daily

    return strength_from_daily(_fold_daily(spark, state_dir))


def read_mann_kendall(spark: SparkSession, state_dir: str) -> DataFrame:
    """Mann–Kendall trend test over the folded daily state — the
    TENTH consumer of the one daily-count state stream;
    column-identical to `plans/timeseries.q_mann_kendall_trend` over
    the union of the ingested batches (pinned by test)."""
    from ..plans.timeseries import mann_kendall_from_daily

    return mann_kendall_from_daily(_fold_daily(spark, state_dir))
