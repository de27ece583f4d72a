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
