"""Time-series repair and smoothing operators: dense-spine gap fill
with last-observation-carried-forward, gaps-and-islands activity
streaks, and FIR exponential smoothing with anomaly flags.

These close out the hypertable-style surface around
``multires_rollup`` / ``rolling_avg_range`` (plans/advanced.py): a
production metrics pipeline needs missing buckets MATERIALIZED (a
downstream join or chart can't see a bucket that isn't there), streak
semantics that tumbling windows can't express, and a cheap smoother
for anomaly triage.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import QuerySpec

# ---------------------------------------------------------------------------
# timeseries_gapfill — dense hourly spine + LOCF
# ---------------------------------------------------------------------------


def q_timeseries_gapfill(spark, sf_dir):
    """Per-event-type hourly totals on a DENSE hour spine covering the
    corpus time range, with empty buckets materialized and filled by
    last-observation-carried-forward (LOCF).

    Scale plan: actuals collapse to one row per (type, hour) in a
    single partial-agg before anything else — the spine join touches
    aggregated rows, never raw events.  The spine itself is
    |types| x |hours| rows built from a one-row global min/max
    aggregate (a broadcast-able scalar, the same shape as tpch_q11's
    global total); LOCF is one window per type ordered by hour —
    shuffle on type, in-partition sort, no self-join.  Sums accumulate
    as exact integer cents with ONE double division at the end, so
    bucket totals are engine-exact AND both engines emit float64 (a
    DECIMAL output would hash as pandas ``Decimal`` on Spark vs
    float64 on DuckDB — the r03 representation-divergence class).
    """
    ev = load_table(spark, sf_dir, "events")
    actual = (
        ev.select(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("bucket"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.sum("cents").alias("hour_cents"))
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    types = ev.select("event_type").distinct()
    spine = types.crossJoin(bounds).select(
        "event_type",
        F.explode(
            F.expr("sequence(lo, hi, interval 1 hour)")
        ).alias("bucket"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # date_trunc returns LTZ; emit NTZ so collected rows render the
    # same wall time under ANY process timezone (session tz is pinned
    # UTC, so the cast is a deterministic relabel — caught by the
    # TZ=America/New_York oracle sweep)
    filled = spine.join(actual, ["event_type", "bucket"], "left").select(
        "event_type",
        F.col("bucket").cast("timestamp_ntz").alias("bucket"),
        F.col("hour_cents").isNull().alias("is_gap"),
        (
            F.last("hour_cents", ignorenulls=True).over(w).cast("double")
            / 100.0
        ).alias("filled_total"),
    )
    return filled.orderBy("event_type", "bucket")


SQL_TIMESERIES_GAPFILL = """
WITH actual AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS hour_cents
  FROM events GROUP BY 1, 2),
bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo,
         date_trunc('hour', MAX(ts)) AS hi
  FROM events),
spine AS (
  SELECT t.event_type, s.bucket
  FROM (SELECT DISTINCT event_type FROM events) t,
       bounds,
       LATERAL unnest(generate_series(bounds.lo, bounds.hi,
                                      INTERVAL 1 HOUR)) AS s(bucket))
SELECT s.event_type, s.bucket,
       a.hour_cents IS NULL AS is_gap,
       CAST(last_value(a.hour_cents IGNORE NULLS)
         OVER (PARTITION BY s.event_type ORDER BY s.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS DOUBLE) / 100.0 AS filled_total
FROM spine s
LEFT JOIN actual a
  ON a.event_type = s.event_type AND a.bucket = s.bucket
ORDER BY s.event_type, s.bucket
"""


# ---------------------------------------------------------------------------
# user_streaks — gaps-and-islands over activity days
# ---------------------------------------------------------------------------


def q_user_streaks(spark, sf_dir):
    """Consecutive-day activity streaks per user (gaps-and-islands):
    the row_number subtraction trick — consecutive dates minus a
    per-user row counter is constant within a streak, so one window
    plus two hash-aggs yields every user's streak profile.  This is
    the calendar-aligned semantics `sessionize`'s inactivity-timeout
    sessions can't express.

    Scale plan: distinct (user, day) first (one hash-agg on raw
    events), then a per-user window over at most |days| rows, then a
    bounded group-by.  All integers — engine-exact.
    """
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    islands = days.withColumn(
        "island",
        F.datediff(F.col("day"), F.lit("1970-01-01"))
        - F.row_number().over(w),
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len")
    )
    return (
        streaks.groupBy("user_id")
        .agg(
            F.sum("len").cast("bigint").alias("n_active_days"),
            F.count(F.lit(1)).alias("n_streaks"),
            F.max("len").alias("longest_streak"),
        )
        .orderBy("user_id")
    )


SQL_USER_STREAKS = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
islands AS (
  SELECT user_id, day,
         datediff('day', DATE '1970-01-01', day)
           - row_number() OVER (PARTITION BY user_id ORDER BY day)
           AS island
  FROM days),
streaks AS (
  SELECT user_id, island, COUNT(*) AS len
  FROM islands GROUP BY 1, 2)
SELECT user_id,
       CAST(SUM(len) AS BIGINT) AS n_active_days,
       COUNT(*) AS n_streaks,
       MAX(len) AS longest_streak
FROM streaks
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# ewma_smooth — FIR exponential smoothing + anomaly flags
# ---------------------------------------------------------------------------

_EWMA_TAPS = 8


def _fir_terms(col: str, taps: int) -> str:
    """Sum of taps lagged terms with power-of-two weights, written as
    one fixed-shape expression so both engines evaluate the identical
    IEEE operation sequence (weights 2^-1 … 2^-taps are exact binary
    fractions; each product and the left-to-right additions are single
    IEEE ops — bit-identical everywhere)."""
    num = " + ".join(
        f"coalesce(l{k} * {2.0 ** -(k + 1)!r}, 0.0)" for k in range(taps)
    )
    den = " + ".join(
        f"(CASE WHEN l{k} IS NOT NULL THEN {2.0 ** -(k + 1)!r}"
        " ELSE 0.0 END)"
        for k in range(taps)
    )
    return f"({num}) / ({den})"


def q_ewma_smooth(spark, sf_dir):
    """Per-event-type daily totals smoothed with an 8-tap exponential
    FIR kernel (weights 1/2, 1/4, …, 1/256 over the trailing days,
    renormalized near the series start), plus a x2-band anomaly flag.

    A true (recursive) EWMA is order-recursive and engine-divergent in
    floats; the truncated FIR form keeps >99.6% of the kernel mass,
    is expressible as pure lag projections, and — because every weight
    is an exact binary fraction evaluated in a fixed order — produces
    bit-identical doubles in any IEEE engine.

    Scale plan: one hash-agg to daily grain, one per-type window for
    the 8 lags (shuffle on type, sort by day in-partition), then a
    map-only projection.  No self-joins, no state.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.col("value").cast("decimal(20,2)").alias("dval"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("dval").cast("double").alias("x"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "day",
        "x",
        *[
            F.lag("x", k).over(w).alias(f"l{k}")
            for k in range(_EWMA_TAPS)
        ],
    )
    smoothed = F.expr(_fir_terms("x", _EWMA_TAPS))
    # floor-based rounding (stats_agg precedent): engine ROUND()
    # semantics differ on doubles; floor is a single exact IEEE op
    det6 = F.floor(smoothed * F.lit(1e6) + F.lit(0.5)).cast(
        "double"
    ) / F.lit(1e6)
    return lagged.select(
        "event_type",
        "day",
        F.round("x", 2).alias("x"),
        det6.alias("smoothed"),
        ((F.col("x") > smoothed * 2) | (F.col("x") < smoothed * 0.5)).alias(
            "is_anomaly"
        ),
    ).orderBy("event_type", "day")


def _sql_fir() -> str:
    num = " + ".join(
        f"coalesce(l{k} * {2.0 ** -(k + 1)!r}, 0.0)"
        for k in range(_EWMA_TAPS)
    )
    den = " + ".join(
        f"(CASE WHEN l{k} IS NOT NULL THEN {2.0 ** -(k + 1)!r}"
        " ELSE 0.0 END)"
        for k in range(_EWMA_TAPS)
    )
    return f"({num}) / ({den})"


SQL_EWMA_SMOOTH = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(20,2))) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2),
lagged AS (
  SELECT event_type, day, x,
         {", ".join(
             f"lag(x, {k}) OVER (PARTITION BY event_type ORDER BY day)"
             f" AS l{k}"
             for k in range(_EWMA_TAPS)
         )}
  FROM daily)
SELECT event_type, day,
       ROUND(x, 2) AS x,
       CAST(FLOOR(({_sql_fir()}) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS smoothed,
       (x > ({_sql_fir()}) * 2 OR x < ({_sql_fir()}) * 0.5) AS is_anomaly
FROM lagged
ORDER BY event_type, day
"""


def q_type_profile_similarity(spark, sf_dir):
    """Time-series similarity search over the stream's OWN shapes (cf.
    "Time Series Similarity Search for Streaming Data in Distributed
    Systems", EDBT 2019, in PAPERS.md): each event type's 24-hour
    activity profile (count per hour-of-day — an exact integer
    vector) compared pairwise by cosine — which types load the system
    alike, the signal behind alert correlation and capacity grouping.

    Scale plan: the corpus collapses to |types| 24-dim vectors in ONE
    hash-agg (24 conditional sums, map-side combined); the pairwise
    stage is quadratic only in |event types| — a bounded domain
    (5 here), so the cross join is |types|² over KB data at any corpus
    size.  Counts are exact integers; the cosine follows the
    `cosine_topk` determinism recipe (single dot fold, 4 dp round).
    """
    from ..operators.similarity import _dot, _norm

    ev = load_table(spark, sf_dir, "events")
    h = F.hour("ts")
    prof = ev.groupBy("event_type").agg(
        F.array(
            *[
                F.sum(F.when(h == i, 1).otherwise(0)).cast("double")
                for i in range(24)
            ]
        ).alias("vec")
    )
    a = prof.select(
        F.col("event_type").alias("type_a"), F.col("vec").alias("va")
    )
    b = prof.select(
        F.col("event_type").alias("type_b"), F.col("vec").alias("vb")
    )
    return (
        a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            F.round(
                _dot(F.col("va"), F.col("vb"))
                / (_norm(F.col("va")) * _norm(F.col("vb"))),
                4,
            ).alias("cos_sim"),
        )
        .orderBy("type_a", "type_b")
    )


def _sql_type_profile_similarity() -> str:
    sums = ", ".join(
        f"CAST(SUM(CASE WHEN h = {i} THEN 1 ELSE 0 END) AS DOUBLE)"
        for i in range(24)
    )
    return f"""
WITH prof AS (
  SELECT event_type, list_value({sums}) AS vec
  FROM (SELECT event_type, EXTRACT(HOUR FROM ts) AS h FROM events)
  GROUP BY event_type)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       ROUND(list_cosine_similarity(a.vec, b.vec), 4) AS cos_sim
FROM prof a JOIN prof b ON a.event_type < b.event_type
ORDER BY type_a, type_b
"""


SQL_TYPE_PROFILE_SIMILARITY = _sql_type_profile_similarity()


MV_CUTOFF = "2024-01-20"  # fixture events span 2024-01-01..01-30


def q_mv_incremental_refresh(spark, sf_dir):
    """Incremental materialized-view maintenance: a daily
    (event_type, day) aggregate is refreshed by MERGING the stored
    aggregate (history before the cutoff) with the new partition's
    partial aggregate — counts add, sums add — instead of rescanning
    history.  The query computes the merged view; the ORACLE computes
    the same view by full recompute over all events, so the row hash
    proves merge == recompute (the algebraic-MV correctness
    condition for distributive aggregates).

    Scale plan: the production form persists `hist`; refresh cost is
    then O(|new partition|) + a |view|-row merge groupBy — at 100 TB
    the difference between reading one day and reading three years.
    Sums accumulate as exact integer cents (associative, so
    merge == recompute bit-for-bit) with ONE double division at the
    end, so both engines emit identical float64 (a DECIMAL output
    hashes as pandas ``Decimal`` on Spark vs float64 on DuckDB — the
    r03 representation-divergence class).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    cutoff = F.lit(MV_CUTOFF).cast("date")

    def day_agg(df):
        return df.groupBy("event_type", "day").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("cents"),
        )

    hist = day_agg(ev.where(F.col("day") < cutoff))  # the stored MV
    delta = day_agg(ev.where(F.col("day") >= cutoff))  # the new data
    merged = (
        hist.unionAll(delta)
        .groupBy("event_type", "day")
        .agg(
            F.sum("n").alias("n"),
            (F.sum("cents").cast("double") / 100.0).alias("total"),
        )
    )
    return merged.orderBy("event_type", "day")


SQL_MV_INCREMENTAL_REFRESH = """
SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
         / 100.0 AS total
FROM events
GROUP BY event_type, CAST(ts AS DATE)
ORDER BY event_type, day
"""


# ---------------------------------------------------------------------------
# interval_overlap — sweep-line max concurrency (round 10)
# ---------------------------------------------------------------------------


def q_interval_overlap(spark, sf_dir):
    """Maximum CONCURRENT intervals per event type — the classic
    sweep-line: each event is an interval [ts, ts + value minutes);
    every boundary becomes a +1/−1 delta row, a per-type running sum
    walks the boundaries in time order, and the max of that sum is
    the peak concurrency (how many sessions/calls/jobs were live at
    once).  Half-open semantics: at an identical instant, ends sort
    BEFORE starts (delta −1 < +1), so two intervals that merely touch
    never count as overlapping; remaining ties break on event_id.

    Scale plan: the interval relation never self-joins (the naive
    overlap query is O(n²)); it explodes 2× to boundary rows and the
    peak rides `operators/windows.running_max_two_level` GROUPED on
    event_type — with 5 event types a plain Window.partitionBy(type)
    serializes 100 TB of boundaries through 5 sort partitions, and
    the sf10 scale point MEASURED that cost: 26.7 s (12×/decade,
    super-linear, one core doing all the work) with the plain window
    vs 16.96 s with the r10 two-level prefix (range-bucket +
    determinism checkpoint + per-row offset join).  Round 14 fuses
    the consumer into the operator: the query only needs the prefix
    MAX per type, so deterministic HOUR buckets (a pure function of
    the boundary timestamp — no range-bound sampling pass, no
    checkpoint pin) feed one hash exchange → in-bucket prefix window
    → per-bucket (total, max, count) aggregate on the same exchange →
    span-bounded offset stitch; the per-row join-back disappears
    entirely (guide §2.4: remove shuffles outright).  Timestamps stay
    NTZ end-to-end (tz-free ordering); the value→minutes cast goes
    through FLOOR because DuckDB's double→int cast ROUNDS while
    Spark's truncates.
    """
    from ..operators.windows import running_max_two_level
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "event_type",
        F.col("ts").alias("start_ts"),
        F.expr(
            "timestampadd(MINUTE, CAST(FLOOR(value) AS INT), ts)"
        ).alias("end_ts"),
        "event_id",
    )
    pts = iv.select(
        "event_type",
        F.col("start_ts").alias("t"),
        F.lit(1).alias("delta"),
        "event_id",
    ).unionAll(
        iv.select(
            "event_type",
            F.col("end_ts").alias("t"),
            F.lit(-1).alias("delta"),
            "event_id",
        )
    )
    res = running_max_two_level(
        pts,
        ["t", "delta", "event_id"],
        "delta",
        bucket_col=F.expr("unix_timestamp(t) DIV 3600"),
        partition_cols=["event_type"],
    )
    return (
        res.select(
            "event_type",
            F.col("max_running").cast("bigint").alias("max_concurrent"),
            F.col("n_rows").cast("bigint").alias("n_boundaries"),
        )
        .orderBy("event_type")
    )


SQL_INTERVAL_OVERLAP = """
WITH iv AS (
  SELECT event_type, ts AS start_ts,
         ts + CAST(FLOOR(value) AS INT) * INTERVAL 1 MINUTE AS end_ts,
         event_id
  FROM events),
pts AS (
  SELECT event_type, start_ts AS t, 1 AS delta, event_id FROM iv
  UNION ALL
  SELECT event_type, end_ts AS t, -1 AS delta, event_id FROM iv),
conc AS (
  SELECT event_type,
         SUM(delta) OVER (
           PARTITION BY event_type ORDER BY t, delta, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
  FROM pts)
SELECT event_type,
       CAST(MAX(conc) AS BIGINT) AS max_concurrent,
       CAST(COUNT(*) AS BIGINT) AS n_boundaries
FROM conc
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# ohlc_bars — open/high/low/close candle aggregation (round 10)
# ---------------------------------------------------------------------------


def q_ohlc_bars(spark, sf_dir):
    """Daily OHLC candles per event type: open = first value of the
    day in time order, close = last, high/low = extremes, plus event
    count and exact-integer-cents volume — the financial-bars shape
    every metrics store reimplements.

    Scale plan: ONE hash exchange on the (event_type, day) grain; the
    first/last picks are two row_number windows over the SAME
    partitioning (Catalyst plans one Exchange, two in-partition
    sorts), never a self-join back to the raw rows.  The key space
    grows with days × types, so parallelism scales with data span —
    unlike the sweep-line's fixed-key caveat.  Measured (bench_one
    --gc-each): sf1 1.03 s → sf10 3.72 s, 3.6×/decade.  Determinism: time ties
    break on event_id; volume accumulates as BIGINT cents (one cast,
    no double-sum order sensitivity); ``day`` is a DATE on both
    engines (Spark date_trunc's LTZ timestamp vs DuckDB's naive one
    is the r03 hash-divergence class).
    """
    ev = load_table(spark, sf_dir, "events")
    t = ev.select(
        "event_type",
        F.to_date("ts").alias("day"),
        "value",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    wa = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    wd = Window.partitionBy("event_type", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    r = t.withColumn("rn_a", F.row_number().over(wa)).withColumn(
        "rn_d", F.row_number().over(wd)
    )
    return (
        r.groupBy("event_type", "day")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias(
                "close"
            ),
            F.count("*").cast("bigint").alias("n_events"),
            F.sum("cents").cast("bigint").alias("volume_cents"),
        )
        .orderBy("event_type", "day")
    )


SQL_OHLC_BARS = """
WITH t AS (
  SELECT event_type, CAST(ts AS DATE) AS day, value, ts, event_id,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY event_type, day
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type, day
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM t)
SELECT event_type, day,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS volume_cents
FROM r
GROUP BY event_type, day
ORDER BY event_type, day
"""


# ---------------------------------------------------------------------------
# time_weighted_avg — TWAP over irregular samples (round 10)
# ---------------------------------------------------------------------------


def q_time_weighted_avg(spark, sf_dir):
    """Time-weighted average value per event type over IRREGULARLY
    spaced samples: each observation holds until the next one, so its
    weight is the gap to its successor (the TWAP every market-data
    and sensor pipeline needs — a plain AVG over-counts bursts).
    The last observation per type has no successor and drops out.

    Scale plan: the successor lookup rides
    `operators/windows.consecutive_pairs_two_level` grouped on
    event_type — the plain 5-partition lead window MEASURED
    super-linear at the sf10 point (15.4 s, 9×/decade); the r10
    two-level form (range-bucket + checkpoint + per-row stitch join)
    read 2.07 s sf1 / 4.42 s sf10; round 14 replaces it with
    deterministic HOUR buckets and a boundary-pair UNION — no range
    sampling pass, no checkpoint materialization, no per-row join
    (guide §2.4) — since the TWAP aggregate drops the per-type last
    row anyway.  Then a map-side-combinable agg.
    Determinism: the weighted sum accumulates as BIGINT
    cents × gap-microseconds (value is 2-decimal, the gap is an exact
    integer, and Σgap is bounded by the corpus time span, so the
    product sum stays far inside int64) with ONE double division at
    the end — no float-summation order sensitivity on either engine.
    """
    from ..operators.windows import consecutive_pairs_two_level

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
        "ts",
        "event_id",
    )
    led = consecutive_pairs_two_level(
        base,
        ["ts", "event_id"],
        bucket_col=F.expr("unix_timestamp(ts) DIV 3600"),
        partition_cols=["event_type"],
    )
    g = led.select(
        "event_type",
        "cents",
        F.expr(
            "timestampdiff(MICROSECOND, ts, __next.ts)"
        ).alias("gap_us"),
    ).where(F.col("gap_us").isNotNull())
    return (
        g.groupBy("event_type")
        .agg(
            (
                F.sum(F.col("cents") * F.col("gap_us")).cast("double")
                / F.sum("gap_us").cast("double")
                / F.lit(100.0)
            ).alias("twap"),
            F.count("*").cast("bigint").alias("n_gaps"),
        )
        .orderBy("event_type")
    )


SQL_TIME_WEIGHTED_AVG = """
WITH g AS (
  SELECT event_type,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
         date_diff('microsecond', ts,
                   lead(ts) OVER (PARTITION BY event_type
                                  ORDER BY ts, event_id)) AS gap_us
  FROM events)
SELECT event_type,
       CAST(SUM(cents * gap_us) AS DOUBLE)
         / CAST(SUM(gap_us) AS DOUBLE) / 100.0 AS twap,
       CAST(COUNT(*) AS BIGINT) AS n_gaps
FROM g
WHERE gap_us IS NOT NULL
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# cusum_changepoints — sequential shift detection (round 10)
# ---------------------------------------------------------------------------

#: relative CUSUM alarm bar: flag a day when the accumulated positive
#: drift exceeds 5% of the series' total mass
CUSUM_THETA_NUM = 1
CUSUM_THETA_DEN = 20


def q_cusum_changepoints(spark, sf_dir):
    """CUSUM changepoint detection over daily per-type revenue — the
    sequential "did the level shift?" monitor (Page 1954) that pairs
    with the distributional PSI gate: PSI asks "does this batch look
    different?", CUSUM asks "WHEN did the running level move?".

    The recurrence S_i = max(0, S_{i−1} + dev_i) looks
    window-inexpressible, but has the classic prefix identity
    S_i = P_i − min_{j≤i} P_j (P = prefix sum of deviations), so two
    per-type windows over the DAILY relation compute it exactly — no
    UDF, no iteration.

    Determinism: deviations are SCALED BY n instead of divided
    (dev_i = cents_i·n − total — exact BIGINTs; a mean-subtraction
    would inject a float into every prefix), the alarm compares
    20·S_i > n·total in integers, and the reported cusum value pays
    ONE double division at the end.

    Scale plan: one hash-agg to (type, day) rows; every window runs
    over that bounded aggregated relation (days × types — KB at any
    corpus scale), the same pre-aggregate-then-window discipline as
    `ewma_smooth`.  int64 headroom: cents·n·days stays under 2⁶³
    through sf1000 for this fixture's 30-day span.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").alias("cents"))
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
        .withColumn(
            "dev", F.col("cents") * F.col("n") - F.col("total")
        )
        .withColumn("pfx", F.sum("dev").over(w_p))
        .withColumn("pmin", F.min("pfx").over(w_p))
    )
    det6 = "CAST(FLOOR(({expr}) * 1e6 + 0.5) AS DOUBLE) / 1e6"
    s = "(pfx - LEAST(pmin, 0))"
    return p.selectExpr(
        "event_type",
        "day",
        det6.format(expr=f"{s} / (n * 100.0)") + " AS cusum_dollars",
        f"{CUSUM_THETA_DEN} * {s} > {CUSUM_THETA_NUM} * n * total"
        " AS is_shift",
    ).orderBy("event_type", "day")


SQL_CUSUM_CHANGEPOINTS = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events GROUP BY 1, 2),
stats AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS total
  FROM daily GROUP BY 1),
pf AS (
  SELECT d.event_type, d.day, s.n, s.total,
         SUM(d.cents * s.n - s.total) OVER w AS pfx
  FROM daily d JOIN stats s USING (event_type)
  WINDOW w AS (PARTITION BY d.event_type ORDER BY d.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
p AS (
  SELECT event_type, day, n, total, pfx,
         MIN(pfx) OVER (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND
                        CURRENT ROW) AS pmin
  FROM pf)
SELECT event_type, day,
       CAST(FLOOR(((pfx - LEAST(pmin, 0)) / (n * 100.0)) * 1e6 + 0.5)
         AS DOUBLE) / 1e6 AS cusum_dollars,
       {CUSUM_THETA_DEN} * (pfx - LEAST(pmin, 0))
         > {CUSUM_THETA_NUM} * n * total AS is_shift
FROM p
ORDER BY event_type, day
"""


_ACF_MAX_LAG = 7


def q_acf_lags(spark, sf_dir):
    """Autocorrelation function of the daily event count per event
    type at lags 1..7 — the diagnostic that tells a forecaster
    whether a series has weekly structure before fitting anything
    (Box & Jenkins): r_k = Σ(y_t−ȳ)(y_{t−k}−ȳ) / Σ(y_t−ȳ)².

    Determinism: deviations are SCALED BY n instead of divided
    (dev_t = n·y_t − S — exact BIGINTs, the `cusum_changepoints`
    trick); the n² factor cancels in the ratio, so r_k =
    Σdev_t·dev_{t−k} / Σdev_t² needs no float until ONE final
    division.  The cross products exceed int64 (dev ~ n·y ~ 10¹⁴ at
    sf10), so they ride DECIMAL(18,0)×DECIMAL(18,0) → DECIMAL(37,0)
    products (hugeint on the DuckDB side) — exact through sf1000
    (dev ≤ 10¹⁵, products ≤ 10³⁰ « 10³⁸).

    Scale plan: one hash-agg to (type, day) grain — the only
    full-table work; the LAG windows and the dev sums all run over
    that bounded aggregated relation (days × types), partitioned by
    event_type.  Lags materialize as 7 window-lag columns in one
    Window node, not 7 self-joins.
    """
    acf = _acf_numerators(_daily_counts(spark, sf_dir), _ACF_MAX_LAG)
    pairs = ", ".join(
        f"{k}, CAST(FLOOR(CAST(num{k} AS DOUBLE) / CAST(den AS DOUBLE)"
        f" * 1e6 + 0.5) AS DOUBLE) / 1e6"
        for k in range(1, _ACF_MAX_LAG + 1)
    )
    return (
        acf.selectExpr(
            "event_type",
            f"map({pairs}) AS acf_by_lag_map",
        )
        .selectExpr(
            "event_type",
            "explode(acf_by_lag_map) AS (lag, acf)",
        )
        .orderBy("event_type", "lag")
    )


def _daily_counts(spark, sf_dir):
    """The (event_type, day, y) daily-count relation every dependence
    diagnostic starts from — and the SAME relation the streaming
    daily-count state (`streaming/timeseries.BURST_STATE_SCHEMA`)
    folds to, which is what makes the read_* twins of burstiness /
    pacf / stl / hurst column-identical by construction."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_type", F.to_date("ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )


def _acf_numerators(daily, max_lag):
    """(event_type, den, num1..num{max_lag}) — the exact-integer ACF
    cross products of `q_acf_lags`'s docstring, shared with the PACF
    solve so both read the identical deviations relation."""
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("s"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    dev = (
        daily.join(F.broadcast(stats), "event_type")
        .withColumn(
            "dev",
            (F.col("y") * F.col("n") - F.col("s")).cast("decimal(18,0)"),
        )
    )
    for k in range(1, max_lag + 1):
        dev = dev.withColumn(f"dev_l{k}", F.lag("dev", k).over(w))
    return dev.groupBy("event_type").agg(
        F.sum(F.col("dev") * F.col("dev")).alias("den"),
        *[
            F.sum(F.col("dev") * F.col(f"dev_l{k}")).alias(f"num{k}")
            for k in range(1, max_lag + 1)
        ],
    )


def _sql_acf_lags() -> str:
    lag_cols = ",\n         ".join(
        f"LAG(dev, {k}) OVER w AS dev_l{k}"
        for k in range(1, _ACF_MAX_LAG + 1)
    )
    nums = ",\n         ".join(
        f"SUM(dev * dev_l{k}) AS num{k}"
        for k in range(1, _ACF_MAX_LAG + 1)
    )
    rows = "\n  UNION ALL\n".join(
        f"  SELECT event_type, {k} AS lag,"
        f" CAST(FLOOR(CAST(num{k} AS DOUBLE) / CAST(den AS DOUBLE)"
        f" * 1e6 + 0.5) AS DOUBLE) / 1e6 AS acf FROM acf"
        for k in range(1, _ACF_MAX_LAG + 1)
    )
    return f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2),
stats AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS s
  FROM daily GROUP BY 1),
dev AS (
  SELECT d.event_type, d.day, (d.y * st.n - st.s) AS dev,
         {lag_cols}
  FROM daily d JOIN stats st USING (event_type)
  WINDOW w AS (PARTITION BY d.event_type ORDER BY d.day)),
acf AS (
  SELECT event_type,
         SUM(dev * dev) AS den,
         {nums}
  FROM dev GROUP BY 1)
SELECT event_type, CAST(lag AS INT) AS lag, acf FROM (
{rows}
)
ORDER BY event_type, lag
"""


SQL_ACF_LAGS = _sql_acf_lags()


_PACF_MAX_LAG = 5


def _dl_program(max_lag: int) -> list[tuple[str, str]]:
    """Durbin–Levinson recursion unrolled to a (name, expr) program
    over det6-rounded ACF columns r1..r{max_lag} — one shared text so
    Spark and DuckDB execute bit-identical double arithmetic (the
    `_BURST_PROG` discipline).  phi_k_k is the PACF at lag k."""
    steps = [("phi_1_1", "r1")]
    for k in range(2, max_lag + 1):
        num = " + ".join(
            f"phi_{k - 1}_{j} * r{k - j}" for j in range(1, k)
        )
        den = " + ".join(
            f"phi_{k - 1}_{j} * r{j}" for j in range(1, k)
        )
        steps.append(
            (f"phi_{k}_{k}", f"(r{k} - ({num})) / (1.0 - ({den}))")
        )
        for j in range(1, k):
            steps.append(
                (
                    f"phi_{k}_{j}",
                    f"phi_{k - 1}_{j} - phi_{k}_{k} * phi_{k - 1}_{k - j}",
                )
            )
    return steps


def q_pacf_lags(spark, sf_dir):
    """Partial autocorrelation of the daily event-count series per
    type at lags 1..5 via the Durbin–Levinson recursion (Durbin 1960)
    over the ACF — the AR-order diagnostic that completes `acf_lags`:
    ACF says "lag 7 correlates", PACF says whether that is a real
    AR(7) term or just propagated AR(1) structure (Box & Jenkins'
    identification step).

    Determinism: the input r_k are det6-rounded BEFORE the recursion
    (both engines start from identical doubles — the ACF itself is
    exact-integer cross products, see `_acf_numerators`), and the
    recursion is one shared unrolled expression program, det6-rounded
    per output.

    Scale plan: everything after the one (type, day) hash-agg runs on
    a ≤|types|-row relation — the recursion is scalar column math,
    no window, no join, no iteration over data.
    """
    return pacf_from_daily(_daily_counts(spark, sf_dir))


def pacf_from_daily(daily):
    """The PACF solve over a (event_type, day, y) daily relation —
    shared by the batch query and `streaming/timeseries.read_pacf`."""
    acf = _acf_numerators(daily, _PACF_MAX_LAG)
    out = acf
    for k in range(1, _PACF_MAX_LAG + 1):
        out = out.withColumn(
            f"r{k}",
            F.expr(
                f"CAST(FLOOR(CAST(num{k} AS DOUBLE)"
                " / CAST(den AS DOUBLE) * 1e6 + 0.5) AS DOUBLE) / 1e6"
            ),
        )
    for name, expr in _dl_program(_PACF_MAX_LAG):
        out = out.withColumn(name, F.expr(expr))
    pairs = ", ".join(
        f"{k}, CAST(FLOOR(phi_{k}_{k} * 1e6 + 0.5) AS DOUBLE) / 1e6"
        for k in range(1, _PACF_MAX_LAG + 1)
    )
    return (
        out.selectExpr("event_type", f"map({pairs}) AS m")
        .selectExpr("event_type", "explode(m) AS (lag, pacf)")
        .orderBy("event_type", "lag")
    )


def _sql_pacf_lags() -> str:
    lag_cols = ",\n         ".join(
        f"LAG(dev, {k}) OVER w AS dev_l{k}"
        for k in range(1, _PACF_MAX_LAG + 1)
    )
    nums = ",\n         ".join(
        f"SUM(dev * dev_l{k}) AS num{k}"
        for k in range(1, _PACF_MAX_LAG + 1)
    )
    rs = ",\n       ".join(
        f"CAST(FLOOR(CAST(num{k} AS DOUBLE) / CAST(den AS DOUBLE)"
        f" * 1e6 + 0.5) AS DOUBLE) / 1e6 AS r{k}"
        for k in range(1, _PACF_MAX_LAG + 1)
    )
    steps = ""
    prev = "r"
    for i, (name, expr) in enumerate(_dl_program(_PACF_MAX_LAG)):
        steps += (
            f", d{i} AS (SELECT *, ({expr}) AS {name} FROM {prev})\n"
        )
        prev = f"d{i}"
    rows = "\n  UNION ALL\n".join(
        f"  SELECT event_type, {k} AS lag,"
        f" CAST(FLOOR(phi_{k}_{k} * 1e6 + 0.5) AS DOUBLE) / 1e6"
        f" AS pacf FROM {prev}"
        for k in range(1, _PACF_MAX_LAG + 1)
    )
    return f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2),
stats AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS s
  FROM daily GROUP BY 1),
dev AS (
  SELECT d.event_type, d.day,
         CAST(d.y * st.n - st.s AS DECIMAL(18,0)) AS dev
  FROM daily d JOIN stats st USING (event_type)),
lagged AS (
  SELECT event_type, dev,
         {lag_cols}
  FROM dev
  WINDOW w AS (PARTITION BY event_type ORDER BY day)),
acf AS (
  SELECT event_type, SUM(dev * dev) AS den,
         {nums}
  FROM lagged GROUP BY 1),
r AS (
  SELECT event_type,
       {rs}
  FROM acf){steps}
SELECT * FROM (
{rows})
ORDER BY event_type, lag
"""


SQL_PACF_LAGS = _sql_pacf_lags()


#: interarrival mean/CV solve on exact integer gap sums (n, Σg, Σg²)
#: — shared expression program, the `_BURST_PROG` discipline
_IAT_PROG = [
    ("mean_g", "CAST(s AS DOUBLE) / CAST(n AS DOUBLE)"),
    ("var_g", "(CAST(q AS DOUBLE) - CAST(s AS DOUBLE)"
              " * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
              " / (CAST(n AS DOUBLE) - 1.0)"),
    ("cv_g", "SQRT(var_g) / mean_g"),
]


def q_interarrival_stats(spark, sf_dir):
    """Interarrival-time profile of each event type: n, mean, CV and
    exact discrete p50/p90/max of the gaps (seconds) between
    consecutive events of the same type — the arrival-process
    fingerprint that pairs with `burstiness` (that query reads daily
    counts; this one reads the actual gaps, where a heavy CV tail
    shows up days before daily aggregates move).

    Determinism: integer-second gaps over the (sec, event_id) total
    order — tie-breaks included, or the gaps themselves would differ
    between engines; percentiles are DISCRETE (actual gap values)
    from the exact gap histogram; mean/CV ride the shared expression
    program on exact integer sums, det6-rounded.

    Scale plan: consecutive-event gaps per TYPE are the
    low-cardinality ordered shape `Window.partitionBy(type)` cannot
    distribute (|types| partitions over 100 TB), so the lead runs on
    `operators/windows.consecutive_pairs_two_level` — deterministic
    HOUR buckets, lead within buckets in parallel, bucket-boundary
    pairs UNIONED in from a span-bounded per-bucket aggregate (round
    14: replaces the r11 range-bucket + checkpoint + per-row stitch
    join; the gap filter drops per-type last rows anyway, so the
    fused pair relation is exactly what this consumes).  The
    percentile pass then runs on the (type, gap) HISTOGRAM, whose
    width is bounded by the time-span value domain, never the stream
    length (the `robust_trimmed_stats` histogram discipline)."""
    from ..operators.windows import consecutive_pairs_two_level

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.unix_timestamp("ts").alias("sec"),
        "event_id",
    )
    led = consecutive_pairs_two_level(
        ev,
        ["sec", "event_id"],
        bucket_col=F.expr("sec DIV 3600"),
        partition_cols=["event_type"],
        out_col="__next",
    )
    gaps = led.select(
        "event_type", (F.col("__next.sec") - F.col("sec")).alias("gap")
    ).where(F.col("gap").isNotNull())
    hist = gaps.groupBy("event_type", "gap").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tot = hist.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.col("gap") * F.col("c")).cast("bigint").alias("s"),
        F.sum(
            F.col("gap").cast("decimal(18,0)")
            * F.col("gap").cast("decimal(18,0)")
            * F.col("c")
        ).alias("q"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("gap")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.join(F.broadcast(tot.select("event_type", "n")),
                    "event_type").withColumn(
        "cum", F.sum("c").over(w)
    )
    pcts = cum.groupBy("event_type").agg(
        F.min(
            F.when(F.col("cum") * 2 >= F.col("n"), F.col("gap"))
        ).cast("bigint").alias("p50_gap_s"),
        F.min(
            F.when(F.col("cum") * 10 >= 9 * F.col("n"), F.col("gap"))
        ).cast("bigint").alias("p90_gap_s"),
        F.max("gap").cast("bigint").alias("max_gap_s"),
    )
    out = tot.join(pcts, "event_type")
    for name, expr in _IAT_PROG:
        out = out.withColumn(name, F.expr(expr))
    det6 = "CAST(FLOOR(({x}) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS {n}"
    return out.selectExpr(
        "event_type",
        "n AS n_gaps",
        det6.format(x="mean_g", n="mean_gap_s"),
        det6.format(x="cv_g", n="cv_gap"),
        "p50_gap_s",
        "p90_gap_s",
        "max_gap_s",
    ).orderBy("event_type")


def _sql_interarrival_stats() -> str:
    steps = ""
    prev = "tot"
    for i, (name, expr) in enumerate(_IAT_PROG):
        steps += f", i{i} AS (SELECT *, ({expr}) AS {name} FROM {prev})\n"
        prev = f"i{i}"
    return f"""
WITH seq AS (
  SELECT event_type,
         LEAD(CAST(floor(epoch(ts)) AS BIGINT)) OVER
           (PARTITION BY event_type
            ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)
           - CAST(floor(epoch(ts)) AS BIGINT) AS gap
  FROM events),
hist AS (
  SELECT event_type, gap, CAST(COUNT(*) AS BIGINT) AS c
  FROM seq WHERE gap IS NOT NULL GROUP BY 1, 2),
tot AS (
  SELECT event_type, CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(gap * c) AS BIGINT) AS s,
         SUM(CAST(gap AS DECIMAL(18,0))
             * CAST(gap AS DECIMAL(18,0)) * c) AS q
  FROM hist GROUP BY 1),
cum AS (
  SELECT h.event_type, h.gap, t.n,
         SUM(h.c) OVER (PARTITION BY h.event_type ORDER BY h.gap)
           AS cum
  FROM hist h JOIN tot t USING (event_type)),
pcts AS (
  SELECT event_type,
         CAST(MIN(CASE WHEN cum * 2 >= n THEN gap END) AS BIGINT)
           AS p50_gap_s,
         CAST(MIN(CASE WHEN cum * 10 >= 9 * n THEN gap END) AS BIGINT)
           AS p90_gap_s,
         CAST(MAX(gap) AS BIGINT) AS max_gap_s
  FROM cum GROUP BY 1){steps}
SELECT t.event_type, t.n AS n_gaps,
       CAST(FLOOR((mean_g) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS mean_gap_s,
       CAST(FLOOR((cv_g) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS cv_gap,
       p.p50_gap_s, p.p90_gap_s, p.max_gap_s
FROM {prev} t JOIN pcts p USING (event_type)
ORDER BY t.event_type
"""


SQL_INTERARRIVAL_STATS = _sql_interarrival_stats()


#: R/S window sizes (dyadic, both fitting the 30-day fixture span)
_HURST_WINDOWS = (8, 16)


def q_hurst_exponent(spark, sf_dir):
    """Hurst exponent of the daily event-count series per type via
    rescaled-range (R/S) analysis (Hurst 1951; Mandelbrot & Wallis'
    estimator): split the series into w-day blocks, compute each
    block's range-of-cumulative-deviations over its standard
    deviation, and read H as the log₂ slope of mean R/S between
    w=8 and w=16.  H≈0.5 is memoryless, H→1 long-range dependent —
    the persistence diagnostic that completes the dependence family
    (`acf_lags` short-range, `burstiness` dispersion, this one
    long-memory).

    Determinism: deviations are scaled by w (dev = w·y − Σy — exact
    BIGINTs, the `acf_lags` trick), so ranges and Σdev² are exact
    integers; each block's R/S is one double expression from those
    integers; the per-(type, w) mean over ≤⌊days/w⌋ blocks rides
    AVG with det6 rounding (the `emb_centroid` rounding-absorbs-
    ulp-order convention), and H is computed from the ROUNDED
    means.

    Scale plan: one hash-agg to (type, day), then every window runs
    partitioned by (type, window, block) over the bounded daily
    relation; block stats are a second bounded hash-agg.  No raw
    event ever enters a window."""
    return hurst_from_daily(_daily_counts(spark, sf_dir))


def hurst_from_daily(daily):
    """The R/S solve over a (event_type, day, y) daily relation —
    shared by the batch query and `streaming/timeseries.read_hurst`."""
    w_idx = Window.partitionBy("event_type").orderBy("day")
    idx = daily.withColumn(
        "i", F.row_number().over(w_idx).cast("bigint") - 1
    )
    per_w = []
    for wsz in _HURST_WINDOWS:
        blk = idx.withColumn("blk", F.expr(f"i DIV {wsz}"))
        w_b = Window.partitionBy("event_type", "blk")
        w_cum = (
            Window.partitionBy("event_type", "blk")
            .orderBy("day")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        dev = (
            blk.withColumn("nb", F.count(F.lit(1)).over(w_b))
            .where(F.col("nb") == wsz)
            .withColumn("sb", F.sum("y").over(w_b))
            .withColumn("dev", F.col("y") * wsz - F.col("sb"))
            .withColumn("cum", F.sum("dev").over(w_cum))
        )
        rs = (
            dev.groupBy("event_type", "blk")
            .agg(
                (F.max("cum") - F.min("cum")).alias("r_scaled"),
                F.sum(F.col("dev") * F.col("dev")).alias("ssq"),
            )
            .selectExpr(
                "event_type",
                # R/S with both R and S de-scaled by w: R = r_scaled/w,
                # S = sqrt(ssq / w^3) (population sd of dev/w over w)
                f"CASE WHEN ssq = 0 THEN NULL ELSE"
                f" (CAST(r_scaled AS DOUBLE) / {wsz}.0)"
                f" / SQRT(CAST(ssq AS DOUBLE) / {wsz * wsz * wsz}.0)"
                " END AS rs",
            )
            .groupBy("event_type")
            .agg(
                F.expr(
                    "CAST(FLOOR(AVG(rs) * 1e6 + 0.5) AS DOUBLE) / 1e6"
                ).alias(f"rs{wsz}")
            )
        )
        per_w.append(rs)
    a, b = per_w
    w0, w1 = _HURST_WINDOWS
    return (
        a.join(b, "event_type")
        .selectExpr(
            "event_type",
            f"rs{w0}",
            f"rs{w1}",
            f"CAST(FLOOR(LN(rs{w1} / rs{w0}) / LN({w1}.0 / {w0}.0)"
            " * 1e6 + 0.5) AS DOUBLE) / 1e6 AS hurst",
        )
        .orderBy("event_type")
    )


def _sql_hurst() -> str:
    parts = []
    for wsz in _HURST_WINDOWS:
        parts.append(f"""rs{wsz} AS (
  SELECT event_type,
         CAST(FLOOR(AVG(rs) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS rs{wsz}
  FROM (
    SELECT event_type, blk,
           CASE WHEN SUM(dev * dev) = 0 THEN NULL ELSE
             (CAST(MAX(cum) - MIN(cum) AS DOUBLE) / {wsz}.0)
             / SQRT(CAST(SUM(dev * dev) AS DOUBLE)
                    / {wsz * wsz * wsz}.0)
           END AS rs
    FROM (
      SELECT event_type, blk, dev,
             SUM(dev) OVER (PARTITION BY event_type, blk
                            ORDER BY day) AS cum
      FROM (
        SELECT event_type, day, blk,
               y * {wsz} - SUM(y) OVER (PARTITION BY event_type, blk)
                 AS dev,
               COUNT(*) OVER (PARTITION BY event_type, blk) AS nb
        FROM (
          SELECT event_type, day, y,
                 (ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY day) - 1) // {wsz} AS blk
          FROM daily))
      WHERE nb = {wsz})
    GROUP BY 1, 2)
  GROUP BY 1)""")
    w0, w1 = _HURST_WINDOWS
    return f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2),
{", ".join(parts)}
SELECT a.event_type, a.rs{w0}, b.rs{w1},
       CAST(FLOOR(LN(b.rs{w1} / a.rs{w0}) / LN({w1}.0 / {w0}.0)
            * 1e6 + 0.5) AS DOUBLE) / 1e6 AS hurst
FROM rs{w0} a JOIN rs{w1} b USING (event_type)
ORDER BY a.event_type
"""


SQL_HURST_EXPONENT = _sql_hurst()


#: classical additive decomposition parameters: centered 7-day MA
#: trend, day-of-week seasonal, 2.5σ residual flag
_STL_MA = 7
_STL_SIGMA = 2.5


def q_stl_decompose(spark, sf_dir):
    """Classical additive decomposition of the daily event-count
    series per type — trend (centered 7-day moving average), seasonal
    (day-of-week mean of the detrended series), residual, and a
    2.5σ residual anomaly flag: the explainable workhorse behind
    "is today actually anomalous or just a Monday?" (the decomposed
    form of what `seasonal_dow_index` + `anomaly_mad` answer
    separately; Cleveland et al.'s STL is the LOESS refinement of
    this same skeleton).

    Determinism: the trend is an exact integer 7-day sum scaled by 7
    (trend7 = Σy over the window; detrended7 = 7y − trend7 — all
    BIGINT); the seasonal means keep exact (Σdetrended7, count)
    rationals per (type, dow); floats appear only in the final shared
    expression steps, det6-rounded.  Rows without a full 7-day
    window drop (the classical edge rule), so every engine sees the
    identical support.

    Scale plan: one hash-agg to the (type, day) grain; every window
    after that runs on the bounded daily relation (≤ types×days
    rows — the value-domain-bounded class, like `acf_lags`); the
    seasonal and sigma relations broadcast back as ≤types×7-row
    equi-joins.  Assumes a dense daily spine per type (pair with
    `timeseries_gapfill` upstream when days can be empty)."""
    return stl_from_daily(_daily_counts(spark, sf_dir))


def stl_from_daily(daily):
    """The decomposition solve over a (event_type, day, y) daily
    relation — shared by the batch query and
    `streaming/timeseries.read_stl_decompose`."""
    half = _STL_MA // 2
    w_ma = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-half, half)
    )
    tr = (
        daily.withColumn("trend7", F.sum("y").over(w_ma))
        .withColumn("w_n", F.count(F.lit(1)).over(w_ma))
        .where(F.col("w_n") == _STL_MA)
        .withColumn("det7", F.col("y") * _STL_MA - F.col("trend7"))
        .withColumn("dow", F.weekday("day").cast("int"))
    )
    seas = tr.groupBy("event_type", "dow").agg(
        F.sum("det7").cast("bigint").alias("sn"),
        F.count(F.lit(1)).cast("bigint").alias("sd"),
    )
    joined = tr.join(F.broadcast(seas), ["event_type", "dow"]).select(
        "event_type",
        "day",
        "y",
        "sd",
        (F.col("trend7") / F.lit(float(_STL_MA))).alias("trend_d"),
        (
            F.col("det7") / F.lit(float(_STL_MA))
            - F.col("sn")
            / (F.col("sd") * F.lit(float(_STL_MA)))
        ).alias("resid_d"),
        (F.col("sn") / (F.col("sd") * F.lit(float(_STL_MA)))).alias(
            "seas_d"
        ),
        # the residual as an exact integer scaled by 7·sd — the
        # sigma pass must not ride order-dependent float sums
        (F.col("det7") * F.col("sd") - F.col("sn"))
        .cast("decimal(18,0)")
        .alias("rsc"),
    )
    # Exact-integer sigma: per-dow residual sums are EXACTLY zero by
    # construction (the seasonal mean removes them), so the variance
    # is Σr²/(rn−1); and under the documented dense-spine assumption
    # the per-dow week counts sd take at most TWO values (q, q+1) in
    # a contiguous range, so Σr² splits into two exact DECIMAL sums
    # with fixed scales — the final sd_r is one fixed-shape double
    # expression, bit-equal in both engines (no float fold anywhere;
    # the reviewer-caught gap in the first shipped version).  If a
    # gapped spine ever makes sd take >2 values, the flag goes NULL
    # instead of silently using a wrong scale.
    qs = seas.groupBy("event_type").agg(
        F.min("sd").cast("bigint").alias("qmin"),
        F.max("sd").cast("bigint").alias("qmax"),
        F.count_distinct("sd").cast("bigint").alias("nd"),
    )
    m2 = _STL_MA * _STL_MA
    sig = (
        joined.join(F.broadcast(qs), "event_type")
        .groupBy("event_type", "qmin", "qmax", "nd")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("rn"),
            F.sum(
                F.when(F.col("sd") == F.col("qmin"),
                       F.col("rsc") * F.col("rsc"))
            ).alias("ssq_lo"),
            F.sum(
                F.when(F.col("sd") != F.col("qmin"),
                       F.col("rsc") * F.col("rsc"))
            ).alias("ssq_hi"),
        )
        .selectExpr(
            "event_type",
            "nd",
            f"SQRT((CAST(COALESCE(ssq_lo, 0) AS DOUBLE)"
            f" / ({m2}.0 * qmin * qmin)"
            f" + CAST(COALESCE(ssq_hi, 0) AS DOUBLE)"
            f" / ({m2}.0 * qmax * qmax))"
            " / (rn - 1.0)) AS sd_r",
        )
    )
    det6 = "CAST(FLOOR(({x}) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS {n}"
    return (
        joined.join(F.broadcast(sig), "event_type")
        .selectExpr(
            "event_type",
            "day",
            "y",
            det6.format(x="trend_d", n="trend"),
            det6.format(x="seas_d", n="seasonal"),
            det6.format(x="resid_d", n="residual"),
            f"CASE WHEN nd > 2 THEN NULL"
            f" ELSE ABS(resid_d) > {_STL_SIGMA} * sd_r END"
            " AS is_anomaly",
        )
        .orderBy("event_type", "day")
    )


SQL_STL_DECOMPOSE = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2),
ma AS (
  SELECT event_type, day, y,
         SUM(y) OVER w AS trend7,
         COUNT(*) OVER w AS w_n
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN {_STL_MA // 2} PRECEDING
                        AND {_STL_MA // 2} FOLLOWING)),
tr AS (
  SELECT event_type, day, y, trend7,
         y * {_STL_MA} - trend7 AS det7,
         CAST(isodow(day) - 1 AS INT) AS dow
  FROM ma WHERE w_n = {_STL_MA}),
seas AS (
  SELECT event_type, dow, CAST(SUM(det7) AS BIGINT) AS sn,
         CAST(COUNT(*) AS BIGINT) AS sd
  FROM tr GROUP BY 1, 2),
joined AS (
  SELECT t.event_type, t.day, t.y, s.sd,
         t.trend7 / {_STL_MA}.0 AS trend_d,
         t.det7 / {_STL_MA}.0 - s.sn / (s.sd * {_STL_MA}.0) AS resid_d,
         s.sn / (s.sd * {_STL_MA}.0) AS seas_d,
         CAST(t.det7 * s.sd - s.sn AS DECIMAL(18,0)) AS rsc
  FROM tr t JOIN seas s USING (event_type, dow)),
qs AS (
  SELECT event_type, CAST(MIN(sd) AS BIGINT) AS qmin,
         CAST(MAX(sd) AS BIGINT) AS qmax,
         CAST(COUNT(DISTINCT sd) AS BIGINT) AS nd
  FROM seas GROUP BY 1),
sig AS (
  SELECT j.event_type, q.nd,
         SQRT((CAST(COALESCE(SUM(CASE WHEN j.sd = q.qmin
                    THEN j.rsc * j.rsc END), 0) AS DOUBLE)
               / ({_STL_MA * _STL_MA}.0 * q.qmin * q.qmin)
               + CAST(COALESCE(SUM(CASE WHEN j.sd <> q.qmin
                      THEN j.rsc * j.rsc END), 0) AS DOUBLE)
               / ({_STL_MA * _STL_MA}.0 * q.qmax * q.qmax))
              / (COUNT(*) - 1.0)) AS sd_r
  FROM joined j JOIN qs q USING (event_type)
  GROUP BY 1, 2, q.qmin, q.qmax)
SELECT j.event_type, j.day, j.y,
       CAST(FLOOR((trend_d) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS trend,
       CAST(FLOOR((seas_d) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS seasonal,
       CAST(FLOOR((resid_d) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS residual,
       CASE WHEN sig.nd > 2 THEN NULL
            ELSE ABS(resid_d) > {_STL_SIGMA} * sd_r END AS is_anomaly
FROM joined j JOIN sig USING (event_type)
ORDER BY j.event_type, j.day
"""


def q_seasonal_dow_index(spark, sf_dir):
    """Day-of-week seasonal index per event type — the
    ratio-to-average decomposition step (classical seasonal
    adjustment): index(dow) = mean daily count on that weekday ÷ mean
    daily count overall.  An index of 1.2 on Mondays says Mondays run
    20% hot; downstream capacity planning divides by it.

    Determinism: the index is a ratio of two rational numbers with
    exact integer parts — (s_d·n_t) / (c_d·S_t) — one double
    division at the end, 6-dp rounded.  int64 headroom: s_d·n_t ≤
    total_events·days ≈ 10¹² at sf1000's 30-day span.

    Scale plan: one hash-agg to (type, day) grain, a second to
    (type, dow) grain (≤ types×7 rows), per-type totals broadcast
    back — no window anywhere, no scalar cross join (totals join on
    event_type, a normal broadcast equi-join).
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select("event_type", F.to_date("ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    # dayofweek(): Spark is 1=Sunday; ISO via weekday() (0=Monday)
    dow = (
        daily.withColumn("dow", F.weekday("day").cast("int"))
        .groupBy("event_type", "dow")
        .agg(
            F.sum("y").cast("bigint").alias("s_d"),
            F.count(F.lit(1)).cast("bigint").alias("c_d"),
        )
    )
    tot = daily.groupBy("event_type").agg(
        F.sum("y").cast("bigint").alias("s_t"),
        F.count(F.lit(1)).cast("bigint").alias("n_t"),
    )
    return (
        dow.join(F.broadcast(tot), "event_type")
        .selectExpr(
            "event_type",
            "dow",
            "s_d AS day_events",
            "CAST(FLOOR(CAST(s_d * n_t AS DOUBLE)"
            " / CAST(c_d * s_t AS DOUBLE) * 1e6 + 0.5) AS DOUBLE)"
            " / 1e6 AS seasonal_index",
        )
        .orderBy("event_type", "dow")
    )


SQL_SEASONAL_DOW_INDEX = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2),
dow AS (
  SELECT event_type, CAST(isodow(day) - 1 AS INT) AS dow,
         CAST(SUM(y) AS BIGINT) AS s_d,
         CAST(COUNT(*) AS BIGINT) AS c_d
  FROM daily GROUP BY 1, 2),
tot AS (
  SELECT event_type, CAST(SUM(y) AS BIGINT) AS s_t,
         CAST(COUNT(*) AS BIGINT) AS n_t
  FROM daily GROUP BY 1)
SELECT event_type, dow, s_d AS day_events,
       CAST(FLOOR(CAST(s_d * n_t AS DOUBLE)
         / CAST(c_d * s_t AS DOUBLE) * 1e6 + 0.5) AS DOUBLE) / 1e6
         AS seasonal_index
FROM dow JOIN tot USING (event_type)
ORDER BY event_type, dow
"""


def q_forecast_seasonal_naive(spark, sf_dir):
    """Seasonal-naive forecast evaluation per event type — the
    baseline every forecasting system must beat before it ships
    (Hyndman & Athanasopoulos: "if you can't beat seasonal-naive,
    don't deploy"): predict each day's count with the count 7 days
    earlier, score MAE against the 1-day-naive on the SAME eval days,
    and report the skill 1 − MAE_seasonal/MAE_naive (positive ⇒
    weekly structure is real and exploitable — the decision `acf_lags`
    diagnoses, quantified in forecast units).

    Determinism: counts and absolute errors are exact BIGINTs; the
    two MAEs and the skill pay one det6 division each.  Eval days are
    exactly those with a lag-7 predecessor, the same set for both
    baselines (so the comparison is apples-to-apples).

    Scale plan: one hash-agg to the (type, day) grain; both lags come
    from ONE type-partitioned window node over that bounded relation;
    the scoring agg is ≤|types| rows.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select("event_type", F.to_date("ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.withColumn("y7", F.lag("y", 7).over(w)).withColumn(
        "y1", F.lag("y", 1).over(w)
    )
    return (
        lagged.where(F.col("y7").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_eval_days"),
            F.sum(F.abs(F.col("y") - F.col("y7")))
            .cast("bigint")
            .alias("ae7"),
            F.sum(F.abs(F.col("y") - F.col("y1")))
            .cast("bigint")
            .alias("ae1"),
        )
        .selectExpr(
            "event_type",
            "n_eval_days",
            "CAST(FLOOR(CAST(ae7 AS DOUBLE) / n_eval_days * 1e6 + 0.5)"
            " AS DOUBLE) / 1e6 AS mae_seasonal",
            "CAST(FLOOR(CAST(ae1 AS DOUBLE) / n_eval_days * 1e6 + 0.5)"
            " AS DOUBLE) / 1e6 AS mae_naive",
            "CAST(FLOOR((1.0 - CAST(ae7 AS DOUBLE)"
            " / NULLIF(CAST(ae1 AS DOUBLE), 0.0)) * 1e6 + 0.5)"
            " AS DOUBLE) / 1e6 AS skill",
        )
        .orderBy("event_type")
    )


SQL_FORECAST_SEASONAL_NAIVE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2),
lagged AS (
  SELECT event_type, day, y,
         LAG(y, 7) OVER w AS y7,
         LAG(y, 1) OVER w AS y1
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day)),
scored AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_eval_days,
         CAST(SUM(ABS(y - y7)) AS BIGINT) AS ae7,
         CAST(SUM(ABS(y - y1)) AS BIGINT) AS ae1
  FROM lagged WHERE y7 IS NOT NULL
  GROUP BY 1)
SELECT event_type, n_eval_days,
       CAST(FLOOR(CAST(ae7 AS DOUBLE) / n_eval_days * 1e6 + 0.5)
         AS DOUBLE) / 1e6 AS mae_seasonal,
       CAST(FLOOR(CAST(ae1 AS DOUBLE) / n_eval_days * 1e6 + 0.5)
         AS DOUBLE) / 1e6 AS mae_naive,
       CAST(FLOOR((1.0 - CAST(ae7 AS DOUBLE)
         / NULLIF(CAST(ae1 AS DOUBLE), 0.0)) * 1e6 + 0.5)
         AS DOUBLE) / 1e6 AS skill
FROM scored
ORDER BY event_type
"""


def q_theil_sen(spark, sf_dir):
    """Theil–Sen robust trend per event type — the median of all
    pairwise slopes of the daily-count series (Sen 1968): immune to
    the outlier days that drag `trend_regression`'s OLS slope around
    (breakdown point 29%).  The robust/classical pair mirrors
    `robust_trimmed_stats` vs plain means.

    Determinism: slopes are (y_j−y_i)/(day_j−day_i) on exact integers
    — one deterministic double division per pair; the median is the
    exact ceil-rank element of the per-type pair relation (an ACTUAL
    slope value, no interpolation), ties broken stably because equal
    doubles are interchangeable under rank-min selection.

    Scale plan: the pair grid is built per type from the BOUNDED
    daily relation (≤days² /2 pairs per type — hundreds of rows at a
    30-day span regardless of corpus size), via a self-equi-join on
    event_type with a day inequality; the rank rides a
    type-partitioned window over that bounded pair relation.  Raw
    events only ever pass through the one (type, day) hash-agg.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select("event_type", F.to_date("ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    a = daily.select(
        "event_type", F.col("day").alias("d1"), F.col("y").alias("y1")
    )
    b = daily.select(
        "event_type", F.col("day").alias("d2"), F.col("y").alias("y2")
    )
    pairs = a.join(b, "event_type").where(F.col("d2") > F.col("d1"))
    slopes = pairs.select(
        "event_type",
        (
            (F.col("y2") - F.col("y1"))
            / F.datediff("d2", "d1").cast("double")
        ).alias("slope"),
    )
    n = slopes.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )
    w = Window.partitionBy("event_type").orderBy("slope")
    ranked = slopes.withColumn("rk", F.row_number().over(w)).join(
        F.broadcast(n), "event_type"
    )
    return (
        ranked.where(
            (F.col("rk") * 2 == F.col("n_pairs"))
            | (F.col("rk") * 2 == F.col("n_pairs") + 1)
        )
        .groupBy("event_type", "n_pairs")
        .agg(F.min("slope").alias("sen_slope_raw"))
        .selectExpr(
            "event_type",
            "n_pairs",
            "CAST(FLOOR(sen_slope_raw * 1e6 + 0.5) AS DOUBLE) / 1e6"
            " AS sen_slope",
        )
        .orderBy("event_type")
    )


SQL_THEIL_SEN = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2),
pairs AS (
  SELECT a.event_type,
         (b.y - a.y) / CAST(date_diff('day', a.day, b.day) AS DOUBLE)
           AS slope
  FROM daily a JOIN daily b
       ON a.event_type = b.event_type AND b.day > a.day),
n AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM pairs GROUP BY 1),
ranked AS (
  SELECT p.event_type, p.slope, n.n_pairs,
         ROW_NUMBER() OVER (PARTITION BY p.event_type
                            ORDER BY p.slope) AS rk
  FROM pairs p JOIN n USING (event_type))
SELECT event_type, n_pairs,
       CAST(FLOOR(MIN(slope) * 1e6 + 0.5) AS DOUBLE) / 1e6
         AS sen_slope
FROM ranked
WHERE rk * 2 = n_pairs OR rk * 2 = n_pairs + 1
GROUP BY 1, 2
ORDER BY event_type
"""


#: burstiness solve on exact integer daily-count sums (n = days,
#: s = Σy, q = Σy²) — shared expression program
_BURST_PROG = [
    ("mean_d", "CAST(s AS DOUBLE) / CAST(n AS DOUBLE)"),
    ("var_d", "(CAST(q AS DOUBLE) - CAST(s AS DOUBLE)"
              " * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
              " / (CAST(n AS DOUBLE) - 1.0)"),
    ("fano", "var_d / mean_d"),
    ("burst", "(SQRT(var_d) - mean_d) / (SQRT(var_d) + mean_d)"),
]


def q_burstiness(spark, sf_dir):
    """Burstiness descriptors of the daily event-count series per
    type: the Fano factor (variance/mean — 1 for a Poisson process,
    >1 overdispersed) and the Goh–Barabási burstiness coefficient
    B = (σ−μ)/(σ+μ) ∈ (−1, 1) (0 ≈ Poisson, →1 bursty, →−1
    regular).  The one-line answer to "is this event stream
    clock-like or bursty?" that decides whether rate alerts need
    Poisson or heavy-tailed thresholds — the descriptive companion to
    `cusum_changepoints` (level shifts) and `acf_lags` (periodicity).

    Determinism: n, Σy, Σy² are exact integers from the daily
    hash-agg (Σy² in DECIMAL past int64 at extreme scales); the solve
    is one shared expression program, det6-rounded.

    Scale plan: one hash-agg to (type, day), one to ≤|types| rows of
    sums, scalar math.  No window, no join.
    """
    return burstiness_from_daily(_daily_counts(spark, sf_dir))


def burstiness_from_daily(daily):
    """The burstiness solve over a (event_type, day, y) daily-count
    relation — shared by the batch query and the streaming twin
    (`streaming/timeseries.read_burstiness`), so the stream fold is
    column-identical by construction."""
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("s"),
        F.sum(
            F.col("y").cast("decimal(18,0)")
            * F.col("y").cast("decimal(18,0)")
        ).alias("q"),
    )
    out = stats
    for name, expr in _BURST_PROG:
        out = out.withColumn(name, F.expr(expr))
    det6 = "CAST(FLOOR(({x}) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS {n}"
    return out.selectExpr(
        "event_type",
        "n AS n_days",
        det6.format(x="mean_d", n="mean_daily"),
        det6.format(x="fano", n="fano_factor"),
        det6.format(x="burst", n="burstiness"),
    ).orderBy("event_type")


def _sql_burstiness() -> str:
    steps = ""
    prev = "stats"
    for i, (name, expr) in enumerate(_BURST_PROG):
        steps += f", b{i} AS (SELECT *, ({expr}) AS {name} FROM {prev})\n"
        prev = f"b{i}"
    return f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2),
stats AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS s,
         SUM(y * y) AS q
  FROM daily GROUP BY 1){steps}
SELECT event_type, n AS n_days,
       CAST(FLOOR((mean_d) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS mean_daily,
       CAST(FLOOR((fano) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS fano_factor,
       CAST(FLOOR((burst) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS burstiness
FROM {prev}
ORDER BY event_type
"""


SQL_BURSTINESS = _sql_burstiness()



#: Holt linear (double exponential) smoothing constants — dyadic so
#: every blend is an exact IEEE operation, and the classic textbook
#: defaults sit nearby (α=0.5 level, β=0.25 trend)
_HOLT_ALPHA = 0.5
_HOLT_BETA = 0.25
_HOLT_HORIZON = 7


def q_holt_linear_forecast(spark, sf_dir):
    """Holt linear-trend exponential smoothing per event type — the
    level+trend forecaster between `forecast_seasonal_naive` (no
    model) and `stl_decompose` (full decomposition): lvl' = αy +
    (1−α)(lvl+tr), tr' = β(lvl'−lvl) + (1−β)tr, h-step forecast
    lvl + h·tr, with the one-step-ahead RMSE the model is judged by
    (Holt 1957; Hyndman & Athanasopoulos FPP §8.2).

    This is the repo's first TRUE IIR recursion (ewma_smooth
    deliberately approximates with an 8-tap FIR): the state fold runs
    as a higher-order AGGREGATE over the day-sorted series, and the
    oracle replays it as a recursive CTE — both engines execute the
    IDENTICAL sequence of double operations in the identical order,
    so the smoothed state matches bitwise before the det6 floor.

    Scale plan: the fold input is the (type, day, y) DAILY relation
    (`_daily_counts` — the streaming twins' shared front end), whose
    per-type width is bounded by the TIME SPAN, never the event
    count; one hash-agg to per-type sorted arrays, then map-side
    lambda math.  At a 10-year span that is ≤3653 elements per type.

    Measured (bench_one, min-of-2): sf1 0.75 s / sf10 0.97 s — flat,
    as a day-span-bounded fold must be."""
    return holt_from_daily(_daily_counts(spark, sf_dir))


def holt_from_daily(daily):
    """The Holt solve over a `(event_type, day, y)` relation — shared
    by the batch query and the streaming fold."""
    a, b = _HOLT_ALPHA, _HOLT_BETA
    series = daily.groupBy("event_type").agg(
        F.expr(
            "transform(array_sort(collect_list(named_struct("
            "'day', day, 'y', y))), p -> CAST(p.y AS DOUBLE))"
        ).alias("ys")
    )
    step = (
        f"named_struct("
        f"'lvl', {a} * y + {1 - a} * (acc.lvl + acc.tr),"
        f"'tr', {b} * (({a} * y + {1 - a} * (acc.lvl + acc.tr))"
        f" - acc.lvl) + {1 - b} * acc.tr,"
        f"'sse', acc.sse + (y - (acc.lvl + acc.tr))"
        f" * (y - (acc.lvl + acc.tr)))"
    )
    det6 = "CAST(FLOOR(({x}) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS {n}"
    return (
        series.selectExpr(
            "event_type",
            "size(ys) AS n_days",
            f"""AGGREGATE(
              slice(ys, 2, size(ys) - 1),
              named_struct('lvl', ys[0], 'tr', CAST(0.0 AS DOUBLE),
                           'sse', CAST(0.0 AS DOUBLE)),
              (acc, y) -> {step}) AS st""",
        )
        .selectExpr(
            "event_type",
            "CAST(n_days AS BIGINT) AS n_days",
            det6.format(x="st.lvl", n="level"),
            det6.format(x="st.tr", n="trend"),
            det6.format(
                x=f"st.lvl + {_HOLT_HORIZON}.0 * st.tr",
                n="forecast_7d",
            ),
            det6.format(
                x="SQRT(st.sse / CAST(n_days - 1 AS DOUBLE))",
                n="rmse_1step",
            ),
        )
        .orderBy("event_type")
    )


def _sql_holt_linear_forecast() -> str:
    a, b = _HOLT_ALPHA, _HOLT_BETA
    lvl_new = f"({a} * d.y + {1 - a} * (r.lvl + r.tr))"
    return f"""
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2),
idx AS (
  SELECT event_type,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type
              ORDER BY day) - 1 AS BIGINT) AS i,
         CAST(y AS DOUBLE) AS y
  FROM daily),
n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
      FROM idx GROUP BY 1),
r (event_type, i, lvl, tr, sse) AS (
  SELECT event_type, i, y, CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)
  FROM idx WHERE i = 0
  UNION ALL
  SELECT r.event_type, d.i,
         {lvl_new},
         {b} * ({lvl_new} - r.lvl) + {1 - b} * r.tr,
         r.sse + (d.y - (r.lvl + r.tr)) * (d.y - (r.lvl + r.tr))
  FROM r JOIN idx d ON d.event_type = r.event_type
                   AND d.i = r.i + 1),
fin AS (
  SELECT r.event_type, r.lvl, r.tr, r.sse
  FROM r JOIN n USING (event_type) WHERE r.i = n.n_days - 1)
SELECT f.event_type, n.n_days,
       CAST(FLOOR(f.lvl * 1e6 + 0.5) AS DOUBLE) / 1e6 AS level,
       CAST(FLOOR(f.tr * 1e6 + 0.5) AS DOUBLE) / 1e6 AS trend,
       CAST(FLOOR((f.lvl + {_HOLT_HORIZON}.0 * f.tr) * 1e6 + 0.5)
            AS DOUBLE) / 1e6 AS forecast_7d,
       CAST(FLOOR(SQRT(f.sse / CAST(n.n_days - 1 AS DOUBLE))
            * 1e6 + 0.5) AS DOUBLE) / 1e6 AS rmse_1step
FROM fin f JOIN n USING (event_type)
ORDER BY f.event_type
"""


SQL_HOLT_LINEAR_FORECAST = _sql_holt_linear_forecast()



def q_forecast_backtest(spark, sf_dir):
    """Forecaster bake-off per event type — the model-selection gauge
    for the forecasting ladder (`retrieval_eval`'s pattern applied to
    time series): one-step-ahead RMSE of naive-1 (yesterday), naive-7
    (same weekday last week), and Holt linear smoothing, all scored
    over the SAME eval window (observations 8+, so every model has
    its inputs), plus the winner.  "If you can't beat seasonal-naive,
    don't deploy" needs this table to be checkable.

    Determinism: naive errors are exact integers squared; Holt errors
    ride the `holt_linear_forecast` fold (identical double-op order
    in both engines) with the warmup-gated SSE counted only from
    observation index 7; the winner compares det6-rounded RMSEs in a
    fixed CASE order.

    Scale plan: the bounded daily relation through one
    type-partitioned lag window (naive side) + one per-type
    higher-order fold (Holt side), joined on ≤|types| rows.

    Measured (bench_one, min-of-2): sf1 0.96 s / sf10 1.16 s — flat."""
    return backtest_from_daily(_daily_counts(spark, sf_dir))


def backtest_from_daily(daily):
    """The forecaster bake-off over a `(event_type, day, y)` relation
    — shared by the batch query and the streaming fold."""
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.withColumn("y7", F.lag("y", 7).over(w)).withColumn(
        "y1", F.lag("y", 1).over(w)
    )
    naive = (
        lagged.where(F.col("y7").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_eval"),
            F.sum(
                (F.col("y") - F.col("y1")) * (F.col("y") - F.col("y1"))
            )
            .cast("bigint")
            .alias("se1"),
            F.sum(
                (F.col("y") - F.col("y7")) * (F.col("y") - F.col("y7"))
            )
            .cast("bigint")
            .alias("se7"),
        )
    )
    a, b = _HOLT_ALPHA, _HOLT_BETA
    series = daily.groupBy("event_type").agg(
        F.expr(
            "transform(array_sort(collect_list(named_struct("
            "'day', day, 'y', y))), p -> CAST(p.y AS DOUBLE))"
        ).alias("ys")
    )
    step = (
        f"named_struct("
        f"'lvl', {a} * y + {1 - a} * (acc.lvl + acc.tr),"
        f"'tr', {b} * (({a} * y + {1 - a} * (acc.lvl + acc.tr))"
        f" - acc.lvl) + {1 - b} * acc.tr,"
        f"'i', acc.i + 1,"
        f"'sse', acc.sse + (CASE WHEN acc.i >= 7 THEN"
        f" (y - (acc.lvl + acc.tr)) * (y - (acc.lvl + acc.tr))"
        f" ELSE 0.0 END))"
    )
    holt = series.selectExpr(
        "event_type",
        f"""AGGREGATE(
          slice(ys, 2, size(ys) - 1),
          named_struct('lvl', ys[0], 'tr', CAST(0.0 AS DOUBLE),
                       'i', 1, 'sse', CAST(0.0 AS DOUBLE)),
          (acc, y) -> {step}).sse AS sse_holt""",
    )
    det6 = "CAST(FLOOR(({x}) * 1e6 + 0.5) AS DOUBLE) / 1e6"
    r1 = det6.format(x="SQRT(CAST(se1 AS DOUBLE) / n_eval)")
    r7 = det6.format(x="SQRT(CAST(se7 AS DOUBLE) / n_eval)")
    rh = det6.format(x="SQRT(sse_holt / n_eval)")
    return (
        naive.join(holt, "event_type")
        .selectExpr(
            "event_type",
            "n_eval AS n_eval_days",
            f"{r1} AS rmse_naive1",
            f"{r7} AS rmse_naive7",
            f"{rh} AS rmse_holt",
            f"CASE WHEN {rh} <= {r7} AND {rh} <= {r1} THEN 'holt'"
            f" WHEN {r7} <= {r1} THEN 'naive7'"
            f" ELSE 'naive1' END AS best_model",
        )
        .orderBy("event_type")
    )


def _sql_forecast_backtest() -> str:
    a, b = _HOLT_ALPHA, _HOLT_BETA
    lvl_new = f"({a} * d.y + {1 - a} * (r.lvl + r.tr))"
    det6 = "CAST(FLOOR(({x}) * 1e6 + 0.5) AS DOUBLE) / 1e6"
    r1 = det6.format(x="SQRT(CAST(se1 AS DOUBLE) / n_eval)")
    r7 = det6.format(x="SQRT(CAST(se7 AS DOUBLE) / n_eval)")
    rh = det6.format(x="SQRT(sse_holt / n_eval)")
    return f"""
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2),
lagged AS (
  SELECT event_type, y,
         LAG(y, 1) OVER (PARTITION BY event_type ORDER BY day) AS y1,
         LAG(y, 7) OVER (PARTITION BY event_type ORDER BY day) AS y7
  FROM daily),
naive AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_eval,
         CAST(SUM((y - y1) * (y - y1)) AS BIGINT) AS se1,
         CAST(SUM((y - y7) * (y - y7)) AS BIGINT) AS se7
  FROM lagged WHERE y7 IS NOT NULL GROUP BY 1),
idx AS (
  SELECT event_type,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type
              ORDER BY day) - 1 AS BIGINT) AS i,
         CAST(y AS DOUBLE) AS y
  FROM daily),
n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
      FROM idx GROUP BY 1),
r (event_type, i, lvl, tr, sse) AS (
  SELECT event_type, i, y, CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)
  FROM idx WHERE i = 0
  UNION ALL
  SELECT r.event_type, d.i,
         {lvl_new},
         {b} * ({lvl_new} - r.lvl) + {1 - b} * r.tr,
         r.sse + (CASE WHEN d.i >= 7 THEN
           (d.y - (r.lvl + r.tr)) * (d.y - (r.lvl + r.tr))
           ELSE 0.0 END)
  FROM r JOIN idx d ON d.event_type = r.event_type
                   AND d.i = r.i + 1),
holt AS (
  SELECT r.event_type, r.sse AS sse_holt
  FROM r JOIN n USING (event_type) WHERE r.i = n.n_days - 1)
SELECT event_type,
       n_eval AS n_eval_days,
       {r1} AS rmse_naive1,
       {r7} AS rmse_naive7,
       {rh} AS rmse_holt,
       CASE WHEN {rh} <= {r7} AND {rh} <= {r1} THEN 'holt'
            WHEN {r7} <= {r1} THEN 'naive7'
            ELSE 'naive1' END AS best_model
FROM naive JOIN holt USING (event_type)
ORDER BY event_type
"""


SQL_FORECAST_BACKTEST = _sql_forecast_backtest()



#: SES coefficient for the theta(2) line — dyadic like Holt's
_THETA_ALPHA = 0.5


def q_theta_forecast(spark, sf_dir):
    """Theta-method forecast per event type (Assimakopoulos &
    Nikolopoulos 2000 — the M3 competition winner; Hyndman & Billah
    2003 showed it is SES-with-drift): decompose the daily series
    into the θ=0 line (the OLS trend) and the θ=2 line
    z_t = 2y_t − (a + b·t), smooth the θ=2 line with SES, and
    forecast the AVERAGE of the flat SES level and the trend
    extrapolation.  Completes the ladder `forecast_backtest` ranks:
    naive has no model, Holt adapts its trend, theta pins the trend
    globally and lets SES track the rest.

    Determinism: the OLS normal equations use EXACT integer sums
    (Σy, Σty as BIGINT aggregates; Σt, Σt² closed-form from n); the
    θ=2 values and the SES fold are then identical double sequences
    in both engines (the `holt_linear_forecast` IIR discipline,
    recursive-CTE oracle), det6 outputs.

    Scale plan: one type-partitioned row_number over the bounded
    daily relation, one hash-agg to (sums + sorted array) per type,
    map-side lambda math.

    Measured: rides the same day-span-bounded machinery as Holt
    (flat across decades)."""
    return theta_from_daily(_daily_counts(spark, sf_dir))


def theta_from_daily(daily):
    """The theta solve over a `(event_type, day, y)` relation —
    shared by the batch query and the streaming fold."""
    w = Window.partitionBy("event_type").orderBy("day")
    idx = daily.withColumn(
        "t", (F.row_number().over(w) - 1).cast("bigint")
    )
    g = idx.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("t") * F.col("y")).cast("bigint").alias("sty"),
        F.expr(
            "transform(array_sort(collect_list(named_struct("
            "'t', t, 'y', y))), p -> CAST(p.y AS DOUBLE))"
        ).alias("ys"),
    )
    nd = "CAST(n AS DOUBLE)"
    st = f"({nd} * ({nd} - 1.0) / 2.0)"
    stt = f"(({nd} - 1.0) * {nd} * (2.0 * {nd} - 1.0) / 6.0)"
    b = (
        f"(({nd} * CAST(sty AS DOUBLE) - {st} * CAST(sy AS DOUBLE))"
        f" / ({nd} * {stt} - {st} * {st}))"
    )
    a = f"((CAST(sy AS DOUBLE) - {b} * {st}) / {nd})"
    det6 = "CAST(FLOOR(({x}) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS {n}"
    al = _THETA_ALPHA
    return (
        g.selectExpr(
            "event_type",
            "n",
            f"{a} AS ic",
            f"{b} AS slope",
            f"""AGGREGATE(
              slice(transform(sequence(0, CAST(n - 1 AS INT)),
                    i -> 2.0 * ys[i] - ({a} + {b} * CAST(i AS DOUBLE))),
                    2, CAST(n - 1 AS INT)),
              2.0 * ys[0] - {a},
              (acc, z) -> {al} * z + {1 - al} * acc) AS ses""",
        )
        .selectExpr(
            "event_type",
            "CAST(n AS BIGINT) AS n_days",
            det6.format(x="slope", n="trend_slope"),
            det6.format(x="ses", n="ses_theta2"),
            det6.format(
                x="0.5 * (ses + (ic + slope"
                " * (CAST(n AS DOUBLE) - 1.0 + 7.0)))",
                n="forecast_7d",
            ),
        )
        .orderBy("event_type")
    )


def _sql_theta_forecast() -> str:
    nd = "CAST(n AS DOUBLE)"
    st = f"({nd} * ({nd} - 1.0) / 2.0)"
    stt = f"(({nd} - 1.0) * {nd} * (2.0 * {nd} - 1.0) / 6.0)"
    b = (
        f"(({nd} * CAST(sty AS DOUBLE) - {st} * CAST(sy AS DOUBLE))"
        f" / ({nd} * {stt} - {st} * {st}))"
    )
    a = f"((CAST(sy AS DOUBLE) - {b} * {st}) / {nd})"
    al = _THETA_ALPHA
    return f"""
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2),
idx AS (
  SELECT event_type,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type
              ORDER BY day) - 1 AS BIGINT) AS t,
         y
  FROM daily),
ols AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(t * y) AS BIGINT) AS sty
  FROM idx GROUP BY 1),
co AS (
  SELECT event_type, n, {b} AS slope, {a} AS ic FROM ols),
z AS (
  SELECT i.event_type, i.t,
         2.0 * CAST(i.y AS DOUBLE) - (c.ic + c.slope
           * CAST(i.t AS DOUBLE)) AS z
  FROM idx i JOIN co c USING (event_type)),
r (event_type, t, lvl) AS (
  SELECT event_type, t, z FROM z WHERE t = 0
  UNION ALL
  SELECT r.event_type, d.t, {al} * d.z + {1 - al} * r.lvl
  FROM r JOIN z d ON d.event_type = r.event_type AND d.t = r.t + 1),
fin AS (
  SELECT r.event_type, r.lvl AS ses
  FROM r JOIN co USING (event_type) WHERE r.t = co.n - 1)
SELECT c.event_type,
       CAST(c.n AS BIGINT) AS n_days,
       CAST(FLOOR(c.slope * 1e6 + 0.5) AS DOUBLE) / 1e6
         AS trend_slope,
       CAST(FLOOR(f.ses * 1e6 + 0.5) AS DOUBLE) / 1e6 AS ses_theta2,
       CAST(FLOOR(0.5 * (f.ses + (c.ic + c.slope
            * (CAST(c.n AS DOUBLE) - 1.0 + 7.0))) * 1e6 + 0.5)
            AS DOUBLE) / 1e6 AS forecast_7d
FROM fin f JOIN co c USING (event_type)
ORDER BY c.event_type
"""


SQL_THETA_FORECAST = _sql_theta_forecast()


# -- round 13: trend test, seasonal strength, intermittent demand, ----------
# -- and the seasonal rung of the forecasting ladder -------------------------


def q_mann_kendall_trend(spark, sf_dir):
    """Mann–Kendall trend test per event type (Mann 1945; Kendall
    1975) — the nonparametric TEST beside `theta_forecast`'s trend
    FIT and `trend_regression`'s OLS: S = Σ_{i<j} sign(y_j − y_i)
    over the day-ordered daily series, tie-corrected variance
    Var(S) = [n(n−1)(2n+5) − Σ t(t−1)(2t+5)]/18, and the
    continuity-corrected z.  Monotone-trend detection with no
    normality or linearity assumption — the gate before trusting a
    fitted slope.

    Determinism: S and the tie term are exact integers (bigint y
    comparisons); Var and z are one closed-form expression each,
    det6.

    Scale plan: the pair join is an equi-join on event_type with a
    day inequality — pair volume is bounded by the DAY SPAN squared
    per type (≤3653²/2 at 10 years), independent of event count;
    ties come from one more hash-agg on the bounded daily relation."""
    return mann_kendall_from_daily(_daily_counts(spark, sf_dir))


def mann_kendall_from_daily(daily):
    """The Mann–Kendall solve over a `(event_type, day, y)` relation
    — shared by the batch query and the streaming fold."""
    a = daily.select(
        "event_type", F.col("day").alias("da"), F.col("y").alias("ya")
    )
    b = daily.select(
        "event_type", F.col("day").alias("db"), F.col("y").alias("yb")
    )
    s = (
        a.join(b, "event_type")
        .where(F.col("da") < F.col("db"))
        .groupBy("event_type")
        .agg(
            F.sum(F.signum(F.col("yb") - F.col("ya")))
            .cast("bigint")
            .alias("s_stat")
        )
    )
    ties = (
        daily.groupBy("event_type", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum("t").cast("bigint").alias("n"),
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            )
            .cast("bigint")
            .alias("tie_term"),
        )
    )
    det6 = "CAST(FLOOR(({x}) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS {n}"
    var_s = (
        "((CAST(n AS DOUBLE) * (n - 1.0) * (2.0 * n + 5.0)"
        " - CAST(tie_term AS DOUBLE)) / 18.0)"
    )
    return (
        s.join(ties, "event_type")
        .selectExpr(
            "event_type",
            "n AS n_days",
            "s_stat",
            det6.format(x=var_s, n="var_s"),
            det6.format(
                x=f"CASE WHEN s_stat > 0 THEN (s_stat - 1.0)"
                f" / SQRT({var_s})"
                f" WHEN s_stat < 0 THEN (s_stat + 1.0)"
                f" / SQRT({var_s})"
                " ELSE 0.0 END",
                n="z_score",
            ),
        )
        .orderBy("event_type")
    )


SQL_MANN_KENDALL_TREND = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2),
s AS (
  SELECT a.event_type,
         CAST(SUM(SIGN(b.y - a.y)) AS BIGINT) AS s_stat
  FROM daily a JOIN daily b ON a.event_type = b.event_type
                            AND a.day < b.day
  GROUP BY 1),
ties AS (
  SELECT event_type, CAST(SUM(t) AS BIGINT) AS n,
         CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
  FROM (SELECT event_type, y, CAST(COUNT(*) AS BIGINT) AS t
        FROM daily GROUP BY 1, 2)
  GROUP BY 1)
SELECT event_type,
       n AS n_days,
       s_stat,
       CAST(FLOOR(((CAST(n AS DOUBLE) * (n - 1.0) * (2.0 * n + 5.0)
            - CAST(tie_term AS DOUBLE)) / 18.0) * 1e6 + 0.5)
            AS DOUBLE) / 1e6 AS var_s,
       CAST(FLOOR((CASE WHEN s_stat > 0 THEN (s_stat - 1.0)
            / SQRT((CAST(n AS DOUBLE) * (n - 1.0) * (2.0 * n + 5.0)
                    - CAST(tie_term AS DOUBLE)) / 18.0)
            WHEN s_stat < 0 THEN (s_stat + 1.0)
            / SQRT((CAST(n AS DOUBLE) * (n - 1.0) * (2.0 * n + 5.0)
                    - CAST(tie_term AS DOUBLE)) / 18.0)
            ELSE 0.0 END) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS z_score
FROM s JOIN ties USING (event_type)
ORDER BY event_type
"""


def q_stl_seasonal_strength(spark, sf_dir):
    """Seasonal / trend strength per event type (Hyndman &
    Athanasopoulos FPP3 §4.3, Wang-Smith-Hyndman features):
    F_s = max(0, 1 − Var(R)/Var(S+R)) and
    F_t = max(0, 1 − Var(R)/Var(T+R)) over the STL components — the
    one-number answer to "is this series worth a seasonal model?"
    that decides between `holt_linear_forecast` and
    `holt_winters_forecast`.

    Determinism: consumes the det6-ROUNDED component columns the STL
    query itself ships (the oracle nests the same decomposition
    text), so both engines variance identical values; variances are
    naive Σx/Σx² folds spelled identically, det6 outputs.

    Scale plan: one agg over the span-bounded STL relation — ≤3653
    rows per type whatever the corpus."""
    return strength_from_daily(_daily_counts(spark, sf_dir))


def strength_from_daily(daily):
    """The strength solve over a `(event_type, day, y)` relation —
    shared by the batch query and the streaming fold."""
    stl = stl_from_daily(daily).select(
        "event_type",
        "residual",
        (F.col("seasonal") + F.col("residual")).alias("sr"),
        (F.col("trend") + F.col("residual")).alias("tr"),
    )
    g = stl.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("residual").alias("s_r"),
        F.sum(F.col("residual") * F.col("residual")).alias("ss_r"),
        F.sum("sr").alias("s_sr"),
        F.sum(F.col("sr") * F.col("sr")).alias("ss_sr"),
        F.sum("tr").alias("s_tr"),
        F.sum(F.col("tr") * F.col("tr")).alias("ss_tr"),
    )
    det6 = "CAST(FLOOR(({x}) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS {n}"
    nd = "CAST(n AS DOUBLE)"
    vr = f"(ss_r - s_r * s_r / {nd})"
    vsr = f"(ss_sr - s_sr * s_sr / {nd})"
    vtr = f"(ss_tr - s_tr * s_tr / {nd})"
    return g.selectExpr(
        "event_type",
        "n AS n_days",
        det6.format(
            x=f"GREATEST(0.0, 1.0 - {vr} / {vsr})", n="seasonal_strength"
        ),
        det6.format(
            x=f"GREATEST(0.0, 1.0 - {vr} / {vtr})", n="trend_strength"
        ),
    ).orderBy("event_type")


def _sql_stl_seasonal_strength() -> str:
    stl_inner = SQL_STL_DECOMPOSE.strip().rstrip()
    det6 = "CAST(FLOOR(({x}) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS {n}"
    nd = "CAST(n AS DOUBLE)"
    vr = f"(ss_r - s_r * s_r / {nd})"
    vsr = f"(ss_sr - s_sr * s_sr / {nd})"
    vtr = f"(ss_tr - s_tr * s_tr / {nd})"
    return f"""
WITH stl AS ({stl_inner}),
g AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(residual) AS s_r,
         SUM(residual * residual) AS ss_r,
         SUM(seasonal + residual) AS s_sr,
         SUM((seasonal + residual) * (seasonal + residual)) AS ss_sr,
         SUM(trend + residual) AS s_tr,
         SUM((trend + residual) * (trend + residual)) AS ss_tr
  FROM stl GROUP BY 1)
SELECT event_type,
       n AS n_days,
       {det6.format(x=f"GREATEST(0.0, 1.0 - {vr} / {vsr})",
                    n="seasonal_strength")},
       {det6.format(x=f"GREATEST(0.0, 1.0 - {vr} / {vtr})",
                    n="trend_strength")}
FROM g
ORDER BY event_type
"""


SQL_STL_SEASONAL_STRENGTH = _sql_stl_seasonal_strength()


#: croston parameters: SES coefficient and the "high-value event"
#: demand definition (value ≥ threshold makes the daily series
#: intermittent — most days have zero such events)
_CROSTON_ALPHA = 0.25
_CROSTON_VALUE_MIN = 250.0


def q_croston_forecast(spark, sf_dir):
    """Croston intermittent-demand forecast per event type (Croston
    1972; Syntetos & Boylan 2005 review) — the forecasting ladder's
    sparse-series rung: daily counts of HIGH-VALUE events (value ≥
    {vmin}) are zero most days, where Holt/theta degenerate; Croston
    runs TWO exponential smoothers — one over the nonzero demand
    SIZES, one over the inter-demand INTERVALS (days) — and
    forecasts the demand rate z/x per day.

    Conventions (documented, both engines): init z₁ = first demand
    size, x₁ = 1 (the first interval is not observed); the fold runs
    over demand points 2..k with α = {alpha}; types with < 2 demand
    points are excluded (no interval to smooth).

    Determinism: demand sizes and day gaps are exact integers; the
    two SES folds are identical double sequences in both engines
    (the `holt_linear_forecast` IIR discipline, recursive-CTE
    oracle), det6 outputs.

    Scale plan: the demand-point relation is the daily hash-agg
    filtered to nonzero — bounded by the day span per type; one
    hash-agg to per-type sorted arrays, map-side lambda math."""
    ev = load_table(spark, sf_dir, "events")
    demands = (
        ev.where(F.col("value") >= F.lit(_CROSTON_VALUE_MIN))
        .select("event_type", F.to_date("ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    series = demands.groupBy("event_type").agg(
        F.expr(
            "array_sort(collect_list(named_struct('day', day, 'y', y)))"
        ).alias("ps")
    ).where(F.size("ps") >= 2)
    al = _CROSTON_ALPHA
    step = (
        f"named_struct("
        f"'z', {al} * CAST(ps[i].y AS DOUBLE) + {1 - al} * acc.z,"
        f"'x', {al} * CAST(datediff(ps[i].day, ps[i-1].day) AS DOUBLE)"
        f" + {1 - al} * acc.x)"
    )
    det6 = "CAST(FLOOR(({x}) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS {n}"
    return (
        series.selectExpr(
            "event_type",
            "size(ps) AS k",
            f"""AGGREGATE(
              sequence(1, size(ps) - 1),
              named_struct('z', CAST(ps[0].y AS DOUBLE),
                           'x', CAST(1.0 AS DOUBLE)),
              (acc, i) -> {step}) AS st""",
        )
        .selectExpr(
            "event_type",
            "CAST(k AS BIGINT) AS n_demands",
            det6.format(x="st.z", n="ses_size"),
            det6.format(x="st.x", n="ses_interval"),
            det6.format(x="st.z / st.x", n="demand_rate_per_day"),
        )
        .orderBy("event_type")
    )


q_croston_forecast.__doc__ = q_croston_forecast.__doc__.format(
    vmin=_CROSTON_VALUE_MIN, alpha=_CROSTON_ALPHA
)


def _sql_croston_forecast() -> str:
    al = _CROSTON_ALPHA
    det6 = "CAST(FLOOR(({x}) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS {n}"
    return f"""
WITH RECURSIVE demands AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events
  WHERE value >= {_CROSTON_VALUE_MIN}
  GROUP BY 1, 2),
idx AS (
  SELECT event_type,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type
              ORDER BY day) - 1 AS BIGINT) AS i,
         day, y
  FROM demands),
n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS k
      FROM idx GROUP BY 1 HAVING COUNT(*) >= 2),
r (event_type, i, z, x) AS (
  SELECT d.event_type, d.i, CAST(d.y AS DOUBLE), CAST(1.0 AS DOUBLE)
  FROM idx d JOIN n USING (event_type) WHERE d.i = 0
  UNION ALL
  SELECT r.event_type, d.i,
         {al} * CAST(d.y AS DOUBLE) + {1 - al} * r.z,
         {al} * CAST(d.day - p.day AS DOUBLE) + {1 - al} * r.x
  FROM r
  JOIN idx d ON d.event_type = r.event_type AND d.i = r.i + 1
  JOIN idx p ON p.event_type = r.event_type AND p.i = r.i)
SELECT r.event_type,
       n.k AS n_demands,
       {det6.format(x="r.z", n="ses_size")},
       {det6.format(x="r.x", n="ses_interval")},
       {det6.format(x="r.z / r.x", n="demand_rate_per_day")}
FROM r JOIN n USING (event_type)
WHERE r.i = n.k - 1
ORDER BY r.event_type
"""


SQL_CROSTON_FORECAST = _sql_croston_forecast()


#: Holt–Winters additive coefficients and the weekly season length
_HW_ALPHA = 0.25
_HW_BETA = 0.125
_HW_GAMMA = 0.25
_HW_PERIOD = 7


def q_holt_winters_forecast(spark, sf_dir):
    """Additive Holt–Winters per event type (Winters 1960; Hyndman &
    Athanasopoulos FPP §8.3) — the seasonal rung above
    `holt_linear_forecast`: level + trend + a rotating 7-slot weekly
    season, lvl' = α(y − s_{t−7}) + (1−α)(lvl+tr), tr' = β(lvl'−lvl)
    + (1−β)tr, s_t = γ(y − lvl') + (1−γ)s_{t−7}; 7-day-ahead
    forecast lvl + 7·tr + s (same weekday slot).

    Init (documented, both engines): lvl₀ = mean of the first week,
    tr₀ = 0, season slot i = yᵢ − lvl₀ for the first 7 days; the
    fold runs from day 8.  Types with < 14 days are excluded (need a
    week of init plus a week of fold).

    Determinism: the state fold carries (lvl, tr, 7-element season
    array) through a higher-order AGGREGATE; the oracle replays it
    as a recursive CTE carrying a LIST — identical double ops in
    identical order (the `holt_linear_forecast` IIR discipline),
    det6 outputs.

    Scale plan: day-span-bounded per-type arrays (≤3653 elements at
    10 years), one hash-agg then map-side lambda math — flat across
    corpus decades like Holt."""
    return hw_from_daily(_daily_counts(spark, sf_dir))


def hw_from_daily(daily):
    """The Holt–Winters solve over a `(event_type, day, y)` relation
    — shared by the batch query and the streaming fold.

    Dense-series assumption: the season slot is keyed on ARRAY
    POSITION (i % 7), not calendar day-of-week, so a gap in a type's
    daily series shifts the weekly-season phase for every later day.
    The oracle replays the identical position-based fold (parity
    holds); the fixture's daily-count relation is gap-free by
    construction.  A gapped deployment should key the slot on
    datediff from the series start instead."""
    a, b, g = _HW_ALPHA, _HW_BETA, _HW_GAMMA
    m = _HW_PERIOD
    series = daily.groupBy("event_type").agg(
        F.expr(
            "transform(array_sort(collect_list(named_struct("
            "'day', day, 'y', y))), p -> CAST(p.y AS DOUBLE))"
        ).alias("ys")
    ).where(F.size("ys") >= 2 * m)
    lvl0 = f"(AGGREGATE(slice(ys, 1, {m}), CAST(0.0 AS DOUBLE),"
    lvl0 += f" (acc, y) -> acc + y) / {m}.0)"
    # Spark [] subscripts are 0-based (DuckDB lists are 1-based — the
    # oracle adds the +1 there)
    s_old = f"acc.season[CAST(i % {m} AS INT)]"
    lvl_new = f"({a} * (ys[CAST(i AS INT)] - {s_old}) + {1 - a} * (acc.lvl + acc.tr))"
    step = (
        f"named_struct("
        f"'lvl', {lvl_new},"
        f"'tr', {b} * ({lvl_new} - acc.lvl) + {1 - b} * acc.tr,"
        f"'season', concat("
        f"  slice(acc.season, 1, CAST(i % {m} AS INT)),"
        f"  array({g} * (ys[CAST(i AS INT)] - {lvl_new})"
        f"        + {1 - g} * {s_old}),"
        f"  slice(acc.season, CAST(i % {m} AS INT) + 2,"
        f"        {m - 1} - CAST(i % {m} AS INT))))"
    )
    det6 = "CAST(FLOOR(({x}) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS {n}"
    return (
        series.selectExpr(
            "event_type",
            "size(ys) AS n_days",
            f"""AGGREGATE(
              sequence({m}, size(ys) - 1),
              named_struct(
                'lvl', {lvl0},
                'tr', CAST(0.0 AS DOUBLE),
                'season', transform(slice(ys, 1, {m}),
                                    y -> y - {lvl0})),
              (acc, i) -> {step}) AS st""",
        )
        .selectExpr(
            "event_type",
            "CAST(n_days AS BIGINT) AS n_days",
            det6.format(x="st.lvl", n="level"),
            det6.format(x="st.tr", n="trend"),
            det6.format(
                x=f"st.lvl + 7.0 * st.tr"
                f" + st.season[CAST((n_days - 1 + 7) % {m} AS INT)]",
                n="forecast_7d",
            ),
        )
        .orderBy("event_type")
    )


def _sql_holt_winters_forecast() -> str:
    a, b, g = _HW_ALPHA, _HW_BETA, _HW_GAMMA
    m = _HW_PERIOD
    # 1-based list position of the season slot day i (0-based) writes
    pos = f"(CAST(d.i % {m} AS BIGINT) + 1)"
    s_old = f"r.season[{pos}]"
    lvl_new = f"({a} * (d.y - {s_old}) + {1 - a} * (r.lvl + r.tr))"
    det6 = "CAST(FLOOR(({x}) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS {n}"
    return f"""
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2),
idx AS (
  SELECT event_type,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type
              ORDER BY day) - 1 AS BIGINT) AS i,
         CAST(y AS DOUBLE) AS y
  FROM daily),
n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
      FROM idx GROUP BY 1 HAVING COUNT(*) >= {2 * m}),
init AS (
  SELECT i.event_type,
         SUM(i.y) / {m}.0 AS lvl0,
         list(i.y - (SELECT SUM(y2.y) / {m}.0 FROM idx y2
                     WHERE y2.event_type = i.event_type
                       AND y2.i < {m})
              ORDER BY i.i) AS season0
  FROM idx i JOIN n USING (event_type)
  WHERE i.i < {m}
  GROUP BY 1),
r (event_type, i, lvl, tr, season) AS (
  SELECT event_type, CAST({m - 1} AS BIGINT), lvl0,
         CAST(0.0 AS DOUBLE), season0
  FROM init
  UNION ALL
  SELECT r.event_type, d.i,
         {lvl_new},
         {b} * ({lvl_new} - r.lvl) + {1 - b} * r.tr,
         r.season[1:({pos} - 1)]
           || [{g} * (d.y - {lvl_new}) + {1 - g} * {s_old}]
           || r.season[({pos} + 1):{m}]
  FROM r JOIN idx d ON d.event_type = r.event_type
                   AND d.i = r.i + 1)
SELECT r.event_type,
       n.n_days,
       {det6.format(x="r.lvl", n="level")},
       {det6.format(x="r.tr", n="trend")},
       {det6.format(
           x=f"r.lvl + 7.0 * r.tr"
             f" + r.season[CAST((n.n_days - 1 + 7) % {m} AS BIGINT) + 1]",
           n="forecast_7d")}
FROM r JOIN n USING (event_type)
WHERE r.i = n.n_days - 1
ORDER BY r.event_type
"""


SQL_HOLT_WINTERS_FORECAST = _sql_holt_winters_forecast()


REGISTRY: dict[str, QuerySpec] = {
    "mann_kendall_trend": QuerySpec(
        q_mann_kendall_trend, SQL_MANN_KENDALL_TREND
    ),
    "stl_seasonal_strength": QuerySpec(
        q_stl_seasonal_strength, SQL_STL_SEASONAL_STRENGTH
    ),
    "croston_forecast": QuerySpec(
        q_croston_forecast, SQL_CROSTON_FORECAST
    ),
    "holt_winters_forecast": QuerySpec(
        q_holt_winters_forecast, SQL_HOLT_WINTERS_FORECAST
    ),
    "acf_lags": QuerySpec(q_acf_lags, SQL_ACF_LAGS),
    "pacf_lags": QuerySpec(q_pacf_lags, SQL_PACF_LAGS),
    "interarrival_stats": QuerySpec(
        q_interarrival_stats, SQL_INTERARRIVAL_STATS
    ),
    "stl_decompose": QuerySpec(q_stl_decompose, SQL_STL_DECOMPOSE),
    "hurst_exponent": QuerySpec(q_hurst_exponent, SQL_HURST_EXPONENT),
    "forecast_seasonal_naive": QuerySpec(
        q_forecast_seasonal_naive, SQL_FORECAST_SEASONAL_NAIVE
    ),
    "theil_sen": QuerySpec(q_theil_sen, SQL_THEIL_SEN),
    "burstiness": QuerySpec(q_burstiness, SQL_BURSTINESS),
    "seasonal_dow_index": QuerySpec(
        q_seasonal_dow_index, SQL_SEASONAL_DOW_INDEX
    ),
    "holt_linear_forecast": QuerySpec(
        q_holt_linear_forecast, SQL_HOLT_LINEAR_FORECAST
    ),
    "forecast_backtest": QuerySpec(
        q_forecast_backtest, SQL_FORECAST_BACKTEST
    ),
    "theta_forecast": QuerySpec(
        q_theta_forecast, SQL_THETA_FORECAST
    ),
    "cusum_changepoints": QuerySpec(
        q_cusum_changepoints, SQL_CUSUM_CHANGEPOINTS
    ),
    "interval_overlap": QuerySpec(q_interval_overlap, SQL_INTERVAL_OVERLAP),
    "ohlc_bars": QuerySpec(q_ohlc_bars, SQL_OHLC_BARS),
    "time_weighted_avg": QuerySpec(
        q_time_weighted_avg, SQL_TIME_WEIGHTED_AVG
    ),
    "mv_incremental_refresh": QuerySpec(
        q_mv_incremental_refresh, SQL_MV_INCREMENTAL_REFRESH
    ),
    "timeseries_gapfill": QuerySpec(
        q_timeseries_gapfill, SQL_TIMESERIES_GAPFILL
    ),
    "user_streaks": QuerySpec(q_user_streaks, SQL_USER_STREAKS),
    "ewma_smooth": QuerySpec(q_ewma_smooth, SQL_EWMA_SMOOTH),
    "type_profile_similarity": QuerySpec(
        q_type_profile_similarity, SQL_TYPE_PROFILE_SIMILARITY
    ),
}

