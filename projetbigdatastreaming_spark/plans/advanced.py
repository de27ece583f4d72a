"""Advanced operator queries: as-of / range / salted joins, sliding
windows (ST6/A7 parity), exact percentiles, extended scalar surface,
and approximate sketches.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import joins
from .registry import QuerySpec


def q_join_asof(spark, sf_dir):
    """As-of join: each event paired with the user's immediately
    preceding event (strict).  Spark has no native ASOF; this is the
    union-merge operator (operators/joins.py) — DuckDB's native
    ASOF JOIN is the oracle."""
    events = load_table(spark, sf_dir, "events")
    out = joins.asof_join(
        events,
        events,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["event_id"],
        strict=True,
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("asof_event_id").alias("prev_event_id"),
    ).orderBy("event_id")


SQL_JOIN_ASOF = """
SELECT e.event_id, e.user_id, o.event_id AS prev_event_id
FROM events e
ASOF LEFT JOIN events o
  ON e.user_id = o.user_id AND e.ts > o.ts
ORDER BY e.event_id
"""


def q_join_range(spark, sf_dir):
    """Range join: pairs of events from the same user within 120 s of
    each other — bucketized equi-join, not an O(n²) theta join."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts"
    )
    right = (
        events.withColumnRenamed("event_id", "event_b")
        .withColumnRenamed("ts", "ts_b")
    )
    out = joins.bucketed_range_join(
        events, right, key="user_id", left_ts="ts", right_ts="ts_b",
        max_gap_seconds=120,
    )
    return (
        out.where(F.col("event_id") < F.col("event_b"))
        .select(
            "user_id",
            F.col("event_id").alias("event_a"),
            "event_b",
            (F.unix_timestamp("ts_b") - F.unix_timestamp("ts")).alias(
                "gap_seconds"
            ),
        )
        .orderBy("event_a", "event_b")
    )


SQL_JOIN_RANGE = """
-- floor(epoch(ts)) matches Spark unix_timestamp()'s per-timestamp
-- truncation to whole seconds (epoch() alone keeps the µs fraction)
SELECT a.user_id, a.event_id AS event_a, b.event_id AS event_b,
       CAST(floor(epoch(b.ts)) - floor(epoch(a.ts)) AS BIGINT) AS gap_seconds
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_id < b.event_id
 AND abs(floor(epoch(b.ts)) - floor(epoch(a.ts))) <= 120
ORDER BY event_a, event_b
"""


def q_join_salted(spark, sf_dir):
    """Skew-salted fact⋈dim join — result-identical to the plain join
    (the oracle is the unsalted SQL); the salt only spreads hot keys
    across reducers."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    out = joins.salted_join(li, orders, key="l_orderkey")
    return (
        out.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


SQL_JOIN_SALTED = """
SELECT o_orderpriority, COUNT(*) AS n,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


#: per-key fact rows past this count are routed to the salted branch
_HOTKEY_THRESHOLD = 40


def q_join_salted_hotkeys(spark, sf_dir):
    """Hot-key-only salted join (`operators/joins.salted_join_hotkeys`)
    — result-identical to the plain lineitem⋈part join (the oracle IS
    the unsalted SQL): keys whose fact count exceeds the threshold
    take the salted branch (dim slice replicated per salt), everything
    else joins plain, branches union.  The proactive skew fix that
    replicates only the HOT dim slice, where `join_salted` replicates
    the whole dim and AQE's reactive skew split can't rebalance a
    single key's hash partition.

    Scale plan: hot detection is one map-side-combined hash-agg on the
    key the fact was shuffling on anyway; the hot list broadcasts
    (skew ⇒ few hot keys by definition); revenue stays in exact cents.
    Measured (bench_one, min-of-2): sf1 1.7 s / sf10 7.6 s.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey"),
        F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("rev_cents"),
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand"
    )
    out = joins.salted_join_hotkeys(
        li, part, key="p_partkey", hot_threshold=_HOTKEY_THRESHOLD
    )
    return (
        out.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("rev_cents").cast("bigint").alias("revenue_cents"),
        )
        .orderBy("p_brand")
    )


SQL_JOIN_SALTED_HOTKEYS = """
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100
         + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1
ORDER BY p_brand
"""


def q_window_sliding(spark, sf_dir):
    """ST6/A7 parity: 3-minute sliding window (1-minute slide) event
    counts per type — the reference's dstream.window(Minutes(3))
    (TwitterKafkaStreaming.scala:186) in its batch form."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "3 minutes", "1 minute").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n"
        )
        .orderBy("window_start", "event_type")
    )


SQL_WINDOW_SLIDING = """
SELECT time_bucket(INTERVAL '1 minute', ts)
         - (r.range * INTERVAL '1 minute') AS window_start,
       event_type, COUNT(*) AS n
FROM events, range(3) r
GROUP BY 1, 2
ORDER BY 1, 2
"""


def q_percentiles(spark, sf_dir):
    """Exact interpolated percentiles + median of order totals per
    priority (the reference has no quantiles; standard OLAP surface)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.percentile("o_totalprice", 0.25), 6).alias("p25"),
            F.round(F.median("o_totalprice"), 6).alias("p50"),
            F.round(F.percentile("o_totalprice", 0.75), 6).alias("p75"),
        )
        .orderBy("o_orderpriority")
    )


SQL_PERCENTILES = """
SELECT o_orderpriority,
       ROUND(quantile_cont(o_totalprice, 0.25), 6) AS p25,
       ROUND(median(o_totalprice), 6) AS p50,
       ROUND(quantile_cont(o_totalprice, 0.75), 6) AS p75
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_scalar_functions2(spark, sf_dir):
    """Extended scalar surface: regex extract/replace, string
    manipulation, date arithmetic and parts."""
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_add(F.to_date("o_orderdate"), 30).alias("due_date"),
        F.datediff(
            F.to_date(F.lit("2002-01-01")), F.to_date("o_orderdate")
        ).alias("age_days"),
        F.regexp_extract("o_orderpriority", r"^(\d+)-", 1).alias("prio_num"),
        F.regexp_replace("o_orderpriority", r"[^A-Z]", "").alias("prio_word"),
        F.lpad(F.col("o_orderkey").cast("string"), 10, "0").alias("key_pad"),
        F.reverse(F.col("o_orderstatus")).alias("status_rev"),
        F.length(F.replace(F.col("o_orderpriority"), F.lit("-"), F.lit("_")))
        .alias("prio_len"),
    )


SQL_SCALAR_FUNCTIONS2 = r"""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(month(o_orderdate) AS INTEGER) AS mo,
       CAST(day(o_orderdate) AS INTEGER) AS dom,
       CAST(o_orderdate AS DATE) + 30 AS due_date,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')
            AS INTEGER) AS age_days,
       regexp_extract(o_orderpriority, '^(\d+)-', 1) AS prio_num,
       regexp_replace(o_orderpriority, '[^A-Z]', '', 'g') AS prio_word,
       lpad(CAST(o_orderkey AS VARCHAR), 10, '0') AS key_pad,
       reverse(o_orderstatus) AS status_rev,
       CAST(length(replace(o_orderpriority, '-', '_')) AS INTEGER) AS prio_len
FROM orders
"""


def q_approx_distinct(spark, sf_dir):
    """Approximate sketches: HLL distinct counts + approximate
    quantiles per event type.  Not registered as a driver query (the
    sketch algorithms differ across engines by design, so a standing
    rows-only row reads as breakage); the ±5%-tolerance companion
    `approx_distinct_check` carries the driver signal, and pytest
    asserts accuracy against exact values here."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.percentile_approx("value", 0.5).alias("approx_median_value"),
        )
        .orderBy("event_type")
    )


def q_rolling_avg_range(spark, sf_dir):
    """Time-RANGE window frame: per-user rolling 10-minute average of
    event values — RANGE BETWEEN (value-based bounds on event time),
    the frame type `window_sliding`'s tumbling/sliding buckets and the
    ROWS frames elsewhere don't cover.  Scale plan: window partitioned
    by user_id (shuffle on user, in-partition time sort); the frame is
    evaluated with a sliding two-pointer over each partition, never a
    self-join.  Sums accumulate in decimal so the 4-dp round is
    knife-edge-free."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("sec"),
        F.col("value").cast("decimal(20,6)").alias("dval"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-600, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        (F.sum("dval").over(w) / F.count("*").over(w))
        .cast("decimal(24,4)")
        .cast("double")
        .alias("avg_10m"),
    ).orderBy("event_id")


SQL_ROLLING_AVG_RANGE = """
SELECT event_id, user_id,
       CAST(CAST(SUM(CAST(value AS DECIMAL(20,6))) OVER w
                 / COUNT(*) OVER w AS DECIMAL(24,4)) AS DOUBLE) AS avg_10m
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


def q_window_value_functions(spark, sf_dir):
    """Value-window surface: first_value / last_value / nth_value per
    user's event timeline — the positional value functions the rank
    and lag queries don't touch.  The frame is pinned to the WHOLE
    partition (ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED
    FOLLOWING) because last_value under the default frame is the
    classic running-last trap; total order (ts, event_id) keeps every
    value engine-deterministic.  Scale: one hash-partitioned window on
    user_id, never global."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            F.round(F.first_value("value").over(w), 4).alias("first_val"),
            F.round(F.last_value("value").over(w), 4).alias("last_val"),
            F.round(F.nth_value("value", 2).over(w), 4).alias("second_val"),
        )
        .orderBy("event_id")
    )


SQL_WINDOW_VALUE_FUNCTIONS = """
SELECT event_id, user_id,
       ROUND(FIRST_VALUE(value) OVER w, 4) AS first_val,
       ROUND(LAST_VALUE(value) OVER w, 4) AS last_val,
       ROUND(NTH_VALUE(value, 2) OVER w, 4) AS second_val
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY event_id
"""


def q_window_rank_functions(spark, sf_dir):
    """Ranking-window surface: rank / dense_rank / ntile / percent_rank
    / cume_dist over order totals per priority — the distribution-rank
    functions the other window queries don't touch.  Total order within
    each partition (tie-break on o_orderkey) keeps every rank
    engine-deterministic.  Doubles (percent_rank/cume_dist) are exact
    k/n ratios of identical integers on both engines — no float
    accumulation."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
        .orderBy("o_orderkey")
    )


SQL_WINDOW_RANK_FUNCTIONS = """
SELECT o_orderkey, o_orderpriority,
       CAST(RANK() OVER w AS BIGINT) AS rnk,
       CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice DESC, o_orderkey ASC)
ORDER BY o_orderkey
"""


#: columns profiled by q_profile_table, with their profile expressions
_PROFILE_COLS = ("l_quantity", "l_discount", "l_returnflag", "l_shipdate")


def q_profile_table(spark, sf_dir):
    """Data-profiling operator (the Deequ/data-quality pattern): per
    column — null count, distinct count, min, max — one aggregate PER
    COLUMN, unioned.

    Why not one wide agg over all columns: multiple count_distinct in
    a single aggregate makes Catalyst rewrite through EXPAND — every
    input row is replicated K+1 times before the aggregation (measured
    6x slower at sf0.1 with K=4).  Per-column aggregates each scan
    exactly ONE parquet column (columnar pruning: total bytes read are
    identical to the wide form), run concurrently as independent
    stages, and shuffle only per-column distinct partials.  Values
    surface as strings so one schema fits every column type.
    """
    li = load_table(spark, sf_dir, "lineitem")
    parts = []
    for c in _PROFILE_COLS:
        parts.append(
            li.agg(
                F.lit(c).alias("column_name"),
                (F.count(F.lit(1)) - F.count(c)).alias("n_null"),
                F.count_distinct(c).alias("n_distinct"),
                F.min(c).cast("string").alias("min_s"),
                F.max(c).cast("string").alias("max_s"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("column_name")


SQL_PROFILE_TABLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS column_name,
       CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_s,
       CAST(MAX({c}) AS VARCHAR) AS max_s
FROM lineitem"""
    for c in _PROFILE_COLS
) + "\nORDER BY column_name"


def q_active_users_rolling(spark, sf_dir):
    """DAU and trailing-7-day WAU per day — the canonical product
    analytics rollup.  Distinct users are NOT summable across days, so
    WAU joins the deduplicated (user, day) relation to a day spine
    with a bounded 0–6-day lag.

    Scale plan: the corpus collapses to one row per (user, day) first
    (hash-agg — the only corpus-sized shuffle); the day spine is tiny
    at any scale and broadcasts, and the lag predicate bounds each
    (user, day) row to ≤7 spine matches, so candidate volume is 7×|user
    -days|, linear.  Counts are exact integers.
    """
    ud = (
        load_table(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
    )
    spine = ud.select(F.col("day").alias("d")).distinct()
    dau = ud.groupBy(F.col("day").alias("d0")).agg(
        F.count_distinct("user_id").alias("dau")
    )
    wau = (
        ud.join(
            F.broadcast(spine),
            (F.col("d") >= F.col("day"))
            & (F.col("d") <= F.date_add(F.col("day"), 6)),
        )
        .groupBy("d")
        .agg(F.count_distinct("user_id").alias("wau"))
    )
    return (
        dau.join(wau, F.col("d0") == F.col("d"))
        .select(F.col("d").alias("day"), "dau", "wau")
        .orderBy("day")
    )


SQL_ACTIVE_USERS_ROLLING = """
WITH ud AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
spine AS (SELECT DISTINCT day AS d FROM ud),
dau AS (
  SELECT day AS d0, COUNT(DISTINCT user_id) AS dau FROM ud GROUP BY day),
wau AS (
  SELECT d, COUNT(DISTINCT user_id) AS wau
  FROM ud JOIN spine ON d >= day AND d <= day + INTERVAL 6 DAY
  GROUP BY d)
SELECT d AS day, dau, wau
FROM dau JOIN wau ON d0 = d
ORDER BY day
"""


ZORDER_BITS = 10  # 1024 buckets per dimension, 2^20 z-points


def _z_interleave(x: str, y: str, bits: int) -> str:
    """Unrolled bit-interleave expression — identical arithmetic text
    for Spark SQL and DuckDB (shifts/and/or with full parens)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def q_zorder_layout(spark, sf_dir):
    """Z-order (Morton-curve) data-layout audit — the lakehouse
    file-skipping technique behind OPTIMIZE ZORDER BY: interleaving
    the bits of two filter columns gives a 1-D sort key whose
    contiguous ranges cover small RECTANGLES of the 2-D space, so
    per-file min/max column stats prune on BOTH dimensions at once
    (a plain sort clusters only its leading column).

    The query computes each event's z-value over (user bucket, value
    bucket) and reports, per 1024-point z-range, the bounding
    rectangle the curve actually covered — count, min/max of each
    dimension, and the rectangle area.  Bounded area per cell IS the
    skipping guarantee: a file holding one z-range can be skipped by
    a predicate on either dimension outside its rectangle.  The
    production write is ``df.repartitionByRange(N, z).sortWithinPartitions(z)
    .write...`` — this query is its effectiveness metric.

    Scale plan: the z-value is a map-only unrolled shift/mask fold
    (whole-stage codegen, no UDF); the audit aggregate has ≤2^bits
    groups.  All arithmetic is exact integers, identical in any
    engine.
    """
    from ..catalog import load_table as _lt

    z = _z_interleave("ub", "vb", ZORDER_BITS)
    ev = _lt(spark, sf_dir, "events").selectExpr(
        f"user_id % {1 << ZORDER_BITS} AS ub",
        f"(((CAST(floor(value * 100 + 0.5) AS BIGINT) % {1 << ZORDER_BITS})"
        f" + {1 << ZORDER_BITS}) % {1 << ZORDER_BITS}) AS vb",
    )
    return (
        ev.selectExpr("ub", "vb", f"{z} AS zval")
        .selectExpr("ub", "vb", f"zval >> {ZORDER_BITS} AS z_cell")
        .groupBy("z_cell")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("ub").alias("min_ub"),
            F.max("ub").alias("max_ub"),
            F.min("vb").alias("min_vb"),
            F.max("vb").alias("max_vb"),
            (
                (F.max("ub") - F.min("ub") + 1)
                * (F.max("vb") - F.min("vb") + 1)
            ).alias("rect_area"),
        )
        .orderBy("z_cell")
    )


def _sql_zorder_layout() -> str:
    n = 1 << ZORDER_BITS
    z = _z_interleave("ub", "vb", ZORDER_BITS)
    return f"""
WITH pts AS (
  SELECT user_id % {n} AS ub,
         (((CAST(floor(value * 100 + 0.5) AS BIGINT) % {n}) + {n}) % {n})
           AS vb
  FROM events),
zv AS (SELECT ub, vb, {z} >> {ZORDER_BITS} AS z_cell FROM pts)
SELECT z_cell, COUNT(*) AS n,
       MIN(ub) AS min_ub, MAX(ub) AS max_ub,
       MIN(vb) AS min_vb, MAX(vb) AS max_vb,
       (MAX(ub) - MIN(ub) + 1) * (MAX(vb) - MIN(vb) + 1) AS rect_area
FROM zv
GROUP BY z_cell
ORDER BY z_cell
"""


SQL_ZORDER_LAYOUT = _sql_zorder_layout()


#: market-basket thresholds: pairs co-ordered at least this often
_BASKET_MIN_SUPPORT = 3
_BASKET_TOPN = 30


def q_basket_lift(spark, sf_dir):
    """Market-basket association mining over order line items — the
    A-priori first pass (Agrawal & Srikant 1994): for every pair of
    part BRANDS co-occurring in an order, support, confidence and
    lift, thresholded at min-support and ranked by lift.  The
    recommender/affinity primitive ("customers who bought X also
    bought Y") this engine was missing.

    Brands (25 distinct), not raw parts: at fixture scale raw
    part-pair support is almost always 1 — the threshold would
    either keep nothing or mean nothing.  The brand roll-up is also
    the realistic production grain (item hierarchies tame sparsity).

    Determinism: support counts are exact integers; confidence and
    lift are integer ratios det6 floor-rounded; ties broken by the
    pair's names.

    Scale plan: baskets = one (order, brand) distinct pass; pairs via
    a SINGLE self-equi-join on l_orderkey with a.brand < b.brand —
    candidate volume is C(brands-per-order, 2) per order (bounded by
    the order's width, not the catalog); per-item supports come from
    the same basket relation and join back as a broadcast (25 rows);
    the min-support filter prunes before the lift math.  This is the
    supplier co-occurrence shape that was REJECTED for triangle
    enumeration (`graph.q_graph_triangles`) — fine here because the
    pair AGGREGATE is the output, never pair×pair expansion.
    Measured (isolated min-of-2, r09): 4.6 s at sf1 → 25 s at sf10,
    ~5.4×/decade — linear in pair instances, as the shape predicts.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    # round 14 (guide §2.3 "shuffle keys and metadata instead of
    # payloads" + §4's stay-in-codegen rule): brands ride as SMALL
    # INTS end-to-end.  The fixture's brand domain is the TPC-H
    # surface 'Brand#N' (the same documented format the q16/q17/q19
    # literals lean on), so the numeral IS a dense id ≤ 63 and the
    # per-order set becomes ONE BIGINT BITMASK — bit_or partial-
    # aggregates map-side and the orderkey exchange carries 8 bytes
    # per order instead of an array<string>.  Pair/item/order tallies
    # then come from one pure-codegen chained-Generate pipeline
    # (HOF-lambda pair generation is interpreted, measured 2× slower):
    # append sentinels {64, 65} to the position array, explode twice
    # with y > x (dropping (x, 65) for real x), and count ids
    # x·66 + y — pair (i<j) when y < 64, item i when y = 64, order
    # count at id 64·66+65.  One ≤~4.3k-key map-side hash-agg feeds
    # the whole assembly.  vs the r10 form this removes the persisted
    # corpus-grain basket relation and two of its three consumer
    # passes, and replaces struct<string,string> hash keys with one
    # int per pair instance.  Strings are reconstructed on the
    # ≤300-row pair relation (lexicographic a<b via least/greatest,
    # so the output order is byte-identical to the oracle's string
    # comparison).  Support/item/order counts are the same integers,
    # so confidence/lift/ordering are unchanged (oracle-verified;
    # before/after numbers in OPTIMIZATION_r14.md).
    part_idx = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.expr("CAST(substring(p_brand, 7) AS INT)").alias("bidx"),
    )
    baskets = (
        li.join(
            F.broadcast(part_idx), li.l_partkey == part_idx.p_partkey
        )
        .groupBy("l_orderkey")
        .agg(
            F.expr(
                "bit_or(shiftleft(CAST(1 AS BIGINT), bidx))"
            ).alias("mask")
        )
    )
    from ..cache import persist_scoped

    b2 = baskets.select(
        F.expr(
            "concat(filter(sequence(0, 63),"
            " p -> (shiftright(mask, p) & 1) = 1), array(64, 65))"
        ).alias("bs2")
    )
    e1 = b2.select("bs2", F.explode("bs2").alias("x"))
    e2 = e1.select("x", F.explode("bs2").alias("y")).where(
        "y > x AND (y < 65 OR x = 64)"
    )
    # the ≤~4.3k-row tally relation feeds TWO consumers (pair rows +
    # the one-row aux broadcast) — persist the post-aggregate rows or
    # each consumer re-runs the corpus pass
    tallies = persist_scoped(
        "basket_lift_tallies",
        e2.select((F.col("x") * 66 + F.col("y")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt")),
    )
    pair = tallies.where(
        (F.col("id") % 66 < 64)
        & (F.col("cnt") >= _BASKET_MIN_SUPPORT)
    ).select(
        F.expr("CAST(id DIV 66 AS INT)").alias("ia"),
        F.expr("CAST(id % 66 AS INT)").alias("ib"),
        F.col("cnt").alias("support"),
    )
    # item counts + order count fold into ONE single-row broadcast (a
    # brand-indexed map): with separate item/n_orders broadcasts, the
    # broadcast build jobs race to populate the tallies cache and the
    # corpus pass ran twice concurrently (measured +5 s at sf10)
    aux = tallies.agg(
        F.expr(
            "map_from_entries(collect_list("
            " CASE WHEN id % 66 = 64 AND id DIV 66 < 64"
            " THEN struct(CAST(id DIV 66 AS INT) AS i, cnt) END))"
        ).alias("items"),
        F.max(
            F.when(F.col("id") == 64 * 66 + 65, F.col("cnt"))
        ).alias("n_orders"),
    )
    return (
        pair.crossJoin(F.broadcast(aux))
        .selectExpr(
            "concat('Brand#', ia) AS sa",
            "concat('Brand#', ib) AS sb",
            "support",
            "items[ia] AS cnt_a",
            "items[ib] AS cnt_b",
            "n_orders",
        )
        .selectExpr(
            "least(sa, sb) AS brand_a",
            "greatest(sa, sb) AS brand_b",
            "support",
            "IF(sa <= sb, cnt_a, cnt_b) AS n_a",
            "IF(sa <= sb, cnt_b, cnt_a) AS n_b",
            "n_orders",
        )
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


SQL_BASKET_LIFT = f"""
WITH baskets AS (
  SELECT DISTINCT l_orderkey, p_brand AS brand
  FROM lineitem JOIN part ON l_partkey = p_partkey),
n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
      FROM baskets),
item AS (
  SELECT brand, CAST(COUNT(*) AS BIGINT) AS item_n
  FROM baskets GROUP BY brand),
pair AS (
  SELECT a.brand AS brand_a, b.brand AS brand_b,
         CAST(COUNT(*) AS BIGINT) AS support
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.brand < b.brand
  GROUP BY 1, 2
  HAVING COUNT(*) >= {_BASKET_MIN_SUPPORT})
SELECT brand_a, brand_b, support,
       FLOOR(support / CAST(ia.item_n AS DOUBLE) * 1e6 + 0.5) / 1e6
         AS confidence,
       FLOOR(support * n_orders
             / CAST(ia.item_n * ib.item_n AS DOUBLE) * 1e6 + 0.5) / 1e6
         AS lift
FROM pair
JOIN item ia ON ia.brand = brand_a
JOIN item ib ON ib.brand = brand_b
CROSS JOIN n
ORDER BY lift DESC, brand_a, brand_b
LIMIT {_BASKET_TOPN}
"""


def q_version_changes(spark, sf_dir):
    """Change feed (CDC) between two committed versions of a versioned
    parquet table (`sinks/versioned.py` — snapshot isolation + time
    travel without a table-format dependency).  The query materializes
    two deterministic curation passes over ``documents`` as table
    versions v1 and v2 via `versioned_overwrite`, then derives the
    insert/delete/update feed with `version_changes`:

    * v1 = docs with ``doc_id % 10 < 8`` (doc_id, lang, n_chars)
    * v2 = docs with ``doc_id % 10 >= 2``, where buckets 4–5 get
      ``n_chars + 1`` (a re-curation that touched those docs)

    ⇒ buckets 0–1 delete, 8–9 insert, 4–5 update, 2–3/6–7 unchanged
    (dropped).  The oracle replays the same two logical slices with a
    full-outer join and direct value comparison — the Spark side's
    xxhash64 value fingerprint must classify identically.

    Scale plan: version materialization is two plain parquet writes;
    the diff is ONE full-outer hash join on the key with the row
    payload collapsed to an 8-byte xxhash64 before the shuffle, so
    a 100 TB-wide table diffs at key+hash width.
    """
    import os
    import shutil
    import tempfile

    from ..catalog import load_table as _lt
    from ..sinks.versioned import version_changes, versioned_overwrite

    docs = _lt(spark, sf_dir, "documents").selectExpr(
        "doc_id", "lang", "n_chars"
    )
    v1 = docs.where("doc_id % 10 < 8")
    v2 = docs.where("doc_id % 10 >= 2").selectExpr(
        "doc_id",
        "lang",
        "CASE WHEN doc_id % 10 IN (4, 5) THEN n_chars + 1 "
        "ELSE n_chars END AS n_chars",
    )
    # deterministic per-process dir, cleared on every invocation —
    # mkdtemp here leaked a fresh 2-version table per call across
    # bench warmups and correctness sweeps (round-9 ADVICE)
    table_dir = os.path.join(
        tempfile.gettempdir(), f"sg_version_changes_{os.getpid()}"
    )
    shutil.rmtree(table_dir, ignore_errors=True)
    va = versioned_overwrite(v1, table_dir)
    vb = versioned_overwrite(v2, table_dir)
    return version_changes(
        spark, table_dir, va, vb, ["doc_id"]
    ).orderBy("doc_id")


SQL_VERSION_CHANGES = """
WITH v1 AS (
  SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 10 < 8),
v2 AS (
  SELECT doc_id, lang,
         CASE WHEN doc_id % 10 IN (4, 5) THEN n_chars + 1
              ELSE n_chars END AS n_chars
  FROM documents WHERE doc_id % 10 >= 2)
SELECT doc_id, change FROM (
  SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
         CASE WHEN v1.doc_id IS NULL THEN 'insert'
              WHEN v2.doc_id IS NULL THEN 'delete'
              WHEN v1.lang IS DISTINCT FROM v2.lang
                OR v1.n_chars IS DISTINCT FROM v2.n_chars THEN 'update'
         END AS change
  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
WHERE change IS NOT NULL
ORDER BY doc_id
"""


def q_event_transitions(spark, sf_dir):
    """First-order Markov statistics over each user's event sequence:
    (from_type → to_type) counts and row-normalized transition
    probabilities — the sequence-model summary behaviour/feature
    pipelines start from.

    Scale plan: one user-partitioned lag window (total order on
    ts + event_id, never global), then a hash-agg on the ≤|types|²
    pair space; probabilities are exact-integer ratios of pair count
    over from-type total (a second tiny aggregate joined back), so
    both engines emit identical doubles.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    pairs = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.lag("event_type").over(w).alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .where(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )
    totals = pairs.groupBy(F.col("from_type").alias("ft")).agg(
        F.sum("n").alias("total")
    )
    return (
        pairs.join(F.broadcast(totals), F.col("from_type") == F.col("ft"))
        .select(
            "from_type",
            "to_type",
            "n",
            F.round(F.col("n") / F.col("total"), 6).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )


SQL_EVENT_TRANSITIONS = """
WITH seq AS (
  SELECT user_id,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts ASC, event_id ASC) AS from_type,
         event_type AS to_type
  FROM events),
pairs AS (
  SELECT from_type, to_type, COUNT(*) AS n
  FROM seq WHERE from_type IS NOT NULL
  GROUP BY from_type, to_type),
totals AS (
  SELECT from_type AS ft, SUM(n) AS total FROM pairs GROUP BY from_type)
SELECT from_type, to_type, n, ROUND(n / total, 6) AS p
FROM pairs JOIN totals ON from_type = ft
ORDER BY from_type, to_type
"""


def q_time_gap_stats(spark, sf_dir):
    """Per-user inter-event gap statistics: lag over a TOTAL order
    (ts, event_id — ties must break deterministically or the gaps
    themselves differ between engines), integer-second gaps, then
    median/max per user with a DISCRETE median (an actual gap value, so
    cross-engine exact).  Scale plan: one user-partitioned window + one
    hash-agg; the shuffle key is user_id throughout, so AQE reuses the
    exchange."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("sec")
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    gaps = ev.withColumn(
        "gap", F.col("sec") - F.lag("sec").over(w)
    ).where(F.col("gap").isNotNull())
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count("*").alias("n_gaps"),
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY gap)")
            .cast("bigint")
            .alias("median_gap_s"),
            F.max("gap").cast("bigint").alias("max_gap_s"),
        )
        .orderBy("user_id")
    )


SQL_TIME_GAP_STATS = """
WITH seq AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT)
           - LAG(CAST(floor(epoch(ts)) AS BIGINT)) OVER
             (PARTITION BY user_id
              ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id) AS gap
  FROM events)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(quantile_disc(gap, 0.5) AS BIGINT) AS median_gap_s,
       CAST(MAX(gap) AS BIGINT) AS max_gap_s
FROM seq
WHERE gap IS NOT NULL
GROUP BY user_id
ORDER BY user_id
"""


_FREQ_COLS = ("l_returnflag", "l_linestatus", "l_quantity")
_FREQ_TOPK = 3


def q_profile_frequent_values(spark, sf_dir):
    """Frequent-values profiling (the other half of `profile_table`):
    top-3 most common values per column, all columns in ONE scan —
    stack to long form, one hash-agg on (column, value), per-column
    top-k via row_number (WindowGroupLimit applies the limit before the
    exchange).  Ties break on the value string for determinism."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    stack_args = ", ".join(
        f"'{c}', CAST({c} AS STRING)" for c in _FREQ_COLS
    )
    long = li.select(
        F.expr(
            f"stack({len(_FREQ_COLS)}, {stack_args}) AS (column_name, value_s)"
        )
    )
    counts = long.groupBy("column_name", "value_s").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("column_name").orderBy(
        F.desc("n"), F.asc("value_s")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _FREQ_TOPK)
        .select("column_name", "value_s", "n", F.col("rk").cast("int").alias("rk"))
        .orderBy("column_name", "rk")
    )


SQL_PROFILE_FREQUENT_VALUES = f"""
WITH long AS (
  {" UNION ALL ".join(
      f"SELECT '{c}' AS column_name, CAST({c} AS VARCHAR) AS value_s "
      f"FROM lineitem" for c in _FREQ_COLS)}),
counts AS (
  SELECT column_name, value_s, CAST(COUNT(*) AS BIGINT) AS n
  FROM long GROUP BY 1, 2),
ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY column_name
                 ORDER BY n DESC, value_s ASC) AS INT) AS rk
  FROM counts)
SELECT column_name, value_s, n, rk FROM ranked
WHERE rk <= {_FREQ_TOPK}
ORDER BY column_name, rk
"""


def q_user_features(spark, sf_dir):
    """Per-user feature extraction (the ML feature-table pattern): one
    row per user with per-type event counts, activity span, and value
    aggregates — a single hash-agg with conditional sums, map-side
    partials, shuffle of one row per user.  Monetary sums accumulate in
    decimal so the 2-dp round is knife-edge-free."""
    ev = load_table(spark, sf_dir, "events")

    def n_of(t):
        return (
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
            .cast("bigint")
            .alias(f"n_{t}")
        )

    return (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            n_of("click"),
            n_of("view"),
            n_of("purchase"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.round(F.sum(F.col("value").cast("decimal(20,6)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("user_id")
    )


SQL_USER_FEATURES = """
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_click,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_view,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_purchase,
       MIN(ts) AS first_ts,
       MAX(ts) AS last_ts,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(20,6))), 2) AS DOUBLE)
         AS total_value
FROM events
GROUP BY user_id
ORDER BY user_id
"""


def q_approx_distinct_check(spark, sf_dir):
    """Oracle-checkable companion to `approx_distinct` (the ANN-recall
    pattern): computes the HLL estimate AND the exact distinct count in
    one plan and emits whether the relative error is within a ±5%
    bound.  The oracle asserts the same booleans from the exact side
    alone, so a drifting sketch turns this row red instead of hiding
    behind rows-only.  The sketch runs at rsd=0.01, making the 5%
    window a 5-sigma bound — at the DEFAULT rsd=0.05 the window is
    only 1 sigma and genuinely fails at larger scale factors (caught
    by the sf0.1 sweep, round 3)."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.01).alias(
                "approx_users"
            ),
            F.count_distinct("user_id").alias("exact_users"),
        )
        .select(
            "event_type",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("within_tol"),
        )
        .orderBy("event_type")
    )


SQL_APPROX_DISTINCT_CHECK = """
SELECT event_type, true AS within_tol
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def q_approx_quantile_check(spark, sf_dir):
    """Tolerance row for the t-digest-style quantile sketch
    (`percentile_approx`), same pattern as approx_distinct_check: the
    sketch's p50/p95 must land inside a generous exact-rank window
    (p40–p60 / p90–p99), asserted from the exact side by the oracle —
    a drifting sketch turns this row red instead of hiding rows-only.
    Sketch error is bounded in RANK space, which is why the tolerance
    is a rank window rather than a value epsilon."""
    g = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.percentile_approx("value", 0.5).alias("ap50"),
            F.percentile_approx("value", 0.95).alias("ap95"),
            F.expr("percentile(value, 0.40)").alias("lo50"),
            F.expr("percentile(value, 0.60)").alias("hi50"),
            F.expr("percentile(value, 0.90)").alias("lo95"),
            F.expr("percentile(value, 0.99)").alias("hi95"),
        )
    )
    return g.select(
        "event_type",
        (
            (F.col("ap50") >= F.col("lo50"))
            & (F.col("ap50") <= F.col("hi50"))
        ).alias("p50_ok"),
        (
            (F.col("ap95") >= F.col("lo95"))
            & (F.col("ap95") <= F.col("hi95"))
        ).alias("p95_ok"),
    ).orderBy("event_type")


SQL_APPROX_QUANTILE_CHECK = """
SELECT event_type, true AS p50_ok, true AS p95_ok
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def q_sql_grouping_sets(spark, sf_dir):
    """SQL-string entry point (the reference's ss.sql(...) path,
    ConsommationStreaming.scala:87-90) + GROUPING SETS, which neither
    cube nor rollup expresses."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_v"
    )
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n,
               ROUND(SUM(o_totalprice), 2) AS total,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_prio
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority
        """
    )


SQL_SQL_GROUPING_SETS = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n,
       ROUND(SUM(o_totalprice), 2) AS total,
       CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_prio
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority
"""


def q_kafka_json_roundtrip(spark, sf_dir):
    """Producer→consumer JSON parity: shape rows into the Kafka payload
    (to_json of a struct — the producer side, ProducerKafa_Prod.scala:
    76-86) and parse them back with from_json against an explicit
    schema (the consumer side, ConsommationStreaming.scala:96) —
    asserting the roundtrip preserves values."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    orders = load_table(spark, sf_dir, "orders")
    payload_schema = StructType(
        [
            StructField("orderid", LongType()),
            StructField("status", StringType()),
            StructField("totalprice", DoubleType()),
        ]
    )
    payload = orders.select(
        F.to_json(
            F.struct(
                F.col("o_orderkey").alias("orderid"),
                F.col("o_orderstatus").alias("status"),
                F.round("o_totalprice", 2).alias("totalprice"),
            )
        ).alias("value")
    )
    parsed = payload.withColumn(
        "j", F.from_json("value", payload_schema)
    )
    return (
        parsed.select("j.orderid", "j.status", "j.totalprice")
        .groupBy("status")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("totalprice"), 2).alias("total"),
        )
        .orderBy("status")
    )


SQL_KAFKA_JSON_ROUNDTRIP = """
WITH payload AS (
  SELECT to_json(struct_pack(orderid := o_orderkey,
                             status := o_orderstatus,
                             totalprice := ROUND(o_totalprice, 2))) AS value
  FROM orders),
parsed AS (
  SELECT CAST(json_extract(value, '$.orderid') AS BIGINT) AS orderid,
         json_extract_string(value, '$.status') AS status,
         CAST(json_extract(value, '$.totalprice') AS DOUBLE) AS totalprice
  FROM payload)
SELECT status, COUNT(*) AS n, ROUND(SUM(totalprice), 2) AS total
FROM parsed
GROUP BY status
ORDER BY status
"""


def q_keyword_filter(spark, sf_dir):
    """P10: keyword/track filtering (HBC trackTerms / FilterQuery.track,
    TwitterKafkaStreaming.scala:57-58,148-149) as pushdown-style
    contains/rlike predicates."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.where(
            F.col("text").contains("spark")
            | F.col("text").rlike(r"\bstream(ing)?\b")
        )
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


SQL_KEYWORD_FILTER = r"""
SELECT doc_id, lang, source
FROM documents
WHERE text LIKE '%spark%' OR regexp_matches(text, '\bstream(ing)?\b')
ORDER BY doc_id
"""


def q_multires_rollup(spark, sf_dir):
    """Hypertable-style continuous-aggregate rollup: one pass over the
    fact stream produces aligned aggregates at every resolution
    (1m/15m/1h/1d).  Implementation: explode each row into its
    (resolution, bucket) memberships — one shuffle for all four levels
    instead of four scans.  At 100 TB this is the difference between
    reading the fact table once and reading it per-resolution.
    """
    events = load_table(spark, sf_dir, "events")
    resolutions = [60, 900, 3600, 86400]
    res_arr = ", ".join(str(r) for r in resolutions)
    # timestampdiff/timestampadd against an NTZ epoch base are
    # timezone-free (unix_timestamp would re-interpret NTZ in the
    # session zone and shift hour/day buckets off UTC)
    exploded = events.select(
        "value",
        F.explode(
            F.expr(
                f"""
                transform(array({res_arr}), r -> named_struct(
                  'res_s', r,
                  'bucket', timestampadd(SECOND,
                      cast(floor(timestampdiff(SECOND,
                            TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) / r)
                           * r as bigint),
                      TIMESTAMP_NTZ '1970-01-01 00:00:00')))
                """
            )
        ).alias("rb"),
    ).select("value", "rb.res_s", "rb.bucket")
    return (
        exploded.groupBy("res_s", "bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("res_s", "bucket")
    )


SQL_MULTIRES_ROLLUP = """
WITH exploded AS (
  SELECT value, r.res_s,
         -- make_timestamp(micros) builds a NAIVE timestamp directly;
         -- to_timestamp() returns TIMESTAMPTZ, whose cast back to
         -- TIMESTAMP re-renders through DuckDB's OS-inherited TimeZone
         -- (caught by the TZ=America/New_York oracle sweep)
         make_timestamp(CAST(floor(floor(epoch(ts)) / r.res_s)
                             * r.res_s AS BIGINT) * 1000000) AS bucket
  FROM events,
       (SELECT unnest([60, 900, 3600, 86400]) AS res_s) r)
SELECT res_s, bucket, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
FROM exploded
GROUP BY res_s, bucket
ORDER BY res_s, bucket
"""


def q_session_window(spark, sf_dir):
    """Native session windows in batch mode: per-user sessions that
    merge events closer than 30 minutes (F.session_window — the same
    operator Structured Streaming uses for stateful session aggs)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.session_window(F.col("ts"), "30 minutes").alias("w"),
            "user_id",
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


SQL_SESSION_WINDOW = """
-- session_window merges events with gap < 30 min (strict); a new
-- session starts when the gap is >= 1800 s
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(LAG(ts) OVER w) >= 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked)
SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
FROM sess
GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


def q_unpivot(spark, sf_dir):
    """Unpivot/melt: lineitem measure columns to long format
    (stack via the unpivot API)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").alias("quantity"),
            F.col("l_extendedprice").alias("extendedprice"),
            F.col("l_discount").alias("discount"),
        )
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["quantity", "extendedprice", "discount"],
            "measure",
            "val",
        )
        .groupBy("measure")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("val"), 2).alias("total"),
        )
        .orderBy("measure")
    )


SQL_UNPIVOT = """
WITH long AS (
  SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
         l_quantity AS val FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
  FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem)
SELECT measure, COUNT(*) AS n, ROUND(SUM(val), 2) AS total
FROM long
GROUP BY measure
ORDER BY measure
"""


def q_array_functions(spark, sf_dir):
    """Array surface: collect_list→array_sort (deterministic),
    size/element access/contains/slice over grouped data."""
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.array_sort(F.collect_list("c_custkey")).alias("keys"))
        .select(
            "c_nationkey",
            F.size("keys").cast("bigint").alias("n_keys"),
            F.element_at("keys", 1).alias("first_key"),
            F.element_at("keys", -1).alias("last_key"),
            # Scalar projection of the sliced array: the driver's
            # pandas-based canonicalizer cannot hash list cells, so the
            # array surface is exercised (slice) but emitted as a string.
            F.concat_ws(
                ",", F.expr("transform(slice(keys, 1, 3), x -> CAST(x AS STRING))")
            ).alias("first3"),
            F.array_contains("keys", 1).alias("has_key_1"),
        )
        .orderBy("c_nationkey")
    )


SQL_ARRAY_FUNCTIONS = """
SELECT c_nationkey,
       CAST(len(keys) AS BIGINT) AS n_keys,
       keys[1] AS first_key,
       keys[-1] AS last_key,
       array_to_string(keys[1:3], ',') AS first3,
       list_contains(keys, 1) AS has_key_1
FROM (SELECT c_nationkey, list_sort(list(c_custkey)) AS keys
      FROM customer GROUP BY c_nationkey)
ORDER BY c_nationkey
"""


def q_null_semantics(spark, sf_dir):
    """Null handling: nullif to manufacture nulls deterministically,
    then coalesce/nvl2-style defaults, null-aware counting, and
    null-safe equality."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "v_null", F.nullif(F.col("event_type"), F.lit("error"))
    )
    return (
        ev.groupBy()
        .agg(
            F.count("*").alias("n_rows"),
            F.count("v_null").alias("n_nonnull"),
            F.sum(F.col("v_null").isNull().cast("long")).alias("n_null"),
            F.count_distinct("v_null").alias("n_distinct_nonnull"),
            F.sum(
                F.col("v_null").eqNullSafe(F.lit(None).cast("string"))
                .cast("long")
            ).alias("n_nullsafe_eq_null"),
        )
    )


SQL_NULL_SEMANTICS = """
SELECT COUNT(*) AS n_rows,
       COUNT(v_null) AS n_nonnull,
       CAST(SUM(CASE WHEN v_null IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null,
       COUNT(DISTINCT v_null) AS n_distinct_nonnull,
       CAST(SUM(CASE WHEN v_null IS NOT DISTINCT FROM NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_eq_null
FROM (SELECT nullif(event_type, 'error') AS v_null FROM events)
"""


def q_string_agg(spark, sf_dir):
    """Ordered string aggregation: region names per... nation names per
    region, sorted and joined — concat_ws(collect+sort)."""
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    return (
        nat.join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("n_name")))
            .alias("nations")
        )
        .orderBy("r_name")
    )


SQL_STRING_AGG = """
SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


def q_stats_agg(spark, sf_dir):
    """Statistical aggregates: sample stddev/variance, correlation,
    covariance, and argmin/argmax (min_by/max_by).

    Cross-engine determinism: naive double summation is partition-order
    dependent, so ``corr``/``covar``/``stddev`` computed directly on
    doubles can flip their last rounded digit between runs (the round-1
    driver hash mismatch).  Instead, values are scaled to exact integer
    cents, summed in DECIMAL(38,0) (exact, order-independent), and the
    closed-form moment formulas are evaluated on the resulting doubles —
    both engines then perform identical IEEE arithmetic on identical
    exact inputs.  argmax/argmin tie-break on (price, orderkey) via a
    zero-padded composite string key (DuckDB's arg_max cannot order by
    struct).  At scale this stays a single partial-aggregate: nine
    decimal accumulators + two string max/min per group.

    Final rounding is floor(x*10^d + 0.5)/10^d rather than ROUND():
    engine ROUND() semantics differ (Spark rounds the exact decimal
    expansion HALF_UP, DuckDB multiplies in floats), and DuckDB's can
    emit -0.0 where Spark emits +0.0 (the round-2 driver hash mismatch
    was exactly that: cov_disc_tax -0.0 vs 0.0).  floor on a double is
    exact IEEE, identical bit-for-bit in both engines, and can never
    produce negative zero.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_orderkey",
        F.round(F.col("l_quantity") * 100, 0).cast("long").alias("qc"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("pc"),
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("dc"),
        F.round(F.col("l_tax") * 100, 0).cast("long").alias("tc"),
    )
    tie_key = F.concat(
        F.lpad(F.col("pc").cast("string"), 13, "0"),
        F.lpad(F.col("l_orderkey").cast("string"), 13, "0"),
    )

    def dsum(col):
        return F.sum(col.cast("decimal(38,0)")).cast("double")

    agg = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        dsum(F.col("qc")).alias("sq"),
        dsum(F.col("pc")).alias("sp"),
        dsum(F.col("dc")).alias("sd"),
        dsum(F.col("tc")).alias("st"),
        dsum(F.col("qc") * F.col("qc")).alias("sqq"),
        dsum(F.col("pc") * F.col("pc")).alias("spp"),
        dsum(F.col("qc") * F.col("pc")).alias("sqp"),
        dsum(F.col("dc") * F.col("tc")).alias("sdt"),
        F.max_by("l_orderkey", tie_key).alias("argmax_order"),
        F.min_by("l_orderkey", tie_key).alias("argmin_order"),
    )
    n, sq, sp, sd_, st = (F.col(c) for c in ("n", "sq", "sp", "sd", "st"))
    sqq, spp, sqp, sdt = (F.col(c) for c in ("sqq", "spp", "sqp", "sdt"))

    def det_round(c, digits):
        s = F.lit(float(10**digits))
        return F.floor(c * s + F.lit(0.5)).cast("double") / s

    return agg.select(
        "l_returnflag",
        det_round(
            F.sqrt((n * spp - sp * sp) / (n * (n - 1))) / 100, 4
        ).alias("sd_price"),
        det_round((n * sqq - sq * sq) / (n * (n - 1)) / 10000, 4).alias(
            "var_qty"
        ),
        det_round(
            (n * sqp - sq * sp)
            / F.sqrt((n * sqq - sq * sq) * (n * spp - sp * sp)),
            6,
        ).alias("corr_qty_price"),
        det_round((n * sdt - sd_ * st) / (n * (n - 1)) / 10000, 6).alias(
            "cov_disc_tax"
        ),
        "argmax_order",
        "argmin_order",
    ).orderBy("l_returnflag")


SQL_STATS_AGG = """
WITH c AS (
  SELECT l_returnflag, l_orderkey,
         CAST(round(l_quantity * 100) AS BIGINT) AS qc,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
         CAST(round(l_discount * 100) AS BIGINT) AS dc,
         CAST(round(l_tax * 100) AS BIGINT) AS tc
  FROM lineitem),
a AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(qc AS DECIMAL(38,0))) AS DOUBLE) AS sq,
         CAST(SUM(CAST(pc AS DECIMAL(38,0))) AS DOUBLE) AS sp,
         CAST(SUM(CAST(dc AS DECIMAL(38,0))) AS DOUBLE) AS sd,
         CAST(SUM(CAST(tc AS DECIMAL(38,0))) AS DOUBLE) AS st,
         CAST(SUM(CAST(qc*qc AS DECIMAL(38,0))) AS DOUBLE) AS sqq,
         CAST(SUM(CAST(pc*pc AS DECIMAL(38,0))) AS DOUBLE) AS spp,
         CAST(SUM(CAST(qc*pc AS DECIMAL(38,0))) AS DOUBLE) AS sqp,
         CAST(SUM(CAST(dc*tc AS DECIMAL(38,0))) AS DOUBLE) AS sdt,
         arg_max(l_orderkey, lpad(CAST(pc AS VARCHAR), 13, '0')
                             || lpad(CAST(l_orderkey AS VARCHAR), 13, '0'))
           AS argmax_order,
         arg_min(l_orderkey, lpad(CAST(pc AS VARCHAR), 13, '0')
                             || lpad(CAST(l_orderkey AS VARCHAR), 13, '0'))
           AS argmin_order
  FROM c GROUP BY l_returnflag)
SELECT l_returnflag,
       floor(sqrt((n*spp - sp*sp) / (n*(n-1))) / 100 * 1e4 + 0.5) / 1e4
         AS sd_price,
       floor((n*sqq - sq*sq) / (n*(n-1)) / 10000 * 1e4 + 0.5) / 1e4
         AS var_qty,
       floor((n*sqp - sq*sp) / sqrt((n*sqq - sq*sq) * (n*spp - sp*sp))
             * 1e6 + 0.5) / 1e6
         AS corr_qty_price,
       floor((n*sdt - sd*st) / (n*(n-1)) / 10000 * 1e6 + 0.5) / 1e6
         AS cov_disc_tax,
       argmax_order, argmin_order
FROM a
ORDER BY l_returnflag
"""


def q_scd2_history(spark, sf_dir):
    """SCD2 / CDC pattern: build a slowly-changing-dimension history
    from a change stream — each (user, event_type) change becomes a
    version with [valid_from, valid_to) bounds and an is_current flag.
    The MERGE-less emulation (lead window) the engine uses where Delta
    is unavailable."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            F.col("event_type").alias("attr"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
            F.lead("ts").over(w).isNull().alias("is_current"),
        )
        .orderBy("user_id", "valid_from")
    )


SQL_SCD2_HISTORY = """
SELECT user_id,
       event_type AS attr,
       ts AS valid_from,
       LEAD(ts) OVER w AS valid_to,
       LEAD(ts) OVER w IS NULL AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, valid_from
"""


def q_map_functions(spark, sf_dir):
    """Map-type surface: build a per-day map event_type→count
    (map_from_entries over grouped structs), then cardinality, key
    lookup, and sorted-keys projection."""
    ev = load_table(spark, sf_dir, "events")
    per_day = (
        ev.select(F.to_date("ts").alias("d"), "event_type")
        .groupBy("d", "event_type")
        .agg(F.count("*").alias("n"))
    )
    mapped = per_day.groupBy("d").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "n")))
        ).alias("m")
    )
    return mapped.select(
        "d",
        F.size("m").cast("bigint").alias("n_types"),
        F.element_at("m", "click").alias("n_click"),
        F.concat_ws(",", F.array_sort(F.map_keys("m"))).alias("types"),
    ).orderBy("d")


SQL_MAP_FUNCTIONS = """
WITH per_day AS (
  SELECT CAST(ts AS DATE) AS d, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2),
mapped AS (
  SELECT d, map_from_entries(list_sort(list({'k': event_type, 'v': n}))) AS m
  FROM per_day GROUP BY d)
SELECT d,
       CAST(cardinality(m) AS BIGINT) AS n_types,
       map_extract(m, 'click')[1] AS n_click,
       array_to_string(list_sort(map_keys(m)), ',') AS types
FROM mapped
ORDER BY d
"""


def q_funnel_steps(spark, sf_dir):
    """Strictly-ordered conversion funnel view → click → purchase:
    a user counts for step n only with an event strictly after their
    first step-(n-1) event.  Each stage is a filtered min-agg joined to
    the (shrinking) previous stage's user set — all equi-joins on
    user_id, co-partitioned down the chain, no window over the full
    event stream."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    rows = [
        v.select(F.lit("1_view").alias("step"), "user_id"),
        c.select(F.lit("2_click").alias("step"), "user_id"),
        p.select(F.lit("3_purchase").alias("step"), "user_id"),
    ]
    out = rows[0].unionAll(rows[1]).unionAll(rows[2])
    return (
        out.groupBy("step")
        .agg(F.count("*").alias("n_users"))
        .orderBy("step")
    )


SQL_FUNNEL_STEPS = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
SELECT step, COUNT(*) AS n_users FROM (
  SELECT '1_view' AS step, user_id FROM v
  UNION ALL SELECT '2_click', user_id FROM c
  UNION ALL SELECT '3_purchase', user_id FROM p)
GROUP BY step ORDER BY step
"""


def q_cohort_retention(spark, sf_dir):
    """Weekly cohort retention matrix: users bucketed by first-seen
    ISO week; one row per (cohort_week, weeks_since) with the count of
    distinct users active that week.  Two aggs + one equi-join on
    user_id; the distinct collapses map-side before the cohort
    shuffle."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("week")
    )
    first = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = ev.distinct()
    return (
        active.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(F.col("week"), F.col("cohort_week")) / 7
            ).cast("int").alias("weeks_since"),
        )
        .agg(F.count("*").alias("n_users"))
        .orderBy("cohort_week", "weeks_since")
    )


SQL_COHORT_RETENTION = """
WITH ev AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
  FROM events),
first AS (
  SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY user_id)
SELECT f.cohort_week,
       CAST((ev.week - f.cohort_week) / 7 AS INTEGER) AS weeks_since,
       COUNT(*) AS n_users
FROM ev JOIN first f USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_trend_regression(spark, sf_dir):
    """Per-user purchase-value trend via the regr_* aggregate family
    (one hash-agg, map-side partials — the JVM-side way to fit 10⁹
    tiny per-key regressions; no applyInPandas needed).

    x is DAY-granularity from the NTZ timestamp (datediff vs a fixed
    epoch date): TZ-free on both engines, unlike epoch-seconds x where
    Spark's unix_timestamp applies the session zone and truncates
    sub-seconds while DuckDB's epoch() does neither.  Rounded to 4 dp
    (the stats_agg float-knife-edge rule); degenerate single-day users
    excluded with an integer-exact HAVING."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    ).select(
        "user_id",
        "value",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("double")
        .alias("x"),
    )
    return (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.min("x").alias("__xmin"),
            F.max("x").alias("__xmax"),
            F.round(F.regr_slope("value", "x"), 4).alias("slope"),
            F.round(F.regr_intercept("value", "x"), 4).alias("intercept"),
        )
        .where(F.col("__xmax") > F.col("__xmin"))
        .drop("__xmin", "__xmax")
        .orderBy("user_id")
    )


SQL_TREND_REGRESSION = """
SELECT user_id, COUNT(*) AS n,
       ROUND(regr_slope(value, x), 4) AS slope,
       ROUND(regr_intercept(value, x), 4) AS intercept
FROM (
  SELECT user_id, value,
         CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS DOUBLE) AS x
  FROM events WHERE event_type = 'purchase')
GROUP BY user_id
HAVING MAX(x) > MIN(x)
ORDER BY user_id
"""


def q_iqr_outliers(spark, sf_dir):
    """Tukey-fence outlier detection per event_type: value outside
    [p25 − 1.5·IQR, p75 + 1.5·IQR].  Uses DISCRETE percentiles (actual
    data values, no interpolation arithmetic) so the fence doubles are
    bit-identical across engines and outlier MEMBERSHIP is
    deterministic — interpolated quantiles would make boundary rows
    engine-dependent.  Scale plan: one agg to ≤|event types| fence
    rows, broadcast back over the scan; no sort of the fact table."""
    ev = load_table(spark, sf_dir, "events")
    fences = ev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY value)")
        .alias("p25"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY value)")
        .alias("p75"),
    )
    iqr = F.col("p75") - F.col("p25")
    return (
        ev.join(F.broadcast(fences), "event_type")
        .where(
            (F.col("value") > F.col("p75") + 1.5 * iqr)
            | (F.col("value") < F.col("p25") - 1.5 * iqr)
        )
        .select("event_id", "event_type", "value")
        .orderBy("event_id")
    )


SQL_IQR_OUTLIERS = """
WITH fences AS (
  SELECT event_type,
         quantile_disc(value, 0.25) AS p25,
         quantile_disc(value, 0.75) AS p75
  FROM events GROUP BY event_type)
SELECT event_id, e.event_type, value
FROM events e JOIN fences f ON e.event_type = f.event_type
WHERE value > p75 + 1.5 * (p75 - p25)
   OR value < p25 - 1.5 * (p75 - p25)
ORDER BY event_id
"""


def q_cep_pattern_match(spark, sf_dir):
    """Complex-event-processing pattern match (the MATCH_RECOGNIZE
    shape): per user, count non-overlapping view→click→purchase
    conversions with no intervening purchase — expressed as ONE
    hash-agg building the user's time-ordered event-initial trace
    string plus a regex count over it.

    vs `funnel_steps` (first-conversion chain of filtered min-aggs):
    this counts EVERY conversion occurrence and supports arbitrary
    regex patterns (negations, alternation) without new joins.

    Determinism: the trace orders by (ts, event_id) — a total order —
    via array_sort over structs (Spark) / ORDER BY inside string_agg
    (DuckDB); signup/share map to 'g'/'h' so initials are unique.

    Scale plan: one shuffle of (user, initial) pairs into the
    collect; the trace length is a user's event count — in production
    the group key is (user, session/day) to bound state, exactly as
    `sessionize` buckets do.  The regex runs map-side post-agg.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "signup", "g")
        .otherwise("h")
        .alias("ini"),
    )
    seq = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "ini"))
                ),
                lambda x: x["ini"],
            ),
            "",
        ).alias("trace"),
    )
    n_conv = F.regexp_count(F.col("trace"), F.lit("v[^p]*c[^p]*p"))
    return (
        seq.select(
            "user_id",
            "n_events",
            n_conv.alias("n_conversions"),
            (n_conv > 0).alias("converted"),
        )
        .orderBy("user_id")
    )


SQL_CEP_PATTERN_MATCH = """
WITH t AS (
  SELECT user_id,
         COUNT(*) AS n_events,
         string_agg(CASE event_type WHEN 'view' THEN 'v'
                    WHEN 'click' THEN 'c' WHEN 'purchase' THEN 'p'
                    WHEN 'signup' THEN 'g' ELSE 'h' END, ''
                    ORDER BY ts, event_id) AS trace
  FROM events
  GROUP BY user_id)
SELECT user_id, n_events,
       len(regexp_extract_all(trace, 'v[^p]*c[^p]*p'))
         AS n_conversions,
       len(regexp_extract_all(trace, 'v[^p]*c[^p]*p')) > 0 AS converted
FROM t
ORDER BY user_id
"""


def q_variant_json(spark, sf_dir):
    """Semi-structured payload analytics on Spark 4's VARIANT type:
    ``events.props`` parses ONCE into a variant (``try_parse_json`` —
    malformed payloads become NULL, never errors, matching the
    ``from_json`` leniency the reference relies on,
    ``IndicateursStreaming.scala:116``), then typed paths are
    extracted with ``variant_get`` and aggregated.

    Vs the `json_parse` query (schema-on-read `from_json` with a fixed
    StructType): VARIANT keeps the full document without committing to
    a schema — the right model when payloads evolve — while the binary
    encoding keeps path access O(field), not a re-parse per extraction.
    Scale plan: parse + extraction are map-side codegen; the aggregate
    is one partial-agg shuffle on (event_type, k_decile).
    """
    from ..catalog import load_table as _lt

    ev = _lt(spark, sf_dir, "events").select(
        "event_type", F.try_parse_json("props").alias("v")
    )
    k = F.try_variant_get(F.col("v"), "$.k", "int")
    return (
        ev.select("event_type", F.floor(k / 10).cast("int").alias("k_decile"),
                  k.alias("k"))
        .where(F.col("k").isNotNull())
        .groupBy("event_type", "k_decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type", "k_decile")
    )


SQL_VARIANT_JSON = """
WITH x AS (
  SELECT event_type, CAST(json_extract(props, '$.k') AS INTEGER) AS k
  FROM events)
SELECT event_type, CAST(FLOOR(k / 10.0) AS INTEGER) AS k_decile,
       COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k,
       MIN(k) AS min_k, MAX(k) AS max_k
FROM x
WHERE k IS NOT NULL
GROUP BY event_type, k_decile
ORDER BY event_type, k_decile
"""


# ---------------------------------------------------------------------------
# rfm_segmentation — recency/frequency/monetary quartiles (round 10)
# ---------------------------------------------------------------------------


def q_rfm_segmentation(spark, sf_dir):
    """RFM customer segmentation — the classic marketing/churn grid
    (Hughes 1994): per customer compute Recency (days since last
    order, anchored to the corpus max date), Frequency (order count)
    and Monetary (exact-cents spend), quartile each with ntile(4),
    and report the segment grid with its population and average
    spend.  The same shape stratifies any entity table before
    sampling ("don't let the top spend quartile dominate the
    training mix").

    Determinism: every ntile ordering carries o_custkey as the tie
    breaker (equal metric values are common — frequency especially);
    monetary accumulates as BIGINT cents with one double division in
    the output; recency is a whole-day date_diff of DATEs.

    Scale plan: one hash-agg of orders to per-customer rows, a 1-row
    max-date broadcast (the tpch_q11 scalar shape), then three ntile
    windows over the SAME segment hash-partitioning (one Exchange,
    three in-partition sorts).  Quartiles are computed WITHIN market
    segment — the analytically standard per-cohort form, and the
    form that keeps every window hash-partitioned (a corpus-global
    ntile would serialize; the audit bans it registry-wide).
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    per_cust = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("last_day"),
            F.count("*").cast("bigint").alias("freq"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                    "bigint"
                )
            ).alias("cents"),
        )
    )
    anchor = orders.agg(
        F.max(F.to_date("o_orderdate")).alias("anchor")
    )
    feat = per_cust.crossJoin(F.broadcast(anchor)).select(
        "c_mktsegment",
        "o_custkey",
        F.datediff("anchor", "last_day").cast("bigint").alias(
            "recency_days"
        ),
        "freq",
        "cents",
    )
    seg = Window.partitionBy("c_mktsegment")
    rq = F.ntile(4).over(
        seg.orderBy("recency_days", "o_custkey")
    )
    fq = F.ntile(4).over(
        seg.orderBy(F.col("freq").desc(), F.col("o_custkey"))
    )
    mq = F.ntile(4).over(
        seg.orderBy(F.col("cents").desc(), F.col("o_custkey"))
    )
    graded = feat.select(
        "c_mktsegment",
        "cents",
        rq.alias("r_quartile"),
        fq.alias("f_quartile"),
        mq.alias("m_quartile"),
    )
    return (
        graded.groupBy(
            "c_mktsegment", "r_quartile", "f_quartile", "m_quartile"
        )
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            (
                F.sum("cents").cast("double")
                / F.count("*")
                / F.lit(100.0)
            ).alias("avg_spend"),
        )
        .orderBy(
            "c_mktsegment", "r_quartile", "f_quartile", "m_quartile"
        )
    )


SQL_RFM_SEGMENTATION = """
WITH per_cust AS (
  SELECT c.c_mktsegment, o.o_custkey,
         MAX(CAST(o.o_orderdate AS DATE)) AS last_day,
         CAST(COUNT(*) AS BIGINT) AS freq,
         SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2),
anchor AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS anchor FROM orders),
feat AS (
  SELECT c_mktsegment, o_custkey,
         CAST(date_diff('day', last_day, anchor) AS BIGINT)
           AS recency_days,
         freq, cents
  FROM per_cust, anchor),
graded AS (
  SELECT c_mktsegment, cents,
         ntile(4) OVER (PARTITION BY c_mktsegment
                        ORDER BY recency_days, o_custkey) AS r_quartile,
         ntile(4) OVER (PARTITION BY c_mktsegment
                        ORDER BY freq DESC, o_custkey) AS f_quartile,
         ntile(4) OVER (PARTITION BY c_mktsegment
                        ORDER BY cents DESC, o_custkey) AS m_quartile
  FROM feat)
SELECT c_mktsegment, r_quartile, f_quartile, m_quartile,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100.0 AS avg_spend
FROM graded
GROUP BY 1, 2, 3, 4
ORDER BY 1, 2, 3, 4
"""


# ---------------------------------------------------------------------------
# crossval_folds — deterministic stratified k-fold assignment (round 10)
# ---------------------------------------------------------------------------


def q_crossval_folds(spark, sf_dir):
    """Deterministic STRATIFIED k-fold assignment — the evaluation-
    split primitive (`train_split`'s k-way sibling): within each
    stratum (market segment) customers are ranked by key and dealt
    round-robin into k=5 folds, so every fold carries the same
    stratum proportions (±1 row) and the assignment is reproducible
    from the data alone — no RNG, no state, rerunnable anywhere.
    Output: per (fold, segment) population and exact-cents balance
    total, which is also the balance audit (near-equal columns ⇒ the
    deal is fair).

    Scale plan: ONE hash exchange on the stratum for the row_number
    window (strata are bounded; for low-cardinality strata at 100 TB
    the documented two-level rewrite applies: deal within
    (stratum, shard) then rebalance shard offsets — the modulo deal
    composes), then a map-side-combined agg to the ≤k·|strata| grid.
    """
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_custkey")
    dealt = cust.select(
        "c_mktsegment",
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("bal_cents"),
        ((F.row_number().over(w) - 1) % 5).cast("int").alias("fold"),
    )
    return (
        dealt.groupBy("fold", "c_mktsegment")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.sum("bal_cents").cast("bigint").alias("bal_cents_sum"),
        )
        .orderBy("fold", "c_mktsegment")
    )


SQL_CROSSVAL_FOLDS = """
WITH dealt AS (
  SELECT c_mktsegment,
         CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents,
         CAST((row_number() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_custkey) - 1) % 5 AS INT)
           AS fold
  FROM customer)
SELECT fold, c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(bal_cents) AS BIGINT) AS bal_cents_sum
FROM dealt
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# pareto_frontier — 2-D skyline per group (round 10)
# ---------------------------------------------------------------------------


def q_pareto_frontier(spark, sf_dir):
    """Per-segment Pareto frontier (skyline) of customers over
    (spend, order count): the non-dominated set — no other customer
    in the segment is ≥ on both axes and strictly better on one.
    The skyline operator (Börzsönyi et al. 2001) is what "show me the
    efficient frontier" dashboards and multi-objective data-selection
    passes (quality vs dedup-penalty) run.

    NOT the O(n²) dominance self-join: after one hash-agg to
    per-customer rows, dominance collapses to two window lookups —
    ``mx_gt`` = max(freq) among STRICTLY higher spend (a RANGE frame
    starting 1 following on integer cents) and ``mx_eq`` = max(freq)
    at equal spend — a row survives iff mx_gt < freq (or none) and
    mx_eq ≤ freq.  Equal (spend, freq) duplicates are mutually
    non-dominating and both survive, which the strict-inequality
    reading of dominance requires.

    Scale plan: one orders hash-agg, one segment hash exchange for
    the windows (both windows share the partitioning; the RANGE frame
    needs integer ordering, which is why spend stays BIGINT cents),
    frontier filter is codegen.  Output is the frontier only —
    skylines are small (O(log n) expected for independent dims).
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    feat = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "o_custkey")
        .agg(
            F.count("*").cast("bigint").alias("freq"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                    "bigint"
                )
            ).alias("cents"),
        )
    )
    w_gt = (
        Window.partitionBy("c_mktsegment")
        .orderBy("cents")
        .rangeBetween(1, Window.unboundedFollowing)
    )
    w_eq = Window.partitionBy("c_mktsegment", "cents")
    flagged = feat.select(
        "c_mktsegment",
        "o_custkey",
        "freq",
        "cents",
        F.max("freq").over(w_gt).alias("mx_gt"),
        F.max("freq").over(w_eq).alias("mx_eq"),
    )
    return (
        flagged.where(
            (F.col("mx_gt").isNull() | (F.col("mx_gt") < F.col("freq")))
            & (F.col("mx_eq") <= F.col("freq"))
        )
        .select("c_mktsegment", "o_custkey", "freq", "cents")
        .orderBy("c_mktsegment", F.col("cents").desc(), "o_custkey")
    )


SQL_PARETO_FRONTIER = """
WITH feat AS (
  SELECT c.c_mktsegment, o.o_custkey,
         CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2),
flagged AS (
  SELECT c_mktsegment, o_custkey, freq, cents,
         MAX(freq) OVER (PARTITION BY c_mktsegment ORDER BY cents
                         RANGE BETWEEN 1 FOLLOWING
                         AND UNBOUNDED FOLLOWING) AS mx_gt,
         MAX(freq) OVER (PARTITION BY c_mktsegment, cents) AS mx_eq
  FROM feat)
SELECT c_mktsegment, o_custkey, freq, cents
FROM flagged
WHERE (mx_gt IS NULL OR mx_gt < freq) AND mx_eq <= freq
ORDER BY c_mktsegment, cents DESC, o_custkey
"""


# ---------------------------------------------------------------------------
# funnel_time_to_convert — conversion latency per cohort (round 10)
# ---------------------------------------------------------------------------


def q_funnel_time_to_convert(spark, sf_dir):
    """Conversion LATENCY distribution — `funnel_steps` counts who
    converted, this measures how long it took: per user, first signup
    → first subsequent purchase, aggregated per signup-week cohort
    (n converted, median/min/max hours) — the time-to-value panel
    every growth dashboard pairs with the funnel counts.

    Determinism: each latency is an exact integer microsecond gap
    divided once to hours (identical doubles on both engines); the
    median interpolates over those small-magnitude doubles (ulp
    ~1e-13 — safely under the det6 grid, unlike a median over raw
    microsecond BIGINTs whose ulp at 1e12 magnitude would survive
    det6 rounding); cohort weeks are ISO Monday-start DATEs on both
    engines.

    Scale plan: two filtered hash-aggs to per-user firsts, one
    equi-join on user_id with the time predicate (purchases after the
    signup), then a map-side-combined agg to ≤|weeks| cohort rows.
    The exact median is the correctness baseline; the lake-scale swap
    is approx_percentile over the same hours column.
    """
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    conv = (
        s.join(p, "user_id")
        .where(F.col("p_ts") > F.col("s_ts"))
        .groupBy("user_id", "s_ts")
        .agg(F.min("p_ts").alias("first_p"))
        .selectExpr(
            "CAST(date_trunc('week', s_ts) AS DATE) AS cohort_week",
            "timestampdiff(MICROSECOND, s_ts, first_p) / 3.6e9 AS hours",
        )
    )
    det6 = "CAST(FLOOR(({expr}) * 1e6 + 0.5) AS DOUBLE) / 1e6"
    return (
        conv.groupBy("cohort_week")
        .agg(
            F.count("*").cast("bigint").alias("n_converted"),
            F.expr(det6.format(expr="median(hours)")).alias(
                "median_hours"
            ),
            F.expr(det6.format(expr="min(hours)")).alias("min_hours"),
            F.expr(det6.format(expr="max(hours)")).alias("max_hours"),
        )
        .orderBy("cohort_week")
    )


SQL_FUNNEL_TIME_TO_CONVERT = """
WITH s AS (
  SELECT user_id, MIN(ts) AS s_ts
  FROM events WHERE event_type = 'signup' GROUP BY user_id),
conv AS (
  SELECT CAST(date_trunc('week', s.s_ts) AS DATE) AS cohort_week,
         date_diff('microsecond', s.s_ts, MIN(e.ts)) / 3.6e9 AS hours
  FROM s JOIN events e
    ON e.user_id = s.user_id
   AND e.event_type = 'purchase' AND e.ts > s.s_ts
  GROUP BY s.user_id, s.s_ts)
SELECT cohort_week,
       CAST(COUNT(*) AS BIGINT) AS n_converted,
       CAST(FLOOR(median(hours) * 1e6 + 0.5) AS DOUBLE) / 1e6
         AS median_hours,
       CAST(FLOOR(MIN(hours) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS min_hours,
       CAST(FLOOR(MAX(hours) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS max_hours
FROM conv
GROUP BY cohort_week
ORDER BY cohort_week
"""


def q_yoy_growth(spark, sf_dir):
    """Year-over-year revenue growth per nation — the warehouse
    reporting staple (every TPC-DS-style sales mart has this shape):
    revenue per (nation, year), then LAG one year within the nation
    and report the percentage delta.

    Determinism: revenue is exact cents (BIGINT); the growth ratio
    pays one double division rounded at 6 dp; the first year of each
    nation is NULL in both engines (LAG default).

    Scale plan: orders ⋈ customer shuffles on custkey (customer is
    fact-scale at sf1000, so AQE picks SMJ/shuffled-hash there); the
    25-row nation side broadcasts.  One hash-agg to (nation, year)
    grain, then the LAG window runs over the POST-AGGREGATE relation
    (nations × years ≤ a few hundred rows at any corpus scale) — the
    pre-aggregate-then-window discipline.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.year("o_orderdate").alias("yr"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    from pyspark.sql import Window

    rev = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", "yr")
        .agg(F.sum("cents").alias("revenue_cents"))
    )
    w = Window.partitionBy("n_name").orderBy("yr")
    return (
        rev.withColumn("prev_cents", F.lag("revenue_cents").over(w))
        .selectExpr(
            "n_name",
            "yr",
            "revenue_cents",
            "CAST(FLOOR((revenue_cents - prev_cents) * 100.0"
            " / prev_cents * 1e6 + 0.5) AS DOUBLE) / 1e6"
            " AS growth_pct",
        )
        .orderBy("n_name", "yr")
    )


SQL_YOY_GROWTH = """
WITH rev AS (
  SELECT n_name, EXTRACT(YEAR FROM o_orderdate) AS yr,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
           AS BIGINT) AS revenue_cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2),
lagged AS (
  SELECT n_name, CAST(yr AS INT) AS yr, revenue_cents,
         LAG(revenue_cents) OVER (PARTITION BY n_name ORDER BY yr)
           AS prev_cents
  FROM rev)
SELECT n_name, yr, revenue_cents,
       CAST(FLOOR((revenue_cents - prev_cents) * 100.0 / prev_cents
         * 1e6 + 0.5) AS DOUBLE) / 1e6 AS growth_pct
FROM lagged
ORDER BY n_name, yr
"""


# ---------------------------------------------------------------------------
# linreg_ols — closed-form least squares from ONE aggregation pass
# ---------------------------------------------------------------------------

#: The OLS solve as a single shared expression program over the exact
#: integer sufficient statistics (n, sx1, sx2, sy, s11, s12, s22, s1y,
#: s2y, syy).  The SAME strings compile in Spark and DuckDB, so both
#: engines execute the identical IEEE-754 expression tree on identical
#: integer inputs — bitwise-equal doubles, with det6 rounding as belt
#: and braces.  Centered (moment-matrix) form for conditioning.
_OLS_PROG = [
    ("d11", "CAST(s11 AS DOUBLE) - CAST(sx1 AS DOUBLE)"
            " * CAST(sx1 AS DOUBLE) / CAST(n AS DOUBLE)"),
    ("d12", "CAST(s12 AS DOUBLE) - CAST(sx1 AS DOUBLE)"
            " * CAST(sx2 AS DOUBLE) / CAST(n AS DOUBLE)"),
    ("d22", "CAST(s22 AS DOUBLE) - CAST(sx2 AS DOUBLE)"
            " * CAST(sx2 AS DOUBLE) / CAST(n AS DOUBLE)"),
    ("d1y", "CAST(s1y AS DOUBLE) - CAST(sx1 AS DOUBLE)"
            " * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)"),
    ("d2y", "CAST(s2y AS DOUBLE) - CAST(sx2 AS DOUBLE)"
            " * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)"),
    ("det", "d11 * d22 - d12 * d12"),
    ("b1", "(d1y * d22 - d2y * d12) / det"),
    ("b2", "(d11 * d2y - d12 * d1y) / det"),
    ("b0", "(CAST(sy AS DOUBLE) - b1 * CAST(sx1 AS DOUBLE)"
           " - b2 * CAST(sx2 AS DOUBLE)) / CAST(n AS DOUBLE)"),
    ("r2", "(b1 * d1y + b2 * d2y)"
           " / (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)"
           " * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))"),
]

_DET6 = "CAST(FLOOR(({x}) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS {name}"


def q_linreg_ols(spark, sf_dir):
    """Closed-form multiple linear regression — extendedprice (cents)
    on quantity and discount (hundredths), one model per return flag.
    The textbook normal-equations solve (X'X)⁻¹X'y, computed the way
    a 100 TB engine must: the data pass produces only the ten
    SUFFICIENT STATISTICS (exact BIGINT/DECIMAL sums — mergeable,
    map-side-combinable), and the 2×2-centered Cramer solve runs on
    the per-group one-row relation.  This is the same
    "aggregate-then-solve" shape MLlib's linear regression uses for
    the normal-equations path; no iteration, no driver collect.

    Determinism: the sums are exact integers (syy = Σcents² exceeds
    int64 at sf10, so it rides DECIMAL(38,0)/hugeint); the solve is
    ONE shared expression program (`_OLS_PROG`) compiled identically
    in both engines — identical IEEE-754 trees on identical integers
    give bitwise-equal doubles before the 6-dp rounding.  int64
    headroom elsewhere: s1y ≤ n·50·10⁷ stays under 2⁶³ through
    sf1000.

    Scale plan: ONE scan → ONE hash-agg keyed by the 3-value return
    flag (partial aggregation map-side; the shuffle moves ≤3 rows per
    task), then scalar expressions over ≤3 rows.  Adding a regressor
    adds accumulators, not passes.  The streaming twin
    (`streaming/timeseries.py::ols_partials_writer`) appends the same
    statistics per batch and folds them at read — sums are additive,
    so stream state == batch aggregate exactly.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return ols_solve(ols_sufficient_stats(li))


def ols_solve(stats):
    """Run the shared OLS expression program over a sufficient-
    statistics relation (one row per group with columns n, sx1, sx2,
    sy, s11, s12, s22, s1y, s2y, syy) — used by the batch query and
    by ``streaming/timeseries.read_ols`` so stream state folds to the
    IDENTICAL solve."""
    out = stats
    for name, expr in _OLS_PROG:
        out = out.withColumn(name, F.expr(expr))
    return out.selectExpr(
        "l_returnflag",
        "n",
        _DET6.format(x="b0", name="b0_cents"),
        _DET6.format(x="b1", name="b1_cents_per_qty"),
        _DET6.format(x="b2", name="b2_cents_per_disc_pct"),
        _DET6.format(x="r2", name="r2"),
    ).orderBy("l_returnflag")


def ols_sufficient_stats(df):
    """Reduce lineitem-shaped rows to the ten exact sufficient
    statistics per return flag — ONE map-side-combinable hash-agg;
    additive across shards/batches (every column is a sum), which is
    what makes the streaming twin exact."""
    base = df.select(
        "l_returnflag",
        F.col("l_quantity").cast("bigint").alias("x1"),
        F.floor(F.col("l_discount") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("x2"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("y"),
    )
    return base.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x1").alias("sx1"),
        F.sum("x2").alias("sx2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
        F.sum(
            F.col("y").cast("decimal(18,0)")
            * F.col("y").cast("decimal(18,0)")
        ).alias("syy"),
    )


def _sql_linreg_ols() -> str:
    # Chain one CTE per program step so each name is in scope for the
    # next expression — the SQL twin of the withColumn chain.
    steps = ""
    prev = "stats"
    for i, (name, expr) in enumerate(_OLS_PROG):
        steps += f", p{i} AS (SELECT *, ({expr}) AS {name} FROM {prev})\n"
        prev = f"p{i}"
    outs = ",\n       ".join(
        "CAST(FLOOR((%s) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS %s" % (x, n)
        for x, n in [
            ("b0", "b0_cents"),
            ("b1", "b1_cents_per_qty"),
            ("b2", "b2_cents_per_disc_pct"),
            ("r2", "r2"),
        ]
    )
    return f"""
WITH base AS (
  SELECT l_returnflag,
         CAST(l_quantity AS BIGINT) AS x1,
         CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS x2,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
  FROM lineitem),
stats AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x1) AS BIGINT) AS sx1,
         CAST(SUM(x2) AS BIGINT) AS sx2,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x1 * x1) AS BIGINT) AS s11,
         CAST(SUM(x1 * x2) AS BIGINT) AS s12,
         CAST(SUM(x2 * x2) AS BIGINT) AS s22,
         CAST(SUM(x1 * y) AS BIGINT) AS s1y,
         CAST(SUM(x2 * y) AS BIGINT) AS s2y,
         SUM(y * y) AS syy
  FROM base GROUP BY 1){steps}
SELECT l_returnflag, n,
       {outs}
FROM {prev}
ORDER BY l_returnflag
"""


SQL_LINREG_OLS = _sql_linreg_ols()


def q_robust_trimmed_stats(spark, sf_dir):
    """Winsorized and truncated means per event type — the robust
    location estimates (Tukey) a metrics pipeline publishes when raw
    means are outlier-hostage: clip (winsorize) or drop (truncate)
    everything outside the exact [p5, p95] value band.

    Percentile semantics: p5 = the smallest value whose cumulative
    count reaches ⌈0.05·n⌉ (quantile_disc — an ACTUAL data value, no
    interpolation), computed as the exact-integer predicate
    20·cum ≥ n on the cumulative histogram; p95 likewise at 19·n.
    Membership is therefore engine-deterministic, and every mean is
    an exact BIGINT-cents ratio paying one det6 division.

    Scale plan: the raw table collapses FIRST to the per-(type, cents)
    HISTOGRAM — one hash-agg whose width is bounded by the VALUE
    DOMAIN (≤49 002 distinct cents at any corpus scale), the same
    discipline as `quantile_histogram`.  The cumulative window, the
    band bounds, and both means all run over that bounded relation;
    bounds re-attach via a ≤|types|-row broadcast.  No raw-row window
    (the low-cardinality-window trap), no second scan.
    """
    ev = load_table(spark, sf_dir, "events")
    hist = (
        ev.select(
            "event_type",
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("event_type", "cents")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    return robust_stats_from_hist(hist)


def robust_stats_from_hist(hist):
    """Exact-quantile winsorized/truncated pipeline over a
    per-(event_type, cents) histogram — shared by the batch query and
    ``streaming/timeseries.read_robust_stats`` so folded stream state
    runs the IDENTICAL computation."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = hist.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("n")
    )
    cum = hist.join(F.broadcast(tot), "event_type").withColumn(
        "cum", F.sum("c").over(w)
    )
    bounds = cum.groupBy("event_type").agg(
        F.min(F.when(F.col("cum") * 20 >= F.col("n"), F.col("cents")))
        .alias("p05_cents"),
        F.min(
            F.when(F.col("cum") * 20 >= 19 * F.col("n"), F.col("cents"))
        ).alias("p95_cents"),
    )
    scored = hist.join(F.broadcast(bounds), "event_type").join(
        F.broadcast(tot), "event_type"
    )
    return (
        scored.groupBy("event_type", "n", "p05_cents", "p95_cents")
        .agg(
            F.sum(
                F.greatest(
                    F.col("p05_cents"),
                    F.least(F.col("p95_cents"), F.col("cents")),
                )
                * F.col("c")
            )
            .cast("bigint")
            .alias("wsum"),
            F.sum(
                F.when(
                    F.col("cents").between(
                        F.col("p05_cents"), F.col("p95_cents")
                    ),
                    F.col("cents") * F.col("c"),
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("tsum"),
            F.sum(
                F.when(
                    F.col("cents").between(
                        F.col("p05_cents"), F.col("p95_cents")
                    ),
                    F.col("c"),
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("tn"),
        )
        .selectExpr(
            "event_type",
            "n",
            "p05_cents",
            "p95_cents",
            "CAST(FLOOR(CAST(wsum AS DOUBLE) / n * 1e6 + 0.5)"
            " AS DOUBLE) / 1e6 AS winsorized_mean_cents",
            "CAST(FLOOR(CAST(tsum AS DOUBLE) / tn * 1e6 + 0.5)"
            " AS DOUBLE) / 1e6 AS trimmed_mean_cents",
        )
        .orderBy("event_type")
    )


SQL_ROBUST_TRIMMED_STATS = """
WITH hist AS (
  SELECT event_type,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
tot AS (
  SELECT event_type, CAST(SUM(c) AS BIGINT) AS n
  FROM hist GROUP BY 1),
cum AS (
  SELECT h.event_type, h.cents, h.c, t.n,
         SUM(h.c) OVER (PARTITION BY h.event_type ORDER BY h.cents
                        ROWS BETWEEN UNBOUNDED PRECEDING AND
                        CURRENT ROW) AS cum
  FROM hist h JOIN tot t USING (event_type)),
bounds AS (
  SELECT event_type,
         MIN(CASE WHEN cum * 20 >= n THEN cents END) AS p05_cents,
         MIN(CASE WHEN cum * 20 >= 19 * n THEN cents END) AS p95_cents
  FROM cum GROUP BY 1),
scored AS (
  SELECT h.event_type, t.n, b.p05_cents, b.p95_cents,
         CAST(SUM(GREATEST(b.p05_cents,
                           LEAST(b.p95_cents, h.cents)) * h.c)
           AS BIGINT) AS wsum,
         CAST(SUM(CASE WHEN h.cents BETWEEN b.p05_cents AND b.p95_cents
                       THEN h.cents * h.c ELSE 0 END) AS BIGINT)
           AS tsum,
         CAST(SUM(CASE WHEN h.cents BETWEEN b.p05_cents AND b.p95_cents
                       THEN h.c ELSE 0 END) AS BIGINT) AS tn
  FROM hist h
  JOIN bounds b USING (event_type)
  JOIN tot t USING (event_type)
  GROUP BY 1, 2, 3, 4)
SELECT event_type, n, p05_cents, p95_cents,
       CAST(FLOOR(CAST(wsum AS DOUBLE) / n * 1e6 + 0.5)
         AS DOUBLE) / 1e6 AS winsorized_mean_cents,
       CAST(FLOOR(CAST(tsum AS DOUBLE) / tn * 1e6 + 0.5)
         AS DOUBLE) / 1e6 AS trimmed_mean_cents
FROM scored
ORDER BY event_type
"""


def q_join_temporal_scd2(spark, sf_dir):
    """Temporal (point-in-validity) join of facts against an SCD2
    dimension — the warehouse pattern `scd2_history` builds the
    dimension FOR: every purchase is attributed to the user's tier
    THAT WAS IN EFFECT at purchase time (tier changes come from
    signup events; their props.k mod 4 is the tier).  Purchases
    before any signup attribute to the null tier — a real cohort, not
    an error.

    Scale plan: the naive form is a range join (fact.ts BETWEEN
    valid_from AND valid_to) — quadratic blowup risk and no equi-key.
    Because SCD2 validity intervals PARTITION time per user, the join
    is equivalent to an AS-OF join, so it runs as the union-merge:
    tag dim changes and facts, ONE window per user ordered by
    (ts, src, event_id) — src orders a same-instant change BEFORE the
    fact, so a tier change taking effect at the purchase timestamp
    attributes the purchase to the NEW tier — carrying the last
    non-null tier forward (`join_asof`'s trick at dimension scale).
    One shuffle on user_id, no interval comparison ever materializes;
    output aggregates to the ≤5-row tier panel.
    """
    ev = load_table(spark, sf_dir, "events")
    dim = ev.where(F.col("event_type") == "signup").select(
        "user_id",
        "ts",
        F.col("event_id"),
        F.lit(0).alias("src"),
        (F.get_json_object("props", "$.k").cast("int") % 4).alias(
            "tier"
        ),
        F.lit(None).cast("bigint").alias("cents"),
    )
    fact = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id"),
        F.lit(1).alias("src"),
        F.lit(None).cast("int").alias("tier"),
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "src", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = dim.unionAll(fact).withColumn(
        "tier_at", F.last("tier", ignorenulls=True).over(w)
    )
    return (
        merged.where(F.col("src") == 1)
        .groupBy("tier_at")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy(F.col("tier_at").asc_nulls_first())
    )


SQL_JOIN_TEMPORAL_SCD2 = """
WITH dim AS (
  SELECT user_id, ts, event_id, 0 AS src,
         CAST(json_extract_string(props, '$.k') AS INT) % 4 AS tier,
         CAST(NULL AS BIGINT) AS cents
  FROM events WHERE event_type = 'signup'),
fact AS (
  SELECT user_id, ts, event_id, 1 AS src,
         CAST(NULL AS INT) AS tier,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'),
merged AS (
  SELECT *, LAST_VALUE(tier IGNORE NULLS) OVER (
              PARTITION BY user_id ORDER BY ts, src, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS tier_at
  FROM (SELECT * FROM dim UNION ALL SELECT * FROM fact))
SELECT tier_at,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM merged WHERE src = 1
GROUP BY 1
ORDER BY tier_at ASC NULLS FIRST
"""


#: z-test significance bar (two-sided 5%)
_AB_Z_CRIT = 1.96

#: the Welch z statistic as one shared expression program on exact
#: integer sums (same bitwise-equality trick as _OLS_PROG)
_AB_PROG = [
    ("mean_a_raw", "CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)"),
    ("mean_b_raw", "CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)"),
    # unbiased variance from exact sums: (Σx² − (Σx)²/n) / (n−1)
    ("var_a", "(CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE)"
              " * CAST(sa AS DOUBLE) / CAST(na AS DOUBLE))"
              " / (CAST(na AS DOUBLE) - 1.0)"),
    ("var_b", "(CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE)"
              " * CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))"
              " / (CAST(nb AS DOUBLE) - 1.0)"),
    ("z", "(mean_a_raw - mean_b_raw) / SQRT(var_a / CAST(na AS DOUBLE)"
          " + var_b / CAST(nb AS DOUBLE))"),
]


def q_ab_test_zscore(spark, sf_dir):
    """A/B experiment readout with a Welch z-test per event type:
    users split 50/50 by the deterministic hash (variant A = even
    bucket), the metric is event value in cents, and the panel
    reports both means, the z statistic, and the 5% two-sided
    verdict.  The null-effect harness every experimentation platform
    ships — on a hash split of unmanipulated data the z's should
    hover near 0, which doubles as an assignment-balance audit.

    The analysis unit is the USER, not the event: events cluster per
    user (a heavy user's events all land in one arm), so an
    event-level z understates variance — the metric is each user's
    total cents within the type, aggregated per user FIRST (the
    cluster-robust design, and also the scalable one: the user grain
    is a plain pre-aggregation).

    Determinism: per-variant n, Σx, Σx² are exact integers from ONE
    conditional hash-agg (Σx² in DECIMAL past int64); the z is one
    shared expression program (`_AB_PROG`) compiled identically in
    both engines — bitwise-equal doubles, det6-rounded.

    Scale plan: one scan → hash-agg to the (type, user) grain →
    hash-agg to the ≤5-value event type; variants are conditional
    accumulators, not a self-join.  Streaming twin: the (type, user)
    partials are additive, the `read_ols` fold shape — not
    duplicated here.
    """
    ev = load_table(spark, sf_dir, "events")
    from ..operators.sampling import _portable_hash

    base = (
        ev.select(
            "event_type",
            "user_id",
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("event_type", "user_id")
        .agg(F.sum("cents").alias("x"))
        .select(
            "event_type",
            (_portable_hash(F.col("user_id"), "ab0") % 2 == 0).alias(
                "in_a"
            ),
            "x",
        )
    )
    stats = base.groupBy("event_type").agg(
        F.sum(F.col("in_a").cast("bigint")).alias("na"),
        F.sum((~F.col("in_a")).cast("bigint")).alias("nb"),
        F.sum(F.when(F.col("in_a"), F.col("x")).otherwise(0))
        .cast("bigint")
        .alias("sa"),
        F.sum(F.when(~F.col("in_a"), F.col("x")).otherwise(0))
        .cast("bigint")
        .alias("sb"),
        F.sum(
            F.when(
                F.col("in_a"),
                F.col("x").cast("decimal(18,0)")
                * F.col("x").cast("decimal(18,0)"),
            ).otherwise(F.lit(0).cast("decimal(37,0)"))
        ).alias("qa"),
        F.sum(
            F.when(
                ~F.col("in_a"),
                F.col("x").cast("decimal(18,0)")
                * F.col("x").cast("decimal(18,0)"),
            ).otherwise(F.lit(0).cast("decimal(37,0)"))
        ).alias("qb"),
    )
    out = stats
    for name, expr in _AB_PROG:
        out = out.withColumn(name, F.expr(expr))
    return out.selectExpr(
        "event_type",
        "na",
        "nb",
        _DET6.format(x="mean_a_raw", name="mean_a_cents"),
        _DET6.format(x="mean_b_raw", name="mean_b_cents"),
        _DET6.format(x="z", name="z_score"),
        f"ABS(z) > {_AB_Z_CRIT} AS significant",
    ).orderBy("event_type")


def _sql_ab_test_zscore() -> str:
    steps = ""
    prev = "stats"
    for i, (name, expr) in enumerate(_AB_PROG):
        steps += f", p{i} AS (SELECT *, ({expr}) AS {name} FROM {prev})\n"
        prev = f"p{i}"
    return f"""
WITH per_user AS (
  SELECT event_type, user_id,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS x
  FROM events GROUP BY 1, 2),
base AS (
  SELECT event_type,
         CAST(concat('0x', substr(md5(concat(
           CAST(user_id AS VARCHAR), 'ab0')), 1, 15)) AS BIGINT)
           % 2 = 0 AS in_a,
         x
  FROM per_user),
stats AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS nb,
         CAST(SUM(CASE WHEN in_a THEN x ELSE 0 END) AS BIGINT) AS sa,
         CAST(SUM(CASE WHEN in_a THEN 0 ELSE x END) AS BIGINT) AS sb,
         SUM(CASE WHEN in_a THEN x * x ELSE 0 END) AS qa,
         SUM(CASE WHEN in_a THEN 0 ELSE x * x END) AS qb
  FROM base GROUP BY 1){steps}
SELECT event_type, na, nb,
       CAST(FLOOR((mean_a_raw) * 1e6 + 0.5) AS DOUBLE) / 1e6
         AS mean_a_cents,
       CAST(FLOOR((mean_b_raw) * 1e6 + 0.5) AS DOUBLE) / 1e6
         AS mean_b_cents,
       CAST(FLOOR((z) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS z_score,
       ABS(z) > {_AB_Z_CRIT} AS significant
FROM {prev}
ORDER BY event_type
"""


SQL_AB_TEST_ZSCORE = _sql_ab_test_zscore()


def q_fifo_fill(spark, sf_dir):
    """FIFO inventory allocation: open demand (linestatus 'O') per
    part is filled OLDEST-FIRST from the part's finished supply
    ('F'), and the fill is read out per order priority — do urgent
    orders actually get stock, or did earlier low-priority demand
    drain it?  The allocation loop every ERP runs nightly.

    The sequential "walk demand in date order, decrement stock" loop
    looks window-inexpressible, but FIFO against a single supply pool
    has a closed form on the demand prefix sums: a demand row holding
    interval [Dprev, Dcur) of cumulative demand is filled by
    min(Dcur, S) − min(Dprev, S) units (S = the part's supply) —
    exactly the interval-clamp identity; no loop, no recursion, and
    per-row fills are EXACT integers.

    Scale plan: supply is one hash-agg to per-part totals (broadcast-
    able at dim scale; AQE picks the strategy when parts are
    fact-scale); the demand prefix sum is ONE window partitioned by
    partkey (high cardinality — no low-cardinality-window trap);
    priorities attach via the orders equi-join; final readout is a
    ≤5-row hash-agg.  Ties inside a (part, date) break on
    (orderkey, linenumber) — a total order, so both engines allocate
    identically.  Measured (bench_one, min-of-2): sf1 1.7 s / sf10
    5.8 s — linear in demand volume.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supply = (
        li.where(F.col("l_linestatus") == "F")
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("s"))
    )
    demand = li.where(F.col("l_linestatus") == "O").select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        F.col("l_quantity").cast("bigint").alias("q"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = (
        demand.withColumn("dcur", F.sum("q").over(w))
        .join(supply, "l_partkey", "left")
        .withColumn("s", F.coalesce("s", F.lit(0)))
        .withColumn("dprev", F.col("dcur") - F.col("q"))
        .withColumn(
            "fill",
            F.greatest(
                F.lit(0),
                F.least(F.col("dcur"), F.col("s"))
                - F.least(F.col("dprev"), F.col("s")),
            ),
        )
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    return (
        filled.join(orders, filled.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum("q").cast("bigint").alias("demand_qty"),
            F.sum("fill").cast("bigint").alias("filled_qty"),
        )
        .selectExpr(
            "o_orderpriority",
            "n_lines",
            "demand_qty",
            "filled_qty",
            "CAST(FLOOR(CAST(filled_qty AS DOUBLE) / demand_qty"
            " * 1e6 + 0.5) AS DOUBLE) / 1e6 AS fill_rate",
        )
        .orderBy("o_orderpriority")
    )


SQL_FIFO_FILL = """
WITH supply AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s
  FROM lineitem WHERE l_linestatus = 'F' GROUP BY 1),
demand AS (
  SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate,
         CAST(l_quantity AS BIGINT) AS q
  FROM lineitem WHERE l_linestatus = 'O'),
pfx AS (
  SELECT d.*,
         SUM(q) OVER (PARTITION BY l_partkey
                      ORDER BY l_shipdate, l_orderkey, l_linenumber
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS dcur
  FROM demand d),
filled AS (
  SELECT p.*, COALESCE(s.s, 0) AS s, p.dcur - p.q AS dprev,
         GREATEST(0, LEAST(p.dcur, COALESCE(s.s, 0))
                     - LEAST(p.dcur - p.q, COALESCE(s.s, 0))) AS fill
  FROM pfx p LEFT JOIN supply s USING (l_partkey))
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(q) AS BIGINT) AS demand_qty,
       CAST(SUM(fill) AS BIGINT) AS filled_qty,
       CAST(FLOOR(CAST(SUM(fill) AS DOUBLE) / SUM(q) * 1e6 + 0.5)
         AS DOUBLE) / 1e6 AS fill_rate
FROM filled JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
ORDER BY o_orderpriority
"""


#: experiment clock: the fixture spans 2024-01-01..30; the second
#: half is the "post" / treatment-exposure period
_DID_POST_START = "2024-01-16"

#: difference-in-differences + Welch-style SE as one shared exact-sum
#: expression program (the _OLS_PROG bitwise-equality discipline)
_DID_PROG = [
    ("m_t1", "CAST(s_t1 AS DOUBLE) / CAST(n_t1 AS DOUBLE)"),
    ("m_t0", "CAST(s_t0 AS DOUBLE) / CAST(n_t0 AS DOUBLE)"),
    ("m_c1", "CAST(s_c1 AS DOUBLE) / CAST(n_c1 AS DOUBLE)"),
    ("m_c0", "CAST(s_c0 AS DOUBLE) / CAST(n_c0 AS DOUBLE)"),
    ("did", "(m_t1 - m_t0) - (m_c1 - m_c0)"),
    ("v_t1", "(CAST(q_t1 AS DOUBLE) - CAST(s_t1 AS DOUBLE)"
             " * CAST(s_t1 AS DOUBLE) / CAST(n_t1 AS DOUBLE))"
             " / (CAST(n_t1 AS DOUBLE) - 1.0)"),
    ("v_t0", "(CAST(q_t0 AS DOUBLE) - CAST(s_t0 AS DOUBLE)"
             " * CAST(s_t0 AS DOUBLE) / CAST(n_t0 AS DOUBLE))"
             " / (CAST(n_t0 AS DOUBLE) - 1.0)"),
    ("v_c1", "(CAST(q_c1 AS DOUBLE) - CAST(s_c1 AS DOUBLE)"
             " * CAST(s_c1 AS DOUBLE) / CAST(n_c1 AS DOUBLE))"
             " / (CAST(n_c1 AS DOUBLE) - 1.0)"),
    ("v_c0", "(CAST(q_c0 AS DOUBLE) - CAST(s_c0 AS DOUBLE)"
             " * CAST(s_c0 AS DOUBLE) / CAST(n_c0 AS DOUBLE))"
             " / (CAST(n_c0 AS DOUBLE) - 1.0)"),
    ("se", "SQRT(v_t1 / CAST(n_t1 AS DOUBLE)"
           " + v_t0 / CAST(n_t0 AS DOUBLE)"
           " + v_c1 / CAST(n_c1 AS DOUBLE)"
           " + v_c0 / CAST(n_c0 AS DOUBLE))"),
    ("z", "did / se"),
]

_DID_CELLS = ("t1", "t0", "c1", "c0")


def q_diff_in_diff(spark, sf_dir):
    """Difference-in-differences readout per event type — the
    quasi-experimental estimator for when randomization wasn't
    possible: effect = (treated post − treated pre) − (control post −
    control pre), which nets out both the group baseline and the
    common time trend (Card & Krueger's design).  Treatment is the
    deterministic user hash split, exposure starts mid-fixture; on
    null-effect data the estimate should hover near 0 — the
    parallel-trends placebo every DiD deployment runs first.

    Determinism: the four cells' n, Σx, Σx² are exact integers from
    ONE hash-agg (unit = user×period totals, the `ab_test_zscore`
    cluster-robust discipline); estimate, SE, and z are one shared
    expression program — bitwise-equal doubles, det6-rounded.

    Scale plan: one scan → hash-agg to (type, user, post) →
    conditional accumulators to ≤|types| rows → scalar math.  No
    join, no window.
    """
    ev = load_table(spark, sf_dir, "events")
    from ..operators.sampling import _portable_hash

    per_unit = (
        ev.select(
            "event_type",
            "user_id",
            (F.to_date("ts") >= F.lit(_DID_POST_START)).alias("post"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("event_type", "user_id", "post")
        .agg(F.sum("cents").alias("x"))
        .select(
            "event_type",
            "post",
            (_portable_hash(F.col("user_id"), "did0") % 2 == 0).alias(
                "treat"
            ),
            "x",
        )
    )
    cells = {
        "t1": (F.col("treat") & F.col("post")),
        "t0": (F.col("treat") & ~F.col("post")),
        "c1": (~F.col("treat") & F.col("post")),
        "c0": (~F.col("treat") & ~F.col("post")),
    }
    aggs = []
    for c, cond in cells.items():
        aggs += [
            F.sum(cond.cast("bigint")).alias(f"n_{c}"),
            F.sum(F.when(cond, F.col("x")).otherwise(0))
            .cast("bigint")
            .alias(f"s_{c}"),
            F.sum(
                F.when(
                    cond,
                    F.col("x").cast("decimal(18,0)")
                    * F.col("x").cast("decimal(18,0)"),
                ).otherwise(F.lit(0).cast("decimal(37,0)"))
            ).alias(f"q_{c}"),
        ]
    out = per_unit.groupBy("event_type").agg(*aggs)
    for name, expr in _DID_PROG:
        out = out.withColumn(name, F.expr(expr))
    return out.selectExpr(
        "event_type",
        "n_t1",
        "n_c1",
        _DET6.format(x="did", name="did_cents"),
        _DET6.format(x="se", name="se_cents"),
        _DET6.format(x="z", name="z_score"),
        f"ABS(z) > {_AB_Z_CRIT} AS significant",
    ).orderBy("event_type")


def _sql_diff_in_diff() -> str:
    cell_sql = {
        "t1": "treat AND post",
        "t0": "treat AND NOT post",
        "c1": "NOT treat AND post",
        "c0": "NOT treat AND NOT post",
    }
    accs = []
    for c, cond in cell_sql.items():
        accs.append(
            f"CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS n_{c}"
        )
        accs.append(
            f"CAST(SUM(CASE WHEN {cond} THEN x ELSE 0 END) AS BIGINT)"
            f" AS s_{c}"
        )
        accs.append(
            f"SUM(CASE WHEN {cond} THEN x * x ELSE 0 END) AS q_{c}"
        )
    accs_sql = ",\n         ".join(accs)
    steps = ""
    prev = "stats"
    for i, (name, expr) in enumerate(_DID_PROG):
        steps += f", p{i} AS (SELECT *, ({expr}) AS {name} FROM {prev})\n"
        prev = f"p{i}"
    return f"""
WITH per_unit AS (
  SELECT event_type,
         CAST(ts AS DATE) >= DATE '{_DID_POST_START}' AS post,
         CAST(concat('0x', substr(md5(concat(
           CAST(user_id AS VARCHAR), 'did0')), 1, 15)) AS BIGINT)
           % 2 = 0 AS treat,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS x
  FROM events GROUP BY 1, 2, 3, user_id),
stats AS (
  SELECT event_type,
         {accs_sql}
  FROM per_unit GROUP BY 1){steps}
SELECT event_type, n_t1, n_c1,
       CAST(FLOOR((did) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS did_cents,
       CAST(FLOOR((se) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS se_cents,
       CAST(FLOOR((z) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS z_score,
       ABS(z) > {_AB_Z_CRIT} AS significant
FROM {prev}
ORDER BY event_type
"""


SQL_DIFF_IN_DIFF = _sql_diff_in_diff()


#: CUPED (controlled-experiment using pre-experiment data, Deng et
#: al. WSDM 2013): θ = cov(pre, post)/var(pre); the adjusted metric
#: y − θ·(x − x̄) has variance var(post)·(1 − ρ²) — the variance an
#: experiment platform actually runs its z-tests on
_CUPED_PROG = [
    ("mx", "CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)"),
    ("my", "CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)"),
    ("vx", "(CAST(qx AS DOUBLE) - CAST(sx AS DOUBLE)"
           " * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"
           " / (CAST(n AS DOUBLE) - 1.0)"),
    ("vy", "(CAST(qy AS DOUBLE) - CAST(sy AS DOUBLE)"
           " * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))"
           " / (CAST(n AS DOUBLE) - 1.0)"),
    ("cxy", "(CAST(qxy AS DOUBLE) - CAST(sx AS DOUBLE)"
            " * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))"
            " / (CAST(n AS DOUBLE) - 1.0)"),
    ("theta", "cxy / vx"),
    ("rho2", "cxy * cxy / (vx * vy)"),
    ("vy_cuped", "vy * (1.0 - rho2)"),
]


def q_cuped_adjustment(spark, sf_dir):
    """CUPED variance-reduction readout per event type — the standard
    pre-period covariate adjustment (Deng et al. 2013) that lets an
    experiment reach significance on a fraction of the traffic: with
    x = each user's PRE-period spend and y = their post-period spend,
    θ = cov(x,y)/var(x) and the adjusted metric y − θ(x − x̄) keeps
    the same mean but variance var(y)·(1 − ρ²).  The panel reports θ,
    ρ², both variances, and the variance-reduction percentage —
    everything `ab_test_zscore` / `diff_in_diff` would gain by
    switching their z denominators to the CUPED metric.

    Determinism: n, Σx, Σy, Σx², Σy², Σxy are exact integers from ONE
    hash-agg over the per-user pre/post totals (users missing a
    period carry an exact 0 — a real cohort, handled by the
    conditional sums, no outer join); the solve is one shared
    expression program — bitwise-equal doubles, det6-rounded.

    Scale plan: one scan → hash-agg to (type, user) with conditional
    pre/post accumulators → hash-agg to ≤|types| rows → scalar math.
    The six sums are additive, so the panel folds from stream batches
    exactly like `read_ols`.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.select(
            "event_type",
            "user_id",
            (F.to_date("ts") >= F.lit(_DID_POST_START)).alias("post"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("event_type", "user_id")
        .agg(
            F.sum(F.when(~F.col("post"), F.col("cents")).otherwise(0))
            .cast("bigint")
            .alias("x"),
            F.sum(F.when(F.col("post"), F.col("cents")).otherwise(0))
            .cast("bigint")
            .alias("y"),
        )
    )
    stats = per_user.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(
            F.col("x").cast("decimal(18,0)")
            * F.col("x").cast("decimal(18,0)")
        ).alias("qx"),
        F.sum(
            F.col("y").cast("decimal(18,0)")
            * F.col("y").cast("decimal(18,0)")
        ).alias("qy"),
        F.sum(
            F.col("x").cast("decimal(18,0)")
            * F.col("y").cast("decimal(18,0)")
        ).alias("qxy"),
    )
    out = stats
    for name, expr in _CUPED_PROG:
        out = out.withColumn(name, F.expr(expr))
    return out.selectExpr(
        "event_type",
        "n",
        _DET6.format(x="theta", name="theta"),
        _DET6.format(x="rho2", name="rho2"),
        _DET6.format(x="vy", name="var_post"),
        _DET6.format(x="vy_cuped", name="var_cuped"),
        _DET6.format(x="100.0 * rho2", name="var_reduction_pct"),
    ).orderBy("event_type")


def _sql_cuped_adjustment() -> str:
    steps = ""
    prev = "stats"
    for i, (name, expr) in enumerate(_CUPED_PROG):
        steps += f", p{i} AS (SELECT *, ({expr}) AS {name} FROM {prev})\n"
        prev = f"p{i}"
    return f"""
WITH per_user AS (
  SELECT event_type, user_id,
         CAST(SUM(CASE WHEN CAST(ts AS DATE) < DATE '{_DID_POST_START}'
                  THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN CAST(ts AS DATE) >= DATE '{_DID_POST_START}'
                  THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY 1, 2),
stats AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         SUM(x * x) AS qx,
         SUM(y * y) AS qy,
         SUM(x * y) AS qxy
  FROM per_user GROUP BY 1){steps}
SELECT event_type, n,
       CAST(FLOOR((theta) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS theta,
       CAST(FLOOR((rho2) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS rho2,
       CAST(FLOOR((vy) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS var_post,
       CAST(FLOOR((vy_cuped) * 1e6 + 0.5) AS DOUBLE) / 1e6
         AS var_cuped,
       CAST(FLOOR((100.0 * rho2) * 1e6 + 0.5) AS DOUBLE) / 1e6
         AS var_reduction_pct
FROM {prev}
ORDER BY event_type
"""


SQL_CUPED_ADJUSTMENT = _sql_cuped_adjustment()


def q_temporal_align(spark, sf_dir):
    """Temporal alignment (the interval-algebra NORMALIZE / temporal
    join of two SCD histories): given per-user TIER changes (signup
    events) and LEVEL changes (purchase events), produce the
    piecewise validity intervals on which BOTH attributes are
    constant — the table you need before any "state at time t across
    dimensions" analysis, and the operator SQL:2011 temporal tables
    conspicuously lack.

    The closed form that avoids interval×interval join blowup: the
    union of both change streams IS the aligned boundary set, so ONE
    user-partitioned window pass fills each attribute forward (last
    non-null), a same-instant collapse keeps the fully-filled row
    (src-ordered, so a tier and a level change at the same timestamp
    merge into one interval), and lead() closes each interval.  No
    range join, no interval intersection — two shuffle-free window
    passes over one union.

    Determinism: boundaries order by (ts, src, event_id) — total;
    attributes are exact ints; open intervals carry NULL valid_to.
    """
    ev = load_table(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "signup").select(
        "user_id",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        "event_id",
        F.lit(0).alias("src"),
        (F.get_json_object("props", "$.k").cast("int") % 4).alias(
            "tier"
        ),
        F.lit(None).cast("int").alias("level"),
    )
    b = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        "event_id",
        F.lit(1).alias("src"),
        F.lit(None).cast("int").alias("tier"),
        (F.get_json_object("props", "$.k").cast("int") % 3).alias(
            "level"
        ),
    )
    from pyspark.sql import Window

    w_fill = (
        Window.partitionBy("user_id")
        .orderBy("ts", "src", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = a.unionAll(b).select(
        "user_id",
        "ts",
        "src",
        "event_id",
        F.last("tier", ignorenulls=True).over(w_fill).alias("tier"),
        F.last("level", ignorenulls=True).over(w_fill).alias("level"),
    )
    # same-instant collapse: the row with the HIGHEST (src, event_id)
    # at each (user, ts) saw every same-instant change fill forward
    w_ts = Window.partitionBy("user_id", "ts").orderBy(
        F.desc("src"), F.desc("event_id")
    )
    intervals = (
        filled.withColumn("rn", F.row_number().over(w_ts))
        .where(F.col("rn") == 1)
        .drop("rn", "src", "event_id")
    )
    w_lead = Window.partitionBy("user_id").orderBy("ts")
    return (
        intervals.select(
            "user_id",
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w_lead).alias("valid_to"),
            "tier",
            "level",
        )
        .orderBy("user_id", "valid_from")
    )


SQL_TEMPORAL_ALIGN = """
WITH a AS (
  SELECT user_id, ts, event_id, 0 AS src,
         CAST(json_extract_string(props, '$.k') AS INT) % 4 AS tier,
         CAST(NULL AS INT) AS level
  FROM events WHERE event_type = 'signup'),
b AS (
  SELECT user_id, ts, event_id, 1 AS src,
         CAST(NULL AS INT) AS tier,
         CAST(json_extract_string(props, '$.k') AS INT) % 3 AS level
  FROM events WHERE event_type = 'purchase'),
filled AS (
  SELECT user_id, ts, src, event_id,
         LAST_VALUE(tier IGNORE NULLS) OVER w AS tier,
         LAST_VALUE(level IGNORE NULLS) OVER w AS level
  FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, src, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
collapsed AS (
  SELECT user_id, ts, tier, level FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, ts
                 ORDER BY src DESC, event_id DESC) AS rn
    FROM filled)
  WHERE rn = 1)
SELECT user_id, ts AS valid_from,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
       tier, level
FROM collapsed
ORDER BY user_id, valid_from
"""


def q_median_ci(spark, sf_dir):
    """Distribution-free 95% confidence interval for the median per
    event type, from order statistics (the binomial argument — no
    normality assumption, no bootstrap): the interval is
    [x(lo), x(hi)] with lo = ⌊n/2 − 0.98·√n⌋ and hi = ⌈n/2 + 1 +
    0.98·√n⌉ (0.98 = z₀.₀₂₅/2), clamped to [1, n] — ranks land on
    ACTUAL data values, so both engines pick identical cents.

    Determinism: ranks are exact integers computed from n by the same
    floor/ceil expressions in both engines (√n is IEEE-identical on
    identical BIGINTs); rank→value resolution rides the cumulative
    histogram (the `robust_trimmed_stats` discipline) — never a
    raw-row sort.

    Scale plan: one hash-agg to the value-domain-bounded cents
    histogram, one type-partitioned cumulative window over it, and a
    ≤|types|-row min-conditional agg per bound.
    """
    ev = load_table(spark, sf_dir, "events")
    hist = (
        ev.select(
            "event_type",
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("event_type", "cents")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    from pyspark.sql import Window

    tot = hist.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("n")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranks = (
        "GREATEST(CAST(1 AS BIGINT),"
        " CAST(FLOOR(n / 2.0 - 0.98 * SQRT(n)) AS BIGINT)) AS r_lo",
        "LEAST(n,"
        " CAST(CEIL(n / 2.0 + 1 + 0.98 * SQRT(n)) AS BIGINT)) AS r_hi",
        "CAST(CEIL(n / 2.0) AS BIGINT) AS r_med",
    )
    cum = (
        hist.join(F.broadcast(tot), "event_type")
        .withColumn("cum", F.sum("c").over(w))
        .selectExpr("event_type", "cents", "cum", "n", *ranks)
    )
    return (
        cum.groupBy("event_type", "n")
        .agg(
            F.min(
                F.when(F.col("cum") >= F.col("r_med"), F.col("cents"))
            ).alias("median_cents"),
            F.min(
                F.when(F.col("cum") >= F.col("r_lo"), F.col("cents"))
            ).alias("ci_lo_cents"),
            F.min(
                F.when(F.col("cum") >= F.col("r_hi"), F.col("cents"))
            ).alias("ci_hi_cents"),
        )
        .orderBy("event_type")
    )


SQL_MEDIAN_CI = """
WITH hist AS (
  SELECT event_type,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
tot AS (
  SELECT event_type, CAST(SUM(c) AS BIGINT) AS n FROM hist GROUP BY 1),
cum AS (
  SELECT h.event_type, h.cents, t.n,
         SUM(h.c) OVER (PARTITION BY h.event_type ORDER BY h.cents
                        ROWS BETWEEN UNBOUNDED PRECEDING AND
                        CURRENT ROW) AS cum,
         GREATEST(CAST(1 AS BIGINT),
           CAST(FLOOR(t.n / 2.0 - 0.98 * SQRT(t.n)) AS BIGINT)) AS r_lo,
         LEAST(t.n,
           CAST(CEIL(t.n / 2.0 + 1 + 0.98 * SQRT(t.n)) AS BIGINT))
           AS r_hi,
         CAST(CEIL(t.n / 2.0) AS BIGINT) AS r_med
  FROM hist h JOIN tot t USING (event_type))
SELECT event_type, n,
       MIN(CASE WHEN cum >= r_med THEN cents END) AS median_cents,
       MIN(CASE WHEN cum >= r_lo THEN cents END) AS ci_lo_cents,
       MIN(CASE WHEN cum >= r_hi THEN cents END) AS ci_hi_cents
FROM cum
GROUP BY 1, 2
ORDER BY event_type
"""


def q_ks_test(spark, sf_dir):
    """Two-sample Kolmogorov–Smirnov test per event type — the
    nonparametric "are these two value distributions the same?"
    companion to the mean-level z tests (`ab_test_zscore` compares
    means; KS catches shape/tail differences a mean can't see): the A
    arm is the deterministic user hash split, D = sup|F_A − F_B|.

    Determinism: D's numerator is max over distinct values of
    |cumA·nB − cumB·nA| — EXACT integers on the shared value-domain
    histogram (sup over a step function is attained at a data value,
    so the histogram grid is lossless); one det6 division for D, and
    the α=0.05 rejection compares num against
    1.358·√((nA+nB)/(nA·nB))·nA·nB in one shared double expression.

    Scale plan: one hash-agg to the (type, cents) histogram with
    per-arm conditional counts, one type-partitioned cumulative
    window over it, one ≤|types|-row max-agg.  int64 headroom:
    cum·n ≤ nA·nB < 2⁶³ through ~3·10⁹ rows per arm.
    """
    ev = load_table(spark, sf_dir, "events")
    from ..operators.sampling import _portable_hash

    hist = (
        ev.select(
            "event_type",
            (_portable_hash(F.col("user_id"), "ab0") % 2 == 0).alias(
                "in_a"
            ),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("event_type", "cents")
        .agg(
            F.sum(F.col("in_a").cast("bigint")).alias("ca"),
            F.sum((~F.col("in_a")).cast("bigint")).alias("cb"),
        )
    )
    tot = hist.groupBy("event_type").agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        hist.join(F.broadcast(tot), "event_type")
        .withColumn("cuma", F.sum("ca").over(w))
        .withColumn("cumb", F.sum("cb").over(w))
        .withColumn(
            "num",
            F.abs(F.col("cuma") * F.col("nb") - F.col("cumb") * F.col("na")),
        )
    )
    return (
        cum.groupBy("event_type", "na", "nb")
        .agg(F.max("num").cast("bigint").alias("num"))
        .selectExpr(
            "event_type",
            "na",
            "nb",
            "CAST(FLOOR(CAST(num AS DOUBLE) / (CAST(na AS DOUBLE)"
            " * CAST(nb AS DOUBLE)) * 1e6 + 0.5) AS DOUBLE) / 1e6"
            " AS ks_d",
            "CAST(num AS DOUBLE) > 1.358"
            " * SQRT((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))"
            " / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)))"
            " * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)"
            " AS reject_h0",
        )
        .orderBy("event_type")
    )


SQL_KS_TEST = """
WITH hist AS (
  SELECT event_type,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5(concat(
             CAST(user_id AS VARCHAR), 'ab0')), 1, 15)) AS BIGINT)
             % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5(concat(
             CAST(user_id AS VARCHAR), 'ab0')), 1, 15)) AS BIGINT)
             % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS cb
  FROM events GROUP BY 1, 2),
tot AS (
  SELECT event_type, CAST(SUM(ca) AS BIGINT) AS na,
         CAST(SUM(cb) AS BIGINT) AS nb
  FROM hist GROUP BY 1),
cum AS (
  SELECT h.event_type, t.na, t.nb,
         ABS(SUM(h.ca) OVER w * t.nb - SUM(h.cb) OVER w * t.na) AS num
  FROM hist h JOIN tot t USING (event_type)
  WINDOW w AS (PARTITION BY h.event_type ORDER BY h.cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT event_type, na, nb,
       CAST(FLOOR(CAST(MAX(num) AS DOUBLE) / (CAST(na AS DOUBLE)
         * CAST(nb AS DOUBLE)) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS ks_d,
       CAST(MAX(num) AS DOUBLE) > 1.358
         * SQRT((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))
         / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)))
         * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) AS reject_h0
FROM cum
GROUP BY 1, 2, 3
ORDER BY event_type
"""


#: Mann-Whitney normal approximation with tie correction, as one
#: shared expression program on exact integer sums (u2 = 2·U_A,
#: tie_s = Σ(t³−t) over tied groups, nn = na+nb)
_MWU_PROG = [
    ("mu2", "CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)"),
    ("var_u", "CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0"
              " * ((CAST(nn AS DOUBLE) + 1.0)"
              " - CAST(tie_s AS DOUBLE) / (CAST(nn AS DOUBLE)"
              " * (CAST(nn AS DOUBLE) - 1.0)))"),
    ("z", "(CAST(u2 AS DOUBLE) / 2.0 - mu2 / 2.0) / SQRT(var_u)"),
]


def q_mann_whitney_u(spark, sf_dir):
    """Mann–Whitney U (Wilcoxon rank-sum) per event type — the
    rank-based location test completing the two-sample panel: the z
    test compares MEANS (outlier-hostage), KS compares SHAPES, MWU
    asks "does one arm stochastically dominate?" and is the standard
    referee for skewed metrics like spend.

    Exactness through ties: midranks come from the shared cents
    histogram — DOUBLED midrank mr2(v) = 2·cum(v−1) + c_v + 1 is an
    exact integer, so the rank sum R2_A = Σ ca_v·mr2(v) and
    U2 = 2·U_A = R2_A − na(na+1) are exact; the tie correction
    Σ(t³−t) sums exact cubes over histogram rows.  The normal
    approximation (mean na·nb/2, tie-corrected variance) runs as one
    shared expression program — bitwise-equal z in both engines.

    Scale plan: identical shape to `ks_test` — one histogram hash-agg
    with per-arm counts, one type-partitioned cumulative window, one
    ≤|types|-row fold.  int64 headroom: mr2 ≤ 2N+1 and ca·mr2 sums
    stay under 2⁶³ through ~10⁹ rows per type; t³ rides DECIMAL.
    """
    ev = load_table(spark, sf_dir, "events")
    from ..operators.sampling import _portable_hash

    hist = (
        ev.select(
            "event_type",
            (_portable_hash(F.col("user_id"), "ab0") % 2 == 0).alias(
                "in_a"
            ),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("event_type", "cents")
        .agg(
            F.sum(F.col("in_a").cast("bigint")).alias("ca"),
            F.sum((~F.col("in_a")).cast("bigint")).alias("cb"),
        )
        .withColumn("t", F.col("ca") + F.col("cb"))
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = hist.withColumn(
        "mr2", 2 * F.sum("t").over(w) - F.col("t") + 1
    )
    stats = ranked.groupBy("event_type").agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
        F.sum(F.col("ca") * F.col("mr2")).cast("bigint").alias("r2a"),
        F.sum(
            F.col("t").cast("decimal(18,0)")
            * F.col("t").cast("decimal(18,0)")
            * F.col("t").cast("decimal(18,0)")
            - F.col("t").cast("decimal(18,0)")
        )
        .cast("decimal(38,0)")
        .alias("tie_s"),
    )
    out = stats.selectExpr(
        "event_type",
        "na",
        "nb",
        "na + nb AS nn",
        "r2a - na * (na + 1) AS u2",
        "tie_s",
    )
    for name, expr in _MWU_PROG:
        out = out.withColumn(name, F.expr(expr))
    return out.selectExpr(
        "event_type",
        "na",
        "nb",
        "CAST(u2 AS DOUBLE) / 2.0 AS u_a",
        _DET6.format(x="z", name="z_score"),
        f"ABS(z) > {_AB_Z_CRIT} AS significant",
    ).orderBy("event_type")


def _sql_mann_whitney_u() -> str:
    steps = ""
    prev = "base"
    for i, (name, expr) in enumerate(_MWU_PROG):
        steps += f", m{i} AS (SELECT *, ({expr}) AS {name} FROM {prev})\n"
        prev = f"m{i}"
    return f"""
WITH hist AS (
  SELECT event_type,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5(concat(
             CAST(user_id AS VARCHAR), 'ab0')), 1, 15)) AS BIGINT)
             % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5(concat(
             CAST(user_id AS VARCHAR), 'ab0')), 1, 15)) AS BIGINT)
             % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS cb
  FROM events GROUP BY 1, 2),
ranked AS (
  SELECT event_type, ca, cb, ca + cb AS t,
         2 * SUM(ca + cb) OVER (PARTITION BY event_type ORDER BY cents
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - (ca + cb) + 1 AS mr2
  FROM hist),
stats AS (
  SELECT event_type,
         CAST(SUM(ca) AS BIGINT) AS na,
         CAST(SUM(cb) AS BIGINT) AS nb,
         CAST(SUM(ca * mr2) AS BIGINT) AS r2a,
         SUM(t * t * t - t) AS tie_s
  FROM ranked GROUP BY 1),
base AS (
  SELECT event_type, na, nb, na + nb AS nn,
         r2a - na * (na + 1) AS u2, tie_s
  FROM stats){steps}
SELECT event_type, na, nb,
       CAST(u2 AS DOUBLE) / 2.0 AS u_a,
       CAST(FLOOR((z) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS z_score,
       ABS(z) > {_AB_Z_CRIT} AS significant
FROM {prev}
ORDER BY event_type
"""


SQL_MANN_WHITNEY_U = _sql_mann_whitney_u()


def q_sign_test(spark, sf_dir):
    """Paired sign test per event type — did each user's spend move
    up or down from the pre to the post period?  The distribution-
    free PAIRED companion to the two-sample panel (z/KS/MWU compare
    independent arms; pairing on the user removes between-user
    variance entirely, and the sign test needs no symmetry assumption
    the way Wilcoxon's signed-rank does).  Zero-diff users are
    excluded per the standard treatment, but counted in the panel —
    their share is itself a signal.

    A Wilcoxon signed-rank twin is deliberately NOT shipped: its
    ranks run over per-user DIFF magnitudes, whose distinct domain
    grows with the user population (unlike the raw value domain that
    bounds `mann_whitney_u`'s histogram), so an exact implementation
    would put a billion-row relation through |types| sort partitions
    — the low-cardinality-window trap this repo bans.

    Determinism: n_pos/n_neg/n_zero are exact integers from one
    hash-agg over per-user pre/post totals; z = (pos−neg)/√(pos+neg)
    is one shared expression.

    Scale plan: one scan → (type, user) hash-agg with conditional
    pre/post sums → ≤|types|-row fold.  No window, no join.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.select(
            "event_type",
            "user_id",
            (F.to_date("ts") >= F.lit(_DID_POST_START)).alias("post"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("event_type", "user_id")
        .agg(
            (
                F.sum(F.when(F.col("post"), F.col("cents")).otherwise(0))
                - F.sum(
                    F.when(~F.col("post"), F.col("cents")).otherwise(0)
                )
            )
            .cast("bigint")
            .alias("d")
        )
    )
    return (
        per_user.groupBy("event_type")
        .agg(
            F.sum((F.col("d") > 0).cast("bigint")).alias("n_pos"),
            F.sum((F.col("d") < 0).cast("bigint")).alias("n_neg"),
            F.sum((F.col("d") == 0).cast("bigint")).alias("n_zero"),
        )
        .selectExpr(
            "event_type",
            "n_pos",
            "n_neg",
            "n_zero",
            "CAST(FLOOR((CAST(n_pos AS DOUBLE) - CAST(n_neg AS DOUBLE))"
            " / SQRT(CAST(n_pos AS DOUBLE) + CAST(n_neg AS DOUBLE))"
            " * 1e6 + 0.5) AS DOUBLE) / 1e6 AS z_score",
            "ABS((CAST(n_pos AS DOUBLE) - CAST(n_neg AS DOUBLE))"
            " / SQRT(CAST(n_pos AS DOUBLE) + CAST(n_neg AS DOUBLE)))"
            f" > {_AB_Z_CRIT} AS significant",
        )
        .orderBy("event_type")
    )


SQL_SIGN_TEST = f"""
WITH per_user AS (
  SELECT event_type, user_id,
         CAST(SUM(CASE WHEN CAST(ts AS DATE) >= DATE '{_DID_POST_START}'
                  THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                  ELSE 0 END)
            - SUM(CASE WHEN CAST(ts AS DATE) < DATE '{_DID_POST_START}'
                  THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS d
  FROM events GROUP BY 1, 2)
SELECT event_type,
       CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       CAST(SUM(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
       CAST(SUM(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
       CAST(FLOOR((CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS DOUBLE)
         - CAST(SUM(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS DOUBLE))
         / SQRT(CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS DOUBLE)
         + CAST(SUM(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS DOUBLE))
         * 1e6 + 0.5) AS DOUBLE) / 1e6 AS z_score,
       ABS((CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS DOUBLE)
         - CAST(SUM(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS DOUBLE))
         / SQRT(CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS DOUBLE)
         + CAST(SUM(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS DOUBLE)))
         > {_AB_Z_CRIT} AS significant
FROM per_user
GROUP BY 1
ORDER BY event_type
"""


#: Poisson(1) inverse CDF thresholds (e⁻¹·Σ 1/j!), fixed 10-dp
#: literals so both engines draw identical weights from the same
#: 60-bit hash fraction; tail capped at w=7 (P ≈ 1e-5)
_POIS_CDF = (
    "0.3678794412", "0.7357588823", "0.9196986029", "0.9810118431",
    "0.9963401532", "0.9994058152", "0.9999167589", "0.9999897508",
)
_BOOT_B = 64


def _poisson_weight_sql(u: str) -> str:
    expr = "7"
    for k in reversed(range(len(_POIS_CDF))):
        expr = f"CASE WHEN {u} < {_POIS_CDF[k]} THEN {k} ELSE {expr} END"
    return expr


def q_bootstrap_ci(spark, sf_dir):
    """Poisson bootstrap CI for the mean event value per type (Efron
    via the streaming-friendly Poissonization: resampling n-out-of-n
    ≈ giving each row an independent Poisson(1) weight — Chamandy et
    al., Google 2012): 64 replicate weighted means, the 2.5%/97.5%
    replicate order statistics as the interval.  The
    assumption-free CI that backs a dashboard when normality is
    dubious — and the ONLY member of the stats panel whose
    uncertainty estimate needs no variance formula at all.

    Determinism: weights draw from the portable md5 hash fraction
    through fixed 10-dp inverse-CDF literals — identical integers in
    both engines; replicate sums are exact (weight·cents BIGINTs);
    the percentile is an exact rank over the 64-row replicate
    relation per type.

    Scale plan: the ×64 replicate explode is corpus-volume map work
    feeding ONE map-side-combined hash-agg to ≤|types|·64 rows — no
    shuffle amplification (the AMS-family discipline: fan-out happens
    inside the map task, the exchange carries only the folded rows).
    The rank window runs over the 64-row-per-type relation.
    """
    ev = load_table(spark, sf_dir, "events")
    from ..operators.sampling import _portable_hash

    reps = ev.select(
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
            _portable_hash(F.concat_ws("#", "event_id", "rep"), "boot")
            / F.lit(float(2**60))
        ).alias("u"),
    )
    w = F.expr(_poisson_weight_sql("u")).cast("bigint")
    rep_means = (
        reps.select("event_type", "rep", (w * F.col("cents")).alias("wc"), w.alias("w"))
        .groupBy("event_type", "rep")
        .agg(
            F.sum("wc").cast("bigint").alias("swc"),
            F.sum("w").cast("bigint").alias("sw"),
        )
        .selectExpr(
            "event_type",
            "CAST(swc AS DOUBLE) / CAST(sw AS DOUBLE) AS rep_mean",
        )
    )
    from pyspark.sql import Window

    wr = Window.partitionBy("event_type").orderBy("rep_mean")
    ranked = rep_means.withColumn("rk", F.row_number().over(wr))
    lo_rk = max(1, int(0.025 * _BOOT_B))
    hi_rk = int(0.975 * _BOOT_B) + 1
    base = ev.groupBy("event_type").agg(
        F.sum(
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
        ).alias("sc"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    det6 = "CAST(FLOOR(({x}) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS {n}"
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
            det6.format(x="CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)",
                        n="mean_cents"),
            det6.format(x="lo_raw", n="ci_lo_cents"),
            det6.format(x="hi_raw", n="ci_hi_cents"),
        )
        .orderBy("event_type")
    )


def _sql_bootstrap_ci() -> str:
    u = ("(CAST(concat('0x', substr(md5(concat(CAST(event_id AS VARCHAR),"
         " '#', CAST(rep AS VARCHAR), 'boot')), 1, 15)) AS BIGINT)"
         f" / {float(2**60)!r})")
    wexpr = _poisson_weight_sql(u)
    lo_rk = max(1, int(0.025 * _BOOT_B))
    hi_rk = int(0.975 * _BOOT_B) + 1
    return f"""
WITH reps AS (
  SELECT event_type, rep,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
         CAST({wexpr} AS BIGINT) AS w
  FROM events CROSS JOIN (SELECT unnest(range({_BOOT_B})) AS rep) r),
rep_means AS (
  SELECT event_type,
         CAST(SUM(w * cents) AS DOUBLE) / CAST(SUM(w) AS DOUBLE)
           AS rep_mean
  FROM reps GROUP BY event_type, rep),
ranked AS (
  SELECT event_type, rep_mean,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY rep_mean) AS rk
  FROM rep_means),
ci AS (
  SELECT event_type, MIN(rep_mean) AS lo_raw, MAX(rep_mean) AS hi_raw
  FROM ranked WHERE rk IN ({lo_rk}, {hi_rk})
  GROUP BY 1),
base AS (
  SELECT event_type,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sc,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1)
SELECT event_type, n,
       CAST(FLOOR((CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)) * 1e6 + 0.5)
         AS DOUBLE) / 1e6 AS mean_cents,
       CAST(FLOOR((lo_raw) * 1e6 + 0.5) AS DOUBLE) / 1e6
         AS ci_lo_cents,
       CAST(FLOOR((hi_raw) * 1e6 + 0.5) AS DOUBLE) / 1e6
         AS ci_hi_cents
FROM ci JOIN base USING (event_type)
ORDER BY event_type
"""


SQL_BOOTSTRAP_CI = _sql_bootstrap_ci()


_FUNNEL_WINDOW_DAYS = 7


def q_window_funnel(spark, sf_dir):
    """Time-bounded funnel depth (the ClickHouse ``windowFunnel``
    shape): signup → view → purchase, where every later step must
    land within 7 days of the user's FIRST signup — `funnel_steps`
    without the window answers "ever converted?"; this answers
    "converted while the campaign was live?".  Output is the depth
    census: how many users reached exactly depth 1/2/3.

    Determinism: each stage is a MIN timestamp under exact
    inequality predicates — no ranks, no floats; the census is exact
    counts.

    Scale plan: the `funnel_steps` discipline with the deadline
    threaded through — one conditional min-agg per stage on the
    (shrinking) user set, chained by user_id equi-joins that stay
    co-partitioned on the same key (one partitioning reused down the
    chain; AQE handles the sizes).  No window function at all.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
    )
    deadline = F.col("t1") + F.expr(
        f"INTERVAL {_FUNNEL_WINDOW_DAYS} DAYS"
    )
    s1 = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == "view")
        .join(s1, "user_id")
        .where((F.col("ts") >= F.col("t1")) & (F.col("ts") <= deadline))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.first("t1").alias("t1"))
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where((F.col("ts") >= F.col("t2")) & (F.col("ts") <= deadline))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
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


SQL_WINDOW_FUNNEL = f"""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1
  FROM events WHERE event_type = 'signup' GROUP BY 1),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2, ANY_VALUE(s1.t1) AS t1
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'view' AND e.ts >= s1.t1
    AND e.ts <= s1.t1 + INTERVAL {_FUNNEL_WINDOW_DAYS} DAY
  GROUP BY 1),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
    AND e.ts <= s2.t1 + INTERVAL {_FUNNEL_WINDOW_DAYS} DAY
  GROUP BY 1),
depth AS (
  SELECT CASE WHEN s3.user_id IS NOT NULL THEN 3
              WHEN s2.user_id IS NOT NULL THEN 2 ELSE 1 END AS depth
  FROM s1
  LEFT JOIN s2 ON s1.user_id = s2.user_id
  LEFT JOIN s3 ON s1.user_id = s3.user_id)
SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_users
FROM depth
GROUP BY 1
ORDER BY depth
"""


_PATH_LEN = 5
_PATH_TOPN = 20


def q_top_user_paths(spark, sf_dir):
    """Top user journey paths — each user's first 5 events (by time)
    concatenated into a path string, counted corpus-wide, top 20
    reported: the "what do people actually do first" panel product
    analytics runs before any funnel is designed (the funnel queries
    assume an order; this one DISCOVERS the orders that exist).

    Determinism: the per-user sequence orders by (ts, event_id) — a
    total order; path strings and counts are exact.

    Scale plan: one user-partitioned row_number window takes the
    first 5 events (WindowGroupLimit keeps 5 per user map-side before
    the exchange); path assembly sorts ≤5 structs inside a hash-agg
    per user; the path census is a hash-agg on the bounded path
    vocabulary (≤|types|⁵); the head compiles to
    TakeOrderedAndProject.
    """
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    firstk = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _PATH_LEN)
    )
    paths = (
        firstk.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("rn", "event_type"))
            ).alias("steps")
        )
        .select(
            F.concat_ws(
                ">", F.transform("steps", lambda s: s["event_type"])
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy(F.desc("n_users"), F.asc("path"))
        .limit(_PATH_TOPN)
    )


SQL_TOP_USER_PATHS = f"""
WITH firstk AS (
  SELECT user_id, event_type, rn FROM (
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn
    FROM events)
  WHERE rn <= {_PATH_LEN}),
paths AS (
  SELECT string_agg(event_type, '>' ORDER BY rn) AS path
  FROM firstk GROUP BY user_id)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
FROM paths
GROUP BY 1
ORDER BY n_users DESC, path ASC
LIMIT {_PATH_TOPN}
"""


def q_join_skew_profile(spark, sf_dir):
    """Join-key skew diagnostics for the two hot join keys
    (lineitem.l_orderkey, events.user_id): key cardinality, row
    count, max / exact-median / exact-p99 key multiplicity, the top
    key's row share, and the max/median skew ratio — the numbers
    that DECIDE between a plain shuffle join, AQE skew splitting,
    and the `join_salted` rewrite, computed before committing to
    any of them.

    Determinism: everything reads off the exact frequency-of-
    frequency histogram (integer counts); percentiles are discrete
    (actual multiplicity values); the share is integer ppm and the
    ratio det6.

    Scale plan: per key, two map-side-combinable hash-aggs (key →
    freq, freq → n_keys); the percentile window runs on the FoF
    relation, whose width is bounded by the MULTIPLICITY domain
    (max rows per key), not by key cardinality or row count.  The
    per-key builder lives in `operators/joins.key_skew_profile`
    (round 12: shared with `choose_join_strategy`, the panel's
    consumer — VERDICT r11 item 6)."""
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")
    return (
        joins.key_skew_profile(li, "l_orderkey", "lineitem.l_orderkey")
        .unionAll(joins.key_skew_profile(ev, "user_id", "events.user_id"))
        .orderBy("key_name")
    )


def _sql_skew_profile(table, col, name):
    return f"""
  SELECT '{name}' AS key_name, n_keys, n_rows, max_freq,
         p50_freq, p99_freq,
         CAST(1000000 * max_freq // n_rows AS BIGINT)
           AS top1_share_ppm,
         CAST(FLOOR(CAST(max_freq AS DOUBLE)
              / CAST(p50_freq AS DOUBLE) * 1e6 + 0.5) AS DOUBLE)
           / 1e6 AS skew_ratio
  FROM (
    SELECT CAST(MIN(CASE WHEN cum * 2 >= n_keys THEN f END)
                AS BIGINT) AS p50_freq,
           CAST(MIN(CASE WHEN cum * 100 >= 99 * n_keys THEN f END)
                AS BIGINT) AS p99_freq,
           CAST(MAX(n_keys) AS BIGINT) AS n_keys,
           CAST(MAX(n_rows) AS BIGINT) AS n_rows,
           CAST(MAX(max_freq) AS BIGINT) AS max_freq
    FROM (
      SELECT a.f, SUM(b.nk) AS cum,
             MAX(t.n_keys) AS n_keys, MAX(t.n_rows) AS n_rows,
             MAX(t.max_freq) AS max_freq
      FROM (SELECT f, CAST(COUNT(*) AS BIGINT) AS nk
            FROM (SELECT {col}, CAST(COUNT(*) AS BIGINT) AS f
                  FROM {table} GROUP BY 1)
            GROUP BY 1) a
      JOIN (SELECT f, CAST(COUNT(*) AS BIGINT) AS nk
            FROM (SELECT {col}, CAST(COUNT(*) AS BIGINT) AS f
                  FROM {table} GROUP BY 1)
            GROUP BY 1) b ON b.f <= a.f
      CROSS JOIN (
        SELECT CAST(SUM(nk) AS BIGINT) AS n_keys,
               CAST(SUM(f * nk) AS BIGINT) AS n_rows,
               CAST(MAX(f) AS BIGINT) AS max_freq
        FROM (SELECT f, CAST(COUNT(*) AS BIGINT) AS nk
              FROM (SELECT {col}, CAST(COUNT(*) AS BIGINT) AS f
                    FROM {table} GROUP BY 1)
              GROUP BY 1)) t
      GROUP BY a.f))"""


SQL_JOIN_SKEW_PROFILE = f"""
SELECT * FROM (
{_sql_skew_profile("lineitem", "l_orderkey", "lineitem.l_orderkey")}
  UNION ALL
{_sql_skew_profile("events", "user_id", "events.user_id")})
ORDER BY key_name
"""


def q_join_strategy_advice(spark, sf_dir):
    """`join_skew_profile` with its DECISION attached — the chooser
    (`operators/joins.choose_join_strategy`, VERDICT r11 item 6)
    driver-verified as a query: each profiled key carries the
    physical strategy the thresholds pick (plain / aqe_skew /
    salted; the broadcast branch needs the dim side's row count,
    which a key profile doesn't carry).  The strategy column
    evaluates `operators/joins.strategy_case_expr` — the SAME text
    the oracle runs, generated from the SAME constants the Python
    chooser uses, and a pytest pins the three agree row-for-row.

    Scale plan: `key_skew_profile`'s (two map-side hash-aggs +
    multiplicity-domain-bounded FoF percentiles) plus one CASE on
    the 2-row result."""
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")
    profile = joins.key_skew_profile(
        li, "l_orderkey", "lineitem.l_orderkey"
    ).unionAll(joins.key_skew_profile(ev, "user_id", "events.user_id"))
    return profile.selectExpr(
        "*", f"{joins.strategy_case_expr()} AS strategy"
    ).orderBy("key_name")


def _sql_join_strategy_advice() -> str:
    from ..operators.joins import strategy_case_expr

    return f"""
SELECT *, {strategy_case_expr()} AS strategy
FROM (
{_sql_skew_profile("lineitem", "l_orderkey", "lineitem.l_orderkey")}
  UNION ALL
{_sql_skew_profile("events", "user_id", "events.user_id")})
ORDER BY key_name
"""


SQL_JOIN_STRATEGY_ADVICE = _sql_join_strategy_advice()


#: attribution lookback window (days before the conversion)
_ATTR_WINDOW_DAYS = 7
_ATTR_TOUCHES = ("click", "view")


def q_attribution_credit(spark, sf_dir):
    """Marketing-attribution census: every purchase distributes
    conversion credit over the user's view/click touches in the 7
    days before it — LAST-TOUCH (the whole credit to the latest
    touch) and LINEAR (equal split) side by side, per touch type: the
    two bookends every attribution debate starts from.  Conversions
    with no in-window touch drop from both columns (the "organic"
    remainder).

    Determinism: the last touch is a (ts, event_id) total-order max;
    linear credit is integer MICRO-credits (1e6 DIV n_touches) so the
    census is an exact BIGINT sum — no order-dependent float folds.

    Scale plan: one user_id equi-join between the two filtered event
    streams with the window predicate applied in-join (pair volume
    bounded by per-user activity — the `basket_lift` bound argument);
    the per-conversion count and last-touch rank ride ONE
    conversion-keyed window partitioned on the high-cardinality
    (user_id, conv_id) key; both exchanges share the user_id key."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        "event_id",
    )
    conv = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("conv_id"),
        F.col("ts").alias("cts"),
    )
    touch = ev.where(F.col("event_type").isin(*_ATTR_TOUCHES)).select(
        "user_id",
        F.col("event_type").alias("touch_type"),
        F.col("ts").alias("tts"),
        F.col("event_id").alias("touch_id"),
    )
    pairs = conv.join(touch, "user_id").where(
        (F.col("tts") < F.col("cts"))
        & (
            F.col("tts")
            >= F.col("cts") - F.expr(f"INTERVAL {_ATTR_WINDOW_DAYS} DAYS")
        )
    )
    w = Window.partitionBy("user_id", "conv_id")
    wr = w.orderBy(F.desc("tts"), F.desc("touch_id"))
    scored = pairs.withColumn(
        "n_touches", F.count(F.lit(1)).over(w)
    ).withColumn("rn", F.row_number().over(wr))
    return (
        scored.groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("last_touch_conversions"),
            F.sum(F.expr("1000000 DIV n_touches"))
            .cast("bigint")
            .alias("linear_credit_ppm"),
        )
        .orderBy("touch_type")
    )


SQL_ATTRIBUTION_CREDIT = f"""
WITH conv AS (
  SELECT user_id, event_id AS conv_id, ts AS cts
  FROM events WHERE event_type = 'purchase'),
touch AS (
  SELECT user_id, event_type AS touch_type, ts AS tts,
         event_id AS touch_id
  FROM events
  WHERE event_type IN ({", ".join(f"'{t}'" for t in _ATTR_TOUCHES)})),
pairs AS (
  SELECT c.user_id, c.conv_id, t.touch_type, t.tts, t.touch_id
  FROM conv c JOIN touch t USING (user_id)
  WHERE t.tts < c.cts
    AND t.tts >= c.cts - INTERVAL {_ATTR_WINDOW_DAYS} DAY),
scored AS (
  SELECT touch_type,
         COUNT(*) OVER (PARTITION BY user_id, conv_id) AS n_touches,
         ROW_NUMBER() OVER (PARTITION BY user_id, conv_id
                            ORDER BY tts DESC, touch_id DESC) AS rn
  FROM pairs)
SELECT touch_type,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS last_touch_conversions,
       CAST(SUM(1000000 // n_touches) AS BIGINT) AS linear_credit_ppm
FROM scored
GROUP BY 1
ORDER BY touch_type
"""


#: numeric lineitem columns profiled by the correlation matrix, each
#: as (name, exact-integer expression) — quantity in units, the money
#: columns in cents (the repo-wide cents discipline)
_CORR_COLS = (
    ("quantity", "CAST(l_quantity AS BIGINT)"),
    ("price_c", "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)"),
    ("discount_c", "CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)"),
    ("tax_c", "CAST(FLOOR(l_tax * 100 + 0.5) AS BIGINT)"),
)


def q_corr_matrix(spark, sf_dir):
    """Pairwise Pearson correlation matrix over the numeric lineitem
    columns (quantity, price, discount, tax), long-form — the first
    panel of any feature-engineering or data-quality pass ("which
    columns move together / are redundant").

    Determinism: all sufficient statistics (n, Σx, Σxy for every
    pair) are EXACT integers in one pass (cross products ride
    DECIMAL(38,0) — price-cents² ≈ 10¹⁴ × 10¹⁰ rows at sf1000 needs
    the headroom); r = (n·Sxy − Sx·Sy)/√((n·Sxx − Sx²)(n·Syy − Sy²))
    is evaluated from identical integers by identical expression
    text, det6-rounded.

    Scale plan: ONE map-side-combinable hash-agg over the fact scan
    (no shuffle of raw rows — partials combine; the `linreg_ols`
    shape widened to the full pair grid); the pair expansion happens
    on the single aggregate row."""
    cols = _CORR_COLS
    base = load_table(spark, sf_dir, "lineitem").selectExpr(
        *[f"{expr} AS {name}" for name, expr in cols]
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    for name, _ in cols:
        aggs.append(
            F.sum(F.col(name).cast("decimal(38,0)")).alias(f"s_{name}")
        )
    for i, (a, _) in enumerate(cols):
        for b, _x in cols[i:]:
            aggs.append(
                F.sum(
                    F.col(a).cast("decimal(18,0)")
                    * F.col(b).cast("decimal(18,0)")
                ).alias(f"s_{a}_{b}")
            )
    stats = base.agg(*aggs)
    det6 = "CAST(FLOOR(({x}) * 1e6 + 0.5) AS DOUBLE) / 1e6"
    rows = []
    for i, (a, _) in enumerate(cols):
        for b, _x in cols[i + 1 :]:
            r = (
                f"(CAST(n AS DOUBLE) * CAST(s_{a}_{b} AS DOUBLE)"
                f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
                f" / SQRT((CAST(n AS DOUBLE) * CAST(s_{a}_{a} AS DOUBLE)"
                f" - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))"
                f" * (CAST(n AS DOUBLE) * CAST(s_{b}_{b} AS DOUBLE)"
                f" - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE)))"
            )
            rows.append(
                f"struct('{a}' AS col_x, '{b}' AS col_y,"
                f" {det6.format(x=r)} AS r)"
            )
    return (
        stats.selectExpr(f"explode(array({', '.join(rows)})) AS p")
        .select("p.col_x", "p.col_y", "p.r")
        .orderBy("col_x", "col_y")
    )


def _sql_corr_matrix() -> str:
    cols = _CORR_COLS
    sums = [f"CAST(COUNT(*) AS BIGINT) AS n"]
    for name, expr in cols:
        sums.append(f"SUM(CAST({expr} AS DECIMAL(38,0))) AS s_{name}")
    for i, (a, _) in enumerate(cols):
        for b, _x in cols[i:]:
            sums.append(
                f"SUM(CAST({dict(cols)[a]} AS DECIMAL(18,0))"
                f" * CAST({dict(cols)[b]} AS DECIMAL(18,0)))"
                f" AS s_{a}_{b}"
            )
    det6 = "CAST(FLOOR(({x}) * 1e6 + 0.5) AS DOUBLE) / 1e6"
    rows = []
    for i, (a, _) in enumerate(cols):
        for b, _x in cols[i + 1 :]:
            r = (
                f"(CAST(n AS DOUBLE) * CAST(s_{a}_{b} AS DOUBLE)"
                f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
                f" / SQRT((CAST(n AS DOUBLE) * CAST(s_{a}_{a} AS DOUBLE)"
                f" - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))"
                f" * (CAST(n AS DOUBLE) * CAST(s_{b}_{b} AS DOUBLE)"
                f" - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE)))"
            )
            rows.append(
                f"  SELECT '{a}' AS col_x, '{b}' AS col_y,"
                f" {det6.format(x=r)} AS r FROM stats"
            )
    selects = "\n  UNION ALL\n".join(rows)
    return f"""
WITH stats AS (
  SELECT {', '.join(sums)}
  FROM lineitem)
SELECT * FROM (
{selects})
ORDER BY col_x, col_y
"""


SQL_CORR_MATRIX = _sql_corr_matrix()


#: chi-square(2 dof) 0.999 quantile — the standard bivariate outlier
#: cut for Mahalanobis D-squared
_MAHAL_CUT = 13.8155


def q_mahalanobis_2d(spark, sf_dir):
    """Bivariate Mahalanobis outlier audit of (quantity, price) per
    return flag: D² = (x−μ)ᵀ Σ⁻¹ (x−μ) with the 2×2 covariance
    inverted in closed form — the correlation-aware generalization of
    per-column z-scores (a row can be ordinary in each margin and
    wildly off the joint ridge; D² sees it, `iqr_outliers` cannot).
    Output per flag: n, the covariance panel, outliers past the
    χ²₂(0.999) cut, and the maximum D².

    Determinism: μ and Σ come from exact integer sums; every row's D²
    is evaluated from those identical doubles by identical expression
    text in both engines, so even the strict `>` cut cannot diverge.

    Scale plan: pass 1 is the `linreg_ols` one-hash-agg shape to
    ≤|flags| stat rows; pass 2 re-scans the fact with the stat row
    broadcast equi-joined on l_returnflag and folds D² map-side —
    two fact scans, zero fact shuffles."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("bigint").alias("x"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("y"),
    )
    stats = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(
            F.col("x").cast("decimal(18,0)")
            * F.col("y").cast("decimal(18,0)")
        ).alias("sxy"),
        F.sum(
            F.col("y").cast("decimal(18,0)")
            * F.col("y").cast("decimal(18,0)")
        ).alias("syy"),
    )
    # covariance entries and the closed-form 2x2 inverse, as one
    # shared expression program from the exact sums
    prog = [
        ("mx", "CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)"),
        ("my", "CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)"),
        ("vxx", "(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * mx)"
                " / (CAST(n AS DOUBLE) - 1.0)"),
        ("vxy", "(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * my)"
                " / (CAST(n AS DOUBLE) - 1.0)"),
        ("vyy", "(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * my)"
                " / (CAST(n AS DOUBLE) - 1.0)"),
        ("det", "vxx * vyy - vxy * vxy"),
    ]
    st = stats
    for name, expr in prog:
        st = st.withColumn(name, F.expr(expr))
    d2 = (
        "((CAST(x AS DOUBLE) - mx) * vyy * (CAST(x AS DOUBLE) - mx)"
        " - 2.0 * (CAST(x AS DOUBLE) - mx) * vxy"
        " * (CAST(y AS DOUBLE) - my)"
        " + (CAST(y AS DOUBLE) - my) * vxx * (CAST(y AS DOUBLE) - my))"
        " / det"
    )
    det6 = "CAST(FLOOR(({x}) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS {n}"
    return (
        li.join(
            F.broadcast(
                st.select(
                    "l_returnflag", "n", "mx", "my", "vxx", "vxy",
                    "vyy", "det",
                )
            ),
            "l_returnflag",
        )
        .withColumn("d2", F.expr(d2))
        .groupBy("l_returnflag", "n")
        .agg(
            F.max("vxy").alias("vxy_r"),
            F.sum(
                F.when(F.col("d2") > _MAHAL_CUT, 1).otherwise(0)
            ).cast("bigint").alias("n_outliers"),
            F.max("d2").alias("max_d2_r"),
        )
        .selectExpr(
            "l_returnflag",
            "n",
            det6.format(x="vxy_r", n="cov_xy"),
            "n_outliers",
            det6.format(x="max_d2_r", n="max_d2"),
        )
        .orderBy("l_returnflag")
    )


def _sql_mahalanobis_2d() -> str:
    prog = [
        ("mx", "CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)"),
        ("my", "CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)"),
        ("vxx", "(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * mx)"
                " / (CAST(n AS DOUBLE) - 1.0)"),
        ("vxy", "(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * my)"
                " / (CAST(n AS DOUBLE) - 1.0)"),
        ("vyy", "(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * my)"
                " / (CAST(n AS DOUBLE) - 1.0)"),
        ("det", "vxx * vyy - vxy * vxy"),
    ]
    steps = ""
    prev = "stats"
    for i, (name, expr) in enumerate(prog):
        steps += f", m{i} AS (SELECT *, ({expr}) AS {name} FROM {prev})\n"
        prev = f"m{i}"
    d2 = (
        "((CAST(x AS DOUBLE) - mx) * vyy * (CAST(x AS DOUBLE) - mx)"
        " - 2.0 * (CAST(x AS DOUBLE) - mx) * vxy"
        " * (CAST(y AS DOUBLE) - my)"
        " + (CAST(y AS DOUBLE) - my) * vxx * (CAST(y AS DOUBLE) - my))"
        " / det"
    )
    return f"""
WITH base AS (
  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
  FROM lineitem),
stats AS (
  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         SUM(CAST(x AS DECIMAL(18,0)) * CAST(y AS DECIMAL(18,0)))
           AS sxy,
         SUM(CAST(y AS DECIMAL(18,0)) * CAST(y AS DECIMAL(18,0)))
           AS syy
  FROM base GROUP BY 1){steps},
scored AS (
  SELECT b.l_returnflag, s.n, s.vxy, ({d2}) AS d2
  FROM base b JOIN {prev} s USING (l_returnflag))
SELECT l_returnflag, n,
       CAST(FLOOR((MAX(vxy)) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS cov_xy,
       CAST(SUM(CASE WHEN d2 > {_MAHAL_CUT} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers,
       CAST(FLOOR((MAX(d2)) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS max_d2
FROM scored
GROUP BY 1, 2
ORDER BY l_returnflag
"""


SQL_MAHALANOBIS_2D = _sql_mahalanobis_2d()


#: zone-map audit geometry: 64 files per layout, predicates covering
#: the bottom 1/8 of each 1024-bucket dimension
_ZM_FILES = 64
_ZM_PRED_HI = 128


def q_zone_map_effectiveness(spark, sf_dir):
    """Head-to-head file-skipping audit of three physical layouts —
    the number OPTIMIZE/ZORDER decisions should be made on, next to
    `zorder_layout`'s per-cell rectangles: assign every event to one
    of 64 "files" under (a) natural ingest order (event_id
    round-robin — the unclustered strawman), (b) a user-sorted
    layout (contiguous user-bucket ranges), (c) the Morton curve
    over (user, value) buckets; then, for a range predicate on EACH
    dimension, count the files whose min/max zone maps let the scan
    skip them and the rows the surviving files still read.  The
    expected story IS the output: natural skips nothing, sorted
    skips perfectly on its sort key and nothing on the other
    dimension, z-order skips substantially on BOTH.

    Determinism: file assignment, zone maps, skip flags, and row
    counts are all exact integer arithmetic; the one ratio is det6.

    Scale plan: three map-only file-key assignments over one scan
    each (union), ONE hash-agg to the 3×64-row zone-map relation,
    then two folds of that KB-sized relation — no window, no join.

    Measured (bench_one, fresh JVM, min-of-3, GC-each): sf1 1.35 s /
    sf10 2.31 s — 1.7×/decade, three map-only passes + one agg."""
    ev = load_table(spark, sf_dir, "events")
    n = 1 << ZORDER_BITS
    z = _z_interleave("ub", "vb", ZORDER_BITS)
    base = ev.selectExpr(
        "event_id",
        # multiplicative (Knuth) spread so the user bucket fills its
        # 1024-value domain at ANY user cardinality — a plain
        # user_id % 1024 collapses into the first buckets on small
        # fixtures and the ub predicate degenerates to "everything".
        # The pre-reduction mod 2^20 keeps the product inside int64
        # (ANSI mode overflows on the scaled fixture's large ids)
        f"((user_id % 1048576) * 2654435761) % {n} AS ub",
        f"(((CAST(floor(value * 100 + 0.5) AS BIGINT) % {n})"
        f" + {n}) % {n}) AS vb",
    )
    layouts = (
        base.selectExpr(
            "'natural' AS layout",
            f"event_id % {_ZM_FILES} AS f",
            "ub",
            "vb",
        )
        .unionAll(
            base.selectExpr(
                "'user_sorted' AS layout",
                f"ub DIV {n // _ZM_FILES} AS f",
                "ub",
                "vb",
            )
        )
        .unionAll(
            base.selectExpr(
                "'zorder' AS layout",
                f"({z}) >> {2 * ZORDER_BITS - 6} AS f",
                "ub",
                "vb",
            )
        )
    )
    zonemaps = layouts.groupBy("layout", "f").agg(
        F.count(F.lit(1)).cast("bigint").alias("rows_in_file"),
        F.min("ub").alias("min_ub"),
        F.max("ub").alias("max_ub"),
        F.min("vb").alias("min_vb"),
        F.max("vb").alias("max_vb"),
    )

    def fold(dim: str):
        agged = zonemaps.groupBy("layout").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum(
                F.when(F.col(f"min_{dim}") >= _ZM_PRED_HI, 1).otherwise(
                    0
                )
            )
            .cast("bigint")
            .alias("n_skipped"),
            F.sum(
                F.when(
                    F.col(f"min_{dim}") < _ZM_PRED_HI,
                    F.col("rows_in_file"),
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("rows_scanned"),
        )
        return agged.withColumn("pred_dim", F.lit(dim))

    return (
        fold("ub")
        .unionAll(fold("vb"))
        .selectExpr(
            "layout",
            "pred_dim",
            "n_files",
            "n_skipped",
            "CAST(FLOOR(CAST(n_skipped AS DOUBLE)"
            " / CAST(n_files AS DOUBLE) * 1e6 + 0.5) AS DOUBLE) / 1e6"
            " AS skip_ratio",
            "rows_scanned",
        )
        .orderBy("layout", "pred_dim")
    )


def _sql_zone_map_effectiveness() -> str:
    n = 1 << ZORDER_BITS
    z = _z_interleave("ub", "vb", ZORDER_BITS)
    folds = []
    for dim in ("ub", "vb"):
        folds.append(
            f"""
  SELECT layout, '{dim}' AS pred_dim,
         CAST(COUNT(*) AS BIGINT) AS n_files,
         CAST(SUM(CASE WHEN min_{dim} >= {_ZM_PRED_HI}
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_skipped,
         CAST(FLOOR(CAST(SUM(CASE WHEN min_{dim} >= {_ZM_PRED_HI}
                               THEN 1 ELSE 0 END) AS DOUBLE)
                    / CAST(COUNT(*) AS DOUBLE) * 1e6 + 0.5)
              AS DOUBLE) / 1e6 AS skip_ratio,
         CAST(SUM(CASE WHEN min_{dim} < {_ZM_PRED_HI}
                  THEN rows_in_file ELSE 0 END) AS BIGINT)
           AS rows_scanned
  FROM zonemaps GROUP BY 1"""
        )
    return f"""
WITH base AS (
  SELECT event_id,
         ((user_id % 1048576) * 2654435761) % {n} AS ub,
         (((CAST(floor(value * 100 + 0.5) AS BIGINT) % {n})
           + {n}) % {n}) AS vb
  FROM events),
layouts AS (
  SELECT 'natural' AS layout, event_id % {_ZM_FILES} AS f, ub, vb
  FROM base
  UNION ALL
  SELECT 'user_sorted', ub // {n // _ZM_FILES}, ub, vb FROM base
  UNION ALL
  SELECT 'zorder', ({z}) >> {2 * ZORDER_BITS - 6}, ub, vb FROM base),
zonemaps AS (
  SELECT layout, f,
         CAST(COUNT(*) AS BIGINT) AS rows_in_file,
         MIN(ub) AS min_ub, MAX(ub) AS max_ub,
         MIN(vb) AS min_vb, MAX(vb) AS max_vb
  FROM layouts GROUP BY 1, 2)
SELECT * FROM ({folds[0]}
  UNION ALL{folds[1]})
ORDER BY layout, pred_dim
"""


SQL_ZONE_MAP_EFFECTIVENESS = _sql_zone_map_effectiveness()


#: compaction target: merge slice-files into groups of about this
#: many characters (the OPTIMIZE binPacking target, scaled to the
#: fixture's char volumes)
_COMPACT_TARGET_CHARS = 4_000


def q_compaction_plan(spark, sf_dir):
    """Small-file compaction plan per source partition — the
    OPTIMIZE/bin-packing primitive every lakehouse table needs once
    streaming ingest has sprayed it with KB-sized files: model each
    (source, lang) slice as one input file, order files largest-first
    within their source partition, and cut sequential groups every
    {_COMPACT_TARGET_CHARS} characters (first-fit into consecutive
    bins of the size-sorted list — the deterministic form of
    binPacking).  Output one row per planned output file: its input
    count, total chars, and the packed member list, ready to drive
    the rewrite job.

    Determinism: sizes are exact integers; ordering ties break on
    lang; group = (cumsum − size) DIV target is integer arithmetic.

    Scale plan: one hash-agg to the (source, lang) file inventory, a
    SOURCE-partitioned cumulative window over that bounded inventory
    (never the documents), one hash-agg to groups.  The real table's
    inventory is the transaction-log listing — same plan, no scan."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    files = docs.groupBy("source", "lang").agg(
        F.sum("n_chars").cast("bigint").alias("sz")
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("sz"), F.asc("lang"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    planned = files.withColumn("csum", F.sum("sz").over(w)).selectExpr(
        "source",
        "lang",
        "sz",
        f"CAST((csum - sz) DIV {_COMPACT_TARGET_CHARS} AS BIGINT)"
        " AS compact_group",
    )
    return (
        planned.groupBy("source", "compact_group")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_inputs"),
            F.sum("sz").cast("bigint").alias("total_chars"),
            F.expr(
                "array_join(array_sort(collect_list(lang)), ',')"
            ).alias("members"),
        )
        .orderBy("source", "compact_group")
    )


q_compaction_plan.__doc__ = q_compaction_plan.__doc__.replace(
    "{_COMPACT_TARGET_CHARS}", str(_COMPACT_TARGET_CHARS)
)

SQL_COMPACTION_PLAN = f"""
WITH files AS (
  SELECT source, lang, CAST(SUM(n_chars) AS BIGINT) AS sz
  FROM documents GROUP BY 1, 2),
planned AS (
  SELECT source, lang, sz,
         CAST((SUM(sz) OVER (PARTITION BY source
                 ORDER BY sz DESC, lang ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - sz) // {_COMPACT_TARGET_CHARS} AS BIGINT)
           AS compact_group
  FROM files)
SELECT source, compact_group,
       CAST(COUNT(*) AS BIGINT) AS n_inputs,
       CAST(SUM(sz) AS BIGINT) AS total_chars,
       array_to_string(list_sort(list(lang)), ',') AS members
FROM planned
GROUP BY 1, 2
ORDER BY source, compact_group
"""


#: power-analysis constants: two-sided alpha=0.05, power=0.80 (the
#: default every experimentation platform quotes), and the relative
#: minimum-detectable-effect grid the table is quoted over
_PWR_Z_ALPHA = 1.959963984540054
_PWR_Z_BETA = 0.8416212335729143
_PWR_MDES = (0.01, 0.02, 0.05, 0.10)


def q_sample_size_power(spark, sf_dir):
    """A/B sample-size calculator per event type — the PLANNING
    counterpart of `ab_test_zscore` (that one judges a finished
    experiment; this one says how many users the next one needs):
    for each type's measured user-conversion rate p₁ and each
    relative MDE, the required users per arm for a two-proportion z
    test at α=0.05 / power 0.80 —
    n = (z_{α/2}·√(2p̄(1−p̄)) + z_β·√(p₁(1−p₁)+p₂(1−p₂)))² / (p₂−p₁)².

    Determinism: p₁ is an exact integer ratio — distinct users who
    fired the type at least once ("converted") over distinct users
    overall, the USER-level conversion probability an experiment arm
    actually measures (ADVICE r12 flagged the first cut for quoting
    a user-DAY traffic share here); the MDE grid is a literal; n is
    one closed-form expression on exact-derived doubles, CEIL to
    bigint.

    Scale plan: two distinct-count hash-aggs (per-type and the 1-row
    global, broadcast back — the Q11 scalar shape) and a 4-literal
    explode; no window, no data join.

    Measured (bench_one, min-of-2): sf1 0.71 s / sf10 1.46 s — the
    cost is the two distinct aggs."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id"
    )
    per_type = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("bigint").alias("u_conv")
    )
    tot = ev.agg(
        F.count_distinct("user_id").cast("bigint").alias("u_all")
    )
    mde_arr = ", ".join(f"CAST({m!r} AS DOUBLE)" for m in _PWR_MDES)
    p1 = "(CAST(u_conv AS DOUBLE) / CAST(u_all AS DOUBLE))"
    p2 = f"(LEAST({p1} * (1.0 + mde), 0.999999))"
    pbar = f"(({p1} + {p2}) / 2.0)"
    num = (
        f"({_PWR_Z_ALPHA!r} * SQRT(2.0 * {pbar} * (1.0 - {pbar}))"
        f" + {_PWR_Z_BETA!r} * SQRT({p1} * (1.0 - {p1})"
        f" + {p2} * (1.0 - {p2})))"
    )
    det6 = "CAST(FLOOR(({x}) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS {n}"
    return (
        per_type.crossJoin(F.broadcast(tot))
        .selectExpr(
            "event_type", "u_conv", "u_all",
            f"explode(array({mde_arr})) AS mde",
        )
        .selectExpr(
            "event_type",
            "mde",
            det6.format(x=p1, n="p_base"),
            det6.format(x=p2, n="p_treat"),
            f"CAST(CEIL({num} * {num}"
            f" / (({p2} - {p1}) * ({p2} - {p1}))) AS BIGINT)"
            " AS n_per_arm",
        )
        .orderBy("event_type", "mde")
    )


def _sql_sample_size_power() -> str:
    mde_vals = ", ".join(f"(CAST({m!r} AS DOUBLE))" for m in _PWR_MDES)
    p1 = "(CAST(u_conv AS DOUBLE) / CAST(u_all AS DOUBLE))"
    p2 = f"(LEAST({p1} * (1.0 + mde), 0.999999))"
    pbar = f"(({p1} + {p2}) / 2.0)"
    num = (
        f"({_PWR_Z_ALPHA!r} * SQRT(2.0 * {pbar} * (1.0 - {pbar}))"
        f" + {_PWR_Z_BETA!r} * SQRT({p1} * (1.0 - {p1})"
        f" + {p2} * (1.0 - {p2})))"
    )
    return f"""
WITH ud AS (
  SELECT event_type, user_id FROM events),
per_type AS (
  SELECT event_type,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS u_conv
  FROM ud GROUP BY 1),
tot AS (
  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS u_all
  FROM ud),
mdes (mde) AS (VALUES {mde_vals})
SELECT event_type, mde,
       CAST(FLOOR({p1} * 1e6 + 0.5) AS DOUBLE) / 1e6 AS p_base,
       CAST(FLOOR({p2} * 1e6 + 0.5) AS DOUBLE) / 1e6 AS p_treat,
       CAST(CEIL({num} * {num}
            / (({p2} - {p1}) * ({p2} - {p1}))) AS BIGINT) AS n_per_arm
FROM per_type CROSS JOIN tot CROSS JOIN mdes
ORDER BY event_type, mde
"""


SQL_SAMPLE_SIZE_POWER = _sql_sample_size_power()


def q_anova_oneway(spark, sf_dir):
    """One-way ANOVA of event value across event types — the
    parametric k-group location test the two-sample panel was
    missing (`ab_test_zscore` compares two arms; this asks "do ANY
    of the k types differ in mean spend" in one F statistic instead
    of k² pairwise z tests).

    Determinism: per-group sufficient statistics (n, Σcents,
    Σcents²) are exact integers summed in DECIMAL(38,0); the k-term
    Σ s_i²/n_i fold is a ≤|types|-term double sum (the
    `retrieval_eval` ≤k-term discipline — det6 absorbs the ≤4-ulp
    ordering slack); SSB/SSW/F are then one shared expression
    program on exact-derived doubles.

    Scale plan: ONE map-side-combinable hash-agg to |types| rows,
    then a single global fold of that KB-sized relation — no window,
    no join, no second pass over the events.  The per-type power
    sums are `moments_by_type` — the SAME additive state relation the
    streaming twin persists per batch (`streaming/timeseries.
    moments_batch_writer`), which also feeds `jarque_bera`."""
    ev = load_table(spark, sf_dir, "events")
    return anova_from_moments(moments_by_type(ev))


def moments_by_type(ev: DataFrame) -> DataFrame:
    """Per-event-type exact power sums Σc..Σc⁴ of value cents — the
    shared sufficient-statistic relation behind `anova_oneway` (uses
    n, s1, s2) and `jarque_bera` (all four), and the additive
    streaming-twin state (per-batch partials of this relation sum to
    it exactly)."""
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    cd = F.col("c").cast("decimal(19,0)")
    # first multiply happens in DECIMAL, not BIGINT: c*c as bigint
    # overflows the intermediate for |cents| beyond ~3e9 before the
    # decimal accumulator ever sees it (ADVICE r12) — cd*cd keeps the
    # documented DECIMAL(38,0) headroom on the per-row products
    c2d = (cd * cd).cast("decimal(38,0)")
    return (
        ev.select("event_type", cents.alias("c"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(cd).cast("decimal(38,0)").alias("s1"),
            F.sum(c2d).cast("decimal(38,0)").alias("s2"),
            F.sum(c2d * cd).cast("decimal(38,0)").alias("s3"),
            F.sum(c2d * c2d).cast("decimal(38,0)").alias("s4"),
        )
    )


def anova_from_moments(g: DataFrame) -> DataFrame:
    """The one-way-ANOVA solve over a `moments_by_type`-shaped
    relation (n, s1, s2 per group) — shared verbatim by the batch
    query and the streaming fold."""
    folded = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("n"),
        F.sum("s1").cast("double").alias("s"),
        F.sum("s2").cast("double").alias("ss2"),
        F.sum(
            F.pow(F.col("s1").cast("double"), F.lit(2.0))
            / F.col("n").cast("double")
        ).alias("sq_over_n"),
    )
    det6 = "CAST(FLOOR(({x}) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS {n}"
    ssb = "(sq_over_n - s * s / CAST(n AS DOUBLE))"
    ssw = "(ss2 - sq_over_n)"
    return folded.selectExpr(
        "k",
        "n",
        "CAST(k - 1 AS BIGINT) AS df_between",
        "CAST(n - k AS BIGINT) AS df_within",
        det6.format(x=f"{ssb} / 1e4", n="ss_between"),
        det6.format(x=f"{ssw} / 1e4", n="ss_within"),
        det6.format(
            x=f"({ssb} / CAST(k - 1 AS DOUBLE))"
            f" / ({ssw} / CAST(n - k AS DOUBLE))",
            n="f_stat",
        ),
    )


SQL_ANOVA_ONEWAY = """
WITH g AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_i,
         SUM(CAST(c AS HUGEINT)) AS s_i,
         SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS ss_i
  FROM (SELECT event_type,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
        FROM events)
  GROUP BY 1),
folded AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n_i) AS BIGINT) AS n,
         CAST(SUM(s_i) AS DOUBLE) AS s,
         CAST(SUM(ss_i) AS DOUBLE) AS ss2,
         SUM(POW(CAST(s_i AS DOUBLE), 2.0) / CAST(n_i AS DOUBLE))
           AS sq_over_n
  FROM g)
SELECT k, n,
       CAST(k - 1 AS BIGINT) AS df_between,
       CAST(n - k AS BIGINT) AS df_within,
       CAST(FLOOR(((sq_over_n - s * s / CAST(n AS DOUBLE)) / 1e4)
            * 1e6 + 0.5) AS DOUBLE) / 1e6 AS ss_between,
       CAST(FLOOR(((ss2 - sq_over_n) / 1e4) * 1e6 + 0.5)
            AS DOUBLE) / 1e6 AS ss_within,
       CAST(FLOOR((((sq_over_n - s * s / CAST(n AS DOUBLE))
                    / CAST(k - 1 AS DOUBLE))
                   / ((ss2 - sq_over_n) / CAST(n - k AS DOUBLE)))
            * 1e6 + 0.5) AS DOUBLE) / 1e6 AS f_stat
FROM folded
"""


def q_kruskal_wallis(spark, sf_dir):
    """Kruskal–Wallis H per event type across day-of-week groups —
    the k-group generalization of `mann_whitney_u` ("does spend
    differ by weekday", asked rank-wise so weekend whales can't buy
    the answer): H from doubled midranks, tie-corrected, χ²(k−1)
    under H₀.

    Exactness through ties: the `mann_whitney_u` machinery verbatim
    — doubled midrank mr2(v) = 2·cum(v−1) + t_v + 1 is an exact
    integer off the per-type cents histogram, so each weekday's rank
    sum R2_d = Σ c_d·mr2 is an exact int64 (≤ N(2N+1)); the tie term
    Σ(t³−t) rides DECIMAL.  The ≤7-term Σ (R2_d/2)²/n_d fold is the
    documented small-double-sum (det6 absorbs ordering slack); H and
    the tie correction are then one expression program.

    Scale plan: one hash-agg to the (type, dow, cents) grain, one to
    (type, cents), a TYPE-partitioned cumulative window over the
    value-domain-bounded histogram (never the event stream), two
    KB-relation folds.

    Measured (bench_one, fresh JVM, min-of-3, GC-each): sf1 1.88 s /
    sf10 3.17 s — 1.7×/decade; the cost is the (type, dow, cents)
    hash-agg, the histogram math is scale-free."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.weekday(F.to_date("ts")).cast("int").alias("dow"),
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    histd = base.groupBy("event_type", "dow", "cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    hist = histd.groupBy("event_type", "cents").agg(
        F.sum("c").cast("bigint").alias("t")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    mr = hist.withColumn(
        "mr2", 2 * F.sum("t").over(w) - F.col("t") + 1
    )
    per_dow = (
        histd.join(
            mr.select("event_type", "cents", "mr2"),
            ["event_type", "cents"],
        )
        .groupBy("event_type", "dow")
        .agg(
            F.sum("c").cast("bigint").alias("n_d"),
            F.sum(F.col("c") * F.col("mr2"))
            .cast("bigint")
            .alias("r2_d"),
        )
    )
    ties = mr.groupBy("event_type").agg(
        F.sum("t").cast("bigint").alias("n"),
        F.sum(
            F.col("t").cast("decimal(18,0)")
            * F.col("t").cast("decimal(18,0)")
            * F.col("t").cast("decimal(18,0)")
            - F.col("t").cast("decimal(18,0)")
        )
        .cast("decimal(38,0)")
        .alias("tie3"),
    )
    folded = per_dow.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(
            F.pow(
                F.col("r2_d").cast("double") / F.lit(2.0), F.lit(2.0)
            )
            / F.col("n_d").cast("double")
        ).alias("sum_r2n"),
    )
    nd = "CAST(n AS DOUBLE)"
    h_raw = (
        f"(12.0 / ({nd} * ({nd} + 1.0)) * sum_r2n"
        f" - 3.0 * ({nd} + 1.0))"
    )
    c_tie = (
        f"(1.0 - CAST(tie3 AS DOUBLE)"
        f" / ({nd} * {nd} * {nd} - {nd}))"
    )
    return (
        folded.join(F.broadcast(ties), "event_type")
        .selectExpr(
            "event_type",
            "n",
            "k",
            "CAST(k - 1 AS BIGINT) AS df",
            f"CAST(FLOOR({h_raw} / {c_tie} * 1e6 + 0.5) AS DOUBLE)"
            " / 1e6 AS h_stat",
        )
        .orderBy("event_type")
    )


SQL_KRUSKAL_WALLIS = """
WITH base AS (
  SELECT event_type,
         CAST(isodow(CAST(ts AS DATE)) - 1 AS INT) AS dow,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events),
histd AS (
  SELECT event_type, dow, cents, CAST(COUNT(*) AS BIGINT) AS c
  FROM base GROUP BY 1, 2, 3),
hist AS (
  SELECT event_type, cents, CAST(SUM(c) AS BIGINT) AS t
  FROM histd GROUP BY 1, 2),
mr AS (
  SELECT event_type, cents, t,
         2 * SUM(t) OVER (PARTITION BY event_type ORDER BY cents
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - t + 1 AS mr2
  FROM hist),
per_dow AS (
  SELECT h.event_type, h.dow,
         CAST(SUM(h.c) AS BIGINT) AS n_d,
         CAST(SUM(h.c * m.mr2) AS BIGINT) AS r2_d
  FROM histd h JOIN mr m
    ON h.event_type = m.event_type AND h.cents = m.cents
  GROUP BY 1, 2),
ties AS (
  SELECT event_type,
         CAST(SUM(t) AS BIGINT) AS n,
         SUM(CAST(t AS HUGEINT) * CAST(t AS HUGEINT)
             * CAST(t AS HUGEINT) - CAST(t AS HUGEINT)) AS tie3
  FROM mr GROUP BY 1),
folded AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS k,
         SUM(POW(CAST(r2_d AS DOUBLE) / 2.0, 2.0)
             / CAST(n_d AS DOUBLE)) AS sum_r2n
  FROM per_dow GROUP BY 1)
SELECT f.event_type, t.n, f.k,
       CAST(f.k - 1 AS BIGINT) AS df,
       CAST(FLOOR((12.0 / (CAST(t.n AS DOUBLE)
                   * (CAST(t.n AS DOUBLE) + 1.0)) * f.sum_r2n
                   - 3.0 * (CAST(t.n AS DOUBLE) + 1.0))
                  / (1.0 - CAST(t.tie3 AS DOUBLE)
                     / (CAST(t.n AS DOUBLE) * CAST(t.n AS DOUBLE)
                        * CAST(t.n AS DOUBLE) - CAST(t.n AS DOUBLE)))
                  * 1e6 + 0.5) AS DOUBLE) / 1e6 AS h_stat
FROM folded f JOIN ties t USING (event_type)
ORDER BY f.event_type
"""


def q_jarque_bera(spark, sf_dir):
    """Jarque–Bera normality test per event type — skewness/kurtosis
    based (the moments the panel already trusts), χ²(2) under H₀:
    JB = n/6 · (S² + (K−3)²/4).  The gate in front of every test
    that ASSUMES normality (`ab_test_zscore`, `cuped_adjustment`'s
    variance math): run this first, and if it rejects, reach for the
    rank tests instead.

    Determinism: the four raw power sums Σc..Σc⁴ are exact integers
    (cents in DECIMAL(38,0); c⁴ ≤ 10¹⁹ per row, 10²⁸ summed at 10⁹
    rows — in range); central moments, S, K, and JB are one shared
    expression program on the exact-derived doubles — cents scaling
    cancels in S and K, so no unit appears anywhere.

    Scale plan: ONE map-side-combinable hash-agg pass (four decimal
    accumulators per type — `moments_by_type`, shared with
    `anova_oneway` and persisted per batch by the streaming twin);
    everything after runs on |types| rows."""
    ev = load_table(spark, sf_dir, "events")
    return jarque_bera_from_moments(moments_by_type(ev))


def jarque_bera_from_moments(g: DataFrame) -> DataFrame:
    """The JB solve over a `moments_by_type`-shaped relation —
    shared verbatim by the batch query and the streaming fold.  The
    exact decimal sums cast to double here, at solve time, so batch
    and stream hand identical integers to identical expressions."""
    g = g.select(
        "event_type",
        "n",
        F.col("s1").cast("double").alias("s1"),
        F.col("s2").cast("double").alias("s2"),
        F.col("s3").cast("double").alias("s3"),
        F.col("s4").cast("double").alias("s4"),
    )
    nd = "CAST(n AS DOUBLE)"
    m = f"(s1 / {nd})"
    mu2 = f"(s2 / {nd} - {m} * {m})"
    mu3 = f"(s3 / {nd} - 3.0 * {m} * s2 / {nd} + 2.0 * {m} * {m} * {m})"
    mu4 = (
        f"(s4 / {nd} - 4.0 * {m} * s3 / {nd}"
        f" + 6.0 * {m} * {m} * s2 / {nd}"
        f" - 3.0 * {m} * {m} * {m} * {m})"
    )
    skew = f"({mu3} / POW({mu2}, 1.5))"
    kurt = f"({mu4} / ({mu2} * {mu2}))"
    jb = (
        f"({nd} / 6.0 * ({skew} * {skew}"
        f" + ({kurt} - 3.0) * ({kurt} - 3.0) / 4.0))"
    )
    det6 = "CAST(FLOOR(({x}) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS {n}"
    return g.selectExpr(
        "event_type",
        "n",
        det6.format(x=skew, n="skewness"),
        det6.format(x=f"{kurt} - 3.0", n="kurtosis_excess"),
        det6.format(x=jb, n="jb_stat"),
        f"{jb} > 5.991464547107979 AS reject_normal_5pct",
    ).orderBy("event_type")


def _sql_jarque_bera() -> str:
    nd = "CAST(n AS DOUBLE)"
    m = f"(s1 / {nd})"
    mu2 = f"(s2 / {nd} - {m} * {m})"
    mu3 = f"(s3 / {nd} - 3.0 * {m} * s2 / {nd} + 2.0 * {m} * {m} * {m})"
    mu4 = (
        f"(s4 / {nd} - 4.0 * {m} * s3 / {nd}"
        f" + 6.0 * {m} * {m} * s2 / {nd}"
        f" - 3.0 * {m} * {m} * {m} * {m})"
    )
    skew = f"({mu3} / POW({mu2}, 1.5))"
    kurt = f"({mu4} / ({mu2} * {mu2}))"
    jb = (
        f"({nd} / 6.0 * ({skew} * {skew}"
        f" + ({kurt} - 3.0) * ({kurt} - 3.0) / 4.0))"
    )
    return f"""
WITH g AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(c AS HUGEINT)) AS DOUBLE) AS s1,
         CAST(SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT))
              AS DOUBLE) AS s2,
         CAST(SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)
              * CAST(c AS HUGEINT)) AS DOUBLE) AS s3,
         CAST(SUM((CAST(c AS HUGEINT) * CAST(c AS HUGEINT))
              * (CAST(c AS HUGEINT) * CAST(c AS HUGEINT)))
              AS DOUBLE) AS s4
  FROM (SELECT event_type,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
        FROM events)
  GROUP BY 1)
SELECT event_type, n,
       CAST(FLOOR(({skew}) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS skewness,
       CAST(FLOOR(({kurt} - 3.0) * 1e6 + 0.5) AS DOUBLE) / 1e6
         AS kurtosis_excess,
       CAST(FLOOR(({jb}) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS jb_stat,
       {jb} > 5.991464547107979 AS reject_normal_5pct
FROM g
ORDER BY event_type
"""


SQL_JARQUE_BERA = _sql_jarque_bera()


# -- round 13: the k-group panel's missing tests and multiplicity ------------


def _norm_two_sided_p(z: str) -> str:
    """Two-sided normal p-value 2·Φ(−|z|) as one expression — the
    Abramowitz–Stegun 26.2.17 polynomial (|ε| < 7.5e-8), spelled
    IDENTICALLY for Spark SQL and DuckDB so both engines run the
    same double program (neither has a normal CDF builtin)."""
    az = f"ABS({z})"
    t = f"(1.0 / (1.0 + 0.2316419 * {az}))"
    pdf = f"(EXP(-({az}) * ({az}) / 2.0) * 0.3989422804014327)"
    poly = (
        f"({t} * (0.319381530 + {t} * (-0.356563782 + {t} *"
        f" (1.781477937 + {t} * (-1.821255978 + {t} * 1.330274429)))))"
    )
    return f"LEAST(1.0, 2.0 * {pdf} * {poly})"


def q_welch_anova(spark, sf_dir):
    """Welch's heteroscedastic one-way ANOVA across event types
    (Welch 1951) — the k-group location test `anova_oneway` users
    reach for when `levene_test` rejects equal variances: weights
    wᵢ = nᵢ/vᵢ, F* = Σwᵢ(mᵢ−x̄w)²/(k−1) over the Welch denominator,
    with the Welch–Satterthwaite df₂.

    Determinism: per-type (n, mean, var) come from the SAME exact
    decimal power sums as `anova_oneway` (`moments_by_type` — so the
    streaming moments state feeds this too); the k-term folds are
    plain double sums (the `anova_oneway` precedent), det6 outputs.

    Scale plan: one map-side-combinable moments pass; the Welch
    algebra runs on ONE row of k-term sums — Σw, Σwm, Σwm², and the
    three expanded Σ(1−w/W)²/(n−1) pieces fold in the same agg, so
    no second pass and no scalar re-join."""
    ev = load_table(spark, sf_dir, "events")
    return welch_from_moments(moments_by_type(ev))


def welch_from_moments(g) -> "DataFrame":
    """The Welch solve over a `moments_by_type`-shaped relation —
    shared by the batch query and the streaming fold."""
    per = g.selectExpr(
        "event_type",
        "n",
        "CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m",
        "(CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)"
        " / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS v",
    ).where("n >= 2 AND v > 0")
    folded = per.selectExpr(
        "CAST(n AS DOUBLE) / v AS w",
        "m",
        "n",
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(F.col("n")).cast("bigint").alias("n_total"),
        F.sum("w").alias("s0"),
        F.sum(F.col("w") * F.col("m")).alias("s1"),
        F.sum(F.col("w") * F.col("m") * F.col("m")).alias("s2"),
        F.sum(F.expr("1.0 / (CAST(n AS DOUBLE) - 1.0)")).alias("d1"),
        F.sum(F.expr("w / (CAST(n AS DOUBLE) - 1.0)")).alias("d2"),
        F.sum(F.expr("w * w / (CAST(n AS DOUBLE) - 1.0)")).alias("d3"),
    )
    det6 = "CAST(FLOOR(({x}) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS {n}"
    kd = "CAST(k AS DOUBLE)"
    c = "(d1 - 2.0 * d2 / s0 + d3 / (s0 * s0))"
    a_num = f"((s2 - s1 * s1 / s0) / ({kd} - 1.0))"
    b_den = f"(1.0 + 2.0 * ({kd} - 2.0) / ({kd} * {kd} - 1.0) * {c})"
    return folded.selectExpr(
        "k",
        "n_total",
        "CAST(k - 1 AS BIGINT) AS df1",
        det6.format(x=f"({kd} * {kd} - 1.0) / (3.0 * {c})", n="df2"),
        det6.format(x=f"{a_num} / {b_den}", n="f_stat"),
    )


SQL_WELCH_ANOVA = """
WITH g AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(c AS HUGEINT)) AS DOUBLE) AS s1,
         CAST(SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT))
              AS DOUBLE) AS s2
  FROM (SELECT event_type,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
        FROM events)
  GROUP BY 1),
per AS (
  SELECT event_type, n,
         s1 / CAST(n AS DOUBLE) AS m,
         (s2 - s1 * s1 / CAST(n AS DOUBLE))
           / (CAST(n AS DOUBLE) - 1.0) AS v
  FROM g
  WHERE n >= 2
    AND (s2 - s1 * s1 / CAST(n AS DOUBLE))
        / (CAST(n AS DOUBLE) - 1.0) > 0),
folded AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n) AS BIGINT) AS n_total,
         SUM(CAST(n AS DOUBLE) / v) AS s0,
         SUM(CAST(n AS DOUBLE) / v * m) AS s1,
         SUM(CAST(n AS DOUBLE) / v * m * m) AS s2,
         SUM(1.0 / (CAST(n AS DOUBLE) - 1.0)) AS d1,
         SUM(CAST(n AS DOUBLE) / v / (CAST(n AS DOUBLE) - 1.0)) AS d2,
         SUM(CAST(n AS DOUBLE) / v * (CAST(n AS DOUBLE) / v)
             / (CAST(n AS DOUBLE) - 1.0)) AS d3
  FROM per)
SELECT k,
       n_total,
       CAST(k - 1 AS BIGINT) AS df1,
       CAST(FLOOR(((CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0)
            / (3.0 * (d1 - 2.0 * d2 / s0 + d3 / (s0 * s0))))
            * 1e6 + 0.5) AS DOUBLE) / 1e6 AS df2,
       CAST(FLOOR((((s2 - s1 * s1 / s0) / (CAST(k AS DOUBLE) - 1.0))
            / (1.0 + 2.0 * (CAST(k AS DOUBLE) - 2.0)
               / (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0)
               * (d1 - 2.0 * d2 / s0 + d3 / (s0 * s0))))
            * 1e6 + 0.5) AS DOUBLE) / 1e6 AS f_stat
FROM folded
"""


def q_levene_test(spark, sf_dir):
    """Brown–Forsythe variance-homogeneity test across event types
    (Levene 1960; Brown & Forsythe 1974 median variant — the robust
    form every stats package defaults to): one-way ANOVA on the
    absolute deviations from each group's MEDIAN.  The gate in front
    of `anova_oneway` (equal variances assumed) vs `welch_anova`.

    Determinism: deviations are EXACT integers in doubled cents —
    the median of integers is a half-integer, so z₂ = |2c − 2·med|
    is a bigint and Σz₂/Σz₂² are exact (decimal accumulators, the
    `moments_by_type` discipline); the F fold is the `anova_oneway`
    expression program, det6; the ×2 scaling cancels in F.  The
    doubled median comes off the cumulative cents histogram (lower +
    upper order statistic), identical to 2·percentile(c, 0.5).

    Scale plan: the corpus is touched ONCE — one map-side-combinable
    hash-agg to the (type, cents) histogram (the `mann_whitney`
    value-domain-bounded discipline); the medians, the deviation
    sums, and the F fold all run on the histogram, whose size is
    bounded by the VALUE DOMAIN, never the row count.  (The first
    cut ran exact-percentile + a second corpus deviation pass —
    3.3×/decade, the round's worst curve; this is the single-scan
    form.)"""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("c"),
    )
    hist = ev.groupBy("event_type", "c").agg(
        F.count(F.lit(1)).cast("bigint").alias("t")
    )
    from pyspark.sql import Window

    wcum = Window.partitionBy("event_type").orderBy("c")
    cum = hist.withColumn("cum", F.sum("t").over(wcum)).withColumn(
        "nn", F.sum("t").over(Window.partitionBy("event_type"))
    )
    # lower/upper median order statistics: ranks (n+1) DIV 2 and
    # n DIV 2 + 1 (equal when n is odd); med2 = c_lo + c_hi
    med = cum.groupBy("event_type").agg(
        (
            F.min(
                F.when(
                    F.col("cum") >= F.expr("(nn + 1) DIV 2"), F.col("c")
                )
            )
            + F.min(
                F.when(
                    F.col("cum") >= F.expr("nn DIV 2 + 1"), F.col("c")
                )
            )
        )
        .cast("bigint")
        .alias("med2")
    )
    z = hist.join(F.broadcast(med), "event_type").select(
        "event_type",
        "t",
        F.abs(2 * F.col("c") - F.col("med2")).alias("z2"),
    )
    z2d = F.col("z2").cast("decimal(19,0)")
    td = F.col("t").cast("decimal(19,0)")
    g = z.groupBy("event_type").agg(
        F.sum("t").cast("bigint").alias("n"),
        F.sum((z2d * td).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("s1"),
        F.sum((z2d * z2d * td).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    folded = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("n"),
        F.sum(F.col("s1").cast("double")).alias("s"),
        F.sum(F.col("s2").cast("double")).alias("ss2"),
        F.sum(
            F.pow(F.col("s1").cast("double"), F.lit(2.0))
            / F.col("n").cast("double")
        ).alias("sq_over_n"),
    )
    det6 = "CAST(FLOOR(({x}) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS {n}"
    ssb = "(sq_over_n - s * s / CAST(n AS DOUBLE))"
    ssw = "(ss2 - sq_over_n)"
    return folded.selectExpr(
        "k",
        "n",
        "CAST(k - 1 AS BIGINT) AS df_between",
        "CAST(n - k AS BIGINT) AS df_within",
        # zero within-group deviation variance (every |x − med|
        # identical inside each group) leaves F undefined — NULL,
        # same CASE in the oracle
        det6.format(
            x=f"CASE WHEN {ssw} > 0.0 THEN"
            f" ({ssb} / CAST(k - 1 AS DOUBLE))"
            f" / ({ssw} / CAST(n - k AS DOUBLE))"
            " ELSE NULL END",
            n="f_stat",
        ),
    )


SQL_LEVENE_TEST = """
WITH ev AS (
  SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
  FROM events),
med AS (
  SELECT event_type,
         CAST(ROUND(2.0 * quantile_cont(c, 0.5)) AS BIGINT) AS med2
  FROM ev GROUP BY 1),
z AS (
  SELECT ev.event_type, ABS(2 * ev.c - med.med2) AS z2
  FROM ev JOIN med USING (event_type)),
g AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(z2 AS HUGEINT)) AS s1,
         SUM(CAST(z2 AS HUGEINT) * CAST(z2 AS HUGEINT)) AS s2
  FROM z GROUP BY 1),
folded AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n) AS BIGINT) AS n,
         CAST(SUM(s1) AS DOUBLE) AS s,
         CAST(SUM(s2) AS DOUBLE) AS ss2,
         SUM(POW(CAST(s1 AS DOUBLE), 2.0) / CAST(n AS DOUBLE))
           AS sq_over_n
  FROM g)
SELECT k, n,
       CAST(k - 1 AS BIGINT) AS df_between,
       CAST(n - k AS BIGINT) AS df_within,
       CAST(FLOOR((CASE WHEN (ss2 - sq_over_n) > 0.0 THEN
            ((sq_over_n - s * s / CAST(n AS DOUBLE))
            / CAST(k - 1 AS DOUBLE))
            / ((ss2 - sq_over_n) / CAST(n - k AS DOUBLE))
            ELSE NULL END)
            * 1e6 + 0.5) AS DOUBLE) / 1e6 AS f_stat
FROM folded
"""


def q_cohens_d_pairs(spark, sf_dir):
    """Pairwise effect sizes between event types — Cohen's d on the
    pooled SD plus the small-sample Hedges' g correction (Cohen
    1988; Hedges 1981): the magnitude panel behind the significance
    panel (`anova_oneway` says SOME pair differs; this says by how
    much, in SD units, for every pair).

    Determinism: per-type (n, mean, var) from the exact
    `moments_by_type` decimal sums; d and g are closed-form on the
    derived doubles, det6; cents scaling cancels in d.

    Scale plan: one moments pass, then the pair grid is generated
    MAP-SIDE from the k-row sorted array (the `basket_lift`
    discipline — no self-join, no BNLJ), k(k−1)/2 ≤ dozens of rows."""
    ev = load_table(spark, sf_dir, "events")
    per = moments_by_type(ev).selectExpr(
        "event_type",
        "n",
        "CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m",
        "(CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)"
        " / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS v",
    ).where("n >= 2")
    det6 = "CAST(FLOOR(({x}) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS {n}"
    sp = (
        "SQRT(((CAST(p.a.n AS DOUBLE) - 1.0) * p.a.v"
        " + (CAST(p.b.n AS DOUBLE) - 1.0) * p.b.v)"
        " / (CAST(p.a.n + p.b.n AS DOUBLE) - 2.0))"
    )
    d = f"((p.a.m - p.b.m) / {sp})"
    corr = "(1.0 - 3.0 / (4.0 * CAST(p.a.n + p.b.n AS DOUBLE) - 9.0))"
    return (
        per.agg(
            F.expr(
                "array_sort(collect_list(named_struct("
                "'event_type', event_type, 'n', n, 'm', m, 'v', v)))"
            ).alias("ts")
        )
        .selectExpr(
            """EXPLODE(FLATTEN(TRANSFORM(ts, (x, i) ->
                 TRANSFORM(slice(ts, i + 2, size(ts) - i - 1),
                           y -> named_struct('a', x, 'b', y))))) AS p"""
        )
        .selectExpr(
            "p.a.event_type AS type_a",
            "p.b.event_type AS type_b",
            "p.a.n AS n_a",
            "p.b.n AS n_b",
            det6.format(x=d, n="cohens_d"),
            det6.format(x=f"{d} * {corr}", n="hedges_g"),
        )
        .orderBy("type_a", "type_b")
    )


SQL_COHENS_D_PAIRS = """
WITH g AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(c AS HUGEINT)) AS DOUBLE) AS s1,
         CAST(SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT))
              AS DOUBLE) AS s2
  FROM (SELECT event_type,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
        FROM events)
  GROUP BY 1),
per AS (
  SELECT event_type, n,
         s1 / CAST(n AS DOUBLE) AS m,
         (s2 - s1 * s1 / CAST(n AS DOUBLE))
           / (CAST(n AS DOUBLE) - 1.0) AS v
  FROM g WHERE n >= 2)
SELECT a.event_type AS type_a,
       b.event_type AS type_b,
       a.n AS n_a,
       b.n AS n_b,
       CAST(FLOOR(((a.m - b.m)
            / SQRT(((CAST(a.n AS DOUBLE) - 1.0) * a.v
                    + (CAST(b.n AS DOUBLE) - 1.0) * b.v)
                   / (CAST(a.n + b.n AS DOUBLE) - 2.0)))
            * 1e6 + 0.5) AS DOUBLE) / 1e6 AS cohens_d,
       CAST(FLOOR(((a.m - b.m)
            / SQRT(((CAST(a.n AS DOUBLE) - 1.0) * a.v
                    + (CAST(b.n AS DOUBLE) - 1.0) * b.v)
                   / (CAST(a.n + b.n AS DOUBLE) - 2.0))
            * (1.0 - 3.0 / (4.0 * CAST(a.n + b.n AS DOUBLE) - 9.0)))
            * 1e6 + 0.5) AS DOUBLE) / 1e6 AS hedges_g
FROM per a JOIN per b ON a.event_type < b.event_type
ORDER BY type_a, type_b
"""


def q_bh_fdr(spark, sf_dir):
    """Benjamini–Hochberg FDR correction over the per-type
    weekend-effect z-test panel (Benjamini & Hochberg 1995) — the
    multiplicity layer the experiment panel was missing: running k
    per-type tests at α=0.05 inflates false positives; BH adjusts
    each p to the step-up bound min_{j≥i}(p_(j)·k/j).

    Determinism: the per-type z comes from exact integer cents sums
    (weekend vs weekday split on the shared weekday() convention);
    p = 2·Φ(−|z|) via the Abramowitz–Stegun polynomial spelled
    identically in both engines; the step-up runs over the k-row
    sorted ARRAY (no unpartitioned window), ties broken by type.

    Scale plan: one corpus hash-agg to (type, is_weekend) cells,
    k-row array math after."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.weekday(F.to_date("ts")) >= 5).alias("wk"),
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("c"),
    )
    cells = ev.groupBy("event_type", "wk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("c").cast("decimal(19,0)"))
        .cast("decimal(38,0)")
        .alias("s1"),
        F.sum(
            (F.col("c").cast("decimal(19,0)")
             * F.col("c").cast("decimal(19,0)")).cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    side = (
        "CAST(SUM(CASE WHEN wk THEN {col} ELSE 0 END) AS DOUBLE)"
    )
    nside = (
        "CAST(SUM(CASE WHEN NOT wk THEN {col} ELSE 0 END) AS DOUBLE)"
    )
    per = cells.groupBy("event_type").agg(
        F.expr(side.format(col="n")).alias("n_w"),
        F.expr(side.format(col="s1")).alias("s1_w"),
        F.expr(side.format(col="s2")).alias("s2_w"),
        F.expr(nside.format(col="n")).alias("n_d"),
        F.expr(nside.format(col="s1")).alias("s1_d"),
        F.expr(nside.format(col="s2")).alias("s2_d"),
    ).where("n_w >= 2 AND n_d >= 2")
    z = (
        "((s1_w / n_w - s1_d / n_d) / SQRT("
        "((s2_w - s1_w * s1_w / n_w) / (n_w - 1.0)) / n_w"
        " + ((s2_d - s1_d * s1_d / n_d) / (n_d - 1.0)) / n_d))"
    )
    p = _norm_two_sided_p(z)
    det6 = "CAST(FLOOR(({x}) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS {n}"
    scored = per.selectExpr(
        "event_type", f"{z} AS z", f"{p} AS p_raw"
    )
    # BH step-up on the k-row sorted array: adj_i = min over j >= i
    # of min(1, p_(j) * k / j) — O(k²) slices, k = |types|
    return (
        scored.agg(
            F.expr(
                "array_sort(collect_list(named_struct("
                "'p', p_raw, 'event_type', event_type, 'z', z)))"
            ).alias("a")
        )
        .selectExpr(
            "a",
            "size(a) AS k",
            """TRANSFORM(a, (x, i) -> array_min(
                 TRANSFORM(slice(a, i + 1, size(a) - i),
                   (y, j) -> LEAST(1.0, y.p * CAST(size(a) AS DOUBLE)
                                        / CAST(i + j + 1 AS DOUBLE)))))
               AS adj""",
        )
        .selectExpr(
            "EXPLODE(TRANSFORM(a, (x, i) -> named_struct("
            "'event_type', x.event_type, 'z', x.z, 'p', x.p,"
            "'p_bh', adj[i]))) AS r"
        )
        .selectExpr(
            "r.event_type",
            det6.format(x="r.z", n="z_score"),
            det6.format(x="r.p", n="p_raw"),
            det6.format(x="r.p_bh", n="p_bh"),
            "r.p_bh <= 0.05 AS reject_q05",
        )
        .orderBy("event_type")
    )


def _sql_bh_fdr() -> str:
    z = (
        "((s1_w / n_w - s1_d / n_d) / SQRT("
        "((s2_w - s1_w * s1_w / n_w) / (n_w - 1.0)) / n_w"
        " + ((s2_d - s1_d * s1_d / n_d) / (n_d - 1.0)) / n_d))"
    )
    p = _norm_two_sided_p(z)
    return f"""
WITH ev AS (
  SELECT event_type,
         isodow(CAST(ts AS DATE)) - 1 >= 5 AS wk,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
  FROM events),
cells AS (
  SELECT event_type, wk,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(c AS HUGEINT)) AS s1,
         SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS s2
  FROM ev GROUP BY 1, 2),
per AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN wk THEN n ELSE 0 END) AS DOUBLE) AS n_w,
         CAST(SUM(CASE WHEN wk THEN s1 ELSE 0 END) AS DOUBLE) AS s1_w,
         CAST(SUM(CASE WHEN wk THEN s2 ELSE 0 END) AS DOUBLE) AS s2_w,
         CAST(SUM(CASE WHEN NOT wk THEN n ELSE 0 END) AS DOUBLE)
           AS n_d,
         CAST(SUM(CASE WHEN NOT wk THEN s1 ELSE 0 END) AS DOUBLE)
           AS s1_d,
         CAST(SUM(CASE WHEN NOT wk THEN s2 ELSE 0 END) AS DOUBLE)
           AS s2_d
  FROM cells GROUP BY 1
  HAVING SUM(CASE WHEN wk THEN n ELSE 0 END) >= 2
     AND SUM(CASE WHEN NOT wk THEN n ELSE 0 END) >= 2),
scored AS (
  SELECT event_type, {z} AS z, {p} AS p_raw FROM per),
ranked AS (
  SELECT event_type, z, p_raw,
         ROW_NUMBER() OVER (ORDER BY p_raw, event_type) AS rn,
         COUNT(*) OVER () AS k
  FROM scored),
adj AS (
  SELECT event_type, z, p_raw,
         MIN(LEAST(1.0, p_raw * CAST(k AS DOUBLE)
                        / CAST(rn AS DOUBLE)))
           OVER (ORDER BY rn DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS p_bh
  FROM ranked)
SELECT event_type,
       CAST(FLOOR(z * 1e6 + 0.5) AS DOUBLE) / 1e6 AS z_score,
       CAST(FLOOR(p_raw * 1e6 + 0.5) AS DOUBLE) / 1e6 AS p_raw,
       CAST(FLOOR(p_bh * 1e6 + 0.5) AS DOUBLE) / 1e6 AS p_bh,
       p_bh <= 0.05 AS reject_q05
FROM adj
ORDER BY event_type
"""


SQL_BH_FDR = _sql_bh_fdr()


def q_friedman_test(spark, sf_dir):
    """Friedman rank test (Friedman 1937) — the blocked k-group
    test the panel was missing: days are BLOCKS, event types are
    treatments, daily counts rank WITHIN each day, so day-level
    shocks (weekends, outages) cancel where `kruskal_wallis` would
    absorb them into the group comparison.  Tie-corrected statistic
    Q/C with C = 1 − Σ(t³−t)/(nk(k²−1)), χ²(k−1) under H₀.

    Determinism: average ranks over bigint counts are exact
    half-integers; R_j sums and the tie term are exact; Q is one
    closed-form det6 expression.  Only days where ALL k types appear
    are blocks (same filter in both engines).

    Scale plan: ranks come from a day-PARTITIONED window over the
    span-bounded daily relation; the global type count is a 1-row
    broadcast (the Q11 scalar shape)."""
    from pyspark.sql import Window

    daily = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.to_date("ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    k1 = daily.agg(
        F.count_distinct("event_type").cast("bigint").alias("k")
    )
    complete = (
        daily.groupBy("day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nt"))
        .join(F.broadcast(k1), F.col("nt") == F.col("k"))
        .select("day", "k")
    )
    wd = Window.partitionBy("day").orderBy("y")
    ranked = (
        daily.join(complete, "day")
        .withColumn("r_lo", F.rank().over(wd))
        .withColumn(
            "t", F.count(F.lit(1)).over(Window.partitionBy("day", "y"))
        )
        .select(
            "event_type",
            "day",
            "y",
            "k",
            (F.col("r_lo") + (F.col("t") - 1) / 2.0).alias("r"),
            "t",
        )
    )
    rj = ranked.groupBy("event_type", "k").agg(
        F.sum("r").alias("rj"), F.count(F.lit(1)).cast("bigint").alias("n")
    )
    # one row per tie GROUP: distinct on (day, y) — distinct on
    # (day, t) would collapse two same-sized tie groups in one day
    ties = (
        ranked.selectExpr("day", "CAST(y AS BIGINT) AS y", "t")
        .distinct()
        .agg(
            F.sum(
                F.col("t") * F.col("t") * F.col("t") - F.col("t")
            )
            .cast("bigint")
            .alias("tie_term")
        )
    )
    folded = rj.groupBy("k").agg(
        F.min("n").cast("bigint").alias("n_blocks"),
        F.sum(F.col("rj") * F.col("rj")).alias("sum_rj2"),
    )
    det6 = "CAST(FLOOR(({x}) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS {n}"
    kd = "CAST(k AS DOUBLE)"
    nd = "CAST(n_blocks AS DOUBLE)"
    q = (
        f"(12.0 / ({nd} * {kd} * ({kd} + 1.0)) * sum_rj2"
        f" - 3.0 * {nd} * ({kd} + 1.0))"
    )
    corr = (
        f"(1.0 - CAST(tie_term AS DOUBLE)"
        f" / ({nd} * {kd} * ({kd} * {kd} - 1.0)))"
    )
    return folded.crossJoin(F.broadcast(ties)).selectExpr(
        "k",
        "n_blocks",
        det6.format(x=q, n="q_stat"),
        # all-values-tied blocks drive the correction to 0 — the
        # statistic is undefined there, ship NULL (both engines)
        det6.format(
            x=f"CASE WHEN {corr} > 0.0 THEN {q} / {corr}"
            " ELSE NULL END",
            n="q_corrected",
        ),
    )


SQL_FRIEDMAN_TEST = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2),
k1 AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k
       FROM daily),
complete AS (
  SELECT day, k1.k
  FROM (SELECT day, COUNT(*) AS nt FROM daily GROUP BY 1), k1
  WHERE nt = k1.k),
ranked AS (
  SELECT d.event_type, d.day, d.y, c.k,
         RANK() OVER (PARTITION BY d.day ORDER BY d.y)
           + (COUNT(*) OVER (PARTITION BY d.day, d.y) - 1) / 2.0
           AS r,
         COUNT(*) OVER (PARTITION BY d.day, d.y) AS t
  FROM daily d JOIN complete c USING (day)),
rj AS (
  SELECT event_type, k, SUM(r) AS rj,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM ranked GROUP BY 1, 2),
ties AS (
  SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie_term
  FROM (SELECT DISTINCT day, y, t FROM ranked)),
folded AS (
  SELECT k, CAST(MIN(n) AS BIGINT) AS n_blocks,
         SUM(rj * rj) AS sum_rj2
  FROM rj GROUP BY 1)
SELECT k,
       n_blocks,
       CAST(FLOOR((12.0 / (CAST(n_blocks AS DOUBLE) * CAST(k AS DOUBLE)
            * (CAST(k AS DOUBLE) + 1.0)) * sum_rj2
            - 3.0 * CAST(n_blocks AS DOUBLE)
            * (CAST(k AS DOUBLE) + 1.0)) * 1e6 + 0.5)
            AS DOUBLE) / 1e6 AS q_stat,
       CAST(FLOOR((CASE WHEN (1.0 - CAST(tie_term AS DOUBLE)
            / (CAST(n_blocks AS DOUBLE) * CAST(k AS DOUBLE)
               * (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0))) > 0.0
            THEN (12.0 / (CAST(n_blocks AS DOUBLE)
            * CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0)) * sum_rj2
            - 3.0 * CAST(n_blocks AS DOUBLE)
            * (CAST(k AS DOUBLE) + 1.0))
            / (1.0 - CAST(tie_term AS DOUBLE)
               / (CAST(n_blocks AS DOUBLE) * CAST(k AS DOUBLE)
                  * (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0)))
            ELSE NULL END)
            * 1e6 + 0.5) AS DOUBLE) / 1e6 AS q_corrected
FROM folded, ties
"""


#: permutation-test resample count (day-label reshuffles)
_PERM_B = 200


def q_permutation_test(spark, sf_dir):
    """Approximate permutation test of the weekend effect per event
    type (Fisher 1935; the day-relabeling Monte Carlo form) — the
    assumption-free check of `bh_fdr`'s z-test on the SAME
    hypothesis: for each of {b} deterministic resamples, days are
    relabeled weekend/weekday by a salted hash at the true 2/7 rate,
    the mean-difference statistic recomputed, and
    p = (1 + #{{|T_b| ≥ |T_obs|}})/(B+1) (the add-one unbiased
    estimator, Phipson & Smyth 2010).

    Determinism: the relabeling is the shared md5 portable hash of
    the day string + salt 'perm<b>' — identical draws in both
    engines; means are exact-integer sums over bigint daily counts
    divided once, so every comparison is bit-identical.

    Scale plan: the resample explode runs on the DAY-SPAN-bounded
    daily relation (≤3653 rows per type), never the corpus — B×span
    ≤ ~0.7M rows per type at 10 years; one hash-agg each side."""
    daily = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.to_date("ts").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    obs = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.expr(
            "CAST(SUM(CASE WHEN weekday(day) >= 5 THEN y ELSE 0 END)"
            " AS DOUBLE)"
            " / SUM(CASE WHEN weekday(day) >= 5 THEN 1 ELSE 0 END)"
            " - CAST(SUM(CASE WHEN weekday(day) < 5 THEN y ELSE 0 END)"
            " AS DOUBLE)"
            " / SUM(CASE WHEN weekday(day) < 5 THEN 1 ELSE 0 END)"
        ).alias("t_obs"),
    )
    lab = (
        "CAST(conv(substring(md5(concat(CAST(day AS STRING),"
        " 'perm', CAST(b AS STRING))), 1, 15), 16, 10) AS BIGINT)"
        " % 7 < 2"
    )
    resamples = (
        daily.selectExpr(
            "event_type",
            "day",
            "y",
            f"explode(sequence(0, {_PERM_B - 1})) AS b",
        )
        .selectExpr("event_type", "b", "y", f"{lab} AS wk")
        .groupBy("event_type", "b")
        .agg(
            F.expr(
                "CAST(SUM(CASE WHEN wk THEN y ELSE 0 END) AS DOUBLE)"
                " / SUM(CASE WHEN wk THEN 1 ELSE 0 END)"
                " - CAST(SUM(CASE WHEN NOT wk THEN y ELSE 0 END)"
                " AS DOUBLE)"
                " / SUM(CASE WHEN NOT wk THEN 1 ELSE 0 END)"
            ).alias("t_b")
        )
    )
    det6 = "CAST(FLOOR(({x}) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS {n}"
    return (
        resamples.join(F.broadcast(obs), "event_type")
        .groupBy("event_type")
        .agg(
            F.min("n_days").cast("bigint").alias("n_days"),
            F.min("t_obs").alias("t_obs_raw"),
            F.sum(
                F.expr(
                    "CASE WHEN ABS(t_b) >= ABS(t_obs) THEN 1 ELSE 0 END"
                )
            )
            .cast("bigint")
            .alias("n_extreme"),
        )
        .selectExpr(
            "event_type",
            "n_days",
            det6.format(x="t_obs_raw", n="t_obs"),
            f"CAST({_PERM_B} AS BIGINT) AS n_resamples",
            det6.format(
                x=f"(1.0 + n_extreme) / ({_PERM_B} + 1.0)", n="p_value"
            ),
        )
        .orderBy("event_type")
    )


q_permutation_test.__doc__ = q_permutation_test.__doc__.format(b=_PERM_B)


def _sql_permutation_test() -> str:
    lab = (
        "CAST(concat('0x', substr(md5(concat(CAST(day AS VARCHAR),"
        " 'perm', CAST(b AS VARCHAR))), 1, 15)) AS BIGINT) % 7 < 2"
    )
    return f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2),
obs AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(CASE WHEN isodow(day) - 1 >= 5 THEN y ELSE 0 END)
              AS DOUBLE)
           / SUM(CASE WHEN isodow(day) - 1 >= 5 THEN 1 ELSE 0 END)
         - CAST(SUM(CASE WHEN isodow(day) - 1 < 5 THEN y ELSE 0 END)
              AS DOUBLE)
           / SUM(CASE WHEN isodow(day) - 1 < 5 THEN 1 ELSE 0 END)
           AS t_obs
  FROM daily GROUP BY 1),
resamples AS (
  SELECT event_type, b,
         CAST(SUM(CASE WHEN wk THEN y ELSE 0 END) AS DOUBLE)
           / SUM(CASE WHEN wk THEN 1 ELSE 0 END)
         - CAST(SUM(CASE WHEN NOT wk THEN y ELSE 0 END) AS DOUBLE)
           / SUM(CASE WHEN NOT wk THEN 1 ELSE 0 END) AS t_b
  FROM (
    SELECT d.event_type, d.y, g.b, {lab} AS wk
    FROM daily d,
         (SELECT unnest(range(0, {_PERM_B})) AS b) g)
  GROUP BY 1, 2)
SELECT r.event_type,
       o.n_days,
       CAST(FLOOR(o.t_obs * 1e6 + 0.5) AS DOUBLE) / 1e6 AS t_obs,
       CAST({_PERM_B} AS BIGINT) AS n_resamples,
       CAST(FLOOR(((1.0 + SUM(CASE WHEN ABS(r.t_b) >= ABS(o.t_obs)
            THEN 1 ELSE 0 END)) / ({_PERM_B} + 1.0)) * 1e6 + 0.5)
            AS DOUBLE) / 1e6 AS p_value
FROM resamples r JOIN obs o USING (event_type)
GROUP BY 1, 2, 3, 4
ORDER BY r.event_type
"""


SQL_PERMUTATION_TEST = _sql_permutation_test()


# -- round 13: physical-layout planners ---------------------------------------

#: shard-count grid a training-data writer is provisioned against
_SHARD_GRID = (64, 256, 1024, 4096)


def q_shard_balance_planner(spark, sf_dir):
    """Hash-shard balance forecast for the document corpus — the
    planning table behind "how many output shards should the
    training-data writer use": for each candidate shard count S,
    docs are assigned by the shared portable hash of doc_id and the
    per-shard byte distribution is summarized (max/mean skew, CV) —
    the straggler/row-group trade `compaction_plan` answers for
    files, answered BEFORE writing.

    Determinism: assignment is the shared md5 portable hash (both
    engines); per-shard byte sums are exact integers; max/mean and
    CV are closed-form on exact sums (Σb, Σb² in decimal), det6.

    Scale plan: a 4-way grid explode of the (doc_id, n_chars)
    projection (never the text), two map-side-combinable hash-aggs;
    output is 4 rows."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars"
    )
    grid = ", ".join(str(s) for s in _SHARD_GRID)
    h = (
        "CAST(conv(substring(md5(concat(CAST(doc_id AS STRING),"
        " 'shard')), 1, 15), 16, 10) AS BIGINT)"
    )
    per_shard = (
        docs.selectExpr(
            "n_chars", f"explode(array({grid})) AS s", f"{h} AS hh"
        )
        .selectExpr("s", "pmod(hh, s) AS shard", "n_chars")
        .groupBy("s", "shard")
        .agg(F.sum("n_chars").cast("bigint").alias("b"))
    )
    bd = F.col("b").cast("decimal(19,0)")
    g = per_shard.groupBy("s").agg(
        F.count(F.lit(1)).cast("bigint").alias("shards_used"),
        F.sum("b").cast("bigint").alias("total_bytes"),
        F.max("b").cast("bigint").alias("max_bytes"),
        F.sum((bd * bd).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("ss"),
    )
    det6 = "CAST(FLOOR(({x}) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS {n}"
    mean = "(CAST(total_bytes AS DOUBLE) / CAST(s AS DOUBLE))"
    var = (
        f"(CAST(ss AS DOUBLE) / CAST(s AS DOUBLE) - {mean} * {mean})"
    )
    return g.selectExpr(
        "CAST(s AS BIGINT) AS n_shards",
        "shards_used",
        "total_bytes",
        "max_bytes",
        det6.format(
            x=f"CAST(max_bytes AS DOUBLE) / {mean}", n="max_over_mean"
        ),
        det6.format(x=f"SQRT({var}) / {mean}", n="cv"),
    ).orderBy("n_shards")


def _sql_shard_balance_planner() -> str:
    grid = ", ".join(f"({s})" for s in _SHARD_GRID)
    h = (
        "CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR),"
        " 'shard')), 1, 15)) AS BIGINT)"
    )
    mean = "(CAST(total_bytes AS DOUBLE) / CAST(s AS DOUBLE))"
    var = f"(CAST(ss AS DOUBLE) / CAST(s AS DOUBLE) - {mean} * {mean})"
    return f"""
WITH grid (s) AS (VALUES {grid}),
per_shard AS (
  SELECT g.s, {h} % g.s AS shard,
         CAST(SUM(n_chars) AS BIGINT) AS b
  FROM documents CROSS JOIN grid g
  GROUP BY 1, 2),
agg AS (
  SELECT s,
         CAST(COUNT(*) AS BIGINT) AS shards_used,
         CAST(SUM(b) AS BIGINT) AS total_bytes,
         CAST(MAX(b) AS BIGINT) AS max_bytes,
         SUM(CAST(b AS HUGEINT) * CAST(b AS HUGEINT)) AS ss
  FROM per_shard GROUP BY 1)
SELECT CAST(s AS BIGINT) AS n_shards,
       shards_used,
       total_bytes,
       max_bytes,
       CAST(FLOOR((CAST(max_bytes AS DOUBLE) / {mean}) * 1e6 + 0.5)
            AS DOUBLE) / 1e6 AS max_over_mean,
       CAST(FLOOR((SQRT({var}) / {mean}) * 1e6 + 0.5)
            AS DOUBLE) / 1e6 AS cv
FROM agg
ORDER BY n_shards
"""


SQL_SHARD_BALANCE_PLANNER = _sql_shard_balance_planner()


#: the catalog tables the broadcast planner surveys
_BCAST_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

#: the planner's REFERENCE parallelism: a fixed constant (not the
#: live session conf) so the quoted rows-per-task is reproducible by
#: the oracle and comparable across machines — readers scale it to
#: their own cluster
_PLAN_PARALLELISM = 32


def q_broadcast_budget_planner(spark, sf_dir):
    """Broadcast-vs-shuffle survey of every catalog table — the
    dim-side half of the join decision `join_strategy_advice` makes
    from the fact-side key profile: per table, the row count, the
    per-task row budget at the fixed 32-way reference parallelism
    (`_PLAN_PARALLELISM` — a constant, not the live conf, so the
    quoted number is oracle-reproducible and machine-comparable), and
    the chooser's own broadcast gate (`operators/joins.
    BROADCAST_ROW_LIMIT`) — so a pipeline author reads one table and
    knows which joins never shuffle.

    Determinism: row counts are exact (parquet-footer counts); the
    verdict CASE and the per-task division are shared text.

    Scale plan: ten metadata-only COUNT aggregates unioned — no data
    columns are read at all (COUNT(*) is answered by footers)."""
    parts = []
    for t in _BCAST_TABLES:
        parts.append(
            load_table(spark, sf_dir, t).agg(
                F.lit(t).alias("table_name"),
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            )
        )
    surveyed = parts[0]
    for p in parts[1:]:
        surveyed = surveyed.unionAll(p)
    det6 = "CAST(FLOOR(({x}) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS {n}"
    return surveyed.selectExpr(
        "table_name",
        "n_rows",
        det6.format(
            x=f"CAST(n_rows AS DOUBLE) / {_PLAN_PARALLELISM}.0",
            n="rows_per_task",
        ),
        f"n_rows <= {joins.BROADCAST_ROW_LIMIT} AS broadcastable",
        f"CASE WHEN n_rows <= {joins.BROADCAST_ROW_LIMIT}"
        " THEN 'broadcast' ELSE 'shuffle' END AS dim_side_strategy",
    ).orderBy("table_name")


def _sql_broadcast_budget_planner() -> str:
    selects = "\n  UNION ALL\n".join(
        f"  SELECT '{t}' AS table_name,"
        f" CAST(COUNT(*) AS BIGINT) AS n_rows FROM {t}"
        for t in _BCAST_TABLES
    )
    return f"""
WITH surveyed AS (
{selects}
)
SELECT table_name,
       n_rows,
       CAST(FLOOR((CAST(n_rows AS DOUBLE) / {_PLAN_PARALLELISM}.0)
            * 1e6 + 0.5)
            AS DOUBLE) / 1e6 AS rows_per_task,
       n_rows <= {joins.BROADCAST_ROW_LIMIT} AS broadcastable,
       CASE WHEN n_rows <= {joins.BROADCAST_ROW_LIMIT}
            THEN 'broadcast' ELSE 'shuffle' END AS dim_side_strategy
FROM surveyed
ORDER BY table_name
"""


SQL_BROADCAST_BUDGET_PLANNER = _sql_broadcast_budget_planner()


REGISTRY: dict[str, QuerySpec] = {
    "welch_anova": QuerySpec(q_welch_anova, SQL_WELCH_ANOVA),
    "shard_balance_planner": QuerySpec(
        q_shard_balance_planner, SQL_SHARD_BALANCE_PLANNER
    ),
    "broadcast_budget_planner": QuerySpec(
        q_broadcast_budget_planner, SQL_BROADCAST_BUDGET_PLANNER
    ),
    "levene_test": QuerySpec(q_levene_test, SQL_LEVENE_TEST),
    "cohens_d_pairs": QuerySpec(q_cohens_d_pairs, SQL_COHENS_D_PAIRS),
    "bh_fdr": QuerySpec(q_bh_fdr, SQL_BH_FDR),
    "friedman_test": QuerySpec(q_friedman_test, SQL_FRIEDMAN_TEST),
    "permutation_test": QuerySpec(
        q_permutation_test, SQL_PERMUTATION_TEST
    ),
    "yoy_growth": QuerySpec(q_yoy_growth, SQL_YOY_GROWTH),
    "anova_oneway": QuerySpec(q_anova_oneway, SQL_ANOVA_ONEWAY),
    "sample_size_power": QuerySpec(
        q_sample_size_power, SQL_SAMPLE_SIZE_POWER
    ),
    "zone_map_effectiveness": QuerySpec(
        q_zone_map_effectiveness, SQL_ZONE_MAP_EFFECTIVENESS
    ),
    "compaction_plan": QuerySpec(q_compaction_plan, SQL_COMPACTION_PLAN),
    "kruskal_wallis": QuerySpec(q_kruskal_wallis, SQL_KRUSKAL_WALLIS),
    "jarque_bera": QuerySpec(q_jarque_bera, SQL_JARQUE_BERA),
    "diff_in_diff": QuerySpec(q_diff_in_diff, SQL_DIFF_IN_DIFF),
    "cuped_adjustment": QuerySpec(
        q_cuped_adjustment, SQL_CUPED_ADJUSTMENT
    ),
    "join_salted_hotkeys": QuerySpec(
        q_join_salted_hotkeys, SQL_JOIN_SALTED_HOTKEYS
    ),
    "top_user_paths": QuerySpec(q_top_user_paths, SQL_TOP_USER_PATHS),
    "temporal_align": QuerySpec(q_temporal_align, SQL_TEMPORAL_ALIGN),
    "median_ci": QuerySpec(q_median_ci, SQL_MEDIAN_CI),
    "ks_test": QuerySpec(q_ks_test, SQL_KS_TEST),
    "mann_whitney_u": QuerySpec(q_mann_whitney_u, SQL_MANN_WHITNEY_U),
    "sign_test": QuerySpec(q_sign_test, SQL_SIGN_TEST),
    "bootstrap_ci": QuerySpec(q_bootstrap_ci, SQL_BOOTSTRAP_CI),
    "window_funnel": QuerySpec(q_window_funnel, SQL_WINDOW_FUNNEL),
    "robust_trimmed_stats": QuerySpec(
        q_robust_trimmed_stats, SQL_ROBUST_TRIMMED_STATS
    ),
    "join_temporal_scd2": QuerySpec(
        q_join_temporal_scd2, SQL_JOIN_TEMPORAL_SCD2
    ),
    "ab_test_zscore": QuerySpec(q_ab_test_zscore, SQL_AB_TEST_ZSCORE),
    "join_skew_profile": QuerySpec(
        q_join_skew_profile, SQL_JOIN_SKEW_PROFILE
    ),
    "join_strategy_advice": QuerySpec(
        q_join_strategy_advice, SQL_JOIN_STRATEGY_ADVICE
    ),
    "attribution_credit": QuerySpec(
        q_attribution_credit, SQL_ATTRIBUTION_CREDIT
    ),
    "corr_matrix": QuerySpec(q_corr_matrix, SQL_CORR_MATRIX),
    "mahalanobis_2d": QuerySpec(q_mahalanobis_2d, SQL_MAHALANOBIS_2D),
    "fifo_fill": QuerySpec(q_fifo_fill, SQL_FIFO_FILL),
    "linreg_ols": QuerySpec(q_linreg_ols, SQL_LINREG_OLS),
    "funnel_time_to_convert": QuerySpec(
        q_funnel_time_to_convert, SQL_FUNNEL_TIME_TO_CONVERT
    ),
    "pareto_frontier": QuerySpec(q_pareto_frontier, SQL_PARETO_FRONTIER),
    "rfm_segmentation": QuerySpec(
        q_rfm_segmentation, SQL_RFM_SEGMENTATION
    ),
    "crossval_folds": QuerySpec(q_crossval_folds, SQL_CROSSVAL_FOLDS),
    "variant_json": QuerySpec(q_variant_json, SQL_VARIANT_JSON),
    "cep_pattern_match": QuerySpec(
        q_cep_pattern_match, SQL_CEP_PATTERN_MATCH
    ),
    "iqr_outliers": QuerySpec(q_iqr_outliers, SQL_IQR_OUTLIERS),
    "funnel_steps": QuerySpec(q_funnel_steps, SQL_FUNNEL_STEPS),
    "trend_regression": QuerySpec(q_trend_regression, SQL_TREND_REGRESSION),
    "cohort_retention": QuerySpec(q_cohort_retention, SQL_COHORT_RETENTION),
    "map_functions": QuerySpec(q_map_functions, SQL_MAP_FUNCTIONS),
    "scd2_history": QuerySpec(q_scd2_history, SQL_SCD2_HISTORY),
    "stats_agg": QuerySpec(q_stats_agg, SQL_STATS_AGG),
    "unpivot": QuerySpec(q_unpivot, SQL_UNPIVOT),
    "array_functions": QuerySpec(q_array_functions, SQL_ARRAY_FUNCTIONS),
    "null_semantics": QuerySpec(q_null_semantics, SQL_NULL_SEMANTICS),
    "string_agg": QuerySpec(q_string_agg, SQL_STRING_AGG),
    "multires_rollup": QuerySpec(q_multires_rollup, SQL_MULTIRES_ROLLUP),
    "session_window_agg": QuerySpec(q_session_window, SQL_SESSION_WINDOW),
    "sql_grouping_sets": QuerySpec(q_sql_grouping_sets, SQL_SQL_GROUPING_SETS),
    "kafka_json_roundtrip": QuerySpec(
        q_kafka_json_roundtrip, SQL_KAFKA_JSON_ROUNDTRIP
    ),
    "keyword_filter": QuerySpec(q_keyword_filter, SQL_KEYWORD_FILTER),
    "join_asof": QuerySpec(q_join_asof, SQL_JOIN_ASOF),
    "join_range": QuerySpec(q_join_range, SQL_JOIN_RANGE),
    "join_salted": QuerySpec(q_join_salted, SQL_JOIN_SALTED),
    "window_sliding": QuerySpec(q_window_sliding, SQL_WINDOW_SLIDING),
    "percentiles": QuerySpec(q_percentiles, SQL_PERCENTILES),
    "scalar_functions2": QuerySpec(q_scalar_functions2, SQL_SCALAR_FUNCTIONS2),
    "zorder_layout": QuerySpec(q_zorder_layout, SQL_ZORDER_LAYOUT),
    "version_changes": QuerySpec(q_version_changes, SQL_VERSION_CHANGES),
    "basket_lift": QuerySpec(q_basket_lift, SQL_BASKET_LIFT),
    "event_transitions": QuerySpec(
        q_event_transitions, SQL_EVENT_TRANSITIONS
    ),
    "active_users_rolling": QuerySpec(
        q_active_users_rolling, SQL_ACTIVE_USERS_ROLLING
    ),
    "window_value_functions": QuerySpec(
        q_window_value_functions, SQL_WINDOW_VALUE_FUNCTIONS
    ),
    "approx_quantile_check": QuerySpec(
        q_approx_quantile_check, SQL_APPROX_QUANTILE_CHECK
    ),
    "approx_distinct_check": QuerySpec(
        q_approx_distinct_check, SQL_APPROX_DISTINCT_CHECK
    ),
    "rolling_avg_range": QuerySpec(q_rolling_avg_range, SQL_ROLLING_AVG_RANGE),
    "window_rank_functions": QuerySpec(
        q_window_rank_functions, SQL_WINDOW_RANK_FUNCTIONS
    ),
    "profile_table": QuerySpec(q_profile_table, SQL_PROFILE_TABLE),
    "user_features": QuerySpec(q_user_features, SQL_USER_FEATURES),
    "profile_frequent_values": QuerySpec(
        q_profile_frequent_values, SQL_PROFILE_FREQUENT_VALUES
    ),
    "time_gap_stats": QuerySpec(q_time_gap_stats, SQL_TIME_GAP_STATS),
}
