"""Relational operator surface — SURVEY.md §2.3-2.6 plus the standard
extensions the reference gets for free from Spark (cube/rollup, window
frames, the full join family, set ops, pivot, sessionization).

Every query is written declaratively so Catalyst does predicate
pushdown / column pruning / join selection; explicit ``broadcast()``
hints mark dimension tables that are small at every scale factor.

Scale notes are per query; the common rules:
- filters sit directly on the scan → parquet PushedFilters;
- aggregations are partial (map-side combine) by construction;
- small dims are broadcast → no shuffle of the fact table for joins;
- sorts happen after aggregation, on already-tiny results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..schemas import EVENT_PROPS_SCHEMA
from .registry import QuerySpec


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# P-family: projections / filters / row transforms
# --------------------------------------------------------------------------

def q_proj_filter(spark, sf_dir):
    """P1+P4+P7: value extraction, isin filter, aliased projection.

    Reference: filter(col("lang") === "en" || === "fr")
    (IndicateursStreaming.scala:117) + aliased final select (:175-181).
    """
    return (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type").isin("click", "purchase") & (F.col("value") > 50.0))
        .select(
            F.col("event_id").alias("id"),
            F.col("user_id").alias("uid"),
            F.col("event_type").alias("etype"),
            F.round(F.col("value"), 2).alias("val"),
        )
    )


SQL_PROJ_FILTER = """
SELECT event_id AS id, user_id AS uid, event_type AS etype,
       ROUND(value, 2) AS val
FROM events
WHERE event_type IN ('click', 'purchase') AND value > 50.0
"""


def q_json_parse(spark, sf_dir):
    """P2+P3: from_json into a struct, nested projection.

    Reference: withColumn(from_json(...)) + select("tweet_message.*")
    (ConsommationStreaming.scala:96-97) — without the `kakfa_jsons`
    column-name typo at IndicateursStreaming.scala:116.
    """
    return (
        _t(spark, sf_dir, "events")
        .withColumn("j", F.from_json(F.col("props"), EVENT_PROPS_SCHEMA))
        .select("event_id", F.col("j.k").alias("k"))
        .where(F.col("k").isNotNull())
    )


SQL_JSON_PARSE = """
SELECT event_id, CAST(json_extract(props, '$.k') AS INTEGER) AS k
FROM events
WHERE json_extract(props, '$.k') IS NOT NULL
"""


def q_conditional_columns(spark, sf_dir):
    """P8+P9+A3: when/otherwise binarization, null-default, arithmetic.

    Reference: bin_retweet CASE (IndicateursStreaming.scala:166-169),
    round(ratio*100, 2) (:173), when(isNull, default) (:174).
    """
    return _t(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("value") > 50, 1).otherwise(0).alias("bin_high"),
        F.coalesce(F.col("value"), F.lit(0.0)).alias("value_nz"),
        F.round(F.col("value") * 100.0 / 7.0, 2).alias("scaled"),
    )


SQL_CONDITIONAL_COLUMNS = """
SELECT event_id,
       CASE WHEN value > 50 THEN 1 ELSE 0 END AS bin_high,
       COALESCE(value, 0.0) AS value_nz,
       ROUND(value * 100.0 / 7.0, 2) AS scaled
FROM events
"""


def q_tokenize(spark, sf_dir):
    """P6: flatMap/tokenize + prefix filter (hashtag-extraction shape).

    Reference: flatMap(_.split(" ").filter(_.startsWith("#")))
    (TwitterKafkaStreaming.scala:184-185) — same shape, 's' prefix.
    """
    return (
        _t(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .where(F.col("token").startswith("s"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy("token")
    )


SQL_TOKENIZE = """
SELECT token, COUNT(*) AS n
FROM (SELECT unnest(str_split(text, ' ')) AS token FROM documents)
WHERE token LIKE 's%'
GROUP BY token
ORDER BY token
"""


def q_scalar_functions(spark, sf_dir):
    """§2.6: the reference's scalar-function surface in one projection —
    concat, upper/lower, trim, length, substring, cast, hour/minute,
    date formatting (unix_timestamp/from_unixtime parity via
    date_format), split, round.
    """
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.col("lang"), F.lit(":"), F.col("source")).alias("tag"),
        F.upper(F.col("lang")).alias("lang_up"),
        F.length(F.trim(F.col("text"))).alias("text_len"),
        F.substring(F.col("text"), 1, 10).alias("prefix10"),
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
        F.col("n_chars").cast("double").alias("n_chars_d"),
    )


SQL_SCALAR_FUNCTIONS = """
SELECT doc_id,
       lang || ':' || source AS tag,
       UPPER(lang) AS lang_up,
       LENGTH(TRIM(text)) AS text_len,
       SUBSTRING(text, 1, 10) AS prefix10,
       CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(n_chars AS DOUBLE) AS n_chars_d
FROM documents
"""


def q_time_functions(spark, sf_dir):
    """§2.6 time surface: hour/minute extraction + formatted labels.

    Reference: hour()/minute()/CAST/CONCAT quarter-hour label SQL
    (IndicateursStreaming.scala:160-165) and
    unix_timestamp/from_unixtime (:143,159).
    """
    return _t(spark, sf_dir, "events").select(
        "event_id",
        F.hour("ts").alias("h"),
        F.minute("ts").alias("m"),
        F.date_format("ts", "yyyy-MM-dd HH:mm").alias("ts_label"),
        F.to_date("ts").alias("d"),
    )


SQL_TIME_FUNCTIONS = """
SELECT event_id,
       CAST(hour(ts) AS INTEGER) AS h,
       CAST(minute(ts) AS INTEGER) AS m,
       strftime(ts, '%Y-%m-%d %H:%M') AS ts_label,
       CAST(ts AS DATE) AS d
FROM events
"""


def q_quarter_hour_case(spark, sf_dir):
    """A4 exact parity: the reference's CASE-based quarter-hour label
    (IndicateursStreaming.scala:160-165), reproduced with when/otherwise
    instead of window() — same label strings, including the reference's
    actual ":45 - HH:60" spelling for the last bucket (the code emits
    "60", not the "59" its comment claims).
    """
    ev = _t(spark, sf_dir, "events")
    h = F.date_format("ts", "HH")
    m = F.minute("ts")
    label = (
        F.when(m < 15, F.concat(h, F.lit(":00 - "), h, F.lit(":15")))
        .when(m < 30, F.concat(h, F.lit(":15 - "), h, F.lit(":30")))
        .when(m < 45, F.concat(h, F.lit(":30 - "), h, F.lit(":45")))
        .otherwise(F.concat(h, F.lit(":45 - "), h, F.lit(":60")))
    )
    return (
        ev.select(label.alias("quart_heure"))
        .groupBy("quart_heure")
        .agg(F.count("*").alias("n"))
        .orderBy("quart_heure")
    )


SQL_QUARTER_HOUR_CASE = """
SELECT CASE
         WHEN minute(ts) < 15 THEN strftime(ts,'%H') || ':00 - ' || strftime(ts,'%H') || ':15'
         WHEN minute(ts) < 30 THEN strftime(ts,'%H') || ':15 - ' || strftime(ts,'%H') || ':30'
         WHEN minute(ts) < 45 THEN strftime(ts,'%H') || ':30 - ' || strftime(ts,'%H') || ':45'
         ELSE strftime(ts,'%H') || ':45 - ' || strftime(ts,'%H') || ':60'
       END AS quart_heure,
       COUNT(*) AS n
FROM events
GROUP BY 1
ORDER BY 1
"""


# --------------------------------------------------------------------------
# A-family: aggregations
# --------------------------------------------------------------------------

def q_agg_groupby(spark, sf_dir):
    """A1+A2 idiomatic form + standard agg surface (count/sum/avg/min/max).

    One hash-aggregate with map-side partials — the stream-safe,
    shuffle-minimal form of IndicateursStreaming.scala:155-156.
    """
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("event_id").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.round(F.min("value"), 2).alias("min_value"),
            F.round(F.max("value"), 2).alias("max_value"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
        )
        .orderBy("event_type")
    )


SQL_AGG_GROUPBY = """
SELECT event_type,
       COUNT(event_id) AS n,
       ROUND(SUM(value), 2) AS sum_value,
       ROUND(AVG(value), 6) AS avg_value,
       ROUND(MIN(value), 2) AS min_value,
       ROUND(MAX(value), 2) AS max_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def q_agg_analytic_window(spark, sf_dir):
    """A1+A2 row-multiplicity parity: COUNT/SUM OVER (PARTITION BY k
    ORDER BY k) — ORDER BY equals PARTITION BY so every row is a peer
    and the analytic degenerates to a replicated group total, exactly as
    in the reference SQL (IndicateursStreaming.scala:152-172).

    Computed AS that degenerate form: one hash-agg to the ≤|types|
    totals, broadcast back onto the rows — semantically identical to
    the window (the oracle keeps the literal analytic SQL), but a
    literal Window.partitionBy(event_type) over raw events would sort
    100 TB through 5 tasks (the round-10 low-cardinality-window
    lesson); the group-total join is map-only on the fact side.
    """
    ev = _t(spark, sf_dir, "events")
    totals = ev.groupBy("event_type").agg(
        F.count("event_id").alias("type_count"),
        F.sum(F.when(F.col("value") > 50, 1).otherwise(0)).alias(
            "type_high"
        ),
    )
    return ev.select("event_id", "event_type").join(
        F.broadcast(totals), "event_type"
    ).select("event_id", "event_type", "type_count", "type_high")


SQL_AGG_ANALYTIC_WINDOW = """
SELECT event_id, event_type,
       COUNT(event_id) OVER (PARTITION BY event_type ORDER BY event_type
                             RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS type_count,
       CAST(SUM(CASE WHEN value > 50 THEN 1 ELSE 0 END)
            OVER (PARTITION BY event_type ORDER BY event_type
                  RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            AS BIGINT) AS type_high
FROM events
"""


def q_rollup(spark, sf_dir):
    """Extension (§2.4 note): ROLLUP over region→nation with GROUPING
    markers. Broadcast joins keep the fact-side shuffle to one
    aggregation exchange.
    """
    cust = _t(spark, sf_dir, "customer")
    nat = F.broadcast(_t(spark, sf_dir, "nation"))
    reg = F.broadcast(_t(spark, sf_dir, "region"))
    joined = cust.join(nat, cust.c_nationkey == nat.n_nationkey).join(
        reg, nat.n_regionkey == reg.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
            F.grouping("r_name").cast("int").alias("g_region"),
            F.grouping("n_name").cast("int").alias("g_nation"),
        )
        .orderBy("g_region", "g_nation", "r_name", "n_name")
    )


SQL_ROLLUP = """
SELECT r_name, n_name,
       COUNT(*) AS n_cust,
       ROUND(SUM(c_acctbal), 2) AS sum_bal,
       CAST(GROUPING(r_name) AS INTEGER) AS g_region,
       CAST(GROUPING(n_name) AS INTEGER) AS g_nation
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY g_region, g_nation, r_name, n_name
"""


def q_cube(spark, sf_dir):
    """Extension: CUBE over (returnflag, linestatus)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.grouping("l_returnflag").cast("int").alias("g_rf"),
            F.grouping("l_linestatus").cast("int").alias("g_ls"),
        )
        .orderBy("g_rf", "g_ls", "l_returnflag", "l_linestatus")
    )


SQL_CUBE = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
       CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY g_rf, g_ls, l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# Window functions (extended surface)
# --------------------------------------------------------------------------

def q_window_topk_per_group(spark, sf_dir):
    """Top-3 orders per customer by totalprice (row_number with a
    deterministic orderkey tie-break) — the canonical top-k-per-group.

    Scale: single hash-partition shuffle on o_custkey; no global sort.
    """
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
            F.row_number().over(w).alias("rk"),
        )
        .where(F.col("rk") <= 3)
    )


SQL_WINDOW_TOPK = """
SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS price, rk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rk
  FROM orders)
WHERE rk <= 3
"""


def q_window_lag_running(spark, sf_dir):
    """lag/lead + cumulative frame (running revenue per customer,
    ordered by date with orderkey tie-break)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.lag("o_totalprice", 1).over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice", 1).over(w), 2).alias("next_price"),
        F.round(F.sum("o_totalprice").over(cum), 2).alias("running_total"),
        F.rank().over(w).alias("rk"),
    )


SQL_WINDOW_LAG_RUNNING = """
SELECT o_custkey, o_orderkey,
       ROUND(LAG(o_totalprice, 1) OVER w, 2) AS prev_price,
       ROUND(LEAD(o_totalprice, 1) OVER w, 2) AS next_price,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS running_total,
       CAST(RANK() OVER w AS INTEGER) AS rk
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def q_sessionize(spark, sf_dir):
    """Sessionization: gap > 30 min starts a new session (lag + windowed
    cumulative sum) — the batch form of streaming session windows.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts", 1).over(w))
    marked = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0).alias("new_sess"),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"))
        .orderBy("user_id", "session_id")
    )


SQL_SESSIONIZE = """
WITH marked AS (
  SELECT user_id, event_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR floor(epoch(ts)) - floor(epoch(LAG(ts) OVER w)) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_id
  FROM marked)
SELECT user_id, session_id, COUNT(*) AS n_events
FROM sess
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


# --------------------------------------------------------------------------
# J-family: joins (J1 generalized) / set ops / sort / limit
# --------------------------------------------------------------------------

def q_join_broadcast_inner(spark, sf_dir):
    """Inner equi-join fact⋈dim with an explicit broadcast hint: the
    lineitem scan never shuffles; revenue per brand aggregates with
    map-side partials."""
    li = _t(spark, sf_dir, "lineitem")
    part = F.broadcast(_t(spark, sf_dir, "part"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue"),
        )
        .orderBy("p_brand")
    )


SQL_JOIN_BROADCAST_INNER = """
SELECT p_brand, COUNT(*) AS n,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY p_brand
"""


def q_join_left(spark, sf_dir):
    """Left outer: every customer, order count 0 where no orders."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


SQL_JOIN_LEFT = """
SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
ORDER BY c_custkey
"""


def q_join_full_outer(spark, sf_dir):
    """Full outer join across customer-nations vs supplier-nations."""
    cn = (
        _t(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_cust"))
    )
    sn = (
        _t(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("n_supp"))
    )
    return (
        cn.join(sn, cn.c_nationkey == sn.s_nationkey, "full")
        .select(
            F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy("nationkey")
    )


SQL_JOIN_FULL_OUTER = """
WITH cn AS (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY 1),
     sn AS (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
       COALESCE(n_cust, 0) AS n_cust,
       COALESCE(n_supp, 0) AS n_supp
FROM cn FULL OUTER JOIN sn ON c_nationkey = s_nationkey
ORDER BY nationkey
"""


def q_join_semi(spark, sf_dir):
    """Left semi: customers that have at least one order (no
    duplication, no payload columns from the right side)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


SQL_JOIN_SEMI = """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
ORDER BY c_custkey
"""


def q_join_anti(spark, sf_dir):
    """Left anti: customers with no orders."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


SQL_JOIN_ANTI = """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
ORDER BY c_custkey
"""


def q_join_cross(spark, sf_dir):
    """Cross join (J1 — the one join capability the reference explicitly
    enables: spark.sql.crossJoin.enabled, SparkBigData.scala:21,28)."""
    r1 = _t(spark, sf_dir, "region").select(F.col("r_name").alias("a"))
    r2 = _t(spark, sf_dir, "region").select(F.col("r_name").alias("b"))
    return r1.crossJoin(r2).orderBy("a", "b")


SQL_JOIN_CROSS = """
SELECT a.r_name AS a, b.r_name AS b
FROM region a CROSS JOIN region b
ORDER BY a, b
"""


def q_star_join(spark, sf_dir):
    """TPC-H Q5-shaped star join: fact table joins two broadcast dim
    chains; only aggregation shuffles the (already reduced) fact rows.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nat = F.broadcast(_t(spark, sf_dir, "nation"))
    reg = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nat, cust.c_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("r_name", "n_name")
    )


SQL_STAR_JOIN = """
SELECT r_name, n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


def q_union(spark, sf_dir):
    """UNION ALL + UNION (distinct) of customer/supplier nation keys."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return (
        c.unionAll(s)
        .groupBy("nationkey")
        .agg(F.count("*").alias("n"))
        .orderBy("nationkey")
    )


SQL_UNION = """
SELECT nationkey, COUNT(*) AS n
FROM (SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey FROM supplier)
GROUP BY nationkey
ORDER BY nationkey
"""


def q_intersect(spark, sf_dir):
    """INTERSECT: nation keys having both customers and suppliers."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s).orderBy("nationkey")


SQL_INTERSECT = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
ORDER BY nationkey
"""


def q_except(spark, sf_dir):
    """EXCEPT: nation keys with customers but no suppliers."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    # subtract == EXCEPT DISTINCT (set semantics, matching the SQL oracle);
    # exceptAll would keep per-row multiplicity (bag semantics)
    return c.subtract(s).orderBy("nationkey")


SQL_EXCEPT = """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey FROM supplier
ORDER BY nationkey
"""


def q_sort_limit(spark, sf_dir):
    """O1 + top-k: global ORDER BY with deterministic tie-break, LIMIT.

    Scale: Spark implements orderBy+limit as a per-partition top-k then
    a single-reduce merge (TakeOrderedAndProject) — no global sort.
    """
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
        .orderBy(F.desc("price"), F.asc("o_orderkey"))
        .limit(10)
    )


SQL_SORT_LIMIT = """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
FROM orders
ORDER BY price DESC, o_orderkey ASC
LIMIT 10
"""


def q_pivot(spark, sf_dir):
    """Pivot: per-day event counts, one column per event type (explicit
    value list so the plan needs no discovery pass)."""
    types = ["click", "view", "purchase", "signup", "error"]
    return (
        _t(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("d"), "event_type")
        .groupBy("d")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
        .orderBy("d")
    )


SQL_PIVOT = """
SELECT CAST(ts AS DATE) AS d,
       COUNT(*) FILTER (event_type = 'click') AS click,
       COUNT(*) FILTER (event_type = 'view') AS view,
       COUNT(*) FILTER (event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (event_type = 'signup') AS signup,
       COUNT(*) FILTER (event_type = 'error') AS error
FROM events
GROUP BY 1
ORDER BY 1
"""


# --------------------------------------------------------------------------
# TPC-H-style headline queries
# --------------------------------------------------------------------------

def q_tpch_q1(spark, sf_dir):
    """TPC-H Q1 shape: pricing summary over lineitem with shipdate
    filter pushed to the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       ROUND(AVG(l_extendedprice), 6) AS avg_price,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_tpch_q3(spark, sf_dir):
    """TPC-H Q3 shape: shipping-priority top 10 — two equi-joins, the
    customer side filtered before the join."""
    cust = _t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


SQL_TPCH_Q3 = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def q_tpch_q5(spark, sf_dir):
    """TPC-H Q5 shape: regional supplier revenue — a six-table
    snowflake.  Scale plan: region filter applied BEFORE the broadcast
    nation⋈region dim build; orders date-filtered before joining the
    fact; the customer-nation = supplier-nation constraint rides the
    supplier join condition so no post-join filter scans fact rows;
    nation/region broadcast (tiny dims), the three fact-side joins
    shuffle on their keys."""
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    nat = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (F.col("l_suppkey") == supp.s_suppkey)
            & (F.col("c_nationkey") == supp.s_nationkey),
        )
        .join(F.broadcast(nat), supp.s_nationkey == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


SQL_TPCH_Q5 = """
SELECT n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


def q_tpch_q6(spark, sf_dir):
    """TPC-H Q6 shape: forecasting-revenue-change — a pure
    filter-and-sum with NO join and NO groupBy key.  Scale plan: all
    three predicates push to the parquet scan (range on l_shipdate,
    bands on l_discount/l_quantity), the aggregate is a map-side
    partial + single-row final — the cheapest possible shape per TB
    scanned, entirely whole-stage-codegen."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
            .alias("revenue")
        )
    )


SQL_TPCH_Q6 = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q_tpch_q13(spark, sf_dir):
    """TPC-H Q13 shape: customer order-count distribution — LEFT join
    so zero-order customers survive, then a second aggregation over
    the first's result (distribution of a distribution).  Scale plan:
    both aggs are hash aggs; the first shuffles on c_custkey (same key
    as the join, so AQE can reuse the exchange), the second's input is
    one row per customer and its output is tens of rows.  (The
    reference schema has no o_comment, so Q13's not-like filter is
    omitted.)"""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


SQL_TPCH_Q13 = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
    SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q_tpch_q14(spark, sf_dir):
    """TPC-H Q14 shape: promotion-revenue share for one month — a
    conditional-sum ratio over a fact⋈dim join.  Scale plan: the
    one-month shipdate range prunes the scan; part is joined on its
    key (shuffle join — at 100 TB part is too big to broadcast, and
    only p_partkey/p_type are read thanks to column pruning); the
    ratio is computed from two partial sums in a single agg, no second
    pass."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("promo_revenue")
        )
    )


SQL_TPCH_Q14 = """
SELECT ROUND(
         100.0 * SUM(CASE WHEN p_type = 'PROMO'
                          THEN l_extendedprice * (1 - l_discount)
                          ELSE 0.0 END)
         / SUM(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
"""


def q_tpch_q10(spark, sf_dir):
    """TPC-H Q10 shape: returned-item reporting — top 20 customers by
    lost revenue in a quarter.  Scale plan: the o_orderdate window and
    l_returnflag='R' filters both push to their scans BEFORE the
    joins; nation broadcasts; customer⋈orders⋈lineitem shuffle on
    their keys; the top-20 is TakeOrderedAndProject (per-partition
    heap, no global sort)."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            # decimal accumulation: exact and summation-order-independent,
            # so the 2-dp round can't sit on a float knife edge
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                    .cast("decimal(30,8)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


SQL_TPCH_Q10 = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(30,8))), 2) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q_tpch_q18(spark, sf_dir):
    """TPC-H Q18 shape: large-volume customers — orders whose total
    lineitem quantity clears a threshold, joined back to customer,
    top-100 by order value.  Scale plan: the qualifying-order set is an
    aggregate (one hash-agg over lineitem) SEMI-joined into orders
    before the customer join, so only qualifying rows reach the wider
    joins; the top-100 is TakeOrderedAndProject."""
    li = _t(spark, sf_dir, "lineitem")
    qualifying = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 300)
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(qualifying, orders.o_orderkey == qualifying.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.round("sum_qty", 2).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


SQL_TPCH_Q18 = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       ROUND(q.sum_qty, 2) AS total_qty
FROM orders
JOIN (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 300) q ON o_orderkey = q.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


def q_bitwise_functions(spark, sf_dir):
    """Bitwise scalar surface: and/or/xor, shifts, popcount — the
    primitives the SimHash/LSH operators build on, exposed as a
    user-facing query.  Pure map-only codegen."""
    k = F.col("o_orderkey")
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        (k.bitwiseAND(F.lit(255))).alias("low_byte"),
        (k.bitwiseOR(F.lit(4096))).alias("with_flag"),
        (k.bitwiseXOR(F.col("o_custkey"))).alias("key_xor"),
        F.shiftleft(k, 3).alias("shl3"),
        F.shiftright(k, 2).alias("shr2"),
        F.bit_count(k).alias("popcount"),
    ).orderBy("o_orderkey")


SQL_BITWISE_FUNCTIONS = """
SELECT o_orderkey,
       o_orderkey & 255 AS low_byte,
       o_orderkey | 4096 AS with_flag,
       xor(o_orderkey, o_custkey) AS key_xor,
       o_orderkey << 3 AS shl3,
       o_orderkey >> 2 AS shr2,
       CAST(bit_count(o_orderkey) AS INT) AS popcount
FROM orders
ORDER BY o_orderkey
"""


REGISTRY: dict[str, QuerySpec] = {
    "proj_filter": QuerySpec(q_proj_filter, SQL_PROJ_FILTER),
    "json_parse": QuerySpec(q_json_parse, SQL_JSON_PARSE),
    "conditional_columns": QuerySpec(q_conditional_columns, SQL_CONDITIONAL_COLUMNS),
    "tokenize": QuerySpec(q_tokenize, SQL_TOKENIZE),
    "scalar_functions": QuerySpec(q_scalar_functions, SQL_SCALAR_FUNCTIONS),
    "time_functions": QuerySpec(q_time_functions, SQL_TIME_FUNCTIONS),
    "quarter_hour_case": QuerySpec(q_quarter_hour_case, SQL_QUARTER_HOUR_CASE),
    "agg_groupby": QuerySpec(q_agg_groupby, SQL_AGG_GROUPBY),
    "agg_analytic_window": QuerySpec(q_agg_analytic_window, SQL_AGG_ANALYTIC_WINDOW),
    "rollup": QuerySpec(q_rollup, SQL_ROLLUP),
    "cube": QuerySpec(q_cube, SQL_CUBE),
    "window_topk_per_group": QuerySpec(q_window_topk_per_group, SQL_WINDOW_TOPK),
    "window_lag_running": QuerySpec(q_window_lag_running, SQL_WINDOW_LAG_RUNNING),
    "sessionize": QuerySpec(q_sessionize, SQL_SESSIONIZE),
    "join_broadcast_inner": QuerySpec(q_join_broadcast_inner, SQL_JOIN_BROADCAST_INNER),
    "join_left": QuerySpec(q_join_left, SQL_JOIN_LEFT),
    "join_full_outer": QuerySpec(q_join_full_outer, SQL_JOIN_FULL_OUTER),
    "join_semi": QuerySpec(q_join_semi, SQL_JOIN_SEMI),
    "join_anti": QuerySpec(q_join_anti, SQL_JOIN_ANTI),
    "join_cross": QuerySpec(q_join_cross, SQL_JOIN_CROSS),
    "star_join": QuerySpec(q_star_join, SQL_STAR_JOIN),
    "union_all": QuerySpec(q_union, SQL_UNION),
    "intersect": QuerySpec(q_intersect, SQL_INTERSECT),
    "except_": QuerySpec(q_except, SQL_EXCEPT),
    "sort_limit": QuerySpec(q_sort_limit, SQL_SORT_LIMIT),
    "pivot": QuerySpec(q_pivot, SQL_PIVOT),
    "tpch_q1": QuerySpec(q_tpch_q1, SQL_TPCH_Q1),
    "tpch_q3": QuerySpec(q_tpch_q3, SQL_TPCH_Q3),
    "tpch_q5": QuerySpec(q_tpch_q5, SQL_TPCH_Q5),
    "tpch_q6": QuerySpec(q_tpch_q6, SQL_TPCH_Q6),
    "tpch_q13": QuerySpec(q_tpch_q13, SQL_TPCH_Q13),
    "tpch_q14": QuerySpec(q_tpch_q14, SQL_TPCH_Q14),
    "tpch_q10": QuerySpec(q_tpch_q10, SQL_TPCH_Q10),
    "tpch_q18": QuerySpec(q_tpch_q18, SQL_TPCH_Q18),
    "bitwise_functions": QuerySpec(q_bitwise_functions, SQL_BITWISE_FUNCTIONS),
}
