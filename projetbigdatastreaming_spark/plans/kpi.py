"""Flagship query: per-quarter-hour event KPIs.

Re-expresses the reference's only end-to-end analytics query — the
per-quarter-hour tweet KPI pipeline (`IndicateursStreaming.scala:42-184`)
— over the driver's `events` fixture, Spark-first:

reference step                              | this implementation
--------------------------------------------|----------------------------------
from_json(value, schema_indicateurs) (:116) | from_json(props) (P2)
lang IN (en, fr) filter (:117)              | event_type IN (click, view) (P4)
quarter-hour CASE bucketing (:160-165)      | F.window(ts, "15 minutes") (A4)
count(id) OVER (PARTITION BY date, quart)   | groupBy(window).count (A1)
sum(bin_retweet) OVER (...) (:156)          | conditional sum (A2/A3)
round(retweet/tweet*100, 2) (:173)          | round ratio (A5/P9)
aliased projection (:175-181)               | aliased select (P7)
ORDER BY quart_heure (:172)                 | orderBy(window_start) (O1)

The reference computes the per-group totals with analytic window
functions whose ORDER BY equals the PARTITION BY — every row is a peer,
so the "window function" degenerates to a group total replicated per
row.  The idiomatic (and stream-safe, and shuffle-minimal) form is a
groupBy aggregation: one row per quarter-hour, same information.  The
row-multiplicity-preserving analytic form is kept separately as
``agg_analytic_window`` in plans/relational.py for parity.

Scale note: this is a single hash-aggregate over the fact stream —
partial (map-side) aggregation means the shuffle carries only one row
per (task, window) pair, so it scales linearly to 100 TB; no join, no
sort until the final (already tiny) result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import EVENT_PROPS_SCHEMA

#: event types the flagship keeps — analogous to the reference's
#: lang IN ('en','fr') predicate (IndicateursStreaming.scala:117).
FLAGSHIP_EVENT_TYPES = ("click", "view")

#: props.k threshold driving the "engaged" binarization — analogous to
#: retweetCount > 0 → bin_retweet (IndicateursStreaming.scala:166-169).
ENGAGED_THRESHOLD = 50


def parse_events(events: DataFrame) -> DataFrame:
    """P2+P3+P4: JSON-parse props, project, filter.

    Mirrors getParsedData (IndicateursStreaming.scala:110-137) without
    porting its `kakfa_jsons` column-name typo (:116).
    """
    return (
        events.where(F.col("event_type").isin(*FLAGSHIP_EVENT_TYPES))
        .withColumn("props_struct", F.from_json(F.col("props"), EVENT_PROPS_SCHEMA))
        .select(
            "event_id",
            "ts",
            "user_id",
            "event_type",
            "value",
            F.col("props_struct.k").alias("k"),
        )
    )


def quarter_hour_kpis(events: DataFrame) -> DataFrame:
    """A1-A5: per-quarter-hour KPIs (getIndicateursComputed parity,
    IndicateursStreaming.scala:139-184)."""
    parsed = parse_events(events)
    w = F.window(F.col("ts"), "15 minutes")
    return (
        parsed.groupBy(w.alias("w"))
        .agg(
            F.count("event_id").alias("event_count"),
            F.sum(
                F.when(F.col("k") > ENGAGED_THRESHOLD, 1).otherwise(0)
            ).alias("engaged_count"),
        )
        .select(
            F.to_date(F.col("w.start")).alias("event_date"),
            F.concat(
                F.date_format("w.start", "HH:mm"),
                F.lit(" - "),
                F.date_format("w.end", "HH:mm"),
            ).alias("quarter_label"),
            F.col("w.start").alias("window_start"),
            F.col("event_count"),
            F.col("engaged_count"),
            F.round(
                F.col("engaged_count") * 100.0 / F.col("event_count"), 2
            ).alias("engagement_pct"),
        )
        .orderBy("window_start")
    )


#: DuckDB-equivalent oracle.  time_bucket's 15-minute origin aligns with
#: Spark window()'s epoch origin, so bucket boundaries match exactly.
QUARTER_HOUR_KPIS_SQL = """
WITH parsed AS (
    SELECT event_id, ts,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k
    FROM events
    WHERE event_type IN ('click', 'view')
),
bucketed AS (
    SELECT event_id,
           time_bucket(INTERVAL '15 minutes', ts) AS window_start,
           CASE WHEN k > 50 THEN 1 ELSE 0 END AS bin_engaged
    FROM parsed
)
SELECT CAST(window_start AS DATE) AS event_date,
       strftime(window_start, '%H:%M') || ' - '
         || strftime(window_start + INTERVAL '15 minutes', '%H:%M')
         AS quarter_label,
       window_start,
       COUNT(event_id) AS event_count,
       CAST(SUM(bin_engaged) AS BIGINT) AS engaged_count,
       ROUND(SUM(bin_engaged) * 100.0 / COUNT(event_id), 2) AS engagement_pct
FROM bucketed
GROUP BY 1, 2, 3
ORDER BY window_start
"""
