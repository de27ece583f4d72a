"""Queries over the custom Python DataSources (sources/pysource.py).

``pysource_synthetic_events`` proves the Spark-4 DataSource API read
path end-to-end with a full value oracle: the generator's fields are
pure functions of the row id (portable md5-prefix hash), so DuckDB
re-derives the identical relation from ``generate_series`` and the
aggregate must match bit-for-bit — partition-parallel custom reads
with groupBy semantics identical to a built-in scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.pysource import register_python_sources
from .registry import QuerySpec

SYN_ROWS = 20_000
SYN_PARTS = 8


def q_pysource_synthetic_events(spark, sf_dir):
    """Aggregate over the ``synthetic_events`` Python DataSource:
    per event_type row count, exact centi-unit value sum (BIGINT — no
    float order-dependence across partitions), and distinct users.

    Scale plan: ``partitions()`` declares 8 independent splits read in
    parallel by executors; the aggregation is an ordinary partial-agg
    shuffle on 5 keys.  A production generator raises `partitions` to
    match cluster cores — the per-partition generator is stateless.
    """
    register_python_sources(spark)
    ev = (
        spark.read.format("synthetic_events")
        .option("rows", str(SYN_ROWS))
        .option("partitions", str(SYN_PARTS))
        .load()
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value_c").alias("sum_value_c"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .orderBy("event_type")
    )


def _duck_h60(salt: str) -> str:
    return (
        "CAST(concat('0x', substr(md5(concat(CAST(i AS VARCHAR),"
        f" '{salt}')), 1, 15)) AS BIGINT)"
    )


SQL_PYSOURCE_SYNTHETIC_EVENTS = f"""
WITH gen AS (
  SELECT i,
         'u' || lpad(CAST({_duck_h60("sy-u")} % 500 AS VARCHAR), 3, '0')
           AS user_id,
         list_extract(['view','click','purchase','signup','share'],
                      CAST({_duck_h60("sy-e")} % 5 AS INTEGER) + 1)
           AS event_type,
         {_duck_h60("sy-v")} % 1000000 AS value_c
  FROM (SELECT unnest(range({SYN_ROWS})) AS i))
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(value_c) AS BIGINT) AS sum_value_c,
       COUNT(DISTINCT user_id) AS n_users
FROM gen
GROUP BY event_type
ORDER BY event_type
"""


REGISTRY: dict[str, QuerySpec] = {
    "pysource_synthetic_events": QuerySpec(
        q_pysource_synthetic_events, SQL_PYSOURCE_SYNTHETIC_EVENTS
    ),
}
