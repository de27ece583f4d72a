"""Managed-table sinks: partitioned and bucketed writes.

Bucketing is the 100 TB lever the file sinks can't give you: two fact
tables bucketed on the same key with the same bucket count co-locate
their rows, so repeated joins/aggregations on that key run with NO
exchange — the single biggest shuffle eliminator for a star schema
that's joined daily.  (The reference enables Hive support,
SparkBigData.scala:22,29, but never writes a table; this module is the
capability it was holding the door open for.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned_table(
    df: DataFrame,
    name: str,
    partition_by: list[str],
    mode: str = "overwrite",
) -> None:
    """Date/attribute-partitioned managed table → partition pruning for
    free on any filter over the partition columns."""
    df.write.mode(mode).partitionBy(*partition_by).format("parquet").saveAsTable(name)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_key: str,
    n_buckets: int = 16,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (and optionally sort-bucketed) managed table.  Joins
    between two tables bucketed on the same key with equal bucket
    counts skip the shuffle entirely; sorting within buckets also
    skips the sort of a sort-merge join."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_key)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key.  With matching
    bucketing the physical plan contains no Exchange on either side —
    assert via .explain() / the test suite."""
    return spark.table(left_table).join(spark.table(right_table), key)


def analyze_table(
    spark: SparkSession, name: str, columns: list[str] | None = None
) -> None:
    """Collect table statistics (row count / size; per-column ndv,
    min/max, null count when ``columns`` given) into the catalog —
    the input Catalyst's cost-based optimizer needs for join
    reordering and broadcast decisions on managed tables.  On a 100 TB
    warehouse this runs once per table per load, not per query.

    Enable CBO consumption with ``spark.sql.cbo.enabled=true`` (and
    ``spark.sql.cbo.joinReorder.enabled`` for reordering).
    """
    if columns:
        spark.sql(
            f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR COLUMNS "
            + ", ".join(columns)
        )
    else:
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")


def table_stats(spark: SparkSession, name: str) -> dict[str, str]:
    """The collected statistics line from DESCRIBE TABLE EXTENDED —
    empty dict if none gathered yet."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
    return {
        r.col_name: r.data_type
        for r in rows
        if r.col_name in ("Statistics",)
    }
