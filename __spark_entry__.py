"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship quarter-hour KPI query at
sf0.001; ``queries()`` / ``oracle_sql()`` pair every implemented
operator with a DuckDB-checkable ANSI-SQL oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from projetbigdatastreaming_spark.catalog import load_table
from projetbigdatastreaming_spark.plans import kpi

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    events = load_table(spark, SMOKE_SF_DIR, "events")
    return kpi.quarter_hour_kpis(events)


def _q_kpi_quarter_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kpi.quarter_hour_kpis(load_table(spark, sf_dir, "events"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {
        "kpi_quarter_hour": _q_kpi_quarter_hour,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each entry in ``queries()``."""
    return {
        "kpi_quarter_hour": kpi.QUARTER_HOUR_KPIS_SQL,
    }
