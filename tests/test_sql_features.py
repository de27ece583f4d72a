"""Recursive CTE + SQL UDF surface: structural properties beyond the
DuckDB value oracle."""

from __future__ import annotations

import __spark_entry__ as entry


def test_recursive_cte_hops_bounded(spark, sf_dir):
    rows = entry.queries()["recursive_cte"](spark, sf_dir).collect()
    assert rows
    hops = {r.min_hops for r in rows}
    assert hops <= {0, 1, 2}
    # the seed nation is reachable at hop 0
    assert 0 in hops


def test_sql_udf_inlines_no_python_eval(spark, sf_dir):
    """A SQL UDF must be a macro: the physical plan contains no Python
    evaluation node and stays inside whole-stage codegen."""
    df = entry.queries()["sql_udf"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    # the function CALL is gone — only the inlined expression remains
    assert "net_revenue(" not in plan
    assert "* (1 - " in plan  # the inlined formula, as written expression


def test_collation_aware_grouping(spark):
    """Spark 4 collations: UTF8_LCASE comparison and grouping treat
    case-variant keys as equal — the engine-level answer to the
    lower()-wrapping the reference era needed for case-insensitive
    analytics."""
    df = spark.createDataFrame(
        [("Paris",), ("PARIS",), ("lyon",), ("Lyon",), ("Lyon",)],
        "city string",
    )
    df.createOrReplaceTempView("collation_cities")
    assert spark.sql(
        "SELECT 'ABC' COLLATE UTF8_LCASE = 'abc' AS eq"
    ).first().eq
    got = {
        r.c.lower(): r.n
        for r in spark.sql(
            """
            SELECT COLLATE(city, 'UTF8_LCASE') AS c, COUNT(*) AS n
            FROM collation_cities
            GROUP BY COLLATE(city, 'UTF8_LCASE')
            """
        ).collect()
    }
    assert got == {"paris": 2, "lyon": 3}
