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
