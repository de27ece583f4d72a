"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship quarter-hour KPI query at
sf0.001; ``queries()`` / ``oracle_sql()`` pair every implemented
operator with a DuckDB-checkable ANSI-SQL oracle (SURVEY.md §2
inventory + north-star extensions).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from projetbigdatastreaming_spark.catalog import load_table
from projetbigdatastreaming_spark.plans import (
    advanced,
    kpi,
    llmdata,
    relational,
    subqueries,
)
from projetbigdatastreaming_spark.plans.registry import QuerySpec, merge

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    events = load_table(spark, SMOKE_SF_DIR, "events")
    return kpi.quarter_hour_kpis(events)


def _registry() -> dict[str, QuerySpec]:
    kpi_reg = {
        "kpi_quarter_hour": QuerySpec(
            lambda spark, sf: kpi.quarter_hour_kpis(
                load_table(spark, sf, "events")
            ),
            kpi.QUARTER_HOUR_KPIS_SQL,
        )
    }
    return merge(
        kpi_reg,
        relational.REGISTRY,
        llmdata.REGISTRY,
        advanced.REGISTRY,
        subqueries.REGISTRY,
    )


#: queries bench.py times at sf0.1 — the scalable paths (the O(n²)
#: brute-force baselines dedup_ngram_jaccard / emb_cosine_pairs exist
#: for correctness comparison, not as the scale path)
HEADLINE_QUERIES = (
    "kpi_quarter_hour",
    "tpch_q1",
    "tpch_q3",
    "star_join",
    "join_broadcast_inner",
    "window_topk_per_group",
    "sessionize",
    "agg_groupby",
    "text_stats",
    "dedup_minhash_pairs",
    "dedup_simhash_pairs",
    "emb_cosine_topk",
    "join_asof",
    "multires_rollup",
    "subq_exists",
    "doc_chunking",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in _registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each entry in ``queries()``."""
    return {
        name: spec.oracle
        for name, spec in _registry().items()
        if spec.oracle is not None
    }
