"""Multi-format IO parity: the same relation written to and read back
from every built-in columnar/text format must aggregate identically.
(Format choice is an IO concern, never a semantics concern.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from projetbigdatastreaming_spark.catalog import load_table


def _agg(df):
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"),
        F.count_distinct("l_orderkey").alias("k"),
    ).first()
    return (row.n, str(row.q), row.k)


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_format_roundtrip_parity(spark, sf_dir, tmp_path, fmt):
    src = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_shipdate"
    )
    want = _agg(src)
    path = str(tmp_path / fmt)
    writer = src.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.save(path)
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true").schema(src.schema)
    elif fmt == "json":
        reader = reader.schema(src.schema)
    got = _agg(reader.load(path))
    assert got == want


def test_orc_predicate_pushdown_reaches_scan(spark, sf_dir, tmp_path):
    """ORC scans must carry pushed filters just like parquet — the
    format swap keeps the 100 TB scan-pruning story."""
    src = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    path = str(tmp_path / "orc_pd")
    src.write.mode("overwrite").orc(path)
    df = spark.read.orc(path).where(F.col("l_quantity") > 30).select(
        "l_orderkey"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "GreaterThan(l_quantity" in plan
