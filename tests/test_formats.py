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


def test_xml_roundtrip_and_functions(spark, sf_dir, tmp_path):
    """Spark 4 native XML: file-source round-trip parity plus the
    to_xml/from_xml expression pair (schema_of_xml-compatible)."""
    src = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    want = sorted(tuple(r) for r in src.collect())
    path = str(tmp_path / "xmlsrc")
    (src.write.format("xml").option("rowTag", "nation")
        .mode("overwrite").save(path))
    back = (
        spark.read.format("xml").option("rowTag", "nation").load(path)
        .select("n_nationkey", "n_name")  # inference orders alphabetically
    )
    assert sorted(tuple(r) for r in back.collect()) == want

    xml_col = src.select(
        "n_nationkey",
        F.to_xml(F.struct("n_nationkey", "n_name")).alias("x"),
    )
    parsed = xml_col.select(
        "n_nationkey",
        F.from_xml(
            "x", "n_nationkey BIGINT, n_name STRING"
        ).alias("s"),
    ).select("n_nationkey", "s.n_name")
    assert sorted(tuple(r) for r in parsed.collect()) == want
