"""Scan-layer resilience: a 100 TB table always contains a few corrupt
files; the engine must be able to (a) skip them on demand and keep the
query alive, and (b) fail loudly by default so silent data loss is a
CHOICE, not an accident."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def _write_mixed_dir(spark, path):
    spark.createDataFrame(
        [(i, f"d{i}") for i in range(100)], "id long, s string"
    ).coalesce(1).write.mode("overwrite").parquet(path)
    # a truncated/garbage file alongside the good one
    with open(os.path.join(path, "part-corrupt.parquet"), "wb") as fh:
        fh.write(b"PAR1 this is not a real parquet footer")


def test_corrupt_file_fails_loudly_by_default(spark, tmp_path):
    path = str(tmp_path / "mixed")
    _write_mixed_dir(spark, path)
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")
    with pytest.raises(Exception):
        spark.read.parquet(path).count()


def test_corrupt_file_skipped_when_opted_in(spark, tmp_path):
    path = str(tmp_path / "mixed2")
    _write_mixed_dir(spark, path)
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try:
        df = spark.read.parquet(path)
        assert df.count() == 100
        assert df.agg(F.sum("id")).first()[0] == 4950
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")
