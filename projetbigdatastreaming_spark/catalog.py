"""Table loading for the driver's synthetic parquet fixtures.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}/``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimension tables small enough to broadcast at ANY scale factor (TPC-H
# region/nation are fixed-size; supplier/part/customer grow with sf but
# stay orders of magnitude under the fact tables).  Used by query code
# to pick broadcast joins explicitly.
SMALL_DIMS = frozenset({"region", "nation", "supplier"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # events.ts has shipped as either parquet TIMESTAMP(NANOS) — which
    # Spark's vectorized reader rejects outright, so we read it as raw
    # nanos-long — or as plain TIMESTAMP(MICROS), which reads natively
    # as timestamp_ntz.  Handle both: the nanosAsLong conf is a no-op
    # on µs files, and the long→ntz conversion only applies when the
    # column actually surfaced as a long.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        from pyspark.sql import functions as F

        # Integer `div` — a double division would lose precision at
        # 1e18 ns; truncation to µs matches what DuckDB (and any
        # µs-precision engine) does with the same file.  timestampadd
        # on an NTZ base stays NTZ end-to-end — unlike
        # timestamp_micros(...).cast("timestamp_ntz"), which routes
        # through an LTZ instant and shifts by the session timezone.
        df = df.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ),
        )
    return df


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Repartition for CPU-bound per-row operators (minhash, simhash,
    feature extraction).

    Parquet splits track *bytes* (maxPartitionBytes), so a small-but-
    expensive input (5k docs in one row group) lands in one task and
    serializes on one core.  For operators whose cost is dominated by
    per-row compute rather than IO, parallelism must track cores —
    round-robin repartition is a cheap narrow-ish shuffle of the raw
    rows and unlocks the full executor width.
    """
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view; returns the DataFrames."""
    dfs = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        dfs[name] = df
    return dfs
