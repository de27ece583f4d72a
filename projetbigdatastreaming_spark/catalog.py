"""Table loading for the driver's synthetic parquet fixtures.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}/``.
"""

from __future__ import annotations

import functools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
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


@functools.lru_cache(maxsize=64)
def _ts_is_parquet_nanos(path: str) -> bool:
    """True iff the file's ``ts`` column is annotated TIMESTAMP(NANOS)
    in the parquet footer.

    A LongType in the Spark schema alone is NOT proof of a nanos file:
    a fixture shipping ``ts`` as a plain unannotated INT64 (e.g.
    already-microsecond longs) would surface identically under the
    nanosAsLong legacy conf, and dividing those by 1000 would corrupt
    every timestamp by 1000x with no error.  The footer is the ground
    truth, so read it (pyarrow reads only footer metadata here).
    """
    import pyarrow.parquet as pq

    field = pq.read_schema(path).field("ts")
    import pyarrow as pa

    return pa.types.is_timestamp(field.type) and field.type.unit == "ns"


#: fixture DataFrames cached per (application, sf_dir, table): each
#: load_table call otherwise costs ~90 ms of footer/schema reads, paid
#: once per table per QUERY BUILD — across a 22-query bench run that
#: is seconds of pure metadata overhead.  Only immutable driver
#: fixture dirs are cached (tests writing their own sf_dirs must see
#: fresh files).
_DF_CACHE: dict[tuple[str, str, str], DataFrame] = {}
#: immutable fixture roots: the driver's testdata plus the bench's
#: scaled copy (write-once behind gen_scale's done-marker).  Tests
#: writing their own sf_dirs (tmp paths) stay uncached.
_CACHEABLE_PREFIXES = (
    "/root/testdata/",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_sf1",
    ),
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    cacheable = sf_dir.startswith(_CACHEABLE_PREFIXES)
    if cacheable:
        key = (spark.sparkContext.applicationId, sf_dir, name)
        hit = _DF_CACHE.get(key)
        if hit is not None:
            return hit
    df = _load_table_uncached(spark, sf_dir, name)
    if cacheable:
        _DF_CACHE[key] = df
    return df


def _load_table_uncached(
    spark: SparkSession, sf_dir: str, name: str
) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    # events.ts has shipped as either parquet TIMESTAMP(NANOS) — which
    # Spark's vectorized reader rejects outright, so we read it as raw
    # nanos-long — or as plain TIMESTAMP(MICROS), which reads natively
    # as timestamp_ntz.  The nanosAsLong conf is scoped to the events
    # read (it is still a session-global dynamic conf once set, but it
    # only changes how TIMESTAMP(NANOS) columns surface, and only the
    # events fixture has ever shipped one).
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # Footer check before dividing: LongType alone could also mean
        # a plain-INT64 ts (already µs), which must not be divided.
        if not _ts_is_parquet_nanos(path):
            raise ValueError(
                f"{path}: ts surfaced as LongType but the parquet footer "
                "says it is not TIMESTAMP(NANOS); refusing to guess its "
                "unit (plain INT64 µs divided by 1000 would corrupt "
                "every timestamp silently)"
            )
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


def spread(
    df: DataFrame, partitions: int | None = None, by: str | None = None
) -> DataFrame:
    """Repartition for CPU-bound per-row operators (minhash, simhash,
    feature extraction).

    Parquet splits track *bytes* (maxPartitionBytes), so a small-but-
    expensive input (5k docs in one row group) lands in one task and
    serializes on one core.  For operators whose cost is dominated by
    per-row compute rather than IO, parallelism must track cores —
    repartition is a cheap narrow-ish shuffle of the raw rows and
    unlocks the full executor width.

    ``by`` names a high-cardinality column (a unique id) to HASH-
    partition on instead of round-robin: every keyless
    ``repartition(n)`` first pays a per-task sort of its input rows
    (``spark.sql.execution.sortBeforeRepartition``, on by default so
    retried tasks reproduce their row-to-partition assignment — guide
    §2.5), and for corpus rows that sort keys on the full document
    text.  Hashing a unique id is deterministic under retry with no
    sort, and with |ids| ≫ n the partitions balance the same.
    """
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    if by is not None:
        return df.repartition(n, F.col(by))
    return df.repartition(n)


def register_views(
    spark: SparkSession,
    sf_dir: str,
    only: tuple[str, ...] | None = None,
) -> dict[str, DataFrame]:
    """Register fixture tables as temp views; returns the DataFrames.

    ``only`` restricts registration to the tables a query actually
    reads — each registration costs a parquet footer read, so a
    one-table SQL query should not pay for ten.
    """
    dfs = {}
    for name in only or TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        dfs[name] = df
    return dfs
