"""Count-min-sketch building blocks shared by the batch query
(`plans/sketches.py::q_heavy_hitters_cms`) and the streaming fold-in
(`streaming/sketches.py`).

The CMS is a d×w grid of counters; every key increments one bucket
per depth (independent portable-md5 hash per depth).  Estimates read
the MIN across depths — one-sided error: never an undercount,
overcounts bounded by bucket collision mass.  Because the grid merges
by elementwise ADD, per-partition partial grids (map-side combine)
and per-batch grids (streaming) fold into the same exact structure a
single pass would build — that mergeability is the whole point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import _portable_hash

CMS_DEPTH = 4
CMS_WIDTH = 512


def _bucket_structs(key_col: str):
    return F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                (
                    _portable_hash(F.col(key_col), f"cms{d}") % CMS_WIDTH
                ).alias("b"),
            )
            for d in range(CMS_DEPTH)
        ]
    )


def cms_cells(df: DataFrame, key_col: str) -> DataFrame:
    """Build the (d, b, cnt) grid for one relation: explode each row
    to its d cells, then one hash-agg — map-side combine collapses
    every partition to ≤ d·w rows before the shuffle."""
    return (
        df.select(F.explode(_bucket_structs(key_col)).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_point_estimate(
    cells: DataFrame, probes: DataFrame, key_col: str
) -> DataFrame:
    """Estimate each probe key's count from a grid: min over the
    key's d buckets.  ``cells`` is ≤ d·w rows → broadcast."""
    keyed = probes.select(
        F.col(key_col),
        F.explode(_bucket_structs(key_col)).alias("p"),
    )
    return (
        keyed.join(
            F.broadcast(cells),
            (keyed["p.d"] == cells["d"]) & (keyed["p.b"] == cells["b"]),
            "inner",
        )
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est_cnt"))
    )


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970) — membership screen, bit_or-mergeable
# ---------------------------------------------------------------------------

BLOOM_BITS = 1 << 16
BLOOM_K = 4


def _bloom_positions(df: DataFrame, fp_col: str) -> DataFrame:
    """One (… , pos) row per (row, hash): the BLOOM_K portable-md5
    bit positions of each fingerprint."""
    return df.select(
        "*",
        F.explode(
            F.array(
                *[
                    (
                        _portable_hash(F.col(fp_col), f"bl{i}")
                        % BLOOM_BITS
                    ).cast("int")
                    for i in range(BLOOM_K)
                ]
            )
        ).alias("pos"),
    )


def bloom_cells(df: DataFrame, fp_col: str = "fp") -> DataFrame:
    """(word, bits) bitmap rows — ≤ BLOOM_BITS/32 rows total, 32-bit
    shifts only (no sign-bit divergence in any engine).  Mergeable by
    further bit_or, exactly like the CMS grids merge by addition."""
    return (
        _bloom_positions(df.select(fp_col), fp_col)
        .select(
            F.expr("pos DIV 32").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), pos % 32)").alias("b"),
        )
        .groupBy("word")
        .agg(F.bit_or("b").alias("bits"))
    )


def bloom_probe(
    df: DataFrame, bitmap: DataFrame, fp_col: str = "fp"
) -> DataFrame:
    """Adds ``bloom_hit`` (1 = all k bits set: possibly seen; 0 =
    definitely new) per input row.  The bitmap broadcasts; probing is
    a map-side join + per-row min — no corpus shuffle."""
    cols = df.columns
    probed = (
        _bloom_positions(df, fp_col)
        .withColumn("word", F.expr("pos DIV 32"))
        .join(F.broadcast(bitmap), "word", "left")
        .select(
            *cols,
            F.when(
                F.col("bits").isNotNull()
                & (F.expr("(bits >> (pos % 32)) & 1") == 1),
                1,
            )
            .otherwise(0)
            .alias("h"),
        )
    )
    return probed.groupBy(*cols).agg(
        F.min("h").cast("int").alias("bloom_hit")
    )
