"""Scalable ordered analytics — the two-level parallel prefix sum.

A running sum (cumulative aggregate) over a TOTAL order is the one
window shape Spark cannot hash-partition away: `Window.orderBy(...)`
with no partition key plans a single-partition sort — one task owns
every row, which is why the registry-wide plan audit bans global
windows and why low-cardinality partition keys (5 event types over
100 TB of boundaries) are called out in the sweep-line and TWAP
docstrings.

`running_sum_two_level` is the distributed form those docstrings
promise (the classic parallel prefix / scan decomposition — Blelloch
1990, and what every MPP engine does under the hood):

1. **Range-bucket** the rows on the order key (`repartitionByRange` —
   one shuffle, sampled bounds, the same exchange a global sort would
   pay) and stamp each row with its bucket id.
2. **Within-bucket prefix sums** via a window PARTITIONED by bucket —
   every bucket scans in parallel.
3. **Bucket offsets**: aggregate each bucket to one total row
   (≤ `n_buckets` rows — KB-sized at any data scale), prefix-sum THAT
   tiny relation, and broadcast-join the exclusive offset back.

The only serial step is the prefix over ≤ n_buckets aggregate rows —
a provably-bounded relation, the class the plan audit's global-window
exemption text describes.  Row-level data never passes through a
single-partition window.

Determinism: the result is bucket-invariant (offsets + local prefix
reconstruct the global prefix exactly) PROVIDED the order key is a
total order — pass tie-breaker columns; with duplicate full keys the
split across a bucket boundary would make per-row prefixes ambiguous
(the same caveat any ORDER BY carries).  Sums should be integer-typed
by the caller (the repo-wide cents discipline) so re-association
across buckets is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: default bucket count: enough parallelism for thousands of cores,
#: small enough that the offset relation is always trivial
DEFAULT_BUCKETS = 256


def running_sum_two_level(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running_sum",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Global running sum of ``value_col`` in ``order_cols`` order,
    without a global window — see module docstring.  Output: the
    input columns + ``out_col``.  ``order_cols`` must be a total
    order (include a tie-breaker)."""
    bucketed = (
        df.repartitionByRange(n_buckets, *order_cols)
        .withColumn("__bucket", F.spark_partition_id())
    )
    w_local = (
        Window.partitionBy("__bucket")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # pin the locally-prefixed relation with a LINEAGE-TRUNCATING
    # checkpoint, not a persist: range bucketing SAMPLES its bounds
    # per execution, and the offset side must read the SAME
    # materialized bucketing the row side does.  A persist could be
    # evicted under memory pressure and silently re-derive a
    # DIFFERENT bucketing (misaligned offsets — wrong answers);
    # localCheckpoint removes the lineage entirely, so a lost block
    # is a loud failure, never a silent wrong result (the
    # SCALING.md "plan-size and rewrite traps" tool, applied for
    # determinism rather than plan growth)
    local = bucketed.withColumn(
        "__local", F.sum(value_col).over(w_local)
    ).localCheckpoint(eager=False)
    totals = local.groupBy("__bucket").agg(
        F.max("__local").alias("__total")
    )
    # the ONLY ordered pass over an unpartitioned relation: ≤n_buckets
    # aggregate rows (provably bounded — never row-level data)
    w_off = (
        Window.orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "__bucket",
        F.coalesce(F.sum("__total").over(w_off), F.lit(0)).alias(
            "__offset"
        ),
    )
    out = (
        local.join(F.broadcast(offsets), "__bucket")
        .withColumn(out_col, F.col("__local") + F.col("__offset"))
        .drop("__bucket", "__local", "__offset")
    )
    return out
