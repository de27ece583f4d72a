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
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Running sum of ``value_col`` in ``order_cols`` order — per
    ``partition_cols`` group when given, global otherwise — without
    the order ever serializing through one task (see module
    docstring).  This is the scale path for LOW-CARDINALITY partition
    keys too: a per-event-type running sum over 100 TB has only
    |types| window partitions, so ``Window.partitionBy(type)`` is as
    serial as a global window — measured at the sf10 scale point:
    the sweep-line's 5-type window read 26.7 s (12×/decade,
    super-linear) before this rewrite vs 17.0 s bytes-bound-parallel
    after, and the TWAP's lead window 15.4 s → 4.4 s (2.1×/decade)
    via the sibling `lead_key_two_level`.  Output: the input
    columns + ``out_col``.  ``order_cols`` must be a total order
    within each group (include a tie-breaker)."""
    pcols = list(partition_cols or [])
    bucketed = (
        df.repartitionByRange(n_buckets, *pcols, *order_cols)
        .withColumn("__bucket", F.spark_partition_id())
    )
    w_local = (
        Window.partitionBy(*pcols, "__bucket")
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
    # bucket total = SUM of the values (NOT max of the local prefix:
    # with signed values — the sweep-line's +1/−1 deltas — the prefix
    # is non-monotone and its max is not the bucket's net total);
    # summing over the checkpointed relation reads the same pinned
    # bucketing the row side does
    totals = local.groupBy(*pcols, "__bucket").agg(
        F.sum(value_col).alias("__total")
    )
    # the ONLY ordered pass over the full bucket range: ≤n_buckets
    # aggregate rows per group (provably bounded — never row-level
    # data); partitioned by the group key when one is given
    w_off = (
        Window.partitionBy(*pcols)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *pcols,
        "__bucket",
        F.coalesce(F.sum("__total").over(w_off), F.lit(0)).alias(
            "__offset"
        ),
    )
    out = (
        local.join(F.broadcast(offsets), [*pcols, "__bucket"])
        .withColumn(out_col, F.col("__local") + F.col("__offset"))
        .drop("__bucket", "__local", "__offset")
    )
    return out


def running_max_two_level(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    bucket_col,
    partition_cols: list[str] | None = None,
    max_col: str = "max_running",
    n_col: str = "n_rows",
) -> DataFrame:
    """Per-group MAX of the running sum (plus the group's row count)
    in one linear pass — the fused form of ``running_sum_two_level``
    for consumers that only need the prefix EXTREMUM (the sweep-line's
    peak concurrency), not the per-row prefix.

    ``bucket_col`` is a DETERMINISTIC, order-monotone bucket
    expression over the order key (e.g. the hour number of a
    timestamp).  Deterministic bucketing removes both costs of the
    generic operator: no ``repartitionByRange`` (whose bound SAMPLING
    is an extra input pass) and no ``localCheckpoint`` determinism pin
    (the pin exists only because sampled bounds could differ between
    two consumers of the bucketed relation — here there is exactly ONE
    linear consumer chain and the bucketing is a pure function of the
    row).  The plan is: one hash exchange on (group, bucket) → in-
    bucket prefix window → per-bucket (total, max-prefix, count)
    aggregate riding the SAME exchange → exclusive-offset window over
    the span-bounded bucket relation → final per-group max.  Identity:
    max over rows of the global prefix = max over buckets of
    (exclusive offset + in-bucket max prefix) — exact for integer
    sums under a total order.

    Bucket-width trade-off: buckets must be numerous enough for
    parallelism (≥ cores) and bounded enough that the per-group
    bucket relation stays small (hour buckets: 8.8 k/year/group); a
    pathologically bursty key can make one bucket large, which AQE
    cannot split inside a window — callers with such data should pick
    a finer bucket expression.
    """
    pcols = list(partition_cols or [])
    b = df.withColumn("__bucket", bucket_col)
    w_local = (
        Window.partitionBy(*pcols, "__bucket")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = b.withColumn("__local", F.sum(value_col).over(w_local))
    # groupBy on (group, bucket) is clustering-satisfied by the window
    # exchange — no second row-level shuffle
    per_bucket = local.groupBy(*pcols, "__bucket").agg(
        F.sum(value_col).alias("__total"),
        F.max("__local").alias("__maxlocal"),
        F.count(F.lit(1)).alias("__n"),
    )
    w_off = (
        Window.partitionBy(*pcols)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = per_bucket.withColumn(
        "__offset", F.coalesce(F.sum("__total").over(w_off), F.lit(0))
    )
    return off.groupBy(*pcols).agg(
        F.max(F.col("__offset") + F.col("__maxlocal")).alias(max_col),
        F.sum("__n").alias(n_col),
    )


def consecutive_pairs_two_level(
    df: DataFrame,
    order_cols: list[str],
    bucket_col,
    partition_cols: list[str] | None = None,
    out_col: str = "__next",
) -> DataFrame:
    """Every consecutive (row, next-row-key) pair per group — the
    fused form of ``lead_key_two_level`` for consumers that DROP the
    per-group last row anyway (gap/TWAP aggregates filter
    ``__next IS NULL``): rows whose successor is in the same bucket
    get an in-bucket ``lead``; each bucket's last row gets its
    successor from the next non-empty bucket's first key via a
    span-bounded per-bucket aggregate, UNIONED in rather than
    broadcast-joined back.  Per-group last rows are omitted.

    ``bucket_col`` must be a DETERMINISTIC, order-monotone bucket
    expression (see ``running_max_two_level``): determinism is what
    makes the two consumers of the bucketed relation (the row-level
    lead and the per-bucket firsts/lasts aggregate) safe WITHOUT the
    generic operator's ``localCheckpoint`` pin — both recompute the
    identical bucketing by construction.  Costs removed vs the
    generic form: the range-bound sampling pass, the checkpoint
    materialization of every row, and the broadcast join that touched
    every row to stitch ≤n_buckets of them.  The second input pass
    (firsts/lasts) partial-aggregates map-side to one row per
    (group, bucket) per task, so its exchange is KB-sized.

    Output: the input columns + ``out_col`` (struct<order_cols> of
    the successor), exactly ``n_group_rows - 1`` rows per group.
    """
    pcols = list(partition_cols or [])
    payload = [c for c in df.columns if c not in pcols]
    key = F.struct(*[F.col(c).alias(c) for c in order_cols])
    b = df.withColumn("__bucket", bucket_col)
    w = Window.partitionBy(*pcols, "__bucket").orderBy(*order_cols)
    inb = (
        b.withColumn(out_col, F.lead(key).over(w))
        .where(F.col(out_col).isNotNull())
        .select(*pcols, *payload, out_col)
    )
    # per-bucket last full row + first key (order is total, so the
    # struct max/min pick exactly the boundary rows); partial-agg
    # collapses this map-side before any exchange
    lasts = b.groupBy(*pcols, "__bucket").agg(
        F.max(
            F.struct(
                *[F.col(c).alias(c) for c in order_cols],
                F.struct(
                    *[F.col(c).alias(c) for c in payload]
                ).alias("__row"),
            )
        ).alias("__last"),
        F.min(key).alias("__first"),
    )
    w_f = Window.partitionBy(*pcols).orderBy("__bucket")
    boundary = (
        lasts.withColumn("__next_first", F.lead("__first").over(w_f))
        .where(F.col("__next_first").isNotNull())
        .select(
            *pcols,
            F.col("__last.__row.*"),
            F.col("__next_first").alias(out_col),
        )
    )
    return inb.unionByName(boundary)


def lead_key_two_level(
    df: DataFrame,
    order_cols: list[str],
    partition_cols: list[str] | None = None,
    out_col: str = "__next",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """lead() of the ORDER KEY itself (as a struct of ``order_cols``)
    per ``partition_cols`` group, without the order serializing
    through one task — the two-level form of the other irreducibly
    ordered primitive (running sums being the first): range-bucket,
    lead WITHIN each bucket in parallel, then stitch each bucket's
    last row to the next non-empty bucket's FIRST key via a
    ≤n_buckets-row aggregate (a lead over the per-bucket firsts —
    empty buckets simply don't appear, so the stitch naturally skips
    them).  The group's final row keeps NULL, exactly like a plain
    lead.  Output: the input columns + ``out_col``
    (struct<order_cols>, NULL on the last row per group).

    Same determinism pin as `running_sum_two_level`: the bucketing is
    checkpointed so the row side and the firsts side cannot sample
    different range bounds.
    """
    pcols = list(partition_cols or [])
    key = F.struct(*[F.col(c).alias(c) for c in order_cols])
    bucketed = (
        df.repartitionByRange(n_buckets, *pcols, *order_cols)
        .withColumn("__bucket", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy(*pcols, "__bucket").orderBy(*order_cols)
    led = bucketed.withColumn(out_col, F.lead(key).over(w))
    firsts = bucketed.groupBy(*pcols, "__bucket").agg(
        F.min(key).alias("__first")
    )
    w_f = Window.partitionBy(*pcols).orderBy("__bucket")
    stitch = firsts.select(
        *pcols,
        "__bucket",
        F.lead("__first").over(w_f).alias("__bucket_next"),
    )
    return (
        led.join(F.broadcast(stitch), [*pcols, "__bucket"])
        .withColumn(
            out_col, F.coalesce(F.col(out_col), F.col("__bucket_next"))
        )
        .drop("__bucket", "__bucket_next")
    )
