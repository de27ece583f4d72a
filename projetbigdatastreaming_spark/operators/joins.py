"""Join operators Spark lacks natively (SURVEY.md §2.5 extensions):
as-of join, range join, and a skew-salted equi-join.

All three are pure DataFrame compositions chosen for their shuffle
shape at scale:

- **as-of**: the naive formulation (inequality theta-join + argmax) is
  O(n·m) per key; the union-merge formulation here is one shuffle on
  the key + one sort within partitions — the same cost as a window
  function, and how columnar engines implement ASOF internally.
- **range**: bucketized to turn the interval predicate into an
  equi-join on (key, bucket) with a ±1-bucket expansion — candidate
  pairs are O(pairs within 2 buckets), not O(n²).
- **salted**: spreads a hot key over SALT_BUCKETS sub-keys by
  replicating the build side; result-identical to the plain join
  (salting changes physical distribution only).  AQE's skew-join
  handles moderate skew automatically; explicit salting is for the
  pathological keys AQE's splitting can't fix (one key > executor
  memory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    strict: bool = True,
) -> DataFrame:
    """For each left row, attach the latest right row of the same key
    with right_ts < left_ts (strict; <= when strict=False).

    Union-merge implementation: tag both sides, union, sort by
    (key, ts, side), and carry the most recent right payload forward
    with last_value(ignoreNulls) over rows-preceding.  At equal
    timestamps the left side sorts *before* the right side, so a
    strict as-of never sees a same-instant right row (in particular a
    row never matches itself in a self-as-of).

    One hash shuffle on `key` + one in-partition sort — no theta-join.
    """
    lcols = left.columns
    side_left = 0 if strict else 2  # non-strict: left sorts after right
    l_tagged = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(side_left).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in right_payload],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols
          if c != key],
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_payload],
    ).select(*lcols, "__ts", "__side", *[f"__r_{c}" for c in right_payload])
    unioned = l_tagged.unionByName(r_tagged)
    # tertiary sort on the first payload column makes the pick among
    # equal-(ts) right rows deterministic
    w = (
        Window.partitionBy(key)
        .orderBy("__ts", "__side", f"__r_{right_payload[0]}")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = unioned.select(
        *lcols,
        "__side",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_payload
        ],
    )
    return carried.where(F.col("__side") != 1).drop("__side")


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_gap_seconds: int,
) -> DataFrame:
    """All (left, right) pairs with the same key and
    |left_ts - right_ts| <= max_gap_seconds.

    The interval predicate becomes an equi-join on (key, bucket) after
    assigning each right row to its bucket and expanding each left row
    to {b-1, b, b+1} — every qualifying pair shares an expanded bucket,
    and the exact predicate filters the ±1 false positives.
    """
    bucket = lambda c: F.floor(F.unix_timestamp(F.col(c)) / max_gap_seconds)  # noqa: E731
    l_exp = left.withColumn(
        "__b", F.explode(F.array(*[bucket(left_ts) + d for d in (-1, 0, 1)]))
    )
    r_b = right.withColumn("__b", bucket(right_ts))
    joined = l_exp.join(r_b, [key, "__b"]).drop("__b")
    gap = F.abs(
        F.unix_timestamp(F.col(left_ts)) - F.unix_timestamp(F.col(right_ts))
    )
    return joined.where(gap <= max_gap_seconds)


SALT_BUCKETS = 8


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = SALT_BUCKETS,
) -> DataFrame:
    """Inner equi-join on `key` with the fact side salted into
    `salt_buckets` sub-keys and the dim side replicated once per salt.

    The salt is a deterministic hash of the whole fact row's key +
    monotonic id surrogate — it only changes which reducer handles the
    row, never the join result.
    """
    fact_salted = fact.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.col(key), F.monotonically_increasing_id()), salt_buckets),
    )
    dim_replicated = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return fact_salted.join(dim_replicated, [key, "__salt"]).drop("__salt")


def salted_join_hotkeys(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    hot_threshold: int,
    salt_buckets: int = SALT_BUCKETS,
) -> DataFrame:
    """Inner equi-join that salts ONLY the hot keys — the
    production-grade refinement of `salted_join`: full salting
    replicates the ENTIRE dim side ``salt_buckets``× even though skew
    lives in a handful of keys.  Here one pass over the fact counts
    per-key rows; keys past ``hot_threshold`` become the (tiny,
    broadcast) hot list; hot fact rows join the salted-replicated hot
    dim slice, cold rows join the dim untouched, and the two branches
    union.  Result-identical to the plain join — the routing predicate
    partitions the fact exactly.

    Scale: the hot list is by construction small (skew means FEW keys
    are hot), so both the broadcast routing filter and the hot-dim
    replication are bounded by |hot|·salt_buckets rows — the dim is
    never replicated at large.  The per-key count is one map-side
    combinable hash-agg on the join key the fact was about to shuffle
    on anyway.  AQE's skew-join handles sort-merge spills reactively;
    this operator is the PROACTIVE form that also fixes
    hash-partition-level imbalance AQE can't split (all of one key's
    rows still land in one task under AQE).
    """
    hot = (
        fact.groupBy(key)
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > hot_threshold)
        .select(key)
    )
    fact_routed = fact.join(
        F.broadcast(hot.withColumn("__hot", F.lit(True))), key, "left"
    )
    dim_routed = dim.join(
        F.broadcast(hot.withColumn("__hot", F.lit(True))), key, "left"
    )
    cold = (
        fact_routed.where(F.col("__hot").isNull())
        .drop("__hot")
        .join(dim_routed.where(F.col("__hot").isNull()).drop("__hot"), key)
    )
    hot_join = salted_join(
        fact_routed.where(F.col("__hot").isNotNull()).drop("__hot"),
        dim_routed.where(F.col("__hot").isNotNull()).drop("__hot"),
        key,
        salt_buckets,
    )
    return cold.unionByName(hot_join)


def key_skew_profile(df: DataFrame, col: str, name: str) -> DataFrame:
    """One-row skew diagnostics for a join key: key cardinality, row
    count, max / exact-median / exact-p99 key multiplicity, the top
    key's row share (integer ppm), and the max/median skew ratio
    (det6) — the inputs `choose_join_strategy` decides on.  Shared
    with the `join_skew_profile` registry query (its DuckDB oracle
    pins the arithmetic).

    Scale plan: two map-side-combinable hash-aggs (key → freq,
    freq → n_keys); percentiles come from the frequency-of-frequency
    relation via the bounded broadcast self-join (the
    `quantile_histogram` pattern), whose width is bounded by the
    MULTIPLICITY domain (max rows per key), never key cardinality or
    row count — no global window enters the plan.
    """
    freq = df.groupBy(F.col(col).alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("f")
    )
    fof = freq.groupBy("f").agg(
        F.count(F.lit(1)).cast("bigint").alias("nk")
    )
    tot = fof.agg(
        F.sum("nk").cast("bigint").alias("n_keys"),
        F.sum(F.col("f") * F.col("nk")).cast("bigint").alias("n_rows"),
        F.max("f").cast("bigint").alias("max_freq"),
    )
    cum = (
        fof.alias("a")
        .join(
            F.broadcast(fof.alias("b")),
            F.col("b.f") <= F.col("a.f"),
        )
        .groupBy(F.col("a.f").alias("f"))
        .agg(F.sum("b.nk").cast("bigint").alias("cum"))
        .crossJoin(F.broadcast(tot))
    )
    pcts = cum.groupBy("n_keys", "n_rows", "max_freq").agg(
        F.min(
            F.when(F.col("cum") * 2 >= F.col("n_keys"), F.col("f"))
        ).cast("bigint").alias("p50_freq"),
        F.min(
            F.when(
                F.col("cum") * 100 >= 99 * F.col("n_keys"),
                F.col("f"),
            )
        ).cast("bigint").alias("p99_freq"),
    )
    return pcts.selectExpr(
        f"'{name}' AS key_name",
        "n_keys",
        "n_rows",
        "max_freq",
        "p50_freq",
        "p99_freq",
        "CAST(1000000 * max_freq DIV n_rows AS BIGINT)"
        " AS top1_share_ppm",
        "CAST(FLOOR(CAST(max_freq AS DOUBLE)"
        " / CAST(p50_freq AS DOUBLE) * 1e6 + 0.5) AS DOUBLE)"
        " / 1e6 AS skew_ratio",
    )


#: `choose_join_strategy` defaults — each mirrors a Spark-side knob:
#: BROADCAST_ROW_LIMIT ≈ autoBroadcastJoinThreshold (10 MB) at ~20 B
#: per narrow dim row; SKEW_FACTOR matches AQE's
#: skewedPartitionFactor default (5: a partition ≥5× the average is
#: "skewed"); SKEW_MIN_ROWS is the absolute floor analogous to AQE's
#: skewedPartitionThresholdInBytes (256 MB ≈ 1 M join-side rows) —
#: below it no strategy beats a plain join no matter the ratio;
#: MONSTER_RATIO separates "one dominant key" (salt it) from "a broad
#: hot tail" (AQE's runtime split is enough); SALT_SHARE_PPM is the
#: unconditional salting trigger — a key holding ≥5% of all rows is
#: several tasks' worth on any realistic partition count.
BROADCAST_ROW_LIMIT = 500_000
SKEW_FACTOR = 5.0
SKEW_MIN_ROWS = 1_000_000
MONSTER_RATIO = 10.0
SALT_SHARE_PPM = 50_000


def choose_join_strategy(
    profile,
    *,
    dim_rows: int | None = None,
    shuffle_partitions: int = 200,
    broadcast_row_limit: int = BROADCAST_ROW_LIMIT,
    skew_factor: float = SKEW_FACTOR,
    skew_min_rows: int = SKEW_MIN_ROWS,
    monster_ratio: float = MONSTER_RATIO,
    salt_share_ppm: int = SALT_SHARE_PPM,
) -> str:
    """Turn a `key_skew_profile` row into a physical join strategy:
    ``"broadcast"`` | ``"plain"`` | ``"aqe_skew"`` | ``"salted"``.

    The decision procedure (thresholds documented on the module
    constants), mirroring how the reference hand-tuned its one
    physical decision (SparkBigData.scala:21,28 — the crossJoin gate
    was flipped by hand after looking at the data; this makes the
    look-at-the-data step an operator):

    1. **broadcast** — if the dim side's row count is known and under
       ``broadcast_row_limit``, skew on the fact key is irrelevant:
       no shuffle happens at all.
    2. **plain** — unless the hottest key exceeds BOTH the absolute
       floor (``skew_min_rows``) and ``skew_factor ×`` the average
       per-partition row budget (``n_rows / shuffle_partitions``),
       every partition fits and any mitigation is pure overhead.
       (At toy scale this branch always wins — correctly.)
    3. **salted** — the skew is ONE dominant key: its multiplicity is
       ``monster_ratio ×`` the p99 key, or it alone holds
       ``salt_share_ppm`` of all rows.  AQE's split leaves every row
       of that key colliding again at the next key-hash stage;
       `salted_join_hotkeys` splits it proactively and replicates
       only the hot dim slice.
    4. **aqe_skew** — a broad hot tail (many moderately-hot keys, no
       monster): AQE's runtime partition splitting rebalances it with
       zero dim replication, so it beats salting.

    ``profile`` may be a Row, dict, or anything with the
    `key_skew_profile` field names.
    """
    get = (
        profile.get
        if isinstance(profile, dict)
        else lambda k: getattr(profile, k)
    )
    n_rows = int(get("n_rows"))
    max_freq = int(get("max_freq"))
    p99_freq = int(get("p99_freq"))
    if dim_rows is not None and dim_rows <= broadcast_row_limit:
        return "broadcast"
    per_task = max(1.0, n_rows / max(1, shuffle_partitions))
    if max_freq <= max(float(skew_min_rows), skew_factor * per_task):
        return "plain"
    share_ppm = 1_000_000 * max_freq // max(1, n_rows)
    if (
        max_freq >= monster_ratio * max(1, p99_freq)
        or share_ppm >= salt_share_ppm
    ):
        return "salted"
    return "aqe_skew"


def strategy_case_expr(shuffle_partitions: int = 200) -> str:
    """The `choose_join_strategy` decision as a SQL CASE expression —
    ONE source of truth for the Spark plan and the DuckDB oracle of
    `join_strategy_advice` (both engines evaluate this text; a pytest
    pins it row-equal to the Python chooser).  Profile-only form: the
    broadcast branch needs the dim side's row count, which a single
    key profile does not carry."""
    # GREATEST(1.0, …) mirrors the Python chooser's per_task clamp so
    # the two renderings stay textually equivalent even under
    # non-default thresholds where a sub-1.0 per-task budget could
    # flip the plain branch (ADVICE r12)
    per_task = (
        f"GREATEST(1.0, CAST(n_rows AS DOUBLE) / {shuffle_partitions}.0)"
    )
    return (
        f"CASE WHEN max_freq <= GREATEST({float(SKEW_MIN_ROWS)!r},"
        f" {SKEW_FACTOR!r} * {per_task}) THEN 'plain'"
        f" WHEN max_freq >= {MONSTER_RATIO!r}"
        f" * GREATEST(1, p99_freq)"
        f" OR top1_share_ppm >= {SALT_SHARE_PPM} THEN 'salted'"
        f" ELSE 'aqe_skew' END"
    )
