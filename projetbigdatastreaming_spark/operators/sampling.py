"""Deterministic sampling operators for training-data pipelines.

`df.sample()` is seed-dependent *per partition layout*: the same seed
over a repartitioned corpus selects different rows, so a 100 TB
pipeline can't reproduce yesterday's sample after a compaction.  These
operators hash a stable key instead — membership depends only on the
key value, so the sample is identical across runs, partitionings, and
engines (the DuckDB oracle replays the same md5 formula).

Both are map-only (no shuffle for bernoulli; one partitioned window
for stratified) and push the sampling predicate below any downstream
joins, so at scale they cut the data *before* it moves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _portable_hash(key: Column, salt: str) -> Column:
    """Stable 60-bit non-negative hash of the key (portable to any
    engine with md5: same 15-hex-char prefix idiom the dedup/ANN
    operators use)."""
    return F.conv(
        F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 15),
        16,
        10,
    ).cast("bigint")


def hash_sample(
    df: DataFrame, key: str, rate_pct: int, salt: str = "s0"
) -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff
    hash(key, salt) mod 100 < rate_pct.  Changing the salt draws an
    independent sample (e.g. train/holdout splits that never overlap:
    disjoint residue ranges on the SAME salt)."""
    return df.where(_portable_hash(F.col(key), salt) % 100 < rate_pct)


def stratified_sample(
    df: DataFrame, stratum: str, key: str, n_per_stratum: int,
    salt: str = "s0",
) -> DataFrame:
    """Deterministic fixed-size-per-stratum sample: the n rows with the
    smallest key hashes within each stratum — a reproducible
    "uniform n per language/source" draw for training-mix balancing.

    One hash-partitioned window per stratum (no global sort); ties are
    impossible for distinct keys (60-bit hash), and the hash order is
    itself the tie-break for identical keys.
    """
    h = _portable_hash(F.col(key), salt)
    w = Window.partitionBy(stratum).orderBy(h.asc(), F.col(key).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )


#: denominator mapping the 60-bit hash onto (0, 1) — (h+1)/(2^60+1)
#: never yields exactly 0 or 1, so ln(u) is always finite
_U_DENOM = float(2**60 + 1)


def weighted_sample(
    df: DataFrame, key: str, weight: str, k: int, salt: str = "w0"
) -> DataFrame:
    """Deterministic weight-proportional sample without replacement
    (Efraimidis–Spirakis A-ES): each row draws u = hash-uniform(key) in
    (0,1) and the k rows with the smallest exponential key
    ``-ln(u) / weight`` win — inclusion probability tracks weight, and
    the draw depends only on (key, salt), so it reproduces across
    runs, partitionings, and engines.

    The mixture-sampling primitive of training pipelines: weight by
    token count and the sample follows token mass, not document count.

    Scale plan: the draw key is a map-only expression; top-k compiles
    to TakeOrderedAndProject (per-partition top-k, one tiny merge) —
    no shuffle of the corpus, no global sort.  u is an exact-integer
    ratio so both engines feed identical doubles to ln().
    """
    u = (_portable_hash(F.col(key), salt) + 1) / F.lit(_U_DENOM)
    draw = (-F.log(u) / F.col(weight)).alias("__draw")
    return (
        df.withColumn("__draw", draw)
        .orderBy(F.col("__draw").asc(), F.col(key).asc())
        .limit(k)
    )
