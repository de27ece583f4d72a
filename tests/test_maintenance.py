"""Small-file compaction tests: row parity, file-count collapse, and
range clustering that actually enables footer-stat pruning."""

from __future__ import annotations

import os

import pytest

from projetbigdatastreaming_spark.maintenance import compact_parquet


def _n_parquet_files(path):
    return sum(
        1
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )


def _fragmented(spark, path, n_rows=5000, n_files=40, pad_expr="repeat('x', 50)"):
    df = spark.range(n_rows).selectExpr(
        "id", "id % 97 AS k", f"{pad_expr} AS pad"
    )
    df.repartition(n_files).write.parquet(path)
    return df


def test_compaction_collapses_files_preserves_rows(spark, tmp_path):
    src, dst = str(tmp_path / "frag"), str(tmp_path / "compact")
    _fragmented(spark, src)
    assert _n_parquet_files(src) == 40
    n = compact_parquet(spark, src, dst, target_mb=256)
    assert n == 1  # tiny table -> one target-size file
    assert _n_parquet_files(dst) == 1
    a = spark.read.parquet(src).orderBy("id").collect()
    b = spark.read.parquet(dst).orderBy("id").collect()
    assert a == b


def test_clustered_compaction_gives_disjoint_file_ranges(spark, tmp_path):
    src, dst = str(tmp_path / "frag2"), str(tmp_path / "clustered")
    # incompressible payload so the source clears several MB on disk
    _fragmented(
        spark, src, n_rows=60_000,
        pad_expr="repeat(md5(cast(id AS string)), 2)",
    )
    # force multiple output files to observe the range partitioning
    n = compact_parquet(spark, src, dst, target_mb=1, cluster_by="id")
    files = sorted(
        os.path.join(dst, f)
        for f in os.listdir(dst)
        if f.endswith(".parquet")
    )
    assert n == len(files) >= 2
    ranges = []
    for f in files:
        rows = spark.read.parquet(f).selectExpr(
            "min(id) AS lo", "max(id) AS hi"
        ).collect()[0]
        ranges.append((rows.lo, rows.hi))
    ranges.sort()
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev < lo_next  # disjoint -> min/max stats prune files


def test_merge_upsert_partitioned_touches_only_batch_partitions(
    spark, tmp_path
):
    from projetbigdatastreaming_spark.maintenance import merge_upsert

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [("d1", 1, "a"), ("d1", 2, "b"), ("d2", 3, "c"), ("d3", 4, "d")],
        "day string, k int, v string",
    )
    base.write.partitionBy("day").parquet(path)
    import os

    d3_files = {
        f: os.path.getmtime(os.path.join(path, "day=d3", f))
        for f in os.listdir(os.path.join(path, "day=d3"))
        if f.endswith(".parquet")
    }

    updates = spark.createDataFrame(
        [("d1", 2, "B"), ("d2", 5, "e")], "day string, k int, v string"
    )
    merge_upsert(spark, path, updates, ["k"], partition_by=["day"])

    got = {
        (str(r.day), r.k, r.v) for r in spark.read.parquet(path).collect()
    }
    assert got == {
        ("d1", 1, "a"), ("d1", 2, "B"),  # update applied, sibling kept
        ("d2", 3, "c"), ("d2", 5, "e"),  # insert into existing partition
        ("d3", 4, "d"),                  # untouched partition intact
    }
    # untouched partition's files were not rewritten
    d3_after = {
        f: os.path.getmtime(os.path.join(path, "day=d3", f))
        for f in os.listdir(os.path.join(path, "day=d3"))
        if f.endswith(".parquet")
    }
    assert d3_after == d3_files


def test_merge_upsert_unpartitioned_full_rewrite(spark, tmp_path):
    from projetbigdatastreaming_spark.maintenance import merge_upsert

    path = str(tmp_path / "u")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "k int, v string"
    ).write.parquet(path)
    merge_upsert(
        spark,
        path,
        spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string"),
        ["k"],
    )
    got = {(r.k, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}


def _crash_merge(spark, path, updates, point):
    """Run merge_upsert but die at the chosen promotion kill point.
    Points: 'mid_swap' (table renamed to .old, staging complete, not
    yet promoted), 'after_swap' (new table promoted, .old not yet
    cleaned up)."""
    from unittest import mock

    from projetbigdatastreaming_spark import maintenance as mt

    real_rename = os.rename

    def dying_rename(src, dst):
        if point == "mid_swap" and src.endswith(
            mt._MERGE_STAGING
        ):
            raise RuntimeError("killed mid swap")
        real_rename(src, dst)
        if src.endswith(mt._MERGE_STAGING):
            raise RuntimeError("killed after swap")

    with mock.patch.object(mt.os, "rename", side_effect=dying_rename):
        try:
            mt.merge_upsert(spark, path, updates, ["k"])
        except RuntimeError:
            pass


@pytest.mark.parametrize("point", ["mid_swap", "after_swap"])
def test_merge_upsert_unpartitioned_crash_safe(spark, tmp_path, point):
    """Round-4 verdict finding: the old cache-then-overwrite-same-path
    fallback could lose the table to a crash mid-write.  The staged
    promotion must leave a durable copy at every kill point and the
    next merge must repair and apply cleanly."""
    from projetbigdatastreaming_spark.maintenance import merge_upsert

    path = str(tmp_path / f"u_{point}")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "k int, v string"
    ).write.parquet(path)
    upd = spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string")

    _crash_merge(spark, path, upd, point)
    # a durable copy exists at the kill point: either the old table
    # (set aside, staging complete) or the already-promoted new one
    if point == "mid_swap":
        assert not os.path.isdir(path)
        assert os.path.isdir(path + ".__merge_old__")
        assert os.path.exists(
            os.path.join(path + ".__merge_staging__", "_SUCCESS")
        )
    else:
        assert os.path.isdir(path)
        assert os.path.isdir(path + ".__merge_old__")

    # the next merge repairs the state, then applies its own change
    upd2 = spark.createDataFrame([(4, "d")], "k int, v string")
    merge_upsert(spark, path, upd2, ["k"])
    got = {(r.k, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c"), (4, "d")}
    assert not os.path.isdir(path + ".__merge_old__")
    assert not os.path.isdir(path + ".__merge_staging__")


@pytest.mark.parametrize("point", ["mid_swap", "after_swap"])
def test_readers_heal_mid_swap_crash(spark, tmp_path, point):
    """Round-5 review finding: after a mid-swap crash the table dir is
    absent until the NEXT merge call — other readers used to fail
    path-not-found.  `repair_table` (and `compact_parquet`, which
    calls it) must heal the swap without a merge."""
    from projetbigdatastreaming_spark.maintenance import (
        compact_parquet,
        repair_table,
    )

    path = str(tmp_path / f"heal_{point}")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "k int, v string"
    ).write.parquet(path)
    upd = spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string")
    _crash_merge(spark, path, upd, point)

    # an arbitrary reader heals the state without calling merge_upsert
    assert repair_table(path) is True
    got = {(r.k, r.v) for r in spark.read.parquet(path).collect()}
    # mid_swap promotes the complete staging (merge applied);
    # after_swap just clears the leftover .old (merge already applied)
    assert got == {(1, "a"), (2, "B"), (3, "c")}
    assert not os.path.isdir(path + ".__merge_old__")
    assert not os.path.isdir(path + ".__merge_staging__")

    # compact_parquet heals on its own read path too
    _crash_merge(
        spark,
        path,
        spark.createDataFrame([(4, "d")], "k int, v string"),
        point,
    )
    out = str(tmp_path / f"heal_{point}_compact")
    assert compact_parquet(spark, path, out) >= 1
    kept = {(r.k, r.v) for r in spark.read.parquet(out).collect()}
    assert kept == {(1, "a"), (2, "B"), (3, "c"), (4, "d")}


def test_merge_upsert_recovers_incomplete_staging(spark, tmp_path):
    """A staging dir without Spark's _SUCCESS marker (kill mid-write)
    must be discarded, never promoted — the intact table wins."""
    from projetbigdatastreaming_spark.maintenance import merge_upsert

    path = str(tmp_path / "u_incomplete")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "k int, v string"
    ).write.parquet(path)
    staging = path + ".__merge_staging__"
    os.makedirs(staging)
    with open(os.path.join(staging, "part-garbage.parquet"), "wb") as fh:
        fh.write(b"\x00not parquet")

    upd = spark.createDataFrame([(3, "c")], "k int, v string")
    merge_upsert(spark, path, upd, ["k"])
    got = {(r.k, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a"), (2, "b"), (3, "c")}
    assert not os.path.isdir(staging)


def test_zorder_write_improves_two_dim_locality(spark, sf_dir, tmp_path):
    """Files written along the Morton curve must cover strictly
    smaller (user x value) rectangles than a plain one-column sort —
    the min/max-stats pruning win z-ordering exists for."""
    from pyspark.sql import functions as F

    from projetbigdatastreaming_spark.catalog import load_table
    from projetbigdatastreaming_spark.maintenance import zorder_write

    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    zdir, sdir = str(tmp_path / "zord"), str(tmp_path / "sorted")
    zorder_write(ev, zdir, "user_id", "value", bits=8, n_files=8)
    (
        ev.repartitionByRange(8, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(sdir)
    )

    def mean_spans(path):
        df = spark.read.parquet(path).select(
            F.input_file_name().alias("f"),
            (F.col("user_id") % 256).alias("ub"),
            F.expr(
                "(((CAST(value AS BIGINT) % 256) + 256) % 256)"
            ).alias("vb"),
        )
        rows = df.groupBy("f").agg(
            (F.max("ub") - F.min("ub") + 1).alias("uspan"),
            (F.max("vb") - F.min("vb") + 1).alias("vspan"),
        ).collect()
        return (
            sum(r.uspan for r in rows) / len(rows),
            sum(r.vspan for r in rows) / len(rows),
        )

    z_u, z_v = mean_spans(zdir)
    s_u, s_v = mean_spans(sdir)
    # the one-column sort leaves the SECOND dimension unclustered —
    # every file spans (nearly) the whole value range, so a value
    # predicate prunes nothing; the curve bounds it
    assert s_v > 200, (s_u, s_v)  # sorted files: vb effectively full
    assert z_v < s_v * 0.5, (z_v, s_v)  # z files: vb genuinely bounded
    # while the first dimension stays bounded too (not a vb-only sort)
    assert z_u < 200, (z_u, z_v)
    # and no rows were lost or altered
    assert spark.read.parquet(zdir).count() == ev.count()


def test_mv_cdc_refresh_equals_recompute_through_churn(spark, tmp_path):
    """Incrementally-maintained MV == full recompute at every version
    of a history containing inserts, updates, deletes, and a group
    that empties out (must vanish from the view)."""
    from pyspark.sql import functions as F

    from projetbigdatastreaming_spark.maintenance import mv_cdc_refresh
    from projetbigdatastreaming_spark.sinks.versioned import (
        read_version,
        versioned_overwrite,
    )

    t = str(tmp_path / "fact")

    def snap(rows):
        return spark.createDataFrame(
            rows, "id int, grp string, v int"
        )

    def recompute(version):
        return (
            read_version(spark, t, version)
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum("v").cast("bigint").alias("sum_v"),
            )
        )

    def rows(df):
        return sorted(map(tuple, df.collect()))

    v1 = versioned_overwrite(
        snap([(1, "a", 10), (2, "a", 20), (3, "b", 5)]), t
    )
    mv = recompute(v1)

    # v2: update id=1, delete id=3 (group b empties), insert id=4 (new
    # group c)
    v2 = versioned_overwrite(
        snap([(1, "a", 99), (2, "a", 20), (4, "c", 7)]), t
    )
    mv = mv_cdc_refresh(
        spark, mv, t, v1, v2, ["id"], ["grp"], "v"
    )
    assert rows(mv) == rows(recompute(v2))
    assert ("b",) not in {(r[0],) for r in rows(mv)}  # emptied group

    # v3: move id=2 from group a to group c (update that crosses
    # groups), delete id=4
    v3 = versioned_overwrite(snap([(1, "a", 99), (2, "c", 20)]), t)
    mv = mv_cdc_refresh(
        spark, mv, t, v2, v3, ["id"], ["grp"], "v"
    )
    assert rows(mv) == rows(recompute(v3))
