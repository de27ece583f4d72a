"""Versioned parquet tables: snapshot isolation, time travel,
crash-safe commits, vacuum — the reproducibility layer a training
pipeline pins data versions with."""

from __future__ import annotations

import os

import pytest

from projetbigdatastreaming_spark.sinks.versioned import (
    list_versions,
    read_version,
    table_history,
    vacuum,
    versioned_append,
    versioned_overwrite,
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _df(spark, ids):
    return spark.createDataFrame([(i, f"d{i}") for i in ids], "id long, v string")


def test_versions_are_immutable_snapshots(spark, tmp_path):
    """Appends and overwrites publish NEW versions; every prior
    version re-reads bit-identically afterward (time travel)."""
    t = str(tmp_path / "vt")
    assert versioned_overwrite(_df(spark, [1, 2]), t) == 1
    assert versioned_append(_df(spark, [3]), t) == 2
    v1 = _rows(read_version(spark, t, 1))
    v2 = _rows(read_version(spark, t, 2))
    assert versioned_overwrite(_df(spark, [9]), t) == 3

    assert _rows(read_version(spark, t, 1)) == v1 == _rows(_df(spark, [1, 2]))
    assert _rows(read_version(spark, t, 2)) == v2 == _rows(_df(spark, [1, 2, 3]))
    assert _rows(read_version(spark, t)) == _rows(_df(spark, [9]))
    assert [h["op"] for h in table_history(t)] == [
        "overwrite",
        "append",
        "overwrite",
    ]
    # append referenced, didn't copy: v2 = v1's files + new ones
    assert table_history(t)[1]["n_files"] > table_history(t)[0]["n_files"]


def test_crashed_commit_is_invisible_and_vacuumable(spark, tmp_path, monkeypatch):
    """Kill a write AFTER the data files land but BEFORE the manifest
    rename: readers still see the old version; vacuum removes the
    orphans; a retried write commits cleanly."""
    from projetbigdatastreaming_spark.sinks import versioned

    t = str(tmp_path / "vt2")
    versioned_overwrite(_df(spark, [1]), t)

    real = versioned._commit

    def boom(table_dir, files, op, batches=None, compose=None):
        raise RuntimeError("killed before manifest rename")

    monkeypatch.setattr(versioned, "_commit", boom)
    with pytest.raises(RuntimeError):
        versioned_append(_df(spark, [2]), t)
    monkeypatch.undo()

    # reader unaffected; orphan files exist
    assert _rows(read_version(spark, t)) == _rows(_df(spark, [1]))
    n_data = len(os.listdir(os.path.join(t, "data")))
    live = table_history(t)[-1]["n_files"]
    assert n_data > live

    mrm, frm = vacuum(t, grace_seconds=0)
    assert mrm == 0 and frm == n_data - live
    assert _rows(read_version(spark, t)) == _rows(_df(spark, [1]))

    # retried write commits as version 2
    assert versioned_append(_df(spark, [2]), t) == 2
    assert _rows(read_version(spark, t)) == _rows(_df(spark, [1, 2]))


def test_vacuum_keep_last_retires_versions_not_shared_files(spark, tmp_path):
    """vacuum(keep_last=1) drops old manifests and their EXCLUSIVE
    files, but files shared into the surviving version stay; the
    survivor re-reads identically, the retired version errors
    clearly."""
    t = str(tmp_path / "vt3")
    versioned_overwrite(_df(spark, [1]), t)
    versioned_append(_df(spark, [2]), t)  # v2 shares v1's files
    want = _rows(read_version(spark, t, 2))

    mrm, frm = vacuum(t, keep_last=1, grace_seconds=0)
    assert mrm == 1 and frm == 0  # v1's files all live on in v2
    assert list_versions(t) == [2]
    assert _rows(read_version(spark, t, 2)) == want
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        read_version(spark, t, 1)

    # an overwrite makes v2's files exclusive to it; keep_last=1 then
    # physically deletes them
    versioned_overwrite(_df(spark, [7]), t)
    mrm, frm = vacuum(t, keep_last=1, grace_seconds=0)
    assert mrm == 1 and frm > 0
    assert _rows(read_version(spark, t)) == _rows(_df(spark, [7]))


def test_empty_table_and_missing_version_errors(spark, tmp_path):
    t = str(tmp_path / "vt4")
    with pytest.raises(FileNotFoundError):
        read_version(spark, t)
    versioned_overwrite(_df(spark, [1]), t)
    with pytest.raises(FileNotFoundError, match="not in"):
        read_version(spark, t, 99)


def test_versioned_cli(spark, tmp_path):
    from projetbigdatastreaming_spark.__main__ import main

    t = str(tmp_path / "vt5")
    versioned_overwrite(_df(spark, [1]), t)
    versioned_append(_df(spark, [2]), t)
    assert main(["maintain", "table-history", t], spark=spark) == 0
    assert main(
        ["maintain", "vacuum-versions", t, "--keep-last", "1"], spark=spark
    ) == 0
    assert list_versions(t) == [2]


def test_versioned_batch_append_restates_on_replay(spark, tmp_path):
    """Streaming versioned appends: 3 batches -> latest == union;
    an at-least-once redelivery of batch 1 publishes a NEW version
    with IDENTICAL rows (restatement, not duplication) while the
    pre-replay versions stay time-travelable."""
    from projetbigdatastreaming_spark.sinks.versioned import (
        versioned_batch_writer,
    )

    t = str(tmp_path / "vt6")
    write = versioned_batch_writer(t)
    for b in range(3):
        write(_df(spark, [b * 10, b * 10 + 1]), b)
    want = _rows(_df(spark, [0, 1, 10, 11, 20, 21]))
    assert _rows(read_version(spark, t)) == want
    v3 = _rows(read_version(spark, t, 3))

    write(_df(spark, [10, 11]), 1)  # redelivery restates batch 1
    assert list_versions(t) == [1, 2, 3, 4]
    assert _rows(read_version(spark, t, 4)) == want
    assert _rows(read_version(spark, t, 3)) == v3
    assert table_history(t)[-1]["op"] == "append_batch:1"

    # vacuum keep_last=1 keeps the latest content readable
    vacuum(t, keep_last=1, grace_seconds=0)
    assert _rows(read_version(spark, t)) == want


def test_versioned_batch_append_over_plain_table(spark, tmp_path):
    """A batch append onto a table seeded by plain overwrite keeps the
    base rows (attributed to a pseudo-batch) alongside the batches."""
    t = str(tmp_path / "vt7")
    versioned_overwrite(_df(spark, [1]), t)
    from projetbigdatastreaming_spark.sinks.versioned import (
        versioned_append_batch,
    )

    versioned_append_batch(_df(spark, [2]), t, 0)
    assert _rows(read_version(spark, t)) == _rows(_df(spark, [1, 2]))
    versioned_append_batch(_df(spark, [3]), t, 0)  # restates batch 0
    assert _rows(read_version(spark, t)) == _rows(_df(spark, [1, 3]))


def test_plain_append_between_batches_stays_replay_safe(spark, tmp_path):
    """Regression (ADVICE r08): a plain versioned_append committed
    AFTER batch commits used to drop the manifest's 'batches'
    attribution — a later redelivery of an old batch_id then kept the
    old batch's files under '__base__' AND wrote restated files,
    duplicating that batch's rows.  Attribution now survives plain
    appends and overwrites."""
    from projetbigdatastreaming_spark.sinks.versioned import (
        versioned_append_batch,
    )

    t = str(tmp_path / "vt9")
    versioned_append_batch(_df(spark, [1]), t, 0)
    versioned_append_batch(_df(spark, [2]), t, 1)
    versioned_append(_df(spark, [3]), t)  # plain append interleaved
    # redelivery of batch 1 must RESTATE, not duplicate
    versioned_append_batch(_df(spark, [2]), t, 1)
    assert _rows(read_version(spark, t)) == _rows(_df(spark, [1, 2, 3]))

    # an overwrite resets attribution to __base__; a redelivered batch
    # restates on top of it without disturbing the base rows
    versioned_overwrite(_df(spark, [7]), t)
    versioned_append_batch(_df(spark, [8]), t, 2)
    versioned_append_batch(_df(spark, [9]), t, 2)  # restates batch 2
    assert _rows(read_version(spark, t)) == _rows(_df(spark, [7, 9]))


def test_version_changes_all_columns_are_keys(spark, tmp_path):
    """Regression (ADVICE r08): key_cols covering every column used to
    raise (xxhash64 needs >=1 arg); now an existence-only compare —
    inserts/deletes only, updates impossible by construction."""
    from projetbigdatastreaming_spark.sinks.versioned import (
        version_changes,
    )

    t = str(tmp_path / "vt10")
    versioned_overwrite(_df(spark, [1, 2]), t)
    versioned_overwrite(_df(spark, [2, 3]), t)
    got = {
        (r.id, r.v, r.change)
        for r in version_changes(spark, t, 1, 2, ["id", "v"]).collect()
    }
    assert got == {(1, "d1", "delete"), (3, "d3", "insert")}


def test_schema_evolution_merge_read(spark, tmp_path):
    """Additive schema evolution: an append with a new column commits;
    merge_schema=True reads the union schema with NULLs for
    pre-evolution rows; the default read and old-version time travel
    are unaffected."""
    t = str(tmp_path / "vt12")
    versioned_overwrite(_df(spark, [1]), t)
    wide = spark.createDataFrame(
        [(2, "d2", 9.5)], "id long, v string, score double"
    )
    versioned_append(wide, t)

    merged = read_version(spark, t, merge_schema=True)
    assert set(merged.columns) == {"id", "v", "score"}
    got = {(r.id, r.v, r.score) for r in merged.collect()}
    assert got == {(1, "d1", None), (2, "d2", 9.5)}
    # v1 time travel unaffected by the evolution
    assert _rows(read_version(spark, t, 1)) == _rows(_df(spark, [1]))


def test_consume_changes_durable_cursor(spark, tmp_path):
    """Subscribe-to-table: consume_changes returns everything since
    the cursor, commit() advances it durably, a crash before commit
    re-reads the identical feed (at-least-once), multi-version gaps
    fold into one diff."""
    from projetbigdatastreaming_spark.sinks.versioned import (
        consume_changes,
    )

    t = str(tmp_path / "vt11")
    cursor = str(tmp_path / "cursor")
    versioned_overwrite(_df(spark, [1, 2]), t)  # v1 = baseline

    # no changes yet: first call baselines at the earliest version
    ch, latest, commit = consume_changes(spark, t, ["id"], cursor)
    assert latest == 1 and ch.count() == 0
    commit()

    versioned_overwrite(_df(spark, [2, 3]), t)  # v2: -1 +3
    versioned_overwrite(_df(spark, [3, 4]), t)  # v3: -2 +4
    ch, latest, commit = consume_changes(spark, t, ["id"], cursor)
    got = {(r.id, r.change) for r in ch.collect()}
    # v1 -> v3 folded: 1,2 deleted; 3,4 inserted
    assert latest == 3
    assert got == {
        (1, "delete"), (2, "delete"), (3, "insert"), (4, "insert"),
    }

    # crash before commit: the SAME feed comes back
    ch2, latest2, commit2 = consume_changes(spark, t, ["id"], cursor)
    assert latest2 == 3
    assert {(r.id, r.change) for r in ch2.collect()} == got
    commit2()

    # after commit: empty until the next version lands
    ch3, latest3, _ = consume_changes(spark, t, ["id"], cursor)
    assert latest3 == 3 and ch3.count() == 0


def test_version_changes_cdc(spark, tmp_path):
    """Change feed between versions: insert/delete/update classified,
    unchanged keys absent, schema drift rejected."""
    from projetbigdatastreaming_spark.sinks.versioned import (
        version_changes,
    )

    t = str(tmp_path / "vt8")
    versioned_overwrite(
        spark.createDataFrame(
            [(1, "d1"), (2, "d2"), (4, "same")], "id long, v string"
        ),
        t,
    )
    versioned_overwrite(
        spark.createDataFrame(
            [(2, "d2x"), (3, "d3"), (4, "same")], "id long, v string"
        ),
        t,
    )
    got = {
        (r.id, r.change)
        for r in version_changes(spark, t, 1, 2, ["id"]).collect()
    }
    assert got == {(1, "delete"), (2, "update"), (3, "insert")}

    versioned_overwrite(
        spark.createDataFrame([(1, 2.0)], "id long, other double"), t
    )
    with pytest.raises(ValueError, match="schema changed"):
        version_changes(spark, t, 2, 3, ["id"])


def test_replicate_versioned_incremental(spark, tmp_path):
    """CDC-driven replica: bootstrap full copy, then each sync applies
    only the delta (upserts + deletes) and the replica equals the
    source's latest version; a crash before the cursor commit
    re-applies the same diff idempotently."""
    from projetbigdatastreaming_spark.sinks.versioned import (
        replicate_versioned,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "replica")
    cursor = str(tmp_path / "replica.cursor")

    versioned_overwrite(_df(spark, [1, 2, 3]), src)
    n = replicate_versioned(spark, src, dst, ["id"], cursor)
    assert n == 3  # bootstrap copies the full latest version
    assert _rows(spark.read.parquet(dst)) == _rows(_df(spark, [1, 2, 3]))

    # source evolves: 1 deleted, 2 updated, 4 inserted (two versions)
    versioned_overwrite(
        spark.createDataFrame(
            [(2, "UPDATED"), (3, "d3")], "id long, v string"
        ),
        src,
    )
    versioned_append(_df(spark, [4]), src)
    n = replicate_versioned(spark, src, dst, ["id"], cursor)
    assert n == 3  # delete(1) + update(2) + insert(4), folded
    want = sorted([(2, "UPDATED"), (3, "d3"), (4, "d4")])
    assert _rows(spark.read.parquet(dst)) == want

    # in sync: zero-row delta, replica untouched
    assert replicate_versioned(spark, src, dst, ["id"], cursor) == 0

    # crash before cursor commit: re-applying the same diff converges
    versioned_overwrite(
        spark.createDataFrame([(4, "d4")], "id long, v string"), src
    )
    import os

    pre = open(cursor).read()
    replicate_versioned(spark, src, dst, ["id"], cursor)
    with open(cursor, "w") as fh:  # simulate lost cursor commit
        fh.write(pre)
    n = replicate_versioned(spark, src, dst, ["id"], cursor)
    assert n == 2  # the same delete(2)+delete(3) diff re-applies
    assert _rows(spark.read.parquet(dst)) == [(4, "d4")]


def test_replicate_cli(spark, tmp_path):
    from projetbigdatastreaming_spark.__main__ import main

    src = str(tmp_path / "src2")
    dst = str(tmp_path / "replica2")
    cursor = str(tmp_path / "r2.cursor")
    versioned_overwrite(_df(spark, [1, 2]), src)
    assert main(
        [
            "maintain", "replicate", src,
            "--dst", dst, "--key-cols", "id", "--cursor", cursor,
        ],
        spark=spark,
    ) == 0
    assert _rows(spark.read.parquet(dst)) == _rows(_df(spark, [1, 2]))
    assert main(["maintain", "replicate", src], spark=spark) == 2


def test_read_version_asof_timestamp(spark, tmp_path):
    """Timestamp time travel: the snapshot visible at T is the highest
    version committed at or before T; pre-first-commit times raise."""
    import time

    from projetbigdatastreaming_spark.sinks.versioned import (
        read_version_asof,
        version_asof,
    )

    t = str(tmp_path / "vt_asof")
    before = time.time()
    versioned_overwrite(_df(spark, [1]), t)
    mid = time.time()
    time.sleep(0.05)
    versioned_overwrite(_df(spark, [2]), t)

    assert version_asof(t, mid) == 1
    assert _rows(read_version_asof(spark, t, mid)) == _rows(_df(spark, [1]))
    assert version_asof(t, time.time()) == 2
    with pytest.raises(FileNotFoundError, match="at or before"):
        version_asof(t, before - 10)


def test_versioned_enrich_pins_dim_version_across_replay(spark, tmp_path):
    """Stream enrichment against a versioned dim: each batch pins the
    dim version it joined; a redelivery AFTER the dim advanced
    restates with the PINNED version, so replay output is identical —
    the reproducible-feature-join contract."""
    from projetbigdatastreaming_spark.sinks.versioned import (
        versioned_overwrite,
    )
    from projetbigdatastreaming_spark.streaming.joins import (
        read_enriched,
        versioned_enrich_writer,
    )

    dim_dir = str(tmp_path / "dim")
    out_dir = str(tmp_path / "enriched")
    v1 = versioned_overwrite(
        spark.createDataFrame(
            [(1, "bronze"), (2, "silver")], "user_id int, tier string"
        ),
        dim_dir,
    )
    write = versioned_enrich_writer(out_dir, dim_dir, on="user_id")
    batch0 = spark.createDataFrame(
        [(1, 100), (2, 200), (3, 300)], "user_id int, cents int"
    )
    write(batch0, 0)
    rows0 = {
        (r.user_id, r.tier, r.dim_version)
        for r in read_enriched(spark, out_dir).collect()
    }
    assert rows0 == {(1, "bronze", v1), (2, "silver", v1), (3, None, v1)}

    # dim advances (new full snapshot): user 1 promoted, user 3 appears
    v2 = versioned_overwrite(
        spark.createDataFrame(
            [(1, "gold"), (2, "silver"), (3, "bronze")],
            "user_id int, tier string",
        ),
        dim_dir,
    )
    assert v2 > v1
    batch1 = spark.createDataFrame(
        [(3, 400)], "user_id int, cents int"
    )
    write(batch1, 1)
    got1 = [
        (r.tier, r.dim_version)
        for r in read_enriched(spark, out_dir)
        .where("batch_id = 1")
        .collect()
    ]
    assert got1 == [("bronze", v2)]

    # redelivery of batch 0 AFTER v2 landed: must restate against v1
    write(batch0, 0)
    rows0_replayed = {
        (r.user_id, r.tier, r.dim_version)
        for r in read_enriched(spark, out_dir)
        .where("batch_id = 0")
        .collect()
    }
    assert rows0_replayed == rows0


def test_schema_drift_reports_additive_evolution(spark, tmp_path):
    from projetbigdatastreaming_spark.sinks.versioned import (
        schema_drift,
        versioned_append,
    )

    t = str(tmp_path / "drift")
    versioned_overwrite(
        spark.createDataFrame([(1, "x")], "id int, a string"), t
    )
    versioned_append(
        spark.createDataFrame([(2, "y", 9)], "id int, a string, b int"),
        t,
    )
    versioned_overwrite(
        spark.createDataFrame([(3,)], "id int"), t
    )
    report = schema_drift(spark, t)
    assert report == [
        {"v_from": 1, "v_to": 2, "added": ["b"], "removed": []},
        {"v_from": 2, "v_to": 3, "added": [], "removed": ["a", "b"]},
    ]


def test_snapshot_group_reads_are_cross_table_consistent(spark, tmp_path):
    """Snapshot groups: a reader resolving through the group sees the
    pinned (orders, items) PAIR even while the publisher has already
    advanced both member tables; the next group commit exposes the
    new pair atomically."""
    from projetbigdatastreaming_spark.sinks.versioned import (
        commit_group,
        read_group,
        versioned_overwrite,
    )

    orders_t = str(tmp_path / "orders_t")
    items_t = str(tmp_path / "items_t")
    group = str(tmp_path / "grp")
    dirs = {"orders": orders_t, "items": items_t}

    vo1 = versioned_overwrite(
        spark.createDataFrame([(1, "A")], "okey int, status string"),
        orders_t,
    )
    vi1 = versioned_overwrite(
        spark.createDataFrame([(1, 10)], "okey int, qty int"), items_t
    )
    g1 = commit_group(group, {"orders": vo1, "items": vi1})

    # publisher advances BOTH tables (a new order + its items) but has
    # not yet committed the group — a mid-update reader must still see
    # the old consistent pair
    vo2 = versioned_overwrite(
        spark.createDataFrame(
            [(1, "A"), (2, "B")], "okey int, status string"
        ),
        orders_t,
    )
    snap = read_group(spark, group, dirs)
    assert snap["orders"].count() == 1 and snap["items"].count() == 1

    vi2 = versioned_overwrite(
        spark.createDataFrame([(1, 10), (2, 20)], "okey int, qty int"),
        items_t,
    )
    snap = read_group(spark, group, dirs)  # still the old pair
    assert snap["orders"].count() == 1 and snap["items"].count() == 1

    g2 = commit_group(group, {"orders": vo2, "items": vi2})
    assert g2 == g1 + 1
    snap = read_group(spark, group, dirs)
    assert snap["orders"].count() == 2 and snap["items"].count() == 2
    # and the OLD group stays readable (time travel across the group)
    old = read_group(spark, group, dirs, group_version=g1)
    assert old["orders"].count() == 1 and old["items"].count() == 1
