"""Sketch rebuild after takedown + tombstone-file compaction
(VERDICT r08 items 7 and 8): additive sketches can't delete, so a
retracted document's contribution disappears by REBUILDING the sketch
from the tombstone-filtered base relation — while the stream keeps
appending under the same idempotent-reader protocol."""

from __future__ import annotations

import os

from projetbigdatastreaming_spark.maintenance import rebuild_sketches
from projetbigdatastreaming_spark.streaming.tombstones import (
    compact_tombstones,
    pending_tombstone_files,
    read_pending_tombstones,
    write_tombstones,
)


def _docs(spark, ids):
    # fp = deterministic per-doc fingerprint string; value for hist
    return spark.createDataFrame(
        [(i, f"fp{i}", float(i % 7)) for i in ids],
        "doc_id long, fp string, value double",
    )


def test_rebuild_bloom_drops_retracted_while_stream_appends(
    spark, tmp_path
):
    from projetbigdatastreaming_spark.operators.sketches import bloom_probe
    from projetbigdatastreaming_spark.streaming.sketches import (
        bloom_batch_writer,
        read_bloom,
    )

    state = str(tmp_path / "bloom")
    tomb = str(tmp_path / "tombs")
    base_dir = str(tmp_path / "base")
    write = bloom_batch_writer(state)
    write(_docs(spark, range(0, 20)), 0)
    write(_docs(spark, range(20, 40)), 1)
    _docs(spark, range(0, 40)).write.parquet(base_dir)  # the base relation

    # doc 5 is taken down; before rebuild its bits are still set
    write_tombstones(spark, tomb, [5])
    probe = spark.createDataFrame([("fp5",), ("fp30",)], "fp string")
    pre = {
        r.fp: r.bloom_hit
        for r in bloom_probe(probe, read_bloom(spark, state)).collect()
    }
    assert pre == {"fp5": 1, "fp30": 1}

    n = rebuild_sketches(
        spark,
        spark.read.parquet(base_dir),
        state,
        "bloom",
        tomb_dir=tomb,
        id_col="doc_id",
        column="fp",
    )
    assert n > 0
    post = {
        r.fp: r.bloom_hit
        for r in bloom_probe(probe, read_bloom(spark, state)).collect()
    }
    assert post == {"fp5": 0, "fp30": 1}

    # the stream keeps appending: a post-rebuild batch folds alongside
    # the rebuilt base (idempotent reader, no coordination)
    write(_docs(spark, range(40, 50)), 2)
    probe2 = spark.createDataFrame(
        [("fp5",), ("fp45",), ("fp30",)], "fp string"
    )
    got = {
        r.fp: r.bloom_hit
        for r in bloom_probe(probe2, read_bloom(spark, state)).collect()
    }
    assert got == {"fp5": 0, "fp45": 1, "fp30": 1}


def test_rebuild_cms_equals_filtered_one_pass(spark, tmp_path):
    from projetbigdatastreaming_spark.operators.sketches import cms_cells
    from projetbigdatastreaming_spark.streaming.sketches import (
        cms_batch_writer,
        read_cms,
    )

    state = str(tmp_path / "cms")
    tomb = str(tmp_path / "tombs")
    write = cms_batch_writer(state, "fp")
    write(_docs(spark, range(0, 30)), 0)
    write(_docs(spark, range(30, 60)), 1)
    base = _docs(spark, range(0, 60))
    write_tombstones(spark, tomb, [3, 7, 11])

    rebuild_sketches(
        spark, base, state, "cms",
        tomb_dir=tomb, id_col="doc_id", column="fp",
    )
    want = {
        (r.d, r.b, r.cnt)
        for r in cms_cells(
            base.where("doc_id NOT IN (3, 7, 11)").select("fp"), "fp"
        ).collect()
    }
    got = {(r.d, r.b, r.cnt) for r in read_cms(spark, state).collect()}
    assert got == want

    # additive family: a batch landing after the rebuild SUMS on top
    write(_docs(spark, [100]), 2)
    assert (
        sum(r.cnt for r in read_cms(spark, state).collect())
        > sum(c for _, _, c in want)
    )


def test_rebuild_kmv_and_hist(spark, tmp_path):
    from projetbigdatastreaming_spark.streaming.sketches import (
        read_histogram,
        read_kmv,
    )

    kmv_state = str(tmp_path / "kmv")
    hist_state = str(tmp_path / "hist")
    tomb = str(tmp_path / "tombs")
    base = spark.createDataFrame(
        [(i, f"u{i % 9}", "click" if i % 2 else "view", float(i % 5))
         for i in range(40)],
        "doc_id long, user string, event_type string, value double",
    )
    write_tombstones(spark, tomb, [0, 2, 4, 6, 8])

    rebuild_sketches(
        spark, base, kmv_state, "kmv",
        tomb_dir=tomb, id_col="doc_id", column="user",
    )
    est = {
        r.event_type: r.est_users
        for r in read_kmv(spark, kmv_state).collect()
    }
    # views with doc_id 0..8 even retracted: remaining views are
    # doc_id 10..38 even → users u{(10..38 even) % 9}; exact below k
    kept_view_users = {f"u{i % 9}" for i in range(10, 40, 2)}
    kept_click_users = {f"u{i % 9}" for i in range(1, 40, 2)}
    assert est["view"] == len(kept_view_users)
    assert est["click"] == len(kept_click_users)

    rebuild_sketches(
        spark, base, hist_state, "hist",
        tomb_dir=tomb, id_col="doc_id", column="value",
    )
    total = sum(r.cnt for r in read_histogram(spark, hist_state).collect())
    assert total == 35  # 40 rows minus 5 retracted


def test_compact_tombstones_bounds_files(spark, tmp_path):
    tomb = str(tmp_path / "tombs")
    for i in range(4):
        write_tombstones(spark, tomb, [i * 10, i * 10 + 1])
    assert len(pending_tombstone_files(tomb)) == 4
    want = {
        r.id for r in read_pending_tombstones(spark, tomb).collect()
    }

    nf, ni = compact_tombstones(spark, tomb)
    assert nf == 4 and ni == 8
    assert len(pending_tombstone_files(tomb)) == 1
    got = {r.id for r in read_pending_tombstones(spark, tomb).collect()}
    assert got == want

    # idempotent: folding a single file is a no-op
    assert compact_tombstones(spark, tomb) == (0, 0)

    # a tombstone written after the fold appends a new file; the next
    # fold absorbs it
    write_tombstones(spark, tomb, [99])
    assert len(pending_tombstone_files(tomb)) == 2
    nf, ni = compact_tombstones(spark, tomb)
    assert nf == 2 and ni == 9


def test_rebuild_and_compact_cli(spark, tmp_path):
    from projetbigdatastreaming_spark.__main__ import main

    state = str(tmp_path / "bloom")
    tomb = str(tmp_path / "tombs")
    base_dir = str(tmp_path / "base")
    _docs(spark, range(0, 10)).write.parquet(base_dir)
    write_tombstones(spark, tomb, [1])
    write_tombstones(spark, tomb, [2])

    assert main(
        [
            "maintain", "rebuild-sketches", state,
            "--base", base_dir, "--kind", "bloom", "--column", "fp",
            "--tomb-dir", tomb, "--id-col", "doc_id",
        ],
        spark=spark,
    ) == 0
    assert os.path.isdir(os.path.join(state, "batch_id=-1"))

    assert main(
        ["maintain", "compact-tombstones", tomb], spark=spark
    ) == 0
    assert len(pending_tombstone_files(tomb)) == 1
    # missing required args -> usage error
    assert main(
        ["maintain", "rebuild-sketches", state], spark=spark
    ) == 2
