"""Streaming CMS fold-in: mergeability across micro-batches must be
EXACT (folded per-batch grids == one-pass grid over all data), and an
at-least-once replay must not double-count."""

from __future__ import annotations

from pyspark.sql import functions as F

from projetbigdatastreaming_spark.operators.sketches import (
    cms_cells,
    cms_point_estimate,
)
from projetbigdatastreaming_spark.streaming.sketches import (
    cms_batch_writer,
    read_cms,
)


def _grid(df):
    return {
        (r.d, r.b): r.cnt for r in df.collect()
    }


def test_streaming_cms_merge_equals_one_pass(spark, tmp_path):
    state = str(tmp_path / "cms_state")
    write = cms_batch_writer(state, "user_id")

    b0 = spark.createDataFrame(
        [(f"u{i % 7}",) for i in range(50)], "user_id string"
    )
    b1 = spark.createDataFrame(
        [(f"u{i % 11}",) for i in range(80)], "user_id string"
    )
    write(b0, 0)
    write(b1, 1)

    folded = _grid(read_cms(spark, state))
    one_pass = _grid(cms_cells(b0.unionAll(b1), "user_id"))
    assert folded == one_pass

    # estimates from the folded grid obey the one-sided guarantee
    exact = {
        r.user_id: r.cnt
        for r in b0.unionAll(b1)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    probes = spark.createDataFrame(
        [(k,) for k in exact], "user_id string"
    )
    est = cms_point_estimate(read_cms(spark, state), probes, "user_id")
    for r in est.collect():
        assert r.est_cnt >= exact[r.user_id]


def test_streaming_cms_replay_is_idempotent(spark, tmp_path):
    state = str(tmp_path / "cms_state2")
    write = cms_batch_writer(state, "user_id")
    b0 = spark.createDataFrame([("a",), ("b",), ("a",)], "user_id string")
    b1 = spark.createDataFrame([("b",), ("c",)], "user_id string")
    write(b0, 0)
    write(b1, 1)
    before = _grid(read_cms(spark, state))
    write(b1, 1)  # at-least-once redelivery of the same batch
    assert _grid(read_cms(spark, state)) == before


def test_cms_compaction_preserves_grid(spark, tmp_path):
    """Compacting per-batch grids into the base partition must leave
    read_cms unchanged, and later batches keep folding on top."""
    from projetbigdatastreaming_spark.streaming.sketches import (
        compact_cms,
    )

    state = str(tmp_path / "cms_state3")
    write = cms_batch_writer(state, "user_id")
    for i in range(4):
        write(
            spark.createDataFrame(
                [(f"u{j % 5}",) for j in range(20 + i)], "user_id string"
            ),
            i,
        )
    before = _grid(read_cms(spark, state))
    n = compact_cms(spark, state)
    assert n == len(before)
    assert _grid(read_cms(spark, state)) == before
    # post-compaction ingest folds onto the base grid
    write(spark.createDataFrame([("u0",)], "user_id string"), 10)
    after = _grid(read_cms(spark, state))
    assert sum(after.values()) == sum(before.values()) + 4  # 4 depths
    # re-compaction folds base + later batches and stays read-equal
    compact_cms(spark, state)
    assert _grid(read_cms(spark, state)) == after


def test_cms_compaction_leaves_unsnapshot_batches(spark, tmp_path):
    """A batch partition the live stream writes while compaction runs
    must survive: compact_cms deletes ONLY the partitions it
    snapshot-folded, never the whole directory (round-3 ADVICE: the
    old static full-directory overwrite silently dropped concurrent
    batches)."""
    import os
    from unittest import mock

    from projetbigdatastreaming_spark.streaming import sketches as sk

    state = str(tmp_path / "cms_state4")
    write = cms_batch_writer(state, "user_id")
    write(spark.createDataFrame([("a",), ("b",)], "user_id string"), 0)
    write(spark.createDataFrame([("b",), ("c",)], "user_id string"), 1)

    # inject a concurrent batch AFTER the partition snapshot: patch
    # os.listdir to take the snapshot, then land batch 7 before the
    # fold/delete runs
    real_listdir = os.listdir
    landed = []

    def snoop(path):
        names = real_listdir(path)
        if str(path) == state and not landed:
            landed.append(True)
            write(
                spark.createDataFrame([("z",)], "user_id string"), 7
            )
        return names

    with mock.patch("os.listdir", side_effect=snoop):
        sk.compact_cms(spark, state)

    # batch 7 survived compaction and is part of the read fold
    assert "batch_id=7" in real_listdir(state)
    expect = spark.createDataFrame(
        [("a",), ("b",), ("b",), ("c",), ("z",)], "user_id string"
    )
    from projetbigdatastreaming_spark.operators.sketches import cms_cells

    want = _grid(cms_cells(expect, "user_id"))
    assert _grid(read_cms(spark, state)) == want


def test_cms_compaction_on_missing_or_empty_state(spark, tmp_path):
    """Compacting before the stream ever wrote is a no-op, not a
    crash (fresh deployment ordering)."""
    from projetbigdatastreaming_spark.streaming.sketches import (
        compact_cms,
    )

    assert compact_cms(spark, str(tmp_path / "never_written")) == 0
    empty = tmp_path / "empty_dir"
    empty.mkdir()
    assert compact_cms(spark, str(empty)) == 0


def _crash_compaction(spark, state, point):
    """Run compact_cms but die at the chosen kill point, leaving the
    on-disk state a real kill would leave.  Points: 'before_promote'
    (staging + intent written, base untouched), 'mid_swap' (old base
    renamed aside to batch_id=-3, staged fold not yet promoted),
    'after_promote' (staged fold swapped in as base; the set-aside
    old base and the folded batches not yet deleted)."""
    import os as _os
    from unittest import mock

    from projetbigdatastreaming_spark.streaming import sketches as sk

    real_rename = _os.rename

    def dying_rename(src, dst):
        promoting = src.endswith(f"batch_id={sk.STAGING_ID}")
        if point == "before_promote":
            raise RuntimeError("killed before promotion")
        if point == "mid_swap" and promoting:
            raise RuntimeError("killed mid swap")
        real_rename(src, dst)
        if promoting:
            raise RuntimeError("killed after promotion")

    with mock.patch.object(sk.os, "rename", side_effect=dying_rename):
        try:
            sk.compact_cms(spark, state)
        except RuntimeError:
            pass


def _setup_state(spark, tmp_path, name):
    state = str(tmp_path / name)
    write = cms_batch_writer(state, "user_id")
    write(spark.createDataFrame([("a",), ("b",), ("a",)], "user_id string"), 0)
    write(spark.createDataFrame([("b",), ("c",)], "user_id string"), 1)
    return state, write, _grid(read_cms(spark, state))


def test_cms_compaction_crash_after_promotion_never_double_counts(
    spark, tmp_path
):
    """Round-4 review finding: a kill between the base commit and the
    partition deletes used to leave base AND folded batches on disk,
    silently double-counting every folded batch.  The staged+intent
    protocol must keep reads exact and let the next compaction finish
    the cleanup."""
    import os

    from projetbigdatastreaming_spark.streaming.sketches import (
        compact_cms,
    )

    state, write, before = _setup_state(spark, tmp_path, "cms_crash1")
    _crash_compaction(spark, state, "after_promote")
    # the hazard state really exists: promoted base + folded batches
    assert os.path.isdir(os.path.join(state, "batch_id=-1"))
    assert os.path.isdir(os.path.join(state, "batch_id=0"))
    assert os.path.exists(os.path.join(state, "_COMPACT_INTENT.json"))

    # reads exclude the already-folded partitions: EXACT, not doubled
    assert _grid(read_cms(spark, state)) == before

    # the next compaction finishes the interrupted cleanup
    compact_cms(spark, state)
    assert not os.path.isdir(os.path.join(state, "batch_id=0"))
    assert not os.path.exists(os.path.join(state, "_COMPACT_INTENT.json"))
    assert _grid(read_cms(spark, state)) == before
    # and the stream keeps folding on top afterwards
    write(spark.createDataFrame([("z",)], "user_id string"), 5)
    after = _grid(read_cms(spark, state))
    assert sum(after.values()) == sum(before.values()) + 4  # 4 depths


def test_cms_compaction_crash_before_promotion_stays_exact(
    spark, tmp_path
):
    """A kill after staging but before the base swap: the old state is
    fully intact AND the staged fold is durable — reads must pick ONE
    consistent view (they read the staged grid in place of the folded
    inputs), and the next compaction completes the promotion."""
    import os

    from projetbigdatastreaming_spark.streaming.sketches import (
        compact_cms,
    )

    state, write, before = _setup_state(spark, tmp_path, "cms_crash2")
    _crash_compaction(spark, state, "before_promote")
    assert os.path.exists(os.path.join(state, "_COMPACT_INTENT.json"))
    assert os.path.isdir(os.path.join(state, "batch_id=-2"))  # staged
    assert os.path.isdir(os.path.join(state, "batch_id=0"))  # intact

    assert _grid(read_cms(spark, state)) == before

    # recovery promotes the staged fold and finishes cleanup
    compact_cms(spark, state)
    assert _grid(read_cms(spark, state)) == before
    assert not os.path.exists(os.path.join(state, "_COMPACT_INTENT.json"))
    assert not os.path.isdir(os.path.join(state, "batch_id=-2"))
    assert not os.path.isdir(os.path.join(state, "batch_id=0"))


def _setup_compacted_state(spark, tmp_path, name):
    """A state dir that already HAS a promoted base plus fresh
    batches, so the next compaction exercises the base→aside swap."""
    import os

    from projetbigdatastreaming_spark.streaming.sketches import (
        compact_cms,
    )

    state, write, _ = _setup_state(spark, tmp_path, name)
    compact_cms(spark, state)
    assert os.path.isdir(os.path.join(state, "batch_id=-1"))
    write(spark.createDataFrame([("z",), ("a",)], "user_id string"), 5)
    return state, write, _grid(read_cms(spark, state))


def test_cms_compaction_crash_mid_swap_stays_exact(spark, tmp_path):
    """Round-5 ADVICE: promotion now swaps through an aside rename so
    a kill (or a reader) between the two renames still sees exactly
    one durable grid — the staged fold stands in for the base it was
    replacing, and recovery completes the promotion."""
    import os

    from projetbigdatastreaming_spark.streaming.sketches import (
        compact_cms,
    )

    state, write, before = _setup_compacted_state(
        spark, tmp_path, "cms_crash3"
    )
    _crash_compaction(spark, state, "mid_swap")
    # the hazard state: base set aside, staged fold not yet promoted
    assert not os.path.isdir(os.path.join(state, "batch_id=-1"))
    assert os.path.isdir(os.path.join(state, "batch_id=-3"))
    assert os.path.isdir(os.path.join(state, "batch_id=-2"))
    assert os.path.exists(os.path.join(state, "_COMPACT_INTENT.json"))

    assert _grid(read_cms(spark, state)) == before

    compact_cms(spark, state)
    assert _grid(read_cms(spark, state)) == before
    for leftover in ("batch_id=-3", "batch_id=-2", "batch_id=5"):
        assert not os.path.isdir(os.path.join(state, leftover))
    assert not os.path.exists(os.path.join(state, "_COMPACT_INTENT.json"))


def test_cms_compaction_crash_after_swap_drops_aside(spark, tmp_path):
    """A kill right after the promote rename leaves the set-aside old
    base on disk; its counts already live in the promoted fold, so
    reads must exclude it and recovery must drop it."""
    import os

    from projetbigdatastreaming_spark.streaming.sketches import (
        compact_cms,
    )

    state, write, before = _setup_compacted_state(
        spark, tmp_path, "cms_crash4"
    )
    _crash_compaction(spark, state, "after_promote")
    # promoted base + aside old base + undeleted folded batches
    assert os.path.isdir(os.path.join(state, "batch_id=-1"))
    assert os.path.isdir(os.path.join(state, "batch_id=-3"))
    assert os.path.exists(os.path.join(state, "_COMPACT_INTENT.json"))

    assert _grid(read_cms(spark, state)) == before

    compact_cms(spark, state)
    assert _grid(read_cms(spark, state)) == before
    assert not os.path.isdir(os.path.join(state, "batch_id=-3"))
    assert not os.path.exists(os.path.join(state, "_COMPACT_INTENT.json"))


def test_read_with_stale_aborted_intent_short_circuits(spark, tmp_path):
    """Round-5 review finding: a genuinely-aborted intent (staging
    never durable) lingers until the next compaction, and read_cms
    used to burn its full 20-iteration re-probe budget (~40 collect
    jobs + 1 s of sleeps) on EVERY read of that common state.  Two
    consecutive identical non-matching probe pairs prove the state is
    stable — the reader must stop after them, and still return the
    exact uncompacted fold."""
    from unittest import mock

    from projetbigdatastreaming_spark.streaming import sketches as sk

    state, _write, before = _setup_state(spark, tmp_path, "stale_intent")
    # a kill before the staging write completed: intent present,
    # staging partial/absent, base untouched
    _crash_compaction(spark, state, "before_promote")
    import shutil

    shutil.rmtree(f"{state}/batch_id={sk.STAGING_ID}", ignore_errors=True)

    calls = {"n": 0}
    real = sk._partition_hash

    def counting(spark_, dir_, bid, cols=sk._CMS_COLS):
        calls["n"] += 1
        return real(spark_, dir_, bid, cols)

    with mock.patch.object(sk, "_partition_hash", side_effect=counting):
        got = _grid(read_cms(spark, state))
    assert got == before  # old state stands, fold exact
    # 2 probe pairs (4 calls) prove stability; the old behavior made 40
    assert calls["n"] <= 6, calls["n"]


def test_streaming_bloom_fold_equals_one_pass_and_probe(spark, tmp_path):
    """bit_or fold of per-batch bitmaps == one-pass bitmap; replay is
    idempotent (bit_or is idempotent, stronger than the CMS add); a
    doc ingested in batch 0 bloom-hits from the folded state, a novel
    fingerprint misses (on this tiny fill there are no collisions)."""
    from projetbigdatastreaming_spark.operators.sketches import (
        bloom_cells,
        bloom_probe,
    )
    from projetbigdatastreaming_spark.streaming.sketches import (
        bloom_batch_writer,
        read_bloom,
    )

    state = str(tmp_path / "bloom_state")
    write = bloom_batch_writer(state)
    b0 = spark.createDataFrame([(f"fp{i}",) for i in range(20)], "fp string")
    b1 = spark.createDataFrame(
        [(f"fp{i}",) for i in range(15, 40)], "fp string"
    )
    write(b0, 0)
    write(b1, 1)

    folded = {(r.word, r.bits) for r in read_bloom(spark, state).collect()}
    one_pass = {
        (r.word, r.bits)
        for r in bloom_cells(b0.unionAll(b1), "fp").collect()
    }
    assert folded == one_pass

    write(b1, 1)  # at-least-once replay: restated, not re-OR-ed twice
    assert {
        (r.word, r.bits) for r in read_bloom(spark, state).collect()
    } == folded

    probes = spark.createDataFrame(
        [("fp0",), ("fp39",), ("never-seen-xyz",)], "fp string"
    )
    got = {
        r.fp: r.bloom_hit
        for r in bloom_probe(probes, read_bloom(spark, state)).collect()
    }
    assert got["fp0"] == 1 and got["fp39"] == 1
    assert got["never-seen-xyz"] == 0


import pytest as _pytest


@_pytest.mark.parametrize(
    "point", ["after_stage", "after_aside", "after_promote", "mid_delete"]
)
def test_bloom_compaction_readable_correct_at_every_kill_point(
    spark, tmp_path, point
):
    """The idempotence argument, demonstrated: kill compact_bloom at
    any point and read_bloom — with NO recovery step, no intent
    machinery — still returns the exact membership bits (duplicate
    partitions cannot corrupt a bit_or fold).  A subsequent compaction
    converges to a single base partition with the same bits."""
    import os as _os
    import shutil as _sh
    from unittest import mock

    from projetbigdatastreaming_spark.streaming import sketches as sk
    from projetbigdatastreaming_spark.streaming.sketches import (
        bloom_batch_writer,
        compact_bloom,
        read_bloom,
    )

    state = str(tmp_path / f"bloomc_{point}")
    write = bloom_batch_writer(state)
    write(spark.createDataFrame([(f"a{i}",) for i in range(30)], "fp string"), 0)
    write(spark.createDataFrame([(f"b{i}",) for i in range(30)], "fp string"), 1)
    compact_bloom(spark, state)  # existing base for the aside path
    write(spark.createDataFrame([(f"c{i}",) for i in range(30)], "fp string"), 2)
    want = {(r.word, r.bits) for r in read_bloom(spark, state).collect()}

    real_rename, real_rmtree = _os.rename, _sh.rmtree
    state_holder = {"staged": False, "deletes": 0}

    def dying_rename(src, dst):
        if point == "after_stage" and src.endswith(
            f"batch_id={sk.STAGING_ID}"
        ) is False and src.endswith(f"batch_id={sk.BASE_ID}"):
            raise RuntimeError("killed after stage, before aside-rename")
        real_rename(src, dst)
        if point == "after_aside" and src.endswith(
            f"batch_id={sk.BASE_ID}"
        ):
            raise RuntimeError("killed between aside and promote")
        if point == "after_promote" and src.endswith(
            f"batch_id={sk.STAGING_ID}"
        ):
            raise RuntimeError("killed after promote, before deletes")

    def dying_rmtree(path, **kw):
        if point == "mid_delete" and "batch_id=1" in str(path):
            raise RuntimeError("killed mid-delete")
        real_rmtree(path, **kw)

    with mock.patch.object(sk.os, "rename", side_effect=dying_rename), \
         mock.patch.object(sk.shutil, "rmtree", side_effect=dying_rmtree):
        try:
            compact_bloom(spark, state)
        except RuntimeError:
            pass

    # NO recovery call: the raw fold over whatever survived is exact
    got = {(r.word, r.bits) for r in read_bloom(spark, state).collect()}
    assert got == want, point

    # and the next compaction converges to a single base
    compact_bloom(spark, state)
    parts = [
        n for n in _os.listdir(state) if n.startswith("batch_id=")
    ]
    assert parts == [f"batch_id={sk.BASE_ID}"], parts
    assert {
        (r.word, r.bits) for r in read_bloom(spark, state).collect()
    } == want


def test_streaming_kmv_fold_equals_direct_estimate(spark, tmp_path):
    """Merge-equals-direct, pinned VALUE-exact: the per-batch
    bottom-k fold's estimate must equal q_kmv_distinct's estimate
    over the same events (the k global-smallest hashes are each
    k-smallest in their own batch; below k the folded sample IS the
    distinct set)."""
    from projetbigdatastreaming_spark.catalog import load_table
    from projetbigdatastreaming_spark.plans.sketches import (
        q_kmv_distinct,
    )
    from projetbigdatastreaming_spark.streaming.sketches import (
        kmv_batch_writer,
        read_kmv,
    )

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events").select("event_type", "user_id")
    state = str(tmp_path / "kmv_state")
    write = kmv_batch_writer(state)
    # three arbitrary shards (uneven on purpose)
    write(ev.where("user_id % 5 < 2"), 0)
    write(ev.where("user_id % 5 = 2"), 1)
    write(ev.where("user_id % 5 > 2"), 2)

    folded = {
        r.event_type: r.est_users for r in read_kmv(spark, state).collect()
    }
    direct = {
        r.event_type: r.est_users
        for r in q_kmv_distinct(spark, sf).collect()
    }
    assert folded == direct


def test_streaming_kmv_replay_and_compaction_idempotent(
    spark, tmp_path
):
    """At-least-once redelivery restates the partition; compaction
    via the generic curation protocol (rows unique per natural key,
    reader dedups) preserves every estimate and converges to one
    base partition."""
    import os

    from projetbigdatastreaming_spark.catalog import load_table
    from projetbigdatastreaming_spark.streaming.curation import (
        compact_state,
    )
    from projetbigdatastreaming_spark.streaming.sketches import (
        BASE_ID,
        kmv_batch_writer,
        read_kmv,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_type", "user_id"
    )
    state = str(tmp_path / "kmv_state2")
    write = kmv_batch_writer(state)
    b1 = ev.where("user_id % 3 = 1")
    write(ev.where("user_id % 3 <> 1"), 0)
    write(b1, 1)
    rows = lambda: sorted(
        map(tuple, read_kmv(spark, state).collect())
    )  # noqa: E731
    before = rows()
    write(b1, 1)  # redelivery
    assert rows() == before
    assert compact_state(spark, state) > 0
    parts = [
        n for n in os.listdir(state) if n.startswith("batch_id=")
    ]
    assert parts == [f"batch_id={BASE_ID}"], parts
    assert rows() == before


def test_hist_stream_fold_equals_batch_and_replay(spark, tmp_path):
    """Fixed-bin histogram twin: fold of 3 micro-batches == one-pass
    batch histogram AND the quantile view over the fold == the batch
    quantile_histogram query; a redelivery restates, never
    double-counts."""
    from projetbigdatastreaming_spark.catalog import load_table
    from projetbigdatastreaming_spark.plans.sketches import (
        hist_bin_counts,
        histogram_quantiles,
        q_quantile_histogram,
    )
    from projetbigdatastreaming_spark.streaming.sketches import (
        hist_batch_writer,
        read_histogram,
    )

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events").select("event_id", "value")
    state = str(tmp_path / "hist_state")
    write = hist_batch_writer(state)
    for b in range(3):
        write(ev.where(f"event_id % 3 = {b}"), b)

    folded = sorted(
        map(tuple, read_histogram(spark, state).collect())
    )
    one_pass = sorted(
        map(tuple, hist_bin_counts(ev.select("value")).collect())
    )
    assert folded == one_pass

    got_q = sorted(
        map(
            tuple,
            histogram_quantiles(read_histogram(spark, state)).collect(),
        )
    )
    want_q = sorted(map(tuple, q_quantile_histogram(spark, sf).collect()))
    assert got_q == want_q and len(got_q) == 3

    write(ev.where("event_id % 3 = 1"), 1)  # at-least-once redelivery
    assert (
        sorted(map(tuple, read_histogram(spark, state).collect()))
        == folded
    )


def test_hist_compaction_preserves_and_recovers(spark, tmp_path):
    """compact_hist folds the per-batch bin partitions to one base
    under the CMS intent protocol: the folded histogram (and its
    quantile view) is identical before/after, a kill during the
    source deletes leaves the reader exact and the rerun converges,
    and a post-compaction batch still sums in."""
    import os

    from projetbigdatastreaming_spark.catalog import load_table
    from projetbigdatastreaming_spark.plans.sketches import (
        histogram_quantiles,
    )
    from projetbigdatastreaming_spark.streaming import sketches as sk
    from projetbigdatastreaming_spark.streaming.sketches import (
        BASE_ID,
        compact_hist,
        hist_batch_writer,
        read_histogram,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "value"
    )
    state = str(tmp_path / "hist_c")
    write = hist_batch_writer(state)
    for b in range(3):
        write(ev.where(f"event_id % 3 = {b}"), b)
    before = sorted(map(tuple, read_histogram(spark, state).collect()))
    before_q = sorted(
        map(
            tuple,
            histogram_quantiles(read_histogram(spark, state)).collect(),
        )
    )

    assert compact_hist(spark, state) > 0
    parts = [n for n in os.listdir(state) if n.startswith("batch_id=")]
    assert parts == [f"batch_id={BASE_ID}"]
    assert sorted(map(tuple, read_histogram(spark, state).collect())) == before
    assert (
        sorted(
            map(
                tuple,
                histogram_quantiles(read_histogram(spark, state)).collect(),
            )
        )
        == before_q
    )

    # kill during the deletes: intent survives, reader stays exact,
    # rerun resolves and converges
    write(ev.where("event_id % 3 = 1"), 10)
    after_add = sorted(map(tuple, read_histogram(spark, state).collect()))

    real = sk._delete_partitions
    try:
        sk._delete_partitions = lambda *a, **k: False
        compact_hist(spark, state)
    finally:
        sk._delete_partitions = real
    assert os.path.exists(os.path.join(state, "_COMPACT_INTENT.json"))
    assert (
        sorted(map(tuple, read_histogram(spark, state).collect()))
        == after_add
    )
    assert compact_hist(spark, state) > 0
    assert not os.path.exists(os.path.join(state, "_COMPACT_INTENT.json"))
    assert (
        sorted(map(tuple, read_histogram(spark, state).collect()))
        == after_add
    )

    from projetbigdatastreaming_spark.__main__ import main

    assert main(["maintain", "compact-hist", state], spark=spark) == 0


def test_streaming_kmv_jaccard_fold_equals_batch(spark, tmp_path):
    """Audience-overlap estimates computed FROM the stored KMV state
    equal the batch q_kmv_jaccard estimator over the same rows — the
    set-operation payoff of a mergeable sketch (no raw-id join)."""
    from projetbigdatastreaming_spark.catalog import load_table
    from projetbigdatastreaming_spark.plans.sketches import (
        q_kmv_jaccard,
    )
    from projetbigdatastreaming_spark.streaming.sketches import (
        kmv_batch_writer,
        read_kmv_jaccard,
    )

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events").select("event_type", "user_id")
    state = str(tmp_path / "kmv_state")
    write = kmv_batch_writer(state)
    write(ev.where("user_id % 3 = 0"), 0)
    write(ev.where("user_id % 3 = 1"), 1)
    write(ev.where("user_id % 3 = 2"), 2)
    write(ev.where("user_id % 3 = 1"), 1)  # redelivery restates

    folded = {
        (r.type_a, r.type_b): r.est_jaccard
        for r in read_kmv_jaccard(spark, state).collect()
    }
    batch = {
        (r.type_a, r.type_b): r.est_jaccard
        for r in q_kmv_jaccard(spark, sf).collect()
    }
    assert folded == batch and len(folded) == 10
