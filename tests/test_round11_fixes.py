"""Round-11 verdict closures: the bench load guard (VERDICT r10 item
2 — BENCH_r10 shipped sf1/sf10 columns taken under concurrent load
with nothing in the artifact saying so), plus later round-11 items.

These tests run WITHOUT a SparkSession — the guard is pure /proc
arithmetic and must stay importable before the JVM exists (bench.py
samples it around sweeps whose JVM it owns).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

import bench


def _spin_jiffies(seconds: float) -> None:
    t0 = time.process_time()
    while time.process_time() - t0 < seconds:
        pass


def test_proc_tree_includes_descendants():
    """A CPU-burning CHILD must count toward our tree (the bench JVM
    is a child of bench.py — if descendants were missed, bench's own
    load would read as external and every sweep would self-flag)."""
    before = bench._proc_tree_jiffies()
    p = subprocess.Popen(
        [
            sys.executable,
            "-c",
            "import time\n"
            "t0=time.process_time()\n"
            "while time.process_time()-t0<0.8: pass\n"
            "time.sleep(5)",
        ]
    )
    try:
        # poll until the child's burn shows up in the tree sum; the
        # child then sleeps so the count is stable when we read it
        deadline = time.monotonic() + 10
        hz = os.sysconf("SC_CLK_TCK")
        while time.monotonic() < deadline:
            if bench._proc_tree_jiffies() - before >= 0.5 * hz:
                break
            time.sleep(0.1)
        else:
            raise AssertionError("child CPU never appeared in tree sum")
    finally:
        p.kill()
        p.wait()


def test_external_load_flags_contamination():
    """Spinners OUTSIDE our process tree (double-forked, reparented
    to init) must be detected as external CPU and flag the sweep.
    THREE spinners, not one: a single spinner injects ~1.0 CPU —
    exactly the strict >1.0 threshold — so jiffy quantization or a
    slow start would make the assertion a coin flip."""
    pids = []
    for _ in range(3):
        out = subprocess.run(
            [
                "sh",
                "-c",
                f"{sys.executable} -c '"
                "import time\n"
                "t0=time.time()\n"
                "while time.time()-t0<4: pass' >/dev/null 2>&1 & echo $!",
            ],
            capture_output=True,
            text=True,
            check=True,
        )
        pids.append(int(out.stdout.strip()))
    try:
        begin = bench.sweep_load_begin()
        _spin_jiffies(0.3)  # our own load — must NOT count as external
        time.sleep(1.7)
        stamp = bench.sweep_load_end(begin)
        # ~3 external CPUs over the ~2s window; well past the limit
        assert stamp["external_cpu_avg"] > bench.EXTERNAL_CPU_LIMIT, stamp
        assert stamp["contaminated"] is True, stamp
    finally:
        for spinner_pid in pids:
            try:
                os.kill(spinner_pid, 9)
            except ProcessLookupError:
                pass


def test_own_load_not_flagged_when_machine_quiet():
    """Our own CPU burn is inside the tree: external stays ~0 even
    while we spin.  Skipped (not failed) if the machine is busy with
    someone else's work — the guard firing then is correct behavior."""
    begin = bench.sweep_load_begin()
    _spin_jiffies(1.0)
    stamp = bench.sweep_load_end(begin)
    if stamp["contaminated"]:
        import pytest

        pytest.skip(
            f"machine has real external load ({stamp}); guard firing "
            "is correct — cannot assert quiet baseline"
        )
    assert stamp["external_cpu_avg"] <= bench.EXTERNAL_CPU_LIMIT


def test_bench_artifact_keys_present_in_stamp():
    begin = bench.sweep_load_begin()
    stamp = bench.sweep_load_end(begin)
    assert set(stamp) == {
        "loadavg_start",
        "loadavg_end",
        "external_cpu_avg",
        "contaminated",
    }


# ---------------------------------------------------------------------------
# Optimistic OVERWRITE: CAS on the base generation (VERDICT r10 item 6)
# ---------------------------------------------------------------------------

import pytest  # noqa: E402
import threading  # noqa: E402

from projetbigdatastreaming_spark.sinks import versioned as V  # noqa: E402
from projetbigdatastreaming_spark.sinks.versioned import (  # noqa: E402
    CommitConflict,
    list_versions,
    read_version,
    versioned_append,
    versioned_overwrite,
)


def _df(spark, ids):
    return spark.createDataFrame(
        [(i, f"d{i}") for i in ids], "id long, v string"
    ).coalesce(1)


def _ids(spark, t):
    return sorted(r.id for r in read_version(spark, t).collect())


def test_overwrite_cas_explicit_stale_base_aborts(spark, tmp_path):
    """An overwrite derived from a version the table has moved past
    must abort loudly, and the interleaved append's rows survive."""
    t = str(tmp_path / "t")
    assert versioned_overwrite(_df(spark, [1, 2]), t) == 1
    assert versioned_append(_df(spark, [3]), t) == 2
    with pytest.raises(CommitConflict):
        versioned_overwrite(_df(spark, [9]), t, expected_version=1)
    assert _ids(spark, t) == [1, 2, 3]  # nothing lost, no v3
    assert list_versions(t) == [1, 2]
    # abort-with-retry: re-derive against the current base and commit
    assert versioned_overwrite(_df(spark, [9]), t, expected_version=2) == 3
    assert _ids(spark, t) == [9]


def test_overwrite_detects_append_between_snapshot_and_commit(
    spark, tmp_path, monkeypatch
):
    """Default CAS (base = latest at call time): an append landing
    while the overwrite is still writing its data files triggers
    CommitConflict — the append is never silently clobbered."""
    t = str(tmp_path / "t")
    versioned_overwrite(_df(spark, [1, 2]), t)
    real_write = V._write_files
    injected = {"done": False}

    def hooked(df, table_dir):
        files = real_write(df, table_dir)
        if not injected["done"]:
            injected["done"] = True
            versioned_append(_df(spark, [3]), table_dir)
        return files

    monkeypatch.setattr(V, "_write_files", hooked)
    with pytest.raises(CommitConflict):
        versioned_overwrite(_df(spark, [9]), t)
    monkeypatch.setattr(V, "_write_files", real_write)
    assert _ids(spark, t) == [1, 2, 3]
    # the conflicted overwrite's files are orphans, not data loss;
    # a clean retry from the new base succeeds
    v = versioned_overwrite(_df(spark, [9]), t)
    assert _ids(spark, t) == [9]
    assert v == 3


def test_append_serializes_on_top_of_interleaved_overwrite(
    spark, tmp_path, monkeypatch
):
    """The other interleave direction: an overwrite winning while an
    append is in flight does NOT kill the append — it recomposes on
    top of the overwrite (serialization), so both commits survive."""
    t = str(tmp_path / "t")
    versioned_overwrite(_df(spark, [1, 2]), t)
    real_write = V._write_files
    injected = {"done": False}

    def hooked(df, table_dir):
        files = real_write(df, table_dir)
        if not injected["done"]:
            injected["done"] = True
            versioned_overwrite(_df(spark, [7, 8]), table_dir)
        return files

    monkeypatch.setattr(V, "_write_files", hooked)
    v = versioned_append(_df(spark, [3]), t)
    monkeypatch.setattr(V, "_write_files", real_write)
    assert v == 3  # overwrite took v2, append serialized as v3
    assert _ids(spark, t) == [3, 7, 8]


def test_append_x_overwrite_race_never_loses_append(spark, tmp_path):
    """Two real threads racing an append against an overwrite: the
    append's commit must NEVER be silently lost — it exists as a
    version in every outcome.  Three legal outcomes: (a) the
    overwrite won its CAS before the append → append serializes on
    top (final has both); (b) the append committed first and the
    overwrite's CAS saw a stale base → loud CommitConflict (final is
    base+append); (c) the append committed BEFORE the overwrite even
    snapshotted its base → the overwrite legitimately supersedes it
    (final is the overwrite alone, the append readable as the prior
    version).  What must never happen: the append's rows absent from
    EVERY version."""
    for trial in range(3):
        t = str(tmp_path / f"t{trial}")
        versioned_overwrite(_df(spark, [1, 2]), t)
        barrier = threading.Barrier(2)
        overwrite_outcome: list[str] = []

        def do_append():
            barrier.wait()
            versioned_append(_df(spark, [30]), t)

        def do_overwrite():
            barrier.wait()
            try:
                versioned_overwrite(_df(spark, [9]), t)
                overwrite_outcome.append("committed")
            except CommitConflict:
                overwrite_outcome.append("conflict")

        th = [
            threading.Thread(target=do_append),
            threading.Thread(target=do_overwrite),
        ]
        for x in th:
            x.start()
        for x in th:
            x.join()
        final = _ids(spark, t)
        # the append's commit exists in SOME version, always
        versions_with_30 = [
            v
            for v in list_versions(t)
            if any(r.id == 30 for r in read_version(spark, t, v).collect())
        ]
        assert versions_with_30, (trial, overwrite_outcome, final)
        if overwrite_outcome == ["conflict"]:
            assert final == [1, 2, 30], (trial, final)
        else:
            assert overwrite_outcome == ["committed"]
            # either the append serialized on top of the overwrite,
            # or the overwrite legitimately superseded the already-
            # committed append (still readable at its own version)
            assert final in ([9, 30], [9]), (trial, final)


# ---------------------------------------------------------------------------
# Streaming twins for the round-10 stat monitors (VERDICT r10 item 7)
# ---------------------------------------------------------------------------


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_burstiness_stream_fold_equals_batch(spark, sf_dir, tmp_path):
    """Additive daily-count partials over 3 micro-batches fold to
    EXACTLY the batch burstiness panel, and a redelivery restates
    instead of double-counting (doubled counts would inflate every
    variance)."""
    from projetbigdatastreaming_spark.catalog import load_table
    from projetbigdatastreaming_spark.plans.timeseries import q_burstiness
    from projetbigdatastreaming_spark.streaming.timeseries import (
        burstiness_batch_writer,
        read_burstiness,
    )

    ev = load_table(spark, sf_dir, "events")
    state = str(tmp_path / "burst")
    write = burstiness_batch_writer(state)
    for i in range(3):
        write(ev.where(f"event_id % 3 = {i}"), i)

    want = _rows(q_burstiness(spark, sf_dir))
    assert _rows(read_burstiness(spark, state)) == want and len(want) > 0

    write(ev.where("event_id % 3 = 1"), 1)  # redelivery restates
    assert _rows(read_burstiness(spark, state)) == want


def test_window_funnel_stream_fold_equals_batch(spark, sf_dir, tmp_path):
    """The funnel twin must equal the batch census under a batch
    split that separates same-day signups from views (the boundary
    case the intra-day arrays exist for), and under redelivery."""
    from projetbigdatastreaming_spark.catalog import load_table
    from projetbigdatastreaming_spark.plans.advanced import q_window_funnel
    from projetbigdatastreaming_spark.streaming.timeseries import (
        funnel_batch_writer,
        read_window_funnel,
    )

    ev = load_table(spark, sf_dir, "events")
    state = str(tmp_path / "funnel")
    write = funnel_batch_writer(state)
    # event_id split scatters a single (user, day)'s events across
    # batches arbitrarily — the hardest replay geometry
    for i in range(3):
        write(ev.where(f"event_id % 3 = {i}"), i)

    want = _rows(q_window_funnel(spark, sf_dir))
    assert _rows(read_window_funnel(spark, state)) == want
    assert sum(r[1] for r in want) > 0

    write(ev.where("event_id % 3 = 2"), 2)  # redelivery restates
    assert _rows(read_window_funnel(spark, state)) == want


def test_window_funnel_boundary_masking_view(spark, tmp_path):
    """Directed boundary case: a view EARLIER than t1 on the signup
    day must not mask the true in-window minimum, even when the two
    views arrive in different batches."""
    import datetime as dt

    from projetbigdatastreaming_spark.streaming.timeseries import (
        funnel_batch_writer,
        read_window_funnel,
    )

    def ev_df(rows):
        return spark.createDataFrame(
            [
                (i, u, t, dt.datetime(2024, 1, d, h, 0, 0))
                for i, (u, t, d, h) in enumerate(rows)
            ],
            "event_id long, user_id long, event_type string, ts timestamp_ntz",
        )

    state = str(tmp_path / "fb")
    write = funnel_batch_writer(state)
    # batch 0: user 1 views at 08:00 (BEFORE the signup), signup 09:00
    write(ev_df([(1, "view", 1, 8), (1, "signup", 1, 9)]), 0)
    # batch 1: the real in-window view at 10:00 same day, then a
    # purchase next day
    write(ev_df([(1, "view", 1, 10), (1, "purchase", 2, 12)]), 1)
    got = {r.depth: r.n_users for r in read_window_funnel(spark, state).collect()}
    assert got == {3: 1}  # full depth: the 10:00 view was found


def test_daily_state_serves_four_monitors(spark, sf_dir, tmp_path):
    """ONE daily-count state stream feeds burstiness, PACF, STL and
    Hurst read paths; each fold equals its batch query exactly over
    the union of the ingested batches."""
    from projetbigdatastreaming_spark.catalog import load_table
    from projetbigdatastreaming_spark.plans.timeseries import (
        q_hurst_exponent,
        q_pacf_lags,
        q_stl_decompose,
    )
    from projetbigdatastreaming_spark.streaming.timeseries import (
        burstiness_batch_writer,
        read_hurst,
        read_pacf,
        read_stl_decompose,
    )

    ev = load_table(spark, sf_dir, "events")
    state = str(tmp_path / "daily")
    write = burstiness_batch_writer(state)
    for i in range(3):
        write(ev.where(f"event_id % 3 = {i}"), i)

    for reader, batch_q in (
        (read_pacf, q_pacf_lags),
        (read_stl_decompose, q_stl_decompose),
        (read_hurst, q_hurst_exponent),
    ):
        want = _rows(batch_q(spark, sf_dir))
        assert _rows(reader(spark, state)) == want and len(want) > 0

    write(ev.where("event_id % 3 = 0"), 0)  # redelivery restates
    assert _rows(read_hurst(spark, state)) == _rows(
        q_hurst_exponent(spark, sf_dir)
    )
