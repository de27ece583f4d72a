"""Round-12 verdict closures (VERDICT r11 items 2-3): the bench load
guard now RECOVERS from contamination instead of only stamping it —
BENCH_r11 shipped its whole sf1 column stamped ``contaminated: true``
(external_cpu_avg 1.78) because the guard detected the competing load
but ran the sweep anyway.  ``run_sweep_guarded`` waits for external
idle before a sweep, re-runs ONCE if the stamp is dirty, ships the
retry's timings, and keeps every attempt's stamp in the artifact.

Pure-Python tests — no SparkSession; the guard must stay importable
before the JVM exists.
"""

from __future__ import annotations

import bench


def test_clean_sweep_runs_once(monkeypatch):
    monkeypatch.setattr(bench, "wait_for_external_idle", lambda **kw: True)
    calls = {"n": 0}

    def body():
        calls["n"] += 1
        return {"q": 1.0}

    monkeypatch.setattr(bench, "sweep_load_begin", lambda: (0, 0, 0, 0.0))
    monkeypatch.setattr(
        bench,
        "sweep_load_end",
        lambda begin: {
            "loadavg_start": 0.0,
            "loadavg_end": 0.0,
            "external_cpu_avg": 0.1,
            "contaminated": False,
        },
    )
    timings, stamp = bench.run_sweep_guarded(body)
    assert calls["n"] == 1
    assert timings == {"q": 1.0}
    assert stamp["contaminated"] is False
    assert stamp["retries"] == 0
    assert "prior_attempts" not in stamp


def test_contaminated_sweep_retries_once_and_ships_retry(monkeypatch):
    """First attempt dirty, second clean: timings must be the RETRY's,
    the final stamp clean, and the dirty attempt preserved under
    ``prior_attempts`` so the artifact shows the retry happened."""
    monkeypatch.setattr(bench, "wait_for_external_idle", lambda **kw: True)
    calls = {"n": 0}

    def body():
        calls["n"] += 1
        return {"q": float(calls["n"])}

    stamps = iter(
        [
            {
                "loadavg_start": 9.0,
                "loadavg_end": 9.0,
                "external_cpu_avg": 5.0,
                "contaminated": True,
            },
            {
                "loadavg_start": 0.2,
                "loadavg_end": 0.2,
                "external_cpu_avg": 0.1,
                "contaminated": False,
            },
        ]
    )
    monkeypatch.setattr(bench, "sweep_load_begin", lambda: (0, 0, 0, 0.0))
    monkeypatch.setattr(bench, "sweep_load_end", lambda begin: next(stamps))
    timings, stamp = bench.run_sweep_guarded(body)
    assert calls["n"] == 2
    assert timings == {"q": 2.0}  # the retry's numbers ship
    assert stamp["contaminated"] is False
    assert stamp["retries"] == 1
    assert stamp["prior_attempts"][0]["contaminated"] is True


def test_doubly_contaminated_sweep_stays_stamped(monkeypatch):
    """If the retry is dirty too, the guard gives up after TWO
    attempts and the shipped stamp is honestly contaminated."""
    monkeypatch.setattr(bench, "wait_for_external_idle", lambda **kw: False)
    calls = {"n": 0}

    def body():
        calls["n"] += 1
        return {"q": float(calls["n"])}

    monkeypatch.setattr(bench, "sweep_load_begin", lambda: (0, 0, 0, 0.0))
    monkeypatch.setattr(
        bench,
        "sweep_load_end",
        lambda begin: {
            "loadavg_start": 9.0,
            "loadavg_end": 9.0,
            "external_cpu_avg": 5.0,
            "contaminated": True,
        },
    )
    timings, stamp = bench.run_sweep_guarded(body)
    assert calls["n"] == 2  # exactly one retry, no unbounded loop
    assert stamp["contaminated"] is True
    assert stamp["retries"] == 1
    assert len(stamp["prior_attempts"]) == 1


def test_wait_for_external_idle_returns_fast_when_quiet(monkeypatch):
    monkeypatch.setattr(bench, "_external_cpu_now", lambda window_sec=2.0: 0.0)
    assert bench.wait_for_external_idle(max_wait_sec=10.0) is True


def test_wait_for_external_idle_bounded_when_busy(monkeypatch):
    """A permanently-busy machine must not hang bench forever."""
    monkeypatch.setattr(
        bench, "_external_cpu_now", lambda window_sec=2.0: 50.0
    )
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench.wait_for_external_idle(max_wait_sec=30.0) is False


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_moments_stream_fold_equals_batch(spark, sf_dir, tmp_path):
    """ONE per-type power-sum state stream feeds BOTH moment
    monitors: additive DECIMAL partials over 3 micro-batches fold to
    EXACTLY the batch anova_oneway and jarque_bera outputs (integer
    sufficient statistics make the equality bitwise, not tolerance),
    and a redelivery restates instead of double-counting."""
    from projetbigdatastreaming_spark.catalog import load_table
    from projetbigdatastreaming_spark.plans.advanced import (
        q_anova_oneway,
        q_jarque_bera,
    )
    from projetbigdatastreaming_spark.streaming.timeseries import (
        moments_batch_writer,
        read_anova_oneway,
        read_jarque_bera,
    )

    ev = load_table(spark, sf_dir, "events")
    state = str(tmp_path / "moments")
    write = moments_batch_writer(state)
    for i in range(3):
        write(ev.where(f"event_id % 3 = {i}"), i)

    want_anova = _rows(q_anova_oneway(spark, sf_dir))
    want_jb = _rows(q_jarque_bera(spark, sf_dir).orderBy("event_type"))
    assert _rows(read_anova_oneway(spark, state)) == want_anova
    got_jb = _rows(read_jarque_bera(spark, state).orderBy("event_type"))
    assert got_jb == want_jb and len(want_jb) > 0

    write(ev.where("event_id % 3 = 1"), 1)  # redelivery restates
    assert _rows(read_anova_oneway(spark, state)) == want_anova
