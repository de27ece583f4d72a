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
    monkeypatch.setattr(bench, "_loadavg1", lambda: 0.5)
    assert bench.wait_for_external_idle(max_wait_sec=10.0) is True


def test_wait_for_external_idle_bounded_when_busy(monkeypatch):
    """A permanently-busy machine must not hang bench forever."""
    monkeypatch.setattr(
        bench, "_external_cpu_now", lambda window_sec=2.0: 50.0
    )
    monkeypatch.setattr(bench, "_loadavg1", lambda: 0.5)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench.wait_for_external_idle(max_wait_sec=30.0) is False


def test_wait_for_external_idle_gates_on_loadavg(monkeypatch):
    """VERDICT r13 item 2: external CPU alone is blind to this
    process's OWN load tail — a high 1-minute loadavg must also block
    the sweep start (bounded, not forever)."""
    monkeypatch.setattr(bench, "_external_cpu_now", lambda window_sec=2.0: 0.0)
    monkeypatch.setattr(bench, "_loadavg1", lambda: 20.0)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench.wait_for_external_idle(max_wait_sec=30.0) is False
    loads = iter([20.0, 8.0, 1.0, 0.5, 0.5])
    monkeypatch.setattr(bench, "_loadavg1", lambda: next(loads))
    assert bench.wait_for_external_idle(max_wait_sec=60.0) is True


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


def test_zone_map_story_holds(spark, sf_dir):
    """The panel's reason to exist: natural layout skips nothing,
    user-sorted skips perfectly on its sort key and nothing on the
    other dimension, z-order skips a nontrivial fraction on BOTH."""
    from projetbigdatastreaming_spark.plans.advanced import (
        q_zone_map_effectiveness,
    )

    rows = {
        (r.layout, r.pred_dim): r
        for r in q_zone_map_effectiveness(spark, sf_dir).collect()
    }
    nat_ub, nat_vb = rows[("natural", "ub")], rows[("natural", "vb")]
    us_ub, us_vb = (
        rows[("user_sorted", "ub")],
        rows[("user_sorted", "vb")],
    )
    z_ub, z_vb = rows[("zorder", "ub")], rows[("zorder", "vb")]
    # natural: at most sparse-file luck (tiny fixtures can have a
    # 15-row file whose every row misses the predicate)
    assert nat_ub.skip_ratio <= 0.25 and nat_vb.skip_ratio <= 0.25
    # sorted: strong pruning on its sort key, none on the other dim
    assert us_ub.skip_ratio >= 0.5
    assert us_ub.rows_scanned < nat_ub.rows_scanned
    assert us_vb.n_skipped == 0
    # z-order: substantial pruning on BOTH dims
    assert z_ub.skip_ratio >= 0.5 and z_vb.skip_ratio >= 0.5
    assert z_ub.rows_scanned < nat_ub.rows_scanned
    assert z_vb.rows_scanned < nat_vb.rows_scanned
    assert z_vb.rows_scanned < us_vb.rows_scanned


def test_lsh_band_planner_tradeoffs_monotone(spark, sf_dir):
    """Banding theory pinned on real data: more rows per band (fewer
    bands) raises the S-curve midpoint, lowers expected recall, and
    lowers expected false candidates — the planner's whole trade."""
    from projetbigdatastreaming_spark.plans.llmdata import (
        q_lsh_band_planner,
    )

    rows = (
        q_lsh_band_planner(spark, sf_dir)
        .orderBy("rows_per_band")
        .collect()
    )
    assert len(rows) == 6
    s50 = [r.s50 for r in rows]
    rec = [r.exp_recall for r in rows]
    fp = [r.exp_false_candidates for r in rows]
    assert s50 == sorted(s50)
    assert rec == sorted(rec, reverse=True)
    assert fp == sorted(fp, reverse=True)
    # the config actually used by dedup_minhash_pairs-style banding
    # (r=4, b=16) must promise high recall at the 0.8 threshold
    r4 = next(r for r in rows if r.rows_per_band == 4)
    assert r4.exp_recall > 0.95


def test_compaction_plan_groups_bounded(spark, sf_dir):
    """Every planned output file holds at least one input; any group
    beyond the first only exists because the target size was hit
    (sum of its predecessors' sizes >= group * target)."""
    from projetbigdatastreaming_spark.plans.advanced import (
        _COMPACT_TARGET_CHARS,
        q_compaction_plan,
    )

    rows = q_compaction_plan(spark, sf_dir).collect()
    assert all(r.n_inputs >= 1 for r in rows)
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, groups in by_src.items():
        groups.sort(key=lambda r: r.compact_group)
        cum = 0
        for g in groups:
            if g.compact_group > 0:
                assert cum >= g.compact_group * _COMPACT_TARGET_CHARS - g.total_chars
            cum += g.total_chars


def test_holt_stream_fold_equals_batch(spark, sf_dir, tmp_path):
    """Holt rides the SAME daily-count state stream as the other four
    daily monitors — additive partials over 3 batches fold to the
    batch forecast exactly (the IIR fold sees the identical ordered
    series, so equality is bitwise)."""
    from projetbigdatastreaming_spark.catalog import load_table
    from projetbigdatastreaming_spark.plans.timeseries import (
        q_holt_linear_forecast,
    )
    from projetbigdatastreaming_spark.streaming.timeseries import (
        burstiness_batch_writer,
        read_holt,
    )

    ev = load_table(spark, sf_dir, "events")
    state = str(tmp_path / "daily")
    write = burstiness_batch_writer(state)
    for i in range(3):
        write(ev.where(f"event_id % 3 = {i}"), i)

    want = _rows(q_holt_linear_forecast(spark, sf_dir))
    assert _rows(read_holt(spark, state)) == want and len(want) > 0


def test_holt_recovers_linear_trend(spark):
    """Directed sanity: on an exactly linear series the smoother must
    converge to the true slope and forecast the line (near-zero
    one-step RMSE after warmup)."""
    import datetime as dt

    from projetbigdatastreaming_spark.plans.timeseries import (
        holt_from_daily,
    )

    rows = [
        ("t", dt.date(2024, 1, 1) + dt.timedelta(days=i), 100 + 10 * i)
        for i in range(30)
    ]
    daily = spark.createDataFrame(rows, "event_type string, day date, y bigint")
    r = holt_from_daily(daily).collect()[0]
    assert abs(r.trend - 10.0) < 0.5
    assert abs(r.forecast_7d - (100 + 10 * 29 + 70)) < 5.0


def test_forecast_backtest_winner_is_argmin(spark, sf_dir):
    """best_model must be the argmin of the three det6 RMSEs under
    the fixed tie order (holt, then naive7, then naive1)."""
    from projetbigdatastreaming_spark.plans.timeseries import (
        q_forecast_backtest,
    )

    for r in q_forecast_backtest(spark, sf_dir).collect():
        rmses = {
            "holt": r.rmse_holt,
            "naive7": r.rmse_naive7,
            "naive1": r.rmse_naive1,
        }
        best = min(rmses.values())
        order = [
            m for m in ("holt", "naive7", "naive1") if rmses[m] == best
        ]
        assert r.best_model == order[0], r


def test_sample_size_power_monotone_in_mde(spark, sf_dir):
    """A bigger detectable effect needs fewer users: n_per_arm must
    decrease along each type's MDE grid (strictly wherever p_treat is
    below its 0.999999 clamp — a SATURATED user-level conversion rate
    of ~1.0 pins p_treat to the clamp for every MDE, so the n's tie
    there by construction), and every n must be positive."""
    from projetbigdatastreaming_spark.plans.advanced import (
        q_sample_size_power,
    )

    rows = q_sample_size_power(spark, sf_dir).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for t, rs in by_type.items():
        rs.sort(key=lambda r: r.mde)
        ns = [r.n_per_arm for r in rs]
        assert all(n > 0 for n in ns), (t, ns)
        assert ns == sorted(ns, reverse=True), (t, ns)
        unclamped = [
            r.n_per_arm for r in rs if r.p_treat < 0.999999
        ]
        assert len(set(unclamped)) == len(unclamped), (t, unclamped)


def test_theta_damped_trend_identity(spark):
    """On an exactly linear series (slope b, α=0.5) the theta parts
    take known closed forms: the OLS slope is exact, the SES of the
    θ=2 line converges to the line minus its lag b(1−α)/α = b, and
    the forecast is the average of that damped level and the trend
    extrapolation — the deliberate trend-damping that won theta the
    M3 competition (it does NOT reproduce the raw line)."""
    import datetime as dt

    from projetbigdatastreaming_spark.plans.timeseries import (
        q_theta_forecast,
    )
    from projetbigdatastreaming_spark.plans import timeseries as ts

    rows = [
        ("t", dt.date(2024, 1, 1) + dt.timedelta(days=i), 100 + 10 * i)
        for i in range(30)
    ]
    daily = spark.createDataFrame(
        rows, "event_type string, day date, y bigint"
    )
    orig = ts._daily_counts
    try:
        ts._daily_counts = lambda spark, sf_dir: daily
        r = q_theta_forecast(spark, "unused").collect()[0]
    finally:
        ts._daily_counts = orig
    assert abs(r.trend_slope - 10.0) < 1e-6
    # SES of the θ=2 line lags the line by b(1−α)/α = 10:
    # level ≈ y_29 − 10 = 380
    assert abs(r.ses_theta2 - 380.0) < 0.5
    # forecast = ½(ses + line(t=36)) = ½(380 + 460) = 420
    assert abs(r.forecast_7d - 420.0) < 0.5
