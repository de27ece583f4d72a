"""Round-13 directed tests (VERDICT r12 items 1/3/4 + ADVICE r12).

Covers: the self-scaling lsh_band_planner sample stride, the
neardup_edit_verify length screen (zero-recall-loss DP skip), and
bench.py's compact primary restatement line.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from projetbigdatastreaming_spark.plans import llmdata


def test_lsh_low_mod_constant_sample_count():
    """The stride keeps the SAMPLED-DOC count ~constant (mod = n//625)
    instead of the r12 fixed fraction — the quadratic-asymptote fix."""
    assert llmdata._lsh_low_mod(500) == 1  # sf0.01: full scan
    assert llmdata._lsh_low_mod(5_000) == 8  # sf0.1 calibration point
    assert llmdata._lsh_low_mod(50_000) == 80
    assert llmdata._lsh_low_mod(500_000) == 800
    # sampled count n // mod stays within 2x of the target at any n
    for n in (700, 10_000, 123_457, 5_000_000, 10**9):
        mod = llmdata._lsh_low_mod(n)
        assert 625 <= n // mod or mod == 1
        assert n // mod < 2 * 625 or mod == 1


def test_lsh_band_planner_exact_dup_bin_clamped():
    """ADVICE r12: the S-curve midpoint is clamped to 1.0, so the
    exact-duplicate bin contributes P = 1 recall mass, not the
    out-of-domain pow(1.01, r) value."""
    assert "LEAST(bin_lo + 0.01, 1.0)" in llmdata.SQL_LSH_BAND_PLANNER
    # oracle derives the SAME stride from COUNT(*) — the sample is
    # replayable, not a hand-set constant
    assert "GREATEST(1, CAST(FLOOR(COUNT(*)" in llmdata.SQL_LSH_BAND_PLANNER


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        [(i, t, "en", "test", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(path)


def test_edit_verify_length_screen_skips_dp(spark, tmp_path):
    """A pair with identical shingle SETS (jaccard 1.0 — order-blind)
    but a >48-char prefix-length gap is provably unconfirmable:
    lev >= |len gap| > (1 - sim_min) * max_len.  The screen ships it
    with NULL lev/sim and confirmed = false without running the DP."""
    base = "alpha beta gamma delta epsilon zeta eta theta " * 4  # ~190 ch
    doubled = base * 3  # same shingle set, prefix 240 vs ~190
    _write_docs(spark, str(tmp_path / "documents.parquet"), [base, doubled])
    out = llmdata.q_neardup_edit_verify(spark, str(tmp_path)).collect()
    assert len(out) == 1
    row = out[0]
    gap = abs(min(len(base), 240) - min(len(doubled), 240))
    assert gap > llmdata.EDIT_LEN_SCREEN
    assert row["jaccard"] >= llmdata.JACCARD_THRESHOLD
    assert row["lev_dist"] is None
    assert row["edit_sim"] is None
    assert row["confirmed"] is False


def test_edit_verify_unscreened_pair_still_exact(spark, tmp_path):
    """A same-length near-dup pair takes the DP path unchanged —
    exact lev, det6 similarity, confirmed at >= 0.8."""
    a = " ".join(f"word{i:03d}" for i in range(60))  # distinct words
    b = a[:-1] + "x"  # one trailing char apart, same length
    _write_docs(spark, str(tmp_path / "documents.parquet"), [a, b])
    out = llmdata.q_neardup_edit_verify(spark, str(tmp_path)).collect()
    assert len(out) == 1
    row = out[0]
    assert row["lev_dist"] is not None and row["lev_dist"] <= 5
    assert row["edit_sim"] is not None and row["edit_sim"] >= 0.9
    assert row["confirmed"] is True


def test_bench_emits_compact_primary_line_last():
    """VERDICT r12 item 3: the driver keeps only the last ~2000 chars
    of bench stdout, so the LAST printed line must be a complete,
    parseable primary-contract object that fits inside the tail."""
    import ast
    import bench

    src = open(bench.__file__).read()
    tree = ast.parse(src)
    # the compact restatement exists...
    assert '"queries": timings' in src
    assert 'separators=(",", ":")' in src
    # ...and is literally the LAST print statement in main(): a print
    # added after it would break the tail contract silently
    main_fn = next(
        n for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == "main"
    )
    prints = [
        n for n in ast.walk(main_fn)
        if isinstance(n, ast.Call)
        and isinstance(n.func, ast.Name)
        and n.func.id == "print"
    ]
    last_print_src = ast.get_source_segment(src, max(
        prints, key=lambda n: n.lineno
    ))
    assert 'separators=(",", ":")' in last_print_src
    # size check: 40 rows at 12-char names / 4-dp values fit in 2000
    sample = {
        "metric": "headline_queries_total_wall",
        "value": 1234.5678,
        "unit": "sec",
        "queries": {f"query_name_{i:03d}": 123.4567 for i in range(40)},
        "sf": 0.1,
        "load_contaminated": False,
    }
    line = json.dumps(sample, separators=(",", ":"))
    assert len(line) < 2000


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_theta_stream_fold_equals_batch(spark, sf_dir, tmp_path):
    """VERDICT r12 item 5: theta rides the SAME daily-count state
    stream as the other daily monitors — additive partials over 3
    batches fold to the batch forecast exactly (OLS integer sums +
    the SES fold see the identical ordered series)."""
    from projetbigdatastreaming_spark.catalog import load_table
    from projetbigdatastreaming_spark.plans.timeseries import (
        q_theta_forecast,
    )
    from projetbigdatastreaming_spark.streaming.timeseries import (
        burstiness_batch_writer,
        read_theta,
    )

    ev = load_table(spark, sf_dir, "events")
    state = str(tmp_path / "daily")
    write = burstiness_batch_writer(state)
    for i in range(3):
        write(ev.where(f"event_id % 3 = {i}"), i)

    want = _rows(q_theta_forecast(spark, sf_dir))
    assert _rows(read_theta(spark, state)) == want and len(want) > 0


def test_backtest_stream_fold_equals_batch(spark, sf_dir, tmp_path):
    """VERDICT r12 item 5: the forecaster bake-off over the folded
    daily state equals the batch query exactly under any batch
    split."""
    from projetbigdatastreaming_spark.catalog import load_table
    from projetbigdatastreaming_spark.plans.timeseries import (
        q_forecast_backtest,
    )
    from projetbigdatastreaming_spark.streaming.timeseries import (
        burstiness_batch_writer,
        read_forecast_backtest,
    )

    ev = load_table(spark, sf_dir, "events")
    state = str(tmp_path / "daily")
    write = burstiness_batch_writer(state)
    for i in range(4):
        write(ev.where(f"event_id % 4 = {i}"), i)

    want = _rows(q_forecast_backtest(spark, sf_dir))
    assert _rows(read_forecast_backtest(spark, state)) == want
    assert len(want) > 0


def test_welch_stream_fold_equals_batch(spark, sf_dir, tmp_path):
    """Welch rides the SAME moments state stream as ANOVA/JB —
    additive power-sum partials over 3 batches fold to the batch
    statistic exactly."""
    from projetbigdatastreaming_spark.catalog import load_table
    from projetbigdatastreaming_spark.plans.advanced import q_welch_anova
    from projetbigdatastreaming_spark.streaming.timeseries import (
        moments_batch_writer,
        read_welch_anova,
    )

    ev = load_table(spark, sf_dir, "events")
    state = str(tmp_path / "moments")
    write = moments_batch_writer(state)
    for i in range(3):
        write(ev.where(f"event_id % 3 = {i}"), i)

    want = _rows(q_welch_anova(spark, sf_dir))
    assert _rows(read_welch_anova(spark, state)) == want and len(want) > 0


def test_hw_and_strength_stream_folds_equal_batch(spark, sf_dir, tmp_path):
    """Holt-Winters and seasonal strength ride the SAME daily-count
    state stream as the other daily monitors — additive partials over
    3 batches fold to the batch outputs exactly."""
    from projetbigdatastreaming_spark.catalog import load_table
    from projetbigdatastreaming_spark.plans.timeseries import (
        q_holt_winters_forecast,
        q_stl_seasonal_strength,
    )
    from projetbigdatastreaming_spark.streaming.timeseries import (
        burstiness_batch_writer,
        read_holt_winters,
        read_seasonal_strength,
    )

    ev = load_table(spark, sf_dir, "events")
    state = str(tmp_path / "daily")
    write = burstiness_batch_writer(state)
    for i in range(3):
        write(ev.where(f"event_id % 3 = {i}"), i)

    want_hw = _rows(q_holt_winters_forecast(spark, sf_dir))
    assert _rows(read_holt_winters(spark, state)) == want_hw
    assert len(want_hw) > 0
    want_ss = _rows(q_stl_seasonal_strength(spark, sf_dir))
    assert _rows(read_seasonal_strength(spark, state)) == want_ss
    assert len(want_ss) > 0


def test_mann_kendall_stream_fold_equals_batch(spark, sf_dir, tmp_path):
    """Mann-Kendall rides the SAME daily-count state stream — the
    tenth consumer; additive partials over 3 batches fold to the
    batch statistic exactly."""
    from projetbigdatastreaming_spark.catalog import load_table
    from projetbigdatastreaming_spark.plans.timeseries import (
        q_mann_kendall_trend,
    )
    from projetbigdatastreaming_spark.streaming.timeseries import (
        burstiness_batch_writer,
        read_mann_kendall,
    )

    ev = load_table(spark, sf_dir, "events")
    state = str(tmp_path / "daily")
    write = burstiness_batch_writer(state)
    for i in range(3):
        write(ev.where(f"event_id % 3 = {i}"), i)

    want = _rows(q_mann_kendall_trend(spark, sf_dir))
    assert _rows(read_mann_kendall(spark, state)) == want
    assert len(want) > 0
