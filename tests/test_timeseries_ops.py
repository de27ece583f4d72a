"""Invariant tests for the time-series repair/smoothing operators
(plans/timeseries.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entry
from projetbigdatastreaming_spark.catalog import load_table


def _run(spark, sf_dir, name):
    return entry.queries()[name](spark, sf_dir)


def test_gapfill_spine_is_dense_and_complete(spark, sf_dir):
    rows = _run(spark, sf_dir, "timeseries_gapfill").collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    ev = load_table(spark, sf_dir, "events")
    n_types = ev.select("event_type").distinct().count()
    assert len(by_type) == n_types
    for series in by_type.values():
        buckets = [r.bucket for r in series]
        assert buckets == sorted(buckets)
        # dense: consecutive buckets exactly 1 hour apart
        for a, b in zip(buckets, buckets[1:]):
            assert (b - a).total_seconds() == 3600
        # every type spans the same global [lo, hi]
        assert buckets[0] == min(r.bucket for r in rows)
        assert buckets[-1] == max(r.bucket for r in rows)


def test_gapfill_locf_carries_last_observation(spark, sf_dir):
    rows = _run(spark, sf_dir, "timeseries_gapfill").collect()
    last_seen: dict[str, object] = {}
    for r in sorted(rows, key=lambda r: (r.event_type, r.bucket)):
        if r.is_gap:
            expected = last_seen.get(r.event_type)
            assert r.filled_total == expected
        else:
            assert r.filled_total is not None
            last_seen[r.event_type] = r.filled_total


def test_gapfill_non_gap_totals_match_groupby(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    # the query sums exact integer cents and divides once (float64
    # output on both engines); mirror that here — float(cents)/100.0
    # is the identical correctly-rounded double
    expected = {
        (r.event_type, r.bucket): r.t / 100.0
        for r in ev.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("bucket")
        )
        .agg(
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
            )
            .cast("double")
            .alias("t")
        )
        .collect()
    }
    for r in _run(spark, sf_dir, "timeseries_gapfill").collect():
        if not r.is_gap:
            assert r.filled_total == expected[(r.event_type, r.bucket)]


def test_streaks_reconcile_with_day_counts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    per_user = {
        r.user_id: r.n for r in days.groupBy("user_id").count()
        .withColumnRenamed("count", "n").collect()
    }
    for r in _run(spark, sf_dir, "user_streaks").collect():
        assert r.n_active_days == per_user[r.user_id]
        assert 1 <= r.longest_streak <= r.n_active_days
        assert r.n_streaks >= 1
        # streaks partition the active days: longest*count bounds
        assert r.longest_streak * r.n_streaks >= r.n_active_days


def test_ewma_smoothed_lies_in_series_envelope(spark, sf_dir):
    # a convex combination of trailing values can never leave the
    # [min, max] envelope of the series so far
    rows = _run(spark, sf_dir, "ewma_smooth").collect()
    hist: dict[str, list[float]] = {}
    for r in sorted(rows, key=lambda r: (r.event_type, str(r.day))):
        xs = hist.setdefault(r.event_type, [])
        xs.append(float(r.x))
        window = xs[-8:]
        assert min(window) - 1e-6 <= r.smoothed <= max(window) + 1e-6
        expected_flag = (
            float(r.x) > r.smoothed * 2 or float(r.x) < r.smoothed * 0.5
        )
        # smoothed is rounded at 6dp after the flag is computed on the
        # raw value, so only assert agreement away from the boundary
        if abs(float(r.x) - r.smoothed * 2) > 1e-3 and abs(
            float(r.x) - r.smoothed * 0.5
        ) > 1e-3:
            assert r.is_anomaly == expected_flag
