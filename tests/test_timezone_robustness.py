"""Timezone-robustness probes: the grading driver calls ``queries()``
with a VANILLA SparkSession — no UTC pinning — so every query's result
must be invariant under ``spark.sql.session.timeZone``.  The testdata
timestamps are TIMESTAMP_NTZ after catalog load, which session tz must
never touch; a regression here once shifted quarter-hour buckets by 5h.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

#: every query whose plan touches a timestamp column
_TZ_SENSITIVE = [
    "kpi_quarter_hour",
    "quarter_hour_case",
    "time_functions",
    "sessionize",
    "window_sliding",
    "session_window_agg",
    "multires_rollup",
    "tpch_q6",
    "tpch_q10",
    "cohort_retention",
    "funnel_steps",
    "join_asof",
    "rolling_avg_range",
    "time_gap_stats",
    "user_features",
    # round-3 TPC-H additions with date filters / INTERVAL arithmetic /
    # year() extraction on timestamp columns
    "tpch_q4",
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "tpch_q12",
    "tpch_q15",
    "tpch_q20",
    "tpch_q21",
    "tpch_q22",
]


@pytest.fixture()
def tz(spark):
    orig = spark.conf.get("spark.sql.session.timeZone")

    def _set(zone):
        spark.conf.set("spark.sql.session.timeZone", zone)

    yield _set
    spark.conf.set("spark.sql.session.timeZone", orig)


@pytest.mark.parametrize("name", _TZ_SENSITIVE)
def test_result_invariant_under_session_timezone(spark, sf_dir, tz, name):
    fn = entry.queries()[name]
    tz("UTC")
    utc_rows = sorted(map(tuple, fn(spark, sf_dir).collect()))
    for zone in ("America/New_York", "Asia/Tokyo"):
        tz(zone)
        rows = sorted(map(tuple, fn(spark, sf_dir).collect()))
        assert rows == utc_rows, f"{name} drifts under {zone}"


def test_no_query_outputs_ltz_timestamp(spark, sf_dir):
    """collect() renders TIMESTAMP (LTZ) in the PYTHON PROCESS's local
    zone, so a query emitting one hash-differently on a non-UTC
    machine even with the session timezone pinned to UTC (caught by a
    TZ=America/New_York oracle sweep: date_trunc silently returns LTZ
    from NTZ input).  Every query must emit timestamp_ntz / date /
    string time values only."""
    import __spark_entry__ as entry

    offenders = []
    for name, fn in entry.queries().items():
        df = fn(spark, sf_dir)
        for f in df.schema.fields:
            if f.dataType.simpleString() == "timestamp":
                offenders.append((name, f.name))
    assert not offenders, f"LTZ timestamp outputs: {offenders}"
