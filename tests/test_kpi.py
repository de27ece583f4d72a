"""Flagship quarter-hour KPI tests.

Mirrors the reference's CASE bucket boundaries
(`IndicateursStreaming.scala:160-165`): minutes 0, 14, 15, 29, 30, 44,
45, 59 must land in the right quarter-hour, and the engaged ratio must
match hand-computed values.
"""

from __future__ import annotations

import datetime

from pyspark.sql import Row

from projetbigdatastreaming_spark.catalog import load_table
from projetbigdatastreaming_spark.plans.kpi import (
    parse_events,
    quarter_hour_kpis,
)


def _mk_events(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=ts,
                user_id=1,
                event_type=et,
                value=1.0,
                props=props,
            )
            for i, (ts, et, props) in enumerate(rows)
        ]
    )


def _t(minute, second=0):
    return datetime.datetime(2024, 1, 1, 10, minute, second)


def test_bucket_boundaries(spark):
    rows = [
        (_t(m), "click", '{"k": 10}') for m in (0, 14, 15, 29, 30, 44, 45, 59)
    ]
    out = quarter_hour_kpis(_mk_events(spark, rows)).collect()
    labels = [r.quarter_label for r in out]
    assert labels == [
        "10:00 - 10:15",
        "10:15 - 10:30",
        "10:30 - 10:45",
        "10:45 - 11:00",
    ]
    assert [r.event_count for r in out] == [2, 2, 2, 2]


def test_engaged_ratio_and_filter(spark):
    rows = [
        (_t(1), "click", '{"k": 80}'),   # engaged
        (_t(2), "view", '{"k": 20}'),    # not engaged
        (_t(3), "click", '{"k": 51}'),   # engaged (strict >50)
        (_t(4), "click", '{"k": 50}'),   # not engaged (boundary)
        (_t(5), "error", '{"k": 99}'),   # filtered out entirely
    ]
    out = quarter_hour_kpis(_mk_events(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.event_count == 4
    assert r.engaged_count == 2
    assert r.engagement_pct == 50.0
    assert r.event_date == datetime.date(2024, 1, 1)


def test_malformed_json_yields_null_k(spark):
    rows = [(_t(1), "click", "not json at all")]
    parsed = parse_events(_mk_events(spark, rows)).collect()
    assert parsed[0].k is None
    out = quarter_hour_kpis(_mk_events(spark, rows)).collect()
    assert out[0].event_count == 1 and out[0].engaged_count == 0


def test_empty_input(spark):
    df = _mk_events(spark, [(_t(0), "click", "{}")]).limit(0)
    assert quarter_hour_kpis(df).count() == 0


def test_runs_on_fixture(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    out = quarter_hour_kpis(events)
    assert out.count() > 0
    # only click/view survive the filter
    total = events.where("event_type IN ('click','view')").count()
    agg = out.groupBy().sum("event_count").collect()[0][0]
    assert agg == total
