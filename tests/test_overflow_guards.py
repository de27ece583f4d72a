"""ANSI int64-overflow sweep of the multiply-by-large-constant family
(VERDICT r12 item 7).

`zone_map_effectiveness` hit `user_id * 2654435761` overflow on the
scaled fixture's 1e10-offset ids in round 12 (fixed by reduce-before-
multiply).  This file sweeps the remaining sites the round-13 grep
surfaced and pins each guard with values at / beyond .bench_sf10 id
and 100 TB frequency ranges, under ANSI mode so an overflow is an
ERROR, not a silent wrap.

Sweep results (grep `\\* <7+-digit-const>` over the package):
- `zone_map_effectiveness` (advanced.py): pre-mod guard present
  (`(user_id % 1048576) * 2654435761` — max product ~2.8e15).
- `moments_by_type` (advanced.py): FIXED here — c*c multiplied in
  DECIMAL, not BIGINT (ADVICE r12); oracle s4 likewise multiplies
  HUGEINT factors only.
- `text_keyphrases_rake` uscore (llmdata.py): FIXED here —
  quotient/remainder split bounds the intermediate by freq*1e6.
- `multires_rollup` bucket (advanced.py): epoch-seconds * 1e6 is
  ~1.7e15 — safe by domain (year 294k before overflow), no guard
  needed.
- mp4 `trak_pos * 2^32 + pos` (media.py oracle CTE): both are header
  byte offsets; documented < 2^31 in practice — theoretical only.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

ANSI = ("spark.sql.ansi.enabled", "true")


@pytest.fixture()
def ansi(spark):
    old = spark.conf.get(ANSI[0], "false")
    spark.conf.set(*ANSI)
    yield spark
    spark.conf.set(ANSI[0], old)


def test_moments_by_type_survives_3e9_cents(ansi):
    """|cents| past ~3e9 overflows a BIGINT c*c; the decimal-first
    multiply must carry it into the DECIMAL(38,0) accumulators."""
    from projetbigdatastreaming_spark.plans.advanced import moments_by_type

    # c^2 = 9.61e18 > int64 max (the old bigint intermediate raises
    # here under ANSI); c^4 = 9.2e37 still inside DECIMAL(38,0) — the
    # documented headroom now actually applies to the per-row products
    c = 3_100_000_000
    assert c * c > 2**63 - 1 and c**4 < 10**38
    ev = ansi.createDataFrame(
        [("t", float(c) / 100.0)], "event_type string, value double"
    )
    row = moments_by_type(ev).collect()[0]
    assert int(row.s1) == c
    assert int(row.s2) == c * c
    assert int(row.s3) == c**3
    assert int(row.s4) == c**4


def test_rake_uscore_split_is_exact_and_bounded(ansi):
    """The quotient/remainder form equals deg*1e6 // freq exactly and
    survives deg values where the naive multiply overflows int64."""
    cases = [
        (4_000_000_000_000, 1_000_000_000_000),  # 100 TB-ish word
        (9_223_372_036_854, 3),
        (7, 2),
        (123_456_789_012, 987_654_321),
    ]
    df = ansi.createDataFrame(cases, "deg long, freq long")
    got = df.selectExpr(
        "deg",
        "freq",
        "(deg DIV freq) * 1000000 + (deg % freq) * 1000000 DIV freq"
        " AS uscore",
    ).collect()
    for r in got:
        assert r.uscore == (r.deg * 1_000_000) // r.freq


def test_zone_map_premod_guard_holds_at_sf10_ids(ansi):
    """The round-12 fix: ids at the .bench_sf10 offset magnitude
    (1e10..1e12) stay inside int64 through the spread multiply."""
    ids = [(990_000_004_999,), (10_000_000_000,), (0,), (2**62,)]
    df = ansi.createDataFrame(ids, "user_id long")
    rows = df.selectExpr(
        "((user_id % 1048576) * 2654435761) % 64 AS ub"
    ).collect()
    assert all(0 <= r.ub < 64 for r in rows)


def test_rake_uscore_split_equals_naive_on_fixture(spark, sf_dir):
    """The quotient/remainder form is value-identical to the naive
    deg*1e6 // freq on the REAL per-word (deg, freq) relation, not
    just synthetic rows — computed side by side over the corpus."""
    import duckdb

    rows = duckdb.sql(f"""
        WITH member AS (
          SELECT unnest(str_split(lower(text), ' ')) AS w,
                 1 AS plen
          FROM '{sf_dir}/documents.parquet'),
        wstats AS (
          SELECT w, CAST(SUM(plen) AS BIGINT) AS deg,
                 CAST(COUNT(*) AS BIGINT) AS freq
          FROM member GROUP BY 1)
        SELECT COUNT(*) AS n,
               SUM(CASE WHEN (deg // freq) * 1000000
                        + (deg % freq) * 1000000 // freq
                        <> deg * 1000000 // freq
                   THEN 1 ELSE 0 END) AS mismatches
        FROM wstats
    """).fetchone()
    assert rows[0] > 0 and rows[1] == 0, rows
