"""Property tests for the round-13 math, cross-validated against
independent pure-Python references.

The driver's correctness gate proves Spark == DuckDB on the shared
expression text; these prove the TEXT ITSELF is right (a both-
engines-wrong bug passes the oracle silently).  The SQL fragments are
evaluated in DuckDB (no Spark session — runs in milliseconds per
example), the references are written from the formulas, not from the
queries.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from projetbigdatastreaming_spark.plans import advanced, llmdata

_SETTINGS = dict(max_examples=60, deadline=None)


@given(z=st.floats(min_value=-8.0, max_value=8.0,
                   allow_nan=False, allow_infinity=False))
@settings(**_SETTINGS)
def test_norm_two_sided_p_matches_erfc(z):
    """The shared A&S 26.2.17 polynomial vs math.erfc (exact):
    2*Phi(-|z|) = erfc(|z|/sqrt(2)).  |eps| < 7.5e-8 per the
    polynomial's published bound (doubled for the two-sided factor)."""
    expr = advanced._norm_two_sided_p("z")
    got = duckdb.sql(
        f"SELECT {expr} AS p FROM (SELECT CAST({z!r} AS DOUBLE) AS z)"
    ).fetchone()[0]
    want = min(1.0, math.erfc(abs(z) / math.sqrt(2.0)))
    assert abs(got - want) < 2e-7, (z, got, want)


def _bh_reference(ps):
    """Benjamini-Hochberg step-up, straight from the 1995 paper."""
    m = len(ps)
    order = sorted(range(m), key=lambda i: ps[i])
    adj = [0.0] * m
    running = 1.0
    for rank in range(m, 0, -1):
        i = order[rank - 1]
        running = min(running, min(1.0, ps[i] * m / rank))
        adj[i] = running
    return adj


@given(ps=st.lists(
    st.floats(min_value=0.0, max_value=1.0,
              allow_nan=False, allow_infinity=False),
    min_size=1, max_size=12))
@settings(**_SETTINGS)
def test_bh_stepup_sql_matches_reference(ps):
    """The oracle's window formulation (MIN over descending rank)
    equals the textbook step-up on arbitrary p-vectors."""
    vals = ", ".join(
        f"({i}, CAST({p!r} AS DOUBLE))" for i, p in enumerate(ps)
    )
    rows = duckdb.sql(f"""
        WITH scored (id, p_raw) AS (VALUES {vals}),
        ranked AS (
          SELECT id, p_raw,
                 ROW_NUMBER() OVER (ORDER BY p_raw, id) AS rn,
                 COUNT(*) OVER () AS k
          FROM scored)
        SELECT id,
               MIN(LEAST(1.0, p_raw * CAST(k AS DOUBLE)
                              / CAST(rn AS DOUBLE)))
                 OVER (ORDER BY rn DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS p_bh
        FROM ranked ORDER BY id
    """).fetchall()
    want = _bh_reference(ps)
    for (_, got), w in zip(rows, want):
        assert abs(got - w) < 1e-12


@given(ns=st.lists(st.integers(min_value=1, max_value=10**9),
                   min_size=1, max_size=10))
@settings(**_SETTINGS)
def test_largest_remainder_apportionment_quota(ns):
    """The minibatch plan's SQL apportionment: sums to B exactly and
    every allocation satisfies the quota property (within 1 of w*B)."""
    b = llmdata._BATCH_SIZE
    a = llmdata.MIX_ALPHA
    vals = ", ".join(f"('s{i:02d}', {n})" for i, n in enumerate(ns))
    rows = duckdb.sql(f"""
        WITH src (source, n_i) AS (VALUES {vals}),
        tot AS (SELECT SUM(POW(CAST(n_i AS DOUBLE), {a})) AS z
                FROM src),
        wts AS (
          SELECT source, n_i,
                 (POW(CAST(n_i AS DOUBLE), {a}) / z) AS w,
                 CAST(FLOOR((POW(CAST(n_i AS DOUBLE), {a}) / z)
                      * {b}.0) AS BIGINT) AS base,
                 (POW(CAST(n_i AS DOUBLE), {a}) / z) * {b}.0
                   - FLOOR((POW(CAST(n_i AS DOUBLE), {a}) / z)
                           * {b}.0) AS rem
          FROM src CROSS JOIN tot),
        ranked AS (
          SELECT *,
                 ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk,
                 {b} - SUM(base) OVER () AS r
          FROM wts)
        SELECT w, base + CASE WHEN rk <= r THEN 1 ELSE 0 END
        FROM ranked
    """).fetchall()
    total = sum(alloc for _, alloc in rows)
    assert total == b
    for w, alloc in rows:
        assert math.floor(w * b) <= alloc <= math.ceil(w * b)


def _mk_reference(ys):
    s = sum(
        (ys[j] > ys[i]) - (ys[j] < ys[i])
        for i in range(len(ys))
        for j in range(i + 1, len(ys))
    )
    n = len(ys)
    from collections import Counter

    ties = sum(t * (t - 1) * (2 * t + 5) for t in Counter(ys).values())
    var = (n * (n - 1) * (2 * n + 5) - ties) / 18.0
    return s, var


@given(ys=st.lists(st.integers(min_value=0, max_value=20),
                   min_size=3, max_size=40))
@settings(**_SETTINGS)
def test_mann_kendall_sql_matches_reference(ys):
    vals = ", ".join(f"({i}, {y})" for i, y in enumerate(ys))
    s_got, var_got = duckdb.sql(f"""
        WITH daily (i, y) AS (VALUES {vals}),
        s AS (
          SELECT CAST(SUM(SIGN(b.y - a.y)) AS BIGINT) AS s_stat
          FROM daily a JOIN daily b ON a.i < b.i),
        ties AS (
          SELECT CAST(SUM(t) AS BIGINT) AS n,
                 CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT)
                   AS tie_term
          FROM (SELECT y, CAST(COUNT(*) AS BIGINT) AS t
                FROM daily GROUP BY 1))
        SELECT s_stat,
               (CAST(n AS DOUBLE) * (n - 1.0) * (2.0 * n + 5.0)
                - CAST(tie_term AS DOUBLE)) / 18.0
        FROM s, ties
    """).fetchone()
    s_want, var_want = _mk_reference(ys)
    assert s_got == s_want
    assert abs(var_got - var_want) < 1e-9


def _croston_reference(points, alpha):
    """(day, y) demand points; init z=y0, x=1; fold from point 2."""
    z = float(points[0][1])
    x = 1.0
    for (d_prev, _), (d, y) in zip(points, points[1:]):
        z = alpha * y + (1 - alpha) * z
        x = alpha * (d - d_prev) + (1 - alpha) * x
    return z, x


@given(data=st.lists(
    st.tuples(st.integers(min_value=0, max_value=400),
              st.integers(min_value=1, max_value=50)),
    min_size=2, max_size=30, unique_by=lambda t: t[0]))
@settings(**_SETTINGS)
def test_croston_recursive_cte_matches_reference(data):
    points = sorted(data)
    al = 0.25
    vals = ", ".join(f"({i}, {d}, {y})"
                     for i, (d, y) in enumerate(points))
    z_got, x_got = duckdb.sql(f"""
        WITH RECURSIVE idx (i, day, y) AS (VALUES {vals}),
        r (i, z, x) AS (
          SELECT 0, CAST((SELECT y FROM idx WHERE i = 0) AS DOUBLE),
                 CAST(1.0 AS DOUBLE)
          UNION ALL
          SELECT r.i + 1,
                 {al} * CAST(d.y AS DOUBLE) + {1 - al} * r.z,
                 {al} * CAST(d.day - p.day AS DOUBLE) + {1 - al} * r.x
          FROM r
          JOIN idx d ON d.i = r.i + 1
          JOIN idx p ON p.i = r.i)
        SELECT z, x FROM r ORDER BY i DESC LIMIT 1
    """).fetchone()
    z_want, x_want = _croston_reference(points, al)
    assert abs(z_got - z_want) < 1e-9
    assert abs(x_got - x_want) < 1e-9


def _welch_reference(groups):
    """groups: list of value lists; returns (F, df2)."""
    stats = []
    for g in groups:
        n = len(g)
        m = sum(g) / n
        v = sum((x - m) ** 2 for x in g) / (n - 1)
        if n >= 2 and v > 0:
            stats.append((n, m, v))
    k = len(stats)
    if k < 2:
        return None
    ws = [(n / v, m, n) for n, m, v in stats]
    w = sum(x[0] for x in ws)
    mbar = sum(wi * mi for wi, mi, _ in ws) / w
    a_num = sum(wi * (mi - mbar) ** 2 for wi, mi, _ in ws) / (k - 1)
    c = sum((1 - wi / w) ** 2 / (ni - 1) for wi, _, ni in ws)
    f = a_num / (1 + 2 * (k - 2) / (k * k - 1) * c)
    df2 = (k * k - 1) / (3 * c)
    return f, df2


@given(groups=st.lists(
    st.lists(st.integers(min_value=0, max_value=1000),
             min_size=3, max_size=15),
    min_size=2, max_size=5))
@settings(**_SETTINGS)
def test_welch_sql_matches_reference(groups):
    ref = _welch_reference(groups)
    vals = ", ".join(
        f"('g{gi}', {v})" for gi, g in enumerate(groups) for v in g
    )
    row = duckdb.sql(f"""
        WITH ev (event_type, c) AS (VALUES {vals}),
        g AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CAST(c AS HUGEINT)) AS DOUBLE) AS s1,
                 CAST(SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT))
                      AS DOUBLE) AS s2
          FROM ev GROUP BY 1),
        per AS (
          SELECT n, s1 / CAST(n AS DOUBLE) AS m,
                 (s2 - s1 * s1 / CAST(n AS DOUBLE))
                   / (CAST(n AS DOUBLE) - 1.0) AS v
          FROM g
          WHERE n >= 2 AND (s2 - s1 * s1 / CAST(n AS DOUBLE))
                / (CAST(n AS DOUBLE) - 1.0) > 0),
        folded AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS k,
                 SUM(CAST(n AS DOUBLE) / v) AS s0,
                 SUM(CAST(n AS DOUBLE) / v * m) AS s1,
                 SUM(CAST(n AS DOUBLE) / v * m * m) AS s2,
                 SUM(1.0 / (CAST(n AS DOUBLE) - 1.0)) AS d1,
                 SUM(CAST(n AS DOUBLE) / v
                     / (CAST(n AS DOUBLE) - 1.0)) AS d2,
                 SUM(CAST(n AS DOUBLE) / v * (CAST(n AS DOUBLE) / v)
                     / (CAST(n AS DOUBLE) - 1.0)) AS d3
          FROM per)
        SELECT k,
               ((s2 - s1 * s1 / s0) / (CAST(k AS DOUBLE) - 1.0))
               / (1.0 + 2.0 * (CAST(k AS DOUBLE) - 2.0)
                  / (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0)
                  * (d1 - 2.0 * d2 / s0 + d3 / (s0 * s0))) AS f,
               (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0)
               / (3.0 * (d1 - 2.0 * d2 / s0 + d3 / (s0 * s0))) AS df2
        FROM folded
    """).fetchone()
    if ref is None or row[0] < 2:
        return
    k_sql, f_got, df2_got = row[0], row[1], row[2]
    f_want, df2_want = ref
    assert abs(f_got - f_want) < 1e-6 * max(1.0, abs(f_want))
    assert abs(df2_got - df2_want) < 1e-6 * max(1.0, abs(df2_want))


def _hw_reference(ys, a=0.25, b=0.125, g=0.25, m=7):
    """Additive Holt-Winters, the docstring's init/fold conventions."""
    lvl = sum(ys[:m]) / float(m)
    tr = 0.0
    season = [y - lvl for y in ys[:m]]
    for i in range(m, len(ys)):
        s_old = season[i % m]
        lvl_new = a * (ys[i] - s_old) + (1 - a) * (lvl + tr)
        tr = b * (lvl_new - lvl) + (1 - b) * tr
        season[i % m] = g * (ys[i] - lvl_new) + (1 - g) * s_old
        lvl = lvl_new
    n = len(ys)
    fc = lvl + 7.0 * tr + season[(n - 1 + 7) % m]
    return lvl, tr, fc


@given(ys=st.lists(st.integers(min_value=0, max_value=500),
                   min_size=14, max_size=45))
@settings(max_examples=25, deadline=None)
def test_holt_winters_cte_matches_reference(ys):
    """The LIST-state recursive CTE (the oracle's shape) equals a
    plain Python loop implementing the documented fold."""
    from projetbigdatastreaming_spark.plans.timeseries import (
        _HW_ALPHA, _HW_BETA, _HW_GAMMA, _HW_PERIOD,
    )

    a, b, g, m = _HW_ALPHA, _HW_BETA, _HW_GAMMA, _HW_PERIOD
    vals = ", ".join(f"({i}, CAST({y} AS DOUBLE))"
                     for i, y in enumerate(ys))
    pos = f"(CAST(d.i % {m} AS BIGINT) + 1)"
    s_old = f"r.season[{pos}]"
    lvl_new = f"({a} * (d.y - {s_old}) + {1 - a} * (r.lvl + r.tr))"
    n = len(ys)
    lvl_got, tr_got, fc_got = duckdb.sql(f"""
        WITH RECURSIVE idx (i, y) AS (VALUES {vals}),
        init AS (
          SELECT SUM(y) / {m}.0 AS lvl0,
                 list(y - (SELECT SUM(y2.y) / {m}.0 FROM idx y2
                           WHERE y2.i < {m})
                      ORDER BY i) AS season0
          FROM idx WHERE i < {m}),
        r (i, lvl, tr, season) AS (
          SELECT CAST({m - 1} AS BIGINT), lvl0,
                 CAST(0.0 AS DOUBLE), season0
          FROM init
          UNION ALL
          SELECT r.i + 1, {lvl_new},
                 {b} * ({lvl_new} - r.lvl) + {1 - b} * r.tr,
                 r.season[1:({pos} - 1)]
                   || [{g} * (d.y - {lvl_new}) + {1 - g} * {s_old}]
                   || r.season[({pos} + 1):{m}]
          FROM r JOIN idx d ON d.i = r.i + 1)
        SELECT lvl, tr,
               lvl + 7.0 * tr
               + season[CAST(({n} - 1 + 7) % {m} AS BIGINT) + 1]
        FROM r WHERE i = {n} - 1
    """).fetchone()
    lvl_want, tr_want, fc_want = _hw_reference(
        [float(y) for y in ys], a, b, g, m
    )
    assert abs(lvl_got - lvl_want) < 1e-9 * max(1.0, abs(lvl_want))
    assert abs(tr_got - tr_want) < 1e-9 * max(1.0, abs(tr_want))
    assert abs(fc_got - fc_want) < 1e-9 * max(1.0, abs(fc_want))
