"""Data-quality and governance operators: declarative constraint
checking (Deequ-style), k-anonymity auditing, blocked fuzzy string
matching, and snapshot diffing (CDC derivation).

These extend the engine's curation surface (SURVEY.md north-star
extensions): a training-data pipeline needs to *assert* dataset
health (constraint_check), *audit* re-identification risk before
release (k_anonymity), *reconcile* entity names across sources
(fuzzy_match), and *derive* change feeds between table snapshots
when no CDC stream exists (snapshot_diff).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from .registry import QuerySpec

# ---------------------------------------------------------------------------
# constraint_check — Deequ-style declarative dataset assertions
# ---------------------------------------------------------------------------


def q_constraint_check(spark, sf_dir):
    """Declarative constraint suite over ``orders``: one row per
    constraint with an exact metric and a pass/fail verdict.

    Scale plan: the four column-level constraints (completeness,
    uniqueness, range, set membership) come out of ONE full scan of
    orders collapsed to a single partial-aggregate row — adding a
    constraint adds an accumulator, not a scan.  The referential
    constraint is one LEFT ANTI broadcast-able join (customer keys are
    dims-scale).  Metrics are exact integer ratios rounded at 6 dp, so
    both engines emit identical doubles.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    one_scan = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_custkey").alias("n_custkey"),
        F.count("o_orderkey").alias("n_orderkey"),
        F.countDistinct("o_orderkey").alias("n_distinct_orderkey"),
        F.sum(F.when(F.col("o_totalprice") > 0, 1).otherwise(0)).alias(
            "n_price_pos"
        ),
        F.sum(
            F.when(F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
        ).alias("n_status_ok"),
    )

    orphans = (
        orders.join(
            cust, orders.o_custkey == cust.c_custkey, "left_anti"
        ).agg(F.count(F.lit(1)).alias("n_orphans"))
    )

    # Each constraint = (name, numerator, denominator); pass iff the
    # ratio is exactly 1.  The ratio of two BIGINTs is the same double
    # in every engine; round(…, 6) is belt-and-braces.
    metrics = one_scan.crossJoin(orphans).select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("completeness_o_custkey").alias("check_name"),
                    F.col("n_custkey").alias("num"),
                    F.col("n").alias("den"),
                ),
                F.struct(
                    F.lit("uniqueness_o_orderkey").alias("check_name"),
                    F.col("n_distinct_orderkey").alias("num"),
                    F.col("n_orderkey").alias("den"),
                ),
                F.struct(
                    F.lit("range_o_totalprice_gt_0").alias("check_name"),
                    F.col("n_price_pos").alias("num"),
                    F.col("n").alias("den"),
                ),
                F.struct(
                    F.lit("membership_o_orderstatus").alias("check_name"),
                    F.col("n_status_ok").alias("num"),
                    F.col("n").alias("den"),
                ),
                F.struct(
                    F.lit("referential_o_custkey").alias("check_name"),
                    (F.col("n") - F.col("n_orphans")).alias("num"),
                    F.col("n").alias("den"),
                ),
            )
        ).alias("c")
    )
    return metrics.select(
        F.col("c.check_name").alias("check_name"),
        F.round(
            F.try_divide(
                F.col("c.num").cast("double"), F.col("c.den").cast("double")
            ),
            6,
        ).alias("metric"),
        (F.col("c.num") == F.col("c.den")).alias("passed"),
    ).orderBy("check_name")


SQL_CONSTRAINT_CHECK = """
WITH s AS (
  SELECT COUNT(*) AS n,
         COUNT(o_custkey) AS n_custkey,
         COUNT(o_orderkey) AS n_orderkey,
         COUNT(DISTINCT o_orderkey) AS n_distinct_orderkey,
         SUM(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END) AS n_price_pos,
         SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END)
           AS n_status_ok
  FROM orders),
o AS (
  SELECT COUNT(*) AS n_orphans
  FROM orders
  WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)),
m AS (
  SELECT 'completeness_o_custkey' AS check_name, n_custkey AS num, n AS den
  FROM s
  UNION ALL
  SELECT 'uniqueness_o_orderkey', n_distinct_orderkey, n_orderkey FROM s
  UNION ALL
  SELECT 'range_o_totalprice_gt_0', n_price_pos, n FROM s
  UNION ALL
  SELECT 'membership_o_orderstatus', n_status_ok, n FROM s
  UNION ALL
  SELECT 'referential_o_custkey', s.n - o.n_orphans, s.n FROM s, o)
SELECT check_name,
       ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS metric,
       num = den AS passed
FROM m
ORDER BY check_name
"""


# ---------------------------------------------------------------------------
# k_anonymity — re-identification risk audit over quasi-identifiers
# ---------------------------------------------------------------------------

_K_THRESHOLD = 5


def q_k_anonymity(spark, sf_dir):
    """k-anonymity audit: group sizes over the quasi-identifier tuple
    (nation, market segment, account-balance band) of ``customer``.
    A group with fewer than k=5 members is re-identifiable; the PII
    scrub (`text_pii`) removes direct identifiers, this audits the
    *indirect* ones — the release gate a curated dataset needs.

    Scale plan: one hash-agg on the quasi-identifier tuple (bounded
    cardinality: nations x segments x 4 bands), then a broadcast-size
    result.  The balance band is integer floor-division — engine-exact.
    """
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    band = (
        F.floor(F.col("c_acctbal").cast("decimal(12,2)") / 3000)
        .cast("int")
        .alias("bal_band")
    )
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("n_name", "c_mktsegment", band)
        .groupBy("n_name", "c_mktsegment", "bal_band")
        .agg(F.count(F.lit(1)).alias("group_n"))
        .withColumn("at_risk", F.col("group_n") < _K_THRESHOLD)
        .orderBy("n_name", "c_mktsegment", "bal_band")
    )


SQL_K_ANONYMITY = f"""
SELECT n_name, c_mktsegment,
       CAST(FLOOR(CAST(c_acctbal AS DECIMAL(12,2)) / 3000) AS INT)
         AS bal_band,
       COUNT(*) AS group_n,
       COUNT(*) < {_K_THRESHOLD} AS at_risk
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1, 2, 3
ORDER BY n_name, c_mktsegment, bal_band
"""


def q_l_diversity(spark, sf_dir):
    """l-diversity audit — k-anonymity's required companion
    (Machanavajjhala et al. 2007): a group can be large (k-anonymous)
    yet leak its SENSITIVE attribute if every member shares one value
    (the homogeneity attack).  Over the same quasi-identifier groups
    as `k_anonymity` (nation, market segment, balance band), count
    DISTINCT sensitive values — here the order priority of each
    customer's orders — and gate on l >= 2.  Customers with no orders
    carry a 'none' sentinel (absence is itself a disclosure class).

    Scale plan: one left join customer→orders (AQE picks the
    strategy; at 100 TB the orders side aggregates to (custkey,
    priority) grain first via the distinct), then one hash-agg on
    the bounded quasi-identifier tuple with a count_distinct — which
    Spark executes as the expand/two-phase distinct-agg, fine for ONE
    distinct column (the multi-count_distinct EXPAND trap documented
    in SCALING.md needs two+).
    """
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    band = (
        F.floor(F.col("c_acctbal").cast("decimal(12,2)") / 3000)
        .cast("int")
        .alias("bal_band")
    )
    base = (
        cust.join(
            F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
        )
        .select("c_custkey", "n_name", "c_mktsegment", band)
        .join(orders, cust.c_custkey == orders.o_custkey, "left")
        .select(
            "n_name",
            "c_mktsegment",
            "bal_band",
            F.coalesce("o_orderpriority", F.lit("none")).alias(
                "sensitive"
            ),
        )
    )
    return (
        base.groupBy("n_name", "c_mktsegment", "bal_band")
        .agg(
            F.count_distinct("sensitive").cast("long").alias("l_div")
        )
        .withColumn("homogeneous", F.col("l_div") < 2)
        .orderBy("n_name", "c_mktsegment", "bal_band")
    )


SQL_L_DIVERSITY = """
WITH base AS (
  SELECT n_name, c_mktsegment,
         CAST(FLOOR(CAST(c_acctbal AS DECIMAL(12,2)) / 3000) AS INT)
           AS bal_band,
         COALESCE(o_orderpriority, 'none') AS sensitive
  FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  LEFT JOIN orders ON c_custkey = o_custkey)
SELECT n_name, c_mktsegment, bal_band,
       CAST(COUNT(DISTINCT sensitive) AS BIGINT) AS l_div,
       COUNT(DISTINCT sensitive) < 2 AS homogeneous
FROM base GROUP BY 1, 2, 3
ORDER BY n_name, c_mktsegment, bal_band
"""


def q_chi2_independence(spark, sf_dir):
    """Pearson χ² independence audit per contingency cell (customer
    market segment × nation): expected count E = R·C/N under
    independence, the cell's χ² contribution (O−E)²/E, and the
    standardized residual (O−E)/√E with the |resid| > 3 flag — WHICH
    cells drive the dependence, the actionable form of the test (the
    global statistic is the sum of the contribution column; like
    `mutual_information`, the output stays per-cell so no cross-cell
    float sum exists to be order-sensitive under hash aggregation).

    Determinism: O, R, C, N are exact integers; E, contribution, and
    residual are fixed single expressions on them — bit-identical
    doubles in both engines before the det6 floor.

    Scale plan: the `mutual_information` shape exactly — broadcast
    nation dim, ONE hash-agg to the ≤|x|·|y| grid, partitioned window
    marginals over that KB-sized grid, 1-row scalar broadcast total.
    """
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    joint = (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_name", "c_mktsegment")
        .agg(F.count("*").cast("bigint").alias("o"))
    )
    wx = Window.partitionBy("n_name")
    wy = Window.partitionBy("c_mktsegment")
    total = joint.agg(F.sum("o").cast("bigint").alias("n"))
    det6 = "CAST(FLOOR(({expr}) * 1e6 + 0.5) AS DOUBLE) / 1e6"
    e = "(CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))"
    return (
        joint.withColumn("r", F.sum("o").over(wx))
        .withColumn("c", F.sum("o").over(wy))
        .crossJoin(F.broadcast(total))
        .selectExpr(
            "n_name",
            "c_mktsegment",
            "o",
            det6.format(expr=e) + " AS expected",
            det6.format(
                expr=f"(CAST(o AS DOUBLE) - {e}) * (CAST(o AS DOUBLE)"
                f" - {e}) / {e}"
            )
            + " AS chi2_contrib",
            det6.format(
                expr=f"(CAST(o AS DOUBLE) - {e}) / SQRT({e})"
            )
            + " AS std_resid",
            f"ABS((CAST(o AS DOUBLE) - {e}) / SQRT({e})) > 3.0"
            " AS outlier_cell",
        )
        .orderBy("n_name", "c_mktsegment")
    )


def _sql_chi2_independence() -> str:
    e = "(CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))"
    det6 = "CAST(FLOOR(({expr}) * 1e6 + 0.5) AS DOUBLE) / 1e6"
    return f"""
WITH joint AS (
  SELECT n_name, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS o
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2),
marg AS (
  SELECT *,
         SUM(o) OVER (PARTITION BY n_name) AS r,
         SUM(o) OVER (PARTITION BY c_mktsegment) AS c
  FROM joint),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM joint)
SELECT n_name, c_mktsegment, o,
       {det6.format(expr=e)} AS expected,
       {det6.format(expr=f"(CAST(o AS DOUBLE) - {e}) * (CAST(o AS DOUBLE) - {e}) / {e}")} AS chi2_contrib,
       {det6.format(expr=f"(CAST(o AS DOUBLE) - {e}) / SQRT({e})")} AS std_resid,
       ABS((CAST(o AS DOUBLE) - {e}) / SQRT({e})) > 3.0 AS outlier_cell
FROM marg CROSS JOIN tot
ORDER BY n_name, c_mktsegment
"""


SQL_CHI2_INDEPENDENCE = _sql_chi2_independence()


def q_t_closeness(spark, sf_dir):
    """t-closeness audit — the third rung of the privacy ladder
    (Li, Li & Venkatasubramanian, ICDE 2007): an l-diverse group can
    still leak if its sensitive-value DISTRIBUTION is skewed relative
    to the table at large (the skewness attack — "this group is 90%
    URGENT" is a disclosure even with all five priorities present).
    Over the same quasi-identifier groups as `k_anonymity` /
    `l_diversity`, t = Earth Mover's Distance between the group's
    order-priority distribution and the global one, under the ordinal
    ground distance (priorities 1-URGENT … 5-LOW are ordered; 'none'
    sits below them as rank 0).  For ordinal domains EMD has a closed
    form: t = (1/(m−1)) · Σ_j |CumP_g(j) − CumP(j)|.

    Determinism: everything stays in 64-bit integers until the last
    division — cumulative-count cross products
    |cum_g(j)·N − gcum(j)·n_g| summed over the first m−1 ranks, the
    violation flag compared as num > n_g·N (⇔ t > 1/(m−1) = 0.2),
    and the reported t pays ONE double division rounded at 6 dp.
    int64 headroom: n_g·N ≤ N² stays under 2⁶³ through N ≈ 3·10⁹
    customers (far past sf1000).

    Scale plan: NO per-rank densify join and NO window — because the
    rank domain is fixed (m=6), the per-group CUMULATIVE counts are
    conditional sums inside ONE hash-agg on the bounded
    quasi-identifier tuple, and the global distribution is the same
    aggregate without keys: a 1-row relation broadcast into the
    group relation (the tpch_q11 uncorrelated-scalar shape, on the
    plan-audit BNLJ allowlist).  The only full-table work is the
    customer→orders left join shared with `l_diversity`.
    """
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    band = (
        F.floor(F.col("c_acctbal").cast("decimal(12,2)") / 3000)
        .cast("int")
        .alias("bal_band")
    )
    base = (
        cust.join(
            F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
        )
        .select("c_custkey", "n_name", "c_mktsegment", band)
        .join(orders, cust.c_custkey == orders.o_custkey, "left")
        .select(
            "n_name",
            "c_mktsegment",
            "bal_band",
            F.coalesce(
                F.substring("o_orderpriority", 1, 1).cast("int"),
                F.lit(0),
            ).alias("r"),
        )
    )
    cums = [
        F.sum((F.col("r") <= j).cast("bigint")).alias(f"cum{j}")
        for j in range(5)
    ]
    grp = base.groupBy("n_name", "c_mktsegment", "bal_band").agg(
        F.count(F.lit(1)).cast("bigint").alias("group_n"), *cums
    )
    glob = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        *[
            F.sum((F.col("r") <= j).cast("bigint")).alias(f"gcum{j}")
            for j in range(5)
        ],
    )
    num = sum(
        F.abs(
            F.col(f"cum{j}") * F.col("n_total")
            - F.col(f"gcum{j}") * F.col("group_n")
        )
        for j in range(5)
    )
    return (
        grp.crossJoin(F.broadcast(glob))
        .withColumn("num", num)
        .selectExpr(
            "n_name",
            "c_mktsegment",
            "bal_band",
            "group_n",
            "CAST(FLOOR(CAST(num AS DOUBLE)"
            " / (5.0 * group_n * n_total) * 1e6 + 0.5) AS DOUBLE)"
            " / 1e6 AS t_value",
            "num > group_n * n_total AS violates",
        )
        .orderBy("n_name", "c_mktsegment", "bal_band")
    )


def _sql_t_closeness() -> str:
    cums = ",\n         ".join(
        f"CAST(SUM(CASE WHEN r <= {j} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS cum{j}"
        for j in range(5)
    )
    gcums = ",\n         ".join(
        f"CAST(SUM(CASE WHEN r <= {j} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS gcum{j}"
        for j in range(5)
    )
    num = " + ".join(
        f"ABS(cum{j} * n_total - gcum{j} * group_n)" for j in range(5)
    )
    return f"""
WITH base AS (
  SELECT n_name, c_mktsegment,
         CAST(FLOOR(CAST(c_acctbal AS DECIMAL(12,2)) / 3000) AS INT)
           AS bal_band,
         COALESCE(CAST(substr(o_orderpriority, 1, 1) AS INT), 0) AS r
  FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  LEFT JOIN orders ON c_custkey = o_custkey),
grp AS (
  SELECT n_name, c_mktsegment, bal_band,
         CAST(COUNT(*) AS BIGINT) AS group_n,
         {cums}
  FROM base GROUP BY 1, 2, 3),
gtot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
         {gcums}
  FROM base),
scored AS (
  SELECT n_name, c_mktsegment, bal_band, group_n, n_total,
         CAST({num} AS BIGINT) AS num
  FROM grp CROSS JOIN gtot)
SELECT n_name, c_mktsegment, bal_band, group_n,
       CAST(FLOOR(CAST(num AS DOUBLE)
         / (5.0 * group_n * n_total) * 1e6 + 0.5) AS DOUBLE) / 1e6
         AS t_value,
       num > group_n * n_total AS violates
FROM scored
ORDER BY n_name, c_mktsegment, bal_band
"""


SQL_T_CLOSENESS = _sql_t_closeness()


# ---------------------------------------------------------------------------
# fuzzy_match — blocked edit-distance self-join (entity reconciliation)
# ---------------------------------------------------------------------------

_EDIT_K = 2


def q_fuzzy_match(spark, sf_dir):
    """Fuzzy name matching: distinct part-name pairs within edit
    distance 2, found WITHOUT an all-pairs comparison.

    Blocking is the FastSS / SymSpell deletion neighborhood: every
    name emits all variants reachable by deleting at most k=2
    characters.  If ed(A,B) <= k, an optimal edit script aligns all
    but <= k positions of each string, so deleting the edited
    positions from each side yields a COMMON variant — the
    neighborhoods intersect, and an equi-join on the variant string
    finds every true pair (complete blocking; positional segment
    schemes are NOT complete under insert/delete, which shift
    boundaries).  Candidates are deduped and verified with the exact
    levenshtein predicate.

    Scale plan: a name of length L emits 1 + L + L(L-1)/2 variants
    (~56 for L=10) — a map-side flatten with bounded fan-out, then one
    equi-join on short string keys.  The quadratic levenshtein runs
    only on verified candidates, never on the cross product.  The
    pair is canonicalized (a < b) before dedup so each pair survives
    exactly once however many variants matched.
    """
    part = load_table(spark, sf_dir, "part")
    names = part.select(F.col("p_name").alias("name")).distinct()
    del1 = (
        "transform(sequence(1, length(name)),"
        " i -> concat(substring(name, 1, i-1),"
        "             substring(name, i+1, length(name))))"
    )
    del2 = (
        "CASE WHEN length(name) >= 2 THEN"
        " flatten(transform(sequence(1, length(name) - 1),"
        "  i -> transform(sequence(i + 1, length(name)),"
        "   j -> concat(substring(name, 1, i-1),"
        "               substring(name, i+1, j-i-1),"
        "               substring(name, j+1, length(name))))))"
        " ELSE array() END"
    )
    variants = names.select(
        "name",
        F.explode(
            F.expr(
                f"array_distinct(concat(array(name), {del1}, {del2}))"
            )
        ).alias("v"),
    )
    a = variants.select(F.col("name").alias("name_a"), "v")
    b = variants.select(F.col("name").alias("name_b"), "v")
    cand = (
        a.join(b, "v")
        .where(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
    )
    return (
        cand.withColumn(
            "dist", F.levenshtein(F.col("name_a"), F.col("name_b"))
        )
        .where(F.col("dist") <= _EDIT_K)
        .orderBy("name_a", "name_b")
    )


SQL_FUZZY_MATCH = f"""
WITH names AS (SELECT DISTINCT p_name AS name FROM part),
variants AS (
  SELECT name, unnest(list_distinct(
    [name]
    || list_transform(generate_series(1, length(name)),
         i -> substr(name, 1, i-1) || substr(name, i+1, length(name)))
    || CASE WHEN length(name) >= 2 THEN
         flatten(list_transform(generate_series(1, length(name) - 1),
           i -> list_transform(generate_series(i + 1, length(name)),
             j -> substr(name, 1, i-1) || substr(name, i+1, j-i-1)
                  || substr(name, j+1, length(name)))))
       ELSE [] END)) AS v
  FROM names),
cand AS (
  SELECT DISTINCT a.name AS name_a, b.name AS name_b
  FROM variants a JOIN variants b ON a.v = b.v
  WHERE a.name < b.name)
SELECT name_a, name_b, levenshtein(name_a, name_b) AS dist
FROM cand
WHERE levenshtein(name_a, name_b) <= {_EDIT_K}
ORDER BY name_a, name_b
"""


# ---------------------------------------------------------------------------
# snapshot_diff — CDC derivation between two table states
# ---------------------------------------------------------------------------


def q_snapshot_diff(spark, sf_dir):
    """Derive a change feed by diffing two snapshots of ``orders``
    when no CDC stream exists (the batch ancestor of `scd2_history`):
    full-outer join on the key, row-hash compare for updates.

    The two states are carved deterministically from the fixture:
    *old* = orders placed before 1996-01-01; *new* = orders placed
    1993-01-01..1996-12-31, with a simulated repricing (+1.00) for
    order keys divisible by 97.  The diff therefore contains all
    three change types: inserts (1996 orders), deletes (pre-1993
    orders), updates (repriced keys in the overlap).

    Scale plan: one shuffle-on-key full-outer join; the md5 row hash
    collapses arbitrarily wide payloads to one comparison, so the
    operator's cost is independent of column count after the scan.
    Output is the change rows only — Exchange carries just
    (key, hash) pairs plus the changed payload.

    Internally prices stay DECIMAL(12,2) (the row-hash needs an exact
    2-dp string), but the OUTPUT price is cast to double on both
    sides: decimal→double is correctly-rounded in both engines, and a
    DECIMAL output hashes as pandas ``Decimal`` on Spark vs float64
    on DuckDB (the r03 representation-divergence class).
    """
    orders = load_table(spark, sf_dir, "orders")
    old = orders.where(F.col("o_orderdate") < "1996-01-01").select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
    )
    new = (
        orders.where(
            (F.col("o_orderdate") >= "1993-01-01")
            & (F.col("o_orderdate") <= "1996-12-31")
        )
        .select(
            "o_orderkey",
            F.col("o_orderstatus").alias("status"),
            (
                F.col("o_totalprice").cast("decimal(12,2)")
                + F.when(F.col("o_orderkey") % 97 == 0, 1).otherwise(0)
            ).cast("decimal(12,2)").alias("price"),
        )
    )
    row_hash = lambda df: F.md5(  # noqa: E731
        F.concat_ws("|", F.col("status"), F.col("price").cast("string"))
    )
    o = old.select(
        "o_orderkey", row_hash(old).alias("old_hash")
    )
    n = new.select(
        "o_orderkey", "status", "price", row_hash(new).alias("new_hash")
    )
    j = o.join(n, "o_orderkey", "full_outer")
    return (
        j.select(
            "o_orderkey",
            F.when(F.col("old_hash").isNull(), "insert")
            .when(F.col("new_hash").isNull(), "delete")
            .when(F.col("old_hash") != F.col("new_hash"), "update")
            .alias("change_type"),
            "status",
            F.col("price").cast("double").alias("price"),
        )
        .where(F.col("change_type").isNotNull())
        .orderBy("o_orderkey")
    )


SQL_SNAPSHOT_DIFF = """
WITH old AS (
  SELECT o_orderkey, o_orderstatus AS status,
         CAST(o_totalprice AS DECIMAL(12,2)) AS price
  FROM orders WHERE o_orderdate < DATE '1996-01-01'),
new AS (
  SELECT o_orderkey, o_orderstatus AS status,
         CAST(CAST(o_totalprice AS DECIMAL(12,2))
              + CASE WHEN o_orderkey % 97 = 0 THEN 1 ELSE 0 END
              AS DECIMAL(12,2)) AS price
  FROM orders
  WHERE o_orderdate BETWEEN DATE '1993-01-01' AND DATE '1996-12-31'),
o AS (SELECT o_orderkey,
             md5(concat_ws('|', status, CAST(price AS VARCHAR)))
               AS old_hash FROM old),
n AS (SELECT o_orderkey, status, price,
             md5(concat_ws('|', status, CAST(price AS VARCHAR)))
               AS new_hash FROM new)
SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
       CASE WHEN o.old_hash IS NULL THEN 'insert'
            WHEN n.new_hash IS NULL THEN 'delete'
            WHEN o.old_hash <> n.new_hash THEN 'update' END AS change_type,
       n.status, CAST(n.price AS DOUBLE) AS price
FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey
WHERE CASE WHEN o.old_hash IS NULL THEN 'insert'
           WHEN n.new_hash IS NULL THEN 'delete'
           WHEN o.old_hash <> n.new_hash THEN 'update' END IS NOT NULL
ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# quality_classifier — linear model scoring (fasttext-filter shape)
# ---------------------------------------------------------------------------

_QC_STOPWORDS = (
    "the", "a", "an", "and", "of", "to", "in", "is", "on", "for",
)
#: integer weights of the linear model (milli-score per unit ratio)
_QC_W_STOP = 600  # stopword ratio: natural prose has some
_QC_W_NONAL = 400  # non-alphanumeric ratio: penalized
_QC_W_LEN = 2  # length credit, saturating at 256 tokens
_QC_OFFSET = 400  # shifts the score positive so floor-div is floor on both engines
_QC_KEEP_MILLI = 20_000  # keep iff score_milli >= 20.000 (~p20 of fixture)


def _qc_scored(docs):
    """doc_id → score_milli for the linear quality model: every
    feature an integer count, the score ONE integer rational num/den
    (common denominator n_tok*n_chars*256); the offset keeps the
    numerator positive so truncating (Spark) and flooring (DuckDB)
    integer division agree.  No float enters the plan."""
    toks = F.split(F.lower(F.col("text")), r"\s+")
    stop_arr = F.array(*[F.lit(s) for s in _QC_STOPWORDS])
    n_tok = F.size(F.filter(toks, lambda t: t != ""))
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_chars = F.length("text")
    n_nonal = F.length(
        F.regexp_replace(F.col("text"), r"[A-Za-z0-9\s]", "")
    )
    feat = docs.select(
        "doc_id",
        n_tok.cast("bigint").alias("n_tok"),
        n_stop.cast("bigint").alias("n_stop"),
        n_chars.cast("bigint").alias("n_chars"),
        n_nonal.cast("bigint").alias("n_nonal"),
    ).where((F.col("n_tok") > 0) & (F.col("n_chars") > 0))
    den = F.col("n_tok") * F.col("n_chars") * 256
    num = (
        _QC_W_STOP * F.col("n_stop") * F.col("n_chars") * 256
        - _QC_W_NONAL * F.col("n_nonal") * F.col("n_tok") * 256
        + _QC_W_LEN
        * F.least(F.col("n_tok"), F.lit(256))
        * F.col("n_tok")
        * F.col("n_chars")
        + _QC_OFFSET * den
    )
    # integer floor-division of positive bigints: (a - a%b)/b — the
    # quotient is an exact multiple so the double division is exact
    # (quotient < 2^53 by construction: score ≤ ~1.4e6 milli)
    return feat.select(
        "doc_id",
        (
            ((1000 * num - (1000 * num) % den) / den).cast("bigint")
            - 1000 * _QC_OFFSET
        ).alias("score_milli"),
    )


def q_quality_classifier(spark, sf_dir):
    """Model-based document filtering: a linear quality classifier
    (the fasttext-classifier shape of CCNet/LLaMA-style curation —
    handcrafted integer weights standing in for trained ones) scoring
    stopword ratio, non-alphanumeric ratio, and saturating length.

    Scale plan: pure map-side codegen expressions over one scan —
    the classifier adds zero shuffles; at 100 TB this is the same
    plan as any projection.  A trained model swaps the weight
    constants; a wider model becomes a broadcast weight table joined
    on feature id.  Cross-engine exactness: see ``_qc_scored``.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        _qc_scored(docs)
        .select(
            "doc_id",
            "score_milli",
            (F.col("score_milli") >= _QC_KEEP_MILLI).alias("keep"),
        )
        .orderBy("doc_id")
    )


_QC_STOP_SQL = ", ".join(f"'{s}'" for s in _QC_STOPWORDS)

#: shared feat/scored CTE bodies — quality_classifier and
#: curation_pipeline reuse the exact same oracle text
_QC_SCORED_CTES = f"""feat AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(lower(text), '\\s+'),
                         t -> t <> '')) AS n_tok,
         len(list_filter(string_split_regex(lower(text), '\\s+'),
                         t -> list_contains([{_QC_STOP_SQL}], t)))
           AS n_stop,
         length(text) AS n_chars,
         length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
           AS n_nonal
  FROM documents),
scored AS (
  SELECT doc_id,
         ((1000 * ({_QC_W_STOP} * n_stop * n_chars * 256
                   - {_QC_W_NONAL} * n_nonal * n_tok * 256
                   + {_QC_W_LEN} * least(n_tok, 256) * n_tok * n_chars
                   + {_QC_OFFSET} * n_tok * n_chars * 256))
          // (n_tok * n_chars * 256)) - {1000 * _QC_OFFSET}
           AS score_milli
  FROM feat
  WHERE n_tok > 0 AND n_chars > 0)"""

SQL_QUALITY_CLASSIFIER = f"""
WITH {_QC_SCORED_CTES}
SELECT doc_id, score_milli, score_milli >= {_QC_KEEP_MILLI} AS keep
FROM scored
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# curation_pipeline — composed end-to-end curation with drop attribution
# ---------------------------------------------------------------------------

_CP_LEN_MIN = 100
_CP_LEN_MAX = 520
_CP_SAMPLE_PCT = 90


def q_curation_pipeline(spark, sf_dir):
    """End-to-end curation run composing four stages of this engine —
    quality classifier → prefix-boilerplate dedup → length band →
    deterministic sample — with per-document drop ATTRIBUTION: each
    document reports the FIRST stage that dropped it, or 'kept'.

    This is the audit artifact a production corpus build ships with
    (why did doc X not make the training set?), and it exercises stage
    ORDER semantics: dedup canonicals are elected among quality
    SURVIVORS (a dropped canonical must not shadow a kept duplicate),
    which the oracle replays exactly.

    Scale plan: one scan computes score + fingerprint map-side; the
    only shuffle is the canonical election groupBy on the 100-char
    prefix fingerprint (shuffles (fp, doc_id) pairs, not text) plus
    the fp-keyed join back.  Stages 3–4 are free predicates on the
    same pass.  At 100 TB this is ONE fact shuffle — the same cost as
    `dedup_prefix` alone; attribution costs nothing extra.
    """
    from ..operators.sampling import _portable_hash

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "n_chars",
        F.md5(F.substring("text", 1, 100)).alias("fp"),
    ).join(_qc_scored(docs), "doc_id", "left")
    q_ok = F.coalesce(
        F.col("score_milli") >= _QC_KEEP_MILLI, F.lit(False)
    )
    canon = (
        base.where(q_ok)
        .groupBy("fp")
        .agg(F.min("doc_id").alias("canon_id"))
    )
    joined = base.join(canon, "fp", "left")
    status = (
        F.when(~q_ok, F.lit("quality"))
        .when(F.col("doc_id") != F.col("canon_id"), F.lit("duplicate"))
        .when(
            ~F.col("n_chars").between(_CP_LEN_MIN, _CP_LEN_MAX),
            F.lit("length"),
        )
        .when(
            _portable_hash(F.col("doc_id"), "cp0") % 100
            >= _CP_SAMPLE_PCT,
            F.lit("sampled_out"),
        )
        .otherwise(F.lit("kept"))
    )
    return joined.select(
        "doc_id", status.alias("status")
    ).orderBy("doc_id")


_CP_HASH = (
    "CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), 'cp0')),"
    " 1, 15)) AS BIGINT)"
)

SQL_CURATION_PIPELINE = f"""
WITH {_QC_SCORED_CTES},
base AS (
  SELECT d.doc_id, d.n_chars, md5(substr(d.text, 1, 100)) AS fp,
         s.score_milli
  FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id),
canon AS (
  SELECT fp, MIN(doc_id) AS canon_id
  FROM base
  WHERE COALESCE(score_milli >= {_QC_KEEP_MILLI}, false)
  GROUP BY fp)
SELECT b.doc_id,
       CASE
         WHEN NOT COALESCE(b.score_milli >= {_QC_KEEP_MILLI}, false)
           THEN 'quality'
         WHEN b.doc_id <> c.canon_id THEN 'duplicate'
         WHEN b.n_chars NOT BETWEEN {_CP_LEN_MIN} AND {_CP_LEN_MAX}
           THEN 'length'
         WHEN {_CP_HASH} % 100 >= {_CP_SAMPLE_PCT} THEN 'sampled_out'
         ELSE 'kept'
       END AS status
FROM base b LEFT JOIN canon c ON b.fp = c.fp
ORDER BY b.doc_id
"""


QC_CAL_BAND_MILLI = 5_000  # calibration band width around the keep cut


def q_quality_calibration(spark, sf_dir):
    """Classifier-vs-rules CALIBRATION curve — the validation step
    before trusting a cheap ranking classifier to gate 100 TB: for
    each fixed score band around `quality_classifier`'s keep
    threshold (width 5000 milli, clamped to bands −5..4), the
    `gopher_quality` rule-gate pass rate and mean rules failed.  A
    well-calibrated classifier shows pass_rate rising monotonically
    through band 0 (the decision boundary); a flat curve says the
    score carries no rule-gate signal at that cut.  Bands are fixed
    integer math (never data-derived quantiles), so the curve is
    mergeable across shards and the oracle replays it exactly.

    Scale plan: composes two green parents — the classifier is
    map-side expressions, the gopher flags are two bounded keyed
    exchanges — plus one doc_id equi-join and a ≤10-key hash-agg."""
    from .llmdata import q_gopher_quality

    docs = load_table(spark, sf_dir, "documents")
    scored = _qc_scored(docs).select("doc_id", "score_milli")
    flags = q_gopher_quality(spark, sf_dir).select(
        "doc_id",
        "ok_n_words",
        "ok_mean_len",
        "ok_alpha",
        "ok_stop",
        "ok_top_unigram",
        "passes",
    )
    band = F.least(
        F.lit(4),
        F.greatest(
            F.lit(-5),
            F.floor(
                (F.col("score_milli") - F.lit(_QC_KEEP_MILLI))
                / F.lit(float(QC_CAL_BAND_MILLI))
            ),
        ),
    ).cast("int")
    n_failed = F.lit(5) - (
        F.col("ok_n_words")
        + F.col("ok_mean_len")
        + F.col("ok_alpha")
        + F.col("ok_stop")
        + F.col("ok_top_unigram")
    )
    return (
        scored.join(flags, "doc_id")
        .select(band.alias("band"), "passes", n_failed.alias("n_failed"))
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("passes").cast("bigint").alias("n_pass"),
            F.round(F.sum("passes") / F.count(F.lit(1)), 4).alias(
                "pass_rate"
            ),
            F.round(F.sum("n_failed") / F.count(F.lit(1)), 4).alias(
                "mean_rules_failed"
            ),
        )
        .orderBy("band")
    )


def _sql_quality_calibration() -> str:
    from .llmdata import _GOPHER_CTES

    return f"""
WITH {_QC_SCORED_CTES},
{_GOPHER_CTES},
j AS (
  SELECT LEAST(4, GREATEST(-5,
           CAST(FLOOR((s.score_milli - {_QC_KEEP_MILLI})
                      / {QC_CAL_BAND_MILLI}.0) AS BIGINT))) AS band,
         f.ok_n_words * f.ok_mean_len * f.ok_alpha * f.ok_stop
           * f.ok_top_unigram AS passes,
         5 - (f.ok_n_words + f.ok_mean_len + f.ok_alpha + f.ok_stop
              + f.ok_top_unigram) AS n_failed
  FROM scored s JOIN flagged f USING (doc_id))
SELECT CAST(band AS INT) AS band,
       COUNT(*) AS n_docs,
       CAST(SUM(passes) AS BIGINT) AS n_pass,
       ROUND(SUM(passes) / CAST(COUNT(*) AS DOUBLE), 4) AS pass_rate,
       ROUND(SUM(n_failed) / CAST(COUNT(*) AS DOUBLE), 4)
         AS mean_rules_failed
FROM j
GROUP BY band
ORDER BY band
"""


def drift_feature_bins(docs):
    """(feature, bin) rows for the two monitored document features —
    ``n_chars`` in 6 fixed 100-wide bins and the ``lang`` categorical.
    Shared verbatim by the batch PSI query and the streaming drift
    monitor (`streaming/curation.drift_monitor_writer`), so the two
    can't diverge on binning."""
    return docs.selectExpr(
        "stack(2, 'n_chars',"
        " CAST(least(5, n_chars DIV 100) AS STRING), 'lang', lang)"
        " AS (feature, bin)"
    )


def psi_from_counts(counts):
    """(feature, psi) from a (feature, bin, ref_cnt, cur_cnt) relation
    — Laplace-smoothed exact-integer ratios into ln, det6
    floor-rounded; the math half shared by batch and stream."""
    totals = counts.groupBy(F.col("feature").alias("tf")).agg(
        F.sum("ref_cnt").cast("long").alias("ref_tot"),
        F.sum("cur_cnt").cast("long").alias("cur_tot"),
        F.count("*").cast("long").alias("n_bins"),
    )
    term = (
        "((cur_cnt + 1) / CAST(cur_tot + n_bins AS DOUBLE)"
        " - (ref_cnt + 1) / CAST(ref_tot + n_bins AS DOUBLE))"
        " * ln(((cur_cnt + 1) / CAST(cur_tot + n_bins AS DOUBLE))"
        " / ((ref_cnt + 1) / CAST(ref_tot + n_bins AS DOUBLE)))"
    )
    return (
        counts.join(
            F.broadcast(totals), F.col("feature") == F.col("tf")
        )
        .selectExpr("feature", f"{term} AS t")
        .groupBy("feature")
        .agg(
            F.expr(
                "CAST(floor(sum(t) * 1e6 + 0.5) AS DOUBLE) / 1e6"
            ).alias("psi")
        )
        .orderBy("feature")
    )


def q_psi_drift(spark, sf_dir):
    """Population-stability-index drift report between a reference and
    a current corpus slice — the standard production gate for "did the
    incoming data's distribution move?" (credit-scoring lineage; the
    PSI is the symmetrized KL estimate Σ (p_cur − p_ref)·ln(p_cur /
    p_ref) over fixed bins).  Two monitored features over `documents`:
    ``n_chars`` in 6 fixed 100-wide bins and the ``lang`` categorical;
    slices are the even/odd doc_id halves (the deterministic stand-in
    for last-period vs this-period).  Output: (feature, psi) — psi ~ 0
    means stable; the conventional alert bars are 0.1 / 0.25.

    Determinism: bin probabilities are Laplace-smoothed exact-integer
    ratios ((cnt + 1) / (slice_total + n_bins_present)), so ln() sees
    engine-identical doubles; per-feature PSI sums over ≤~10 bins in a
    keyed aggregate (addition order inside one engine-side sum over so
    few near-magnitude terms is hash-order stable across both engines
    at det6 granularity); det6 floor-rounded.

    Scale plan: ONE corpus pass aggregates to (feature, bin,
    ref_cnt, cur_cnt) — conditional sums, map-side combine, bounded
    output (≤ bins + langs rows); the probability/PSI math runs on
    that KB-sized relation, with slice totals as a broadcast 1-row
    aggregate per feature (computed by re-aggregating the bounded
    relation, never the corpus).
    """
    docs = load_table(spark, sf_dir, "documents")
    both = docs.selectExpr("doc_id % 2 = 0 AS is_ref", "n_chars", "lang")
    # the stack expr mirrors drift_feature_bins with the slice flag
    # carried through (stack + an extra passthrough column)
    binned = both.selectExpr(
        "is_ref",
        "stack(2, 'n_chars',"
        " CAST(least(5, n_chars DIV 100) AS STRING), 'lang', lang)"
        " AS (feature, bin)",
    )
    counts = binned.groupBy("feature", "bin").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0))
        .cast("long")
        .alias("ref_cnt"),
        F.sum(F.when(~F.col("is_ref"), 1).otherwise(0))
        .cast("long")
        .alias("cur_cnt"),
    )
    return psi_from_counts(counts)


SQL_PSI_DRIFT = """
WITH docs AS (
  SELECT doc_id % 2 = 0 AS is_ref,
         CAST(least(5, n_chars // 100) AS VARCHAR) AS chars_bin,
         lang
  FROM documents),
binned AS (
  SELECT is_ref, 'n_chars' AS feature, chars_bin AS bin FROM docs
  UNION ALL
  SELECT is_ref, 'lang' AS feature, lang AS bin FROM docs),
counts AS (
  SELECT feature, bin,
         CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT)
           AS ref_cnt,
         CAST(SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT)
           AS cur_cnt
  FROM binned GROUP BY feature, bin),
totals AS (
  SELECT feature AS tf,
         CAST(SUM(ref_cnt) AS BIGINT) AS ref_tot,
         CAST(SUM(cur_cnt) AS BIGINT) AS cur_tot,
         CAST(COUNT(*) AS BIGINT) AS n_bins
  FROM counts GROUP BY feature),
terms AS (
  SELECT feature,
         ((cur_cnt + 1) / CAST(cur_tot + n_bins AS DOUBLE)
          - (ref_cnt + 1) / CAST(ref_tot + n_bins AS DOUBLE))
         * ln(((cur_cnt + 1) / CAST(cur_tot + n_bins AS DOUBLE))
              / ((ref_cnt + 1) / CAST(ref_tot + n_bins AS DOUBLE)))
           AS t
  FROM counts JOIN totals ON feature = tf)
SELECT feature, FLOOR(SUM(t) * 1e6 + 0.5) / 1e6 AS psi
FROM terms GROUP BY feature
ORDER BY feature
"""


# ---------------------------------------------------------------------------
# benford_fit — first-digit distribution audit (round 10)
# ---------------------------------------------------------------------------


def q_benford_fit(spark, sf_dir):
    """First-significant-digit audit of ``l_extendedprice`` against
    Benford's law — the standard forensic screen for fabricated or
    unit-corrupted numeric columns (Benford 1938; Nigrini's audit
    practice): naturally occurring multi-scale amounts put digit d
    first with probability log10(1+1/d), and a synthetic or truncated
    feed visibly doesn't.  Output per digit: count, observed share,
    expected share, and the χ² contribution n·(obs−exp)²/exp.

    Determinism: the digit is extracted from the EXACT integer cents
    (floor(x·100+0.5) → BIGINT → decimal string → first char), never
    from floor(log10(x)) — log10 lands below the true value at exact
    powers of ten and misclassifies them, and integer→string renders
    identically on both engines where double formatting doesn't.

    Scale plan: one map-side-combined hash-agg to ≤9 rows, a 1-row
    total broadcast (the tpch_q11 scalar shape); the fact table is
    scanned once, projection-pruned to one column.
    """
    li = load_table(spark, sf_dir, "lineitem")
    digits = li.select(
        F.substring(
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
            .cast("bigint")
            .cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("digit")
    )
    counts = digits.groupBy("digit").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    total = counts.agg(F.sum("cnt").cast("bigint").alias("n"))
    det6 = "CAST(FLOOR(({expr}) * 1e6 + 0.5) AS DOUBLE) / 1e6"
    obs = "cnt / CAST(n AS DOUBLE)"
    exp = "ln(1.0 + 1.0 / digit) / ln(10.0)"
    chi2 = f"n * power(({obs}) - ({exp}), 2) / ({exp})"
    return (
        counts.crossJoin(F.broadcast(total))
        .selectExpr(
            "digit",
            "cnt",
            det6.format(expr=obs) + " AS observed_p",
            det6.format(expr=exp) + " AS expected_p",
            det6.format(expr=chi2) + " AS chi2_term",
        )
        .orderBy("digit")
    )


SQL_BENFORD_FIT = """
WITH counts AS (
  SELECT CAST(substring(CAST(CAST(FLOOR(l_extendedprice * 100 + 0.5)
                        AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY 1),
total AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM counts)
SELECT digit, cnt,
       CAST(FLOOR((cnt / CAST(n AS DOUBLE)) * 1e6 + 0.5) AS DOUBLE)
         / 1e6 AS observed_p,
       CAST(FLOOR((ln(1.0 + 1.0 / digit) / ln(10.0)) * 1e6 + 0.5)
         AS DOUBLE) / 1e6 AS expected_p,
       CAST(FLOOR((n * power(cnt / CAST(n AS DOUBLE)
                             - ln(1.0 + 1.0 / digit) / ln(10.0), 2)
                   / (ln(1.0 + 1.0 / digit) / ln(10.0))) * 1e6 + 0.5)
         AS DOUBLE) / 1e6 AS chi2_term
FROM counts, total
ORDER BY digit
"""


# ---------------------------------------------------------------------------
# mutual_information — categorical dependence audit (round 10)
# ---------------------------------------------------------------------------


def q_mutual_information(spark, sf_dir):
    """Mutual information between two categorical columns (customer
    market segment × nation) — the feature-dependence audit a
    training pipeline runs before trusting a stratification key or
    looking for leakage between metadata columns (MI = Σ p(x,y)
    ln(p(x,y)/(p(x)p(y))); Cover & Thomas ch. 2).  Output: one row
    per observed (nation, segment) cell with its count, PMI, and MI
    contribution — all ratios formed from exact integer counts, so
    both engines compute bit-identical doubles before the det6 floor.

    Scale plan: broadcast the 25-row nation dim into the customer
    scan, ONE map-side-combined hash-agg to the ≤|x|·|y| joint grid;
    marginals ride PARTITIONED window sums over that tiny grid and
    the grand total is the tpch_q11 1-row scalar broadcast (the
    repo's blessed shape for an uncorrelated scalar — a global window
    would serialize, and the audit bans it registry-wide).  The grid
    is KB-sized at any corpus scale, so the second tiny aggregate
    over it costs nothing next to the fact scan.
    """
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    joint = (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_name", "c_mktsegment")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    wx = Window.partitionBy("n_name")
    wy = Window.partitionBy("c_mktsegment")
    total = joint.agg(F.sum("cnt").cast("bigint").alias("n"))
    det6 = "CAST(FLOOR(({expr}) * 1e6 + 0.5) AS DOUBLE) / 1e6"
    pmi = "ln((cnt * n) / (CAST(cx AS DOUBLE) * cy))"
    mi = f"(cnt / CAST(n AS DOUBLE)) * ({pmi})"
    return (
        joint.select(
            "n_name",
            "c_mktsegment",
            "cnt",
            F.sum("cnt").over(wx).alias("cx"),
            F.sum("cnt").over(wy).alias("cy"),
        )
        .crossJoin(F.broadcast(total))
        .selectExpr(
            "n_name",
            "c_mktsegment",
            "cnt",
            det6.format(expr=pmi) + " AS pmi",
            det6.format(expr=mi) + " AS mi_term",
        )
        .orderBy("n_name", "c_mktsegment")
    )


SQL_MUTUAL_INFORMATION = """
WITH joint AS (
  SELECT n.n_name, c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2),
total AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM joint),
g AS (
  SELECT n_name, c_mktsegment, cnt,
         SUM(cnt) OVER (PARTITION BY n_name) AS cx,
         SUM(cnt) OVER (PARTITION BY c_mktsegment) AS cy,
         n
  FROM joint, total)
SELECT n_name, c_mktsegment, cnt,
       CAST(FLOOR(ln((cnt * n) / (CAST(cx AS DOUBLE) * cy)) * 1e6 + 0.5)
         AS DOUBLE) / 1e6 AS pmi,
       CAST(FLOOR(((cnt / CAST(n AS DOUBLE))
                   * ln((cnt * n) / (CAST(cx AS DOUBLE) * cy)))
                  * 1e6 + 0.5) AS DOUBLE) / 1e6 AS mi_term
FROM g
ORDER BY n_name, c_mktsegment
"""


# ---------------------------------------------------------------------------
# anomaly_mad — median/MAD robust outlier census (round 10)
# ---------------------------------------------------------------------------


def q_anomaly_mad(spark, sf_dir):
    """Robust per-group outlier census: a value is anomalous when its
    absolute deviation from the group MEDIAN exceeds 3 robust sigmas
    (1.4826 × MAD — the median absolute deviation consistency
    constant for a normal population; Hampel's rule).  Unlike the
    mean/stddev z-score (`iqr_outliers`' cousin), one wild sensor
    reading cannot drag the threshold, which is why production drift
    monitors prefer it.  Output per event type: median, MAD, outlier
    count and share.

    Determinism: both medians are det6-floored BEFORE the threshold
    comparison — Spark and DuckDB interpolate even-count medians with
    differently associated expressions (lo+(hi−lo)·f vs lo·(1−f)+hi·f)
    that can differ in the last ulp, and a raw-ulp threshold would
    flip boundary rows.

    Scale plan: exact medians are two sort-based aggs per group (the
    5-row result broadcasts back into the scan each time) — the exact
    path is the CORRECTNESS baseline; at 100 TB swap stage 1 for
    approx_percentile(0.5) (t-digest, one pass, mergeable) without
    touching the census stage.  Three scans of one pruned column, no
    self-joins.
    """
    ev = load_table(spark, sf_dir, "events")
    det6 = "CAST(FLOOR(({expr}) * 1e6 + 0.5) AS DOUBLE) / 1e6"
    med = ev.groupBy("event_type").agg(
        F.expr(det6.format(expr="median(value)")).alias("med")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.expr(
                det6.format(expr="median(abs(value - med))")
            ).alias("mad")
        )
    )
    stats = med.join(mad, "event_type")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("med").alias("med"),
            F.first("mad").alias("mad"),
            F.sum(
                (
                    F.abs(F.col("value") - F.col("med"))
                    > 3 * 1.4826 * F.col("mad")
                ).cast("int")
            )
            .cast("bigint")
            .alias("n_outliers"),
            F.count("*").cast("bigint").alias("n"),
        )
        .selectExpr(
            "event_type",
            "med",
            "mad",
            "n_outliers",
            det6.format(expr="n_outliers / CAST(n AS DOUBLE)")
            + " AS outlier_share",
        )
        .orderBy("event_type")
    )


SQL_ANOMALY_MAD = """
WITH med AS (
  SELECT event_type,
         CAST(FLOOR(median(value) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS med
  FROM events GROUP BY 1),
mad AS (
  SELECT e.event_type,
         CAST(FLOOR(median(abs(e.value - m.med)) * 1e6 + 0.5) AS DOUBLE)
           / 1e6 AS mad
  FROM events e JOIN med m ON e.event_type = m.event_type
  GROUP BY 1),
census AS (
  SELECT e.event_type, m.med, d.mad,
         CAST(SUM(CASE WHEN abs(e.value - m.med) > 3 * 1.4826 * d.mad
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events e
  JOIN med m ON e.event_type = m.event_type
  JOIN mad d ON e.event_type = d.event_type
  GROUP BY 1, 2, 3)
SELECT event_type, med, mad, n_outliers,
       CAST(FLOOR((n_outliers / CAST(n AS DOUBLE)) * 1e6 + 0.5)
         AS DOUBLE) / 1e6 AS outlier_share
FROM census
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# gini_concentration — inequality coefficient of customer spend (round 10)
# ---------------------------------------------------------------------------


def q_gini_concentration(spark, sf_dir):
    """Per-nation Gini coefficient of customer spend — the
    concentration audit ("how skewed is my key within each group?") a
    pipeline runs before trusting a partition or sampling key, and
    the economics-standard inequality measure.  Uses the sorted-rank
    identity G = (2·Σ i·xᵢ − (n+1)·Σ xᵢ) / (n·Σ xᵢ) over ascending
    spend within each nation (Sen 1973) — one ranked pass, never the
    O(n²) pairwise |xᵢ−xⱼ| definition.

    Determinism: spend accumulates as BIGINT cents; rank ties break
    on custkey; both Σ terms stay integers until the single final
    division (i·xᵢ ≤ n·max_cents keeps Σ i·xᵢ inside int64 through
    sf100).

    Scale plan: one hash-agg to per-customer rows with the 25-row
    nation dim broadcast in, then NATION-PARTITIONED rank + aggregate
    (hashpartitioning — the audit bans global windows registry-wide,
    and the grouped form is also the analytically useful one; a
    whole-corpus Gini at 100 TB is the two-level rank-by-range
    composition this grouped operator's math drops into unchanged).
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    spend = (
        orders.join(
            cust.join(
                F.broadcast(nat),
                cust.c_nationkey == nat.n_nationkey,
            ).select("c_custkey", "n_name"),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy("n_name", "o_custkey")
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                    "bigint"
                )
            ).alias("cents")
        )
    )
    w = Window.partitionBy("n_name").orderBy("cents", "o_custkey")
    ranked = spend.select(
        "n_name",
        "cents",
        F.row_number().over(w).cast("bigint").alias("i"),
    )
    det6 = "CAST(FLOOR(({expr}) * 1e6 + 0.5) AS DOUBLE) / 1e6"
    gini = (
        "(2 * sum_ix - (n + 1) * sum_x) / (n * CAST(sum_x AS DOUBLE))"
    )
    return (
        ranked.groupBy("n_name")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("sum_x"),
            F.sum(F.col("i") * F.col("cents")).cast("bigint").alias(
                "sum_ix"
            ),
        )
        .selectExpr(
            "n_name",
            "n AS n_customers",
            det6.format(expr=gini) + " AS gini",
        )
        .orderBy("n_name")
    )


SQL_GINI_CONCENTRATION = """
WITH spend AS (
  SELECT n.n_name, o.o_custkey,
         SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2),
ranked AS (
  SELECT n_name, cents,
         CAST(row_number() OVER (PARTITION BY n_name
                                 ORDER BY cents, o_custkey) AS BIGINT)
           AS i
  FROM spend),
agg AS (
  SELECT n_name,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS sum_x,
         CAST(SUM(i * cents) AS BIGINT) AS sum_ix
  FROM ranked GROUP BY 1)
SELECT n_name, n AS n_customers,
       CAST(FLOOR(((2 * sum_ix - (n + 1) * sum_x)
                   / (n * CAST(sum_x AS DOUBLE))) * 1e6 + 0.5)
         AS DOUBLE) / 1e6 AS gini
FROM agg
ORDER BY n_name
"""


REGISTRY: dict[str, QuerySpec] = {
    "benford_fit": QuerySpec(q_benford_fit, SQL_BENFORD_FIT),
    "mutual_information": QuerySpec(
        q_mutual_information, SQL_MUTUAL_INFORMATION
    ),
    "anomaly_mad": QuerySpec(q_anomaly_mad, SQL_ANOMALY_MAD),
    "gini_concentration": QuerySpec(
        q_gini_concentration, SQL_GINI_CONCENTRATION
    ),
    "psi_drift": QuerySpec(q_psi_drift, SQL_PSI_DRIFT),
    "quality_classifier": QuerySpec(
        q_quality_classifier, SQL_QUALITY_CLASSIFIER
    ),
    "quality_calibration": QuerySpec(
        q_quality_calibration, _sql_quality_calibration()
    ),
    "curation_pipeline": QuerySpec(
        q_curation_pipeline, SQL_CURATION_PIPELINE
    ),
    "constraint_check": QuerySpec(q_constraint_check, SQL_CONSTRAINT_CHECK),
    "k_anonymity": QuerySpec(q_k_anonymity, SQL_K_ANONYMITY),
    "l_diversity": QuerySpec(q_l_diversity, SQL_L_DIVERSITY),
    "t_closeness": QuerySpec(q_t_closeness, SQL_T_CLOSENESS),
    "chi2_independence": QuerySpec(
        q_chi2_independence, SQL_CHI2_INDEPENDENCE
    ),
    "fuzzy_match": QuerySpec(q_fuzzy_match, SQL_FUZZY_MATCH),
    "snapshot_diff": QuerySpec(q_snapshot_diff, SQL_SNAPSHOT_DIFF),
}
