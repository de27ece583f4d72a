"""Subquery surface: scalar subqueries, correlated EXISTS / NOT
EXISTS, IN / NOT IN, HAVING — expressed through the SQL entry point
(the reference's ss.sql path) in TPC-H-shaped queries.

Catalyst rewrites every one of these into joins (correlated EXISTS →
left-semi, NOT IN → null-aware anti, scalar subquery → broadcast of a
1-row aggregate), so the 100 TB story is the join story — see
SCALING.md.  The DuckDB oracles are near-identical SQL, which is the
point: this is standard ANSI surface.
"""

from __future__ import annotations

from ..catalog import register_views
from .registry import QuerySpec


#: every table any subquery here touches — registered once per call
#: instead of all ten fixture tables (each registration costs a
#: parquet footer read)
_TABLES = ("customer", "lineitem", "orders", "part")


def _sql(query: str):
    def run(spark, sf_dir):
        register_views(spark, sf_dir, only=_TABLES)
        return spark.sql(query)

    return run


# TPC-H Q4 shape: correlated EXISTS
Q_EXISTS = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_quantity > 45
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

# correlated NOT EXISTS (TPC-H Q22 flavor)
Q_NOT_EXISTS = """
SELECT c_mktsegment, COUNT(*) AS n_quiet_customers,
       ROUND(SUM(c_acctbal), 2) AS total_bal
FROM customer
WHERE c_acctbal > 0
  AND NOT EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = c_custkey
      AND o_totalprice > 100000
)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""

# scalar subquery in a predicate (TPC-H Q22's avg filter)
Q_SCALAR_SUBQUERY = """
SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS bal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) * 1.5 FROM customer)
ORDER BY c_custkey
"""

# IN over a grouped HAVING subquery (TPC-H Q18 shape)
Q_IN_HAVING = """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
FROM orders
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(l_quantity) > 250
)
ORDER BY o_orderkey
"""

# NOT IN (null-aware anti join shape, TPC-H Q16 flavor)
Q_NOT_IN = """
SELECT p_brand, COUNT(*) AS n_parts
FROM part
WHERE p_partkey NOT IN (
    SELECT l_partkey FROM lineitem WHERE l_discount > 0.09
)
GROUP BY p_brand
ORDER BY p_brand
"""

# correlated scalar subquery in SELECT (per-row aggregate lookup)
Q_CORRELATED_SCALAR = """
SELECT c_custkey,
       (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey)
         AS n_orders,
       (SELECT ROUND(COALESCE(MAX(o_totalprice), 0), 2) FROM orders
        WHERE o_custkey = c_custkey) AS max_price
FROM customer
ORDER BY c_custkey
"""

REGISTRY: dict[str, QuerySpec] = {
    "subq_exists": QuerySpec(_sql(Q_EXISTS), Q_EXISTS),
    "subq_not_exists": QuerySpec(_sql(Q_NOT_EXISTS), Q_NOT_EXISTS),
    "subq_scalar": QuerySpec(_sql(Q_SCALAR_SUBQUERY), Q_SCALAR_SUBQUERY),
    "subq_in_having": QuerySpec(_sql(Q_IN_HAVING), Q_IN_HAVING),
    "subq_not_in": QuerySpec(_sql(Q_NOT_IN), Q_NOT_IN),
    "subq_correlated_scalar": QuerySpec(
        _sql(Q_CORRELATED_SCALAR), Q_CORRELATED_SCALAR
    ),
}
