"""Driver-contract guards: every registered query must be consumable
by the grading driver's pandas-based canonicalizer, which sorts all
columns before hashing — array/map/struct output crashes it
(round 1: `array_functions` red row, TypeError unhashable 'list').
"""

from __future__ import annotations

import pyspark.sql.types as T
import pytest

import __spark_entry__ as entry

_NESTED = (T.ArrayType, T.MapType, T.StructType)


@pytest.fixture(scope="module")
def schemas(spark):
    sf_dir = "/root/testdata/sf0.001"
    return {
        name: fn(spark, sf_dir).schema
        for name, fn in entry.queries().items()
    }


def test_all_query_outputs_are_atomic(schemas):
    offenders = {
        name: [f.name for f in schema.fields
               if isinstance(f.dataType, _NESTED)]
        for name, schema in schemas.items()
    }
    offenders = {k: v for k, v in offenders.items() if v}
    assert not offenders, f"nested-typed output columns: {offenders}"


def test_all_query_column_names_are_sql_safe(schemas):
    """Lower-case identifier-ish names on every output column — the
    oracle twin must alias to the exact same name, and exotic chars
    invite quoting mismatches between engines."""
    import re

    pat = re.compile(r"^[a-z][a-z0-9_]*$")
    offenders = {
        name: [f.name for f in schema.fields if not pat.match(f.name)]
        for name, schema in schemas.items()
    }
    offenders = {k: v for k, v in offenders.items() if v}
    assert not offenders, f"non-conforming column names: {offenders}"
