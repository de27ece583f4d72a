"""Query registry plumbing shared by all plan modules.

Each plan module contributes ``QuerySpec`` entries; ``__spark_entry__``
merges them into the driver's ``queries()`` / ``oracle_sql()`` dicts.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """A named query: Spark implementation + optional DuckDB oracle SQL.

    ``oracle`` is None only for genuinely non-SQL-expressible operators
    (custom stateful streaming, probabilistic structures); the driver
    then records a weaker rows-only check.
    """

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None


def merge(*registries: dict[str, QuerySpec]) -> dict[str, QuerySpec]:
    out: dict[str, QuerySpec] = {}
    for reg in registries:
        dup = set(reg) & set(out)
        if dup:
            raise ValueError(f"duplicate query names: {sorted(dup)}")
        out.update(reg)
    return out
