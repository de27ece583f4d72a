"""Local emulation of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at sf0.01 (or --sf-dir), compares
row count, column names, an order-insensitive value hash
(columns sorted by name, rows sorted, values normalized), AND the
pandas dtype *class* of every column (``toPandas()`` vs ``.df()``),
and prints a per-query PASS/FAIL table.

The dtype-class check exists because the driver's hash is
representation-sensitive through a pandas conversion: nine r03
queries had bit-identical values but hashed red because DuckDB's
HUGEINT sums land as float64 ("3.0") where Spark emits int64 ("3"),
and DECIMAL outputs land as pandas ``Decimal`` on Spark vs float64
on DuckDB.  Classes proven EQUIVALENT by driver-green rows (and so
merged here): any int width; any datetime64 unit; datetime64 vs
``datetime.date`` objects (ewma_smooth's DATE day was green in r03).
Classes proven DIVERGENT (kept distinct): int vs float, Decimal vs
float.  Local PASS must imply driver PASS.

Usage: python tools/check_oracle.py [--sf-dir DIR] [--only q1,q2] [-v]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from projetbigdatastreaming_spark.catalog import TABLES  # noqa: E402
from projetbigdatastreaming_spark.session import get_test_session  # noqa: E402


def _norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # normalize -0.0 / int-valued floats; 10 sig digits
        if v == 0:
            return "0"
        return f"{v:.10g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_value(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        import datetime

        if isinstance(v, datetime.datetime):
            return v.replace(tzinfo=None).isoformat(sep=" ")
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _col_class(dtype, series) -> str | None:
    """Collapse a pandas column to the representation class the
    driver's hash distinguishes.  None = all-null (no signal)."""
    import datetime
    import decimal

    import numpy as np

    kind = getattr(dtype, "kind", "O")
    if kind in "iu":
        return "int"
    if kind == "f":
        return "float"
    if kind == "b":
        return "bool"
    if kind == "M":
        return "datetime"
    if kind == "m":
        return "timedelta"
    for v in series:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            continue
        if isinstance(v, (bool, np.bool_)):
            return "bool"
        if isinstance(v, decimal.Decimal):
            return "decimal"
        if isinstance(v, (datetime.datetime, datetime.date)):
            return "datetime"
        if isinstance(v, str):
            return "str"
        if isinstance(v, (bytes, bytearray)):
            return "bytes"
        if isinstance(v, (int, np.integer)):
            return "int"
        if isinstance(v, (float, np.floating)):
            return "float"
        if isinstance(v, (list, tuple, np.ndarray)):
            return "list"
        if isinstance(v, dict):
            return "map"
        return "other"
    return None


def _frame_classes(df) -> dict[str, str | None]:
    return {
        c: _col_class(df.dtypes.iloc[i], df.iloc[:, i])
        for i, c in enumerate(df.columns)
    }


def _hash_rows(cols: list[str], rows: list[tuple]) -> tuple[str, list[str]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_norm_value(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return h, lines


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(args.only.split(",")) if args.only else None

    spark = get_test_session()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{args.sf_dir}/{t}.parquet'"
        )

    n_pass = n_fail = n_nosql = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, args.sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc()
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only: {len(srows)} rows)")
            n_nosql += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception:
            print(f"FAIL {name}: duckdb error")
            traceback.print_exc()
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(ocols)}")
        if not problems:
            sh, sl = _hash_rows(scols, srows)
            oh, ol = _hash_rows(ocols, orows)
            if sh != oh:
                problems.append(f"hash spark={sh} duck={oh}")
                if args.verbose:
                    for a, b in zip(sl, ol):
                        if a != b:
                            print(f"  spark: {a}\n  duck : {b}")
                            break
        if not problems:
            # pandas-dtype parity: the representation path the driver
            # hashes through (see module docstring).  A row prefix is
            # enough to read off each column's class — don't pay a
            # second full execution per engine.
            try:
                sclasses = _frame_classes(sdf.limit(500).toPandas())
                oclasses = _frame_classes(
                    con.execute(
                        f"SELECT * FROM ({oracles[name]}) LIMIT 500"
                    ).df()
                )
            except Exception:
                print(f"FAIL {name}: dtype-parity conversion error")
                traceback.print_exc()
                n_fail += 1
                continue
            diverged = {
                c: (sclasses[c], oclasses.get(c))
                for c in sclasses
                if sclasses[c] is not None
                and oclasses.get(c) is not None
                and sclasses[c] != oclasses[c]
            }
            if diverged:
                problems.append(f"dtype-class {diverged}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_nosql} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
