"""Dump ``.explain("formatted")`` for named queries into files — the
optimization-round evidence artifact (plans/r14/<query>_{before,after}.txt).

Usage:
    python tools/dump_plan.py QUERY [QUERY...] --suffix before \
        [--out-dir plans/r14] [--sf-dir /root/testdata/sf0.1]

Plan SHAPE is scale-independent, so the default sf-dir is the primary
bench fixture; AQE may still re-plan exchanges at runtime (the bench
numbers are the runtime truth, these files are the static shape).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--suffix", required=True, choices=["before", "after"])
    ap.add_argument("--out-dir", default="plans/r14")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from projetbigdatastreaming_spark.session import get_session

    spark = get_session(
        app_name="dump_plan", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    all_queries = entrymod.queries()
    os.makedirs(args.out_dir, exist_ok=True)
    for name in args.queries:
        df = all_queries[name](spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
