"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value", "unit": "sec", "queries", "sf"}.

Each query is forced end-to-end with the `noop` sink (full computation,
no driver-side collect bottleneck).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from projetbigdatastreaming_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf_from_dir(d: str) -> float:
    m = re.search(r"sf([0-9.]+)", d)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    import __spark_entry__ as entrymod

    spark = get_session(
        app_name="bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    spark.sparkContext.setLogLevel("ERROR")

    all_queries = entrymod.queries()
    headline = getattr(entrymod, "HEADLINE_QUERIES", tuple(all_queries))

    timings: dict[str, float] = {}
    for name in headline:
        fn = all_queries[name]
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()  # warm (JIT, scan cache)
        # min of 3 measured runs: machine-noise floor, not a lucky cache
        # (all runs are full end-to-end noop-sink executions)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(SF_DIR),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
