"""One-off stage profiler for graph_kcore's loop (round 15 diagnosis):
times the pair pipeline materialization and each peel round
separately, in a fresh JVM, so the 92 s A/B reading can be attributed.

Usage: python tools/profile_kcore.py [--sf-dir .bench_sf10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=".bench_sf10")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from projetbigdatastreaming_spark.session import get_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_session(
        app_name="profile_kcore",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from projetbigdatastreaming_spark.catalog import load_table
    from projetbigdatastreaming_spark.operators import dedup as _dedup
    from projetbigdatastreaming_spark.plans.graph import (
        _KCORE_K,
        _KCORE_ROUNDS,
        _TRI_THRESHOLD,
    )

    t0 = time.perf_counter()
    pairs = _dedup.minhash_near_duplicates(
        load_table(spark, args.sf_dir, "documents"), _TRI_THRESHOLD
    ).select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    edges = pairs.persist()
    prev_n = edges.count()
    print(f"pipeline+cache fill: {time.perf_counter() - t0:.2f}s "
          f"n_edges={prev_n}")

    for i in range(_KCORE_ROUNDS):
        t0 = time.perf_counter()
        deg = (
            edges.selectExpr("explode(array(u, v)) AS x")
            .groupBy("x")
            .agg(F.count("*").cast("long").alias("d"))
        )
        keep = deg.where(F.col("d") >= _KCORE_K).select("x")
        nxt = (
            edges.join(keep.withColumnRenamed("x", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("x", "v"), "v", "left_semi")
            .select("u", "v")
            .persist()
        )
        n = nxt.count()
        edges.unpersist()
        edges = nxt
        print(f"round {i}: {time.perf_counter() - t0:.2f}s n={n}")
        if n == prev_n:
            print("fixpoint reached")
            break
        prev_n = n

    t0 = time.perf_counter()
    core_deg = (
        edges.selectExpr("explode(array(u, v)) AS x")
        .groupBy("x")
        .agg(F.count("*").cast("long").alias("core_degree"))
    )
    core_deg.selectExpr("x AS doc_id", "core_degree").orderBy(
        "doc_id"
    ).write.format("noop").mode("overwrite").save()
    print(f"final agg+sort: {time.perf_counter() - t0:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
