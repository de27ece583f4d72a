"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value", "unit": "sec", "queries", "sf"}.

Each query is forced end-to-end with the `noop` sink (full computation,
no driver-side collect bottleneck).

Second scale point: at sf0.1 every headline query sits in Spark's
job-scheduling noise floor (0.2-0.7 s), where a +6% wobble and a real
regression look alike and algorithmic blowups hide behind constants.
So after the primary sweep, scaled copies of the fixture are built
once (tools/gen_scale.py, cached in .bench_sf1/ and .bench_sf10/)
and re-timed — reported under the extra keys ``sf2``/``sf3`` (the
primary contract keys are unchanged).  The 100× column runs BEFORE
the 10× column (most cold-state-sensitive rows get the freshest JVM)
and every sweep runs under the idle-wait + retry-once contamination
guard.  Disable with SPARK_GRAFT_SF2=0 / SPARK_GRAFT_SF3=0.
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
SF2_FACTOR = int(os.environ.get("SPARK_GRAFT_SF2", "10"))
SF2_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".bench_sf1"
)
SF3_FACTOR = int(os.environ.get("SPARK_GRAFT_SF3", "100"))
SF3_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".bench_sf10"
)

#: third scale point, one decade past sf1 (~60 M lineitem rows, ~1 M
#: documents): the scaling-curve queries the 100x claims lean on —
#: the widest TPC-H join, the corpus-wide line dedup, the banded
#: near-dup join, the window-fingerprint profile, and the Bloom screen
#: NEXT TO its unscreened parent (the docstring predicts the screen's
#: fixed broadcast latency is overtaken by the corpus-shuffle cost it
#: avoids as the corpus grows — sf10 is where that crossover should
#: become visible).  Sub-quadratic growth sf1→sf10 is the acceptance
#: bar; min-of-3 per query since round 12 (tpch_q21's 10.7→28.9 s
#: consecutive-run spread showed min-of-2 under-samples the
#: cold-state band SCALING.md documents).
SF3_QUERIES: tuple[str, ...] = (
    "tpch_q21",
    "line_dedup",
    "dedup_minhash_pairs",
    "substring_dedup",
    "dedup_incremental",
    "dedup_incremental_bloom",
    # round 9: the retrieval ladder's scale points (VERDICT r08
    # missing #2) — the exact brute-force anchor and the two-stage
    # BQ-shortlist + ADC-rescore production path.  gen_scale perturbs
    # embeddings per copy, so sf10 is ~1 M distinct vectors.  The
    # acceptance shape: stage-2 cost tracks |Q|·shortlist (constant
    # across decades), so the two-stage search should grow strictly
    # slower than the brute-force anchor decade-over-decade.
    "emb_cosine_topk",
    "emb_bq_ivfpq_rerank",
    # round 10: the round-9 heavyweights' scale points (VERDICT r09
    # missing #2) — the text-retrieval explode (expected ~linear:
    # one corpus explode + 1-row stats broadcast), the triangle
    # census over the near-dup pair graph (pair-volume-bounded), and
    # the order-width-bounded basket self-join (measured 5.4x/decade
    # by hand in round 9; this puts the claim in the shipped
    # artifact)
    "bm25_topk",
    "graph_triangles",
    "basket_lift",
    # round 11 (VERDICT r10 item 4): the two-level-prefix rows and
    # the hand-measured graph rows enter the shipped artifact.
    # interval_overlap is the slowest non-basket sf10 row (16.96 s
    # hand-measured r10, attributed to the 2n-row boundary relation's
    # range exchange + determinism checkpoint); TWAP rides the same
    # machinery at 4.42 s — shipping both pins the attribution.
    "interval_overlap",
    "time_weighted_avg",
    "graph_clustering_coeff",
    "graph_kcore",
    # round 11: the two-level distributed lead's growth curve (the
    # third two-level consumer; TWAP and the sweep-line already ship)
    "interarrival_stats",
    # round 12: the boilerplate scorer's growth curve next to its
    # sibling line_dedup (same two-exchange segment shape, plus the
    # distinct-doc count)
    "doc_boilerplate_ratio",
    # round 13: the corpus bigram explode's growth curve (hand
    # bench_one: 1.44→2.52 s sf1→sf10, 1.8×/decade — this pins it in
    # the shipped artifact)
    "ngram_entropy_rate",
)

#: queries re-timed at the scaled fixture.  ``None`` means "every
#: headline query" — the sf1 column exists to be the noise-free trend
#: signal, so it must cover the same set the primary column does
#: (a partial subset left 10 headline queries with no scaled number
#: and made round-over-round drift unadjudicable).
SF2_QUERIES: tuple[str, ...] | None = None

#: sustained external CPU (whole-machine busy minus this process
#: tree) above which a sweep is stamped contaminated.  OS background
#: noise measures <0.2 CPU on this container; a competing pytest/
#: oracle sweep is 10-30 CPUs.  1.0 splits those by an order of
#: magnitude each way.
EXTERNAL_CPU_LIMIT = float(os.environ.get("SPARK_GRAFT_EXT_CPU_LIMIT", "1.0"))

#: 1-minute loadavg a sweep may START at (VERDICT r13 item 2): the
#: external-CPU guard is blind to SELF-contamination — r13's sf10
#: column started at loadavg 4.55 right after the 17-minute pytest
#: suite (external CPU 0.0, so no flag) and read tpch_q21 at 26.6 s
#: vs 14.4 s adjudicated on the idle machine.  Loadavg decays e-fold
#: per minute, so waiting for < 2 costs a couple of minutes between
#: columns and buys a clean JVM/page-cache start for each one.
LOADAVG_START_LIMIT = float(
    os.environ.get("SPARK_GRAFT_LOADAVG_LIMIT", "2.0")
)


def _sf_from_dir(d: str) -> float:
    m = re.search(r"sf([0-9.]+)", d)
    return float(m.group(1)) if m else -1.0


def _total_busy_jiffies() -> int:
    """Whole-machine busy jiffies from /proc/stat (all - idle - iowait)."""
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    v = [int(x) for x in parts]
    return sum(v) - v[3] - (v[4] if len(v) > 4 else 0)


def _proc_tree_jiffies() -> int:
    """CPU jiffies of this process and every descendant: live
    utime+stime PLUS each process's cutime+cstime (CPU of its REAPED
    children).  The reaped terms matter: a pyspark worker that dies
    mid-sweep takes its whole jiffy history out of the live sum, and
    without cutime/cstime that history would reappear as phantom
    EXTERNAL load and falsely contaminate an idle sweep.  A child's
    CPU is never double-counted — cutime/cstime accumulate only
    after the wait(), when the child has left the live listing."""
    stats: dict[int, int] = {}
    children: dict[int, list[int]] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                s = f.read()
        except OSError:
            continue  # raced a process exit
        rest = s[s.rindex(")") + 2 :].split()
        pid = int(d)
        stats[pid] = (
            int(rest[11])
            + int(rest[12])
            + int(rest[13])
            + int(rest[14])
        )
        children.setdefault(int(rest[1]), []).append(pid)
    total = 0
    stack = [os.getpid()]
    while stack:
        p = stack.pop()
        total += stats.get(p, 0)
        stack.extend(children.get(p, []))
    return total


def sweep_load_begin() -> tuple[float, int, int, float]:
    return (
        time.monotonic(),
        _total_busy_jiffies(),
        _proc_tree_jiffies(),
        os.getloadavg()[0],
    )


def sweep_load_end(begin: tuple[float, int, int, float]) -> dict:
    """Load stamp for one sweep (VERDICT r10 item 2: BENCH_r10 shipped
    sf1/sf10 columns taken under concurrent load and unflagged).
    ``external_cpu_avg`` is machine-busy-CPU minus THIS process tree's
    CPU, averaged over the sweep — raw loadavg alone can't separate
    bench's own 32 threads from a competitor's."""
    t0, busy0, tree0, load0 = begin
    elapsed = max(time.monotonic() - t0, 1e-6)
    hz = os.sysconf("SC_CLK_TCK")
    external = (_total_busy_jiffies() - busy0) - (
        _proc_tree_jiffies() - tree0
    )
    ext_cpus = max(0.0, external / hz / elapsed)
    stamp = {
        "loadavg_start": round(load0, 2),
        "loadavg_end": round(os.getloadavg()[0], 2),
        "external_cpu_avg": round(ext_cpus, 2),
        "contaminated": ext_cpus > EXTERNAL_CPU_LIMIT,
    }
    if stamp["contaminated"]:
        print(
            f"WARNING: sweep ran against {ext_cpus:.1f} external CPUs "
            "of competing load — timings stamped contaminated",
            file=sys.stderr,
        )
    return stamp


def _external_cpu_now(window_sec: float = 2.0) -> float:
    """External CPU (whole machine minus this process tree) averaged
    over a short sampling window — the quiet probe the idle-wait loop
    polls (no warning print, no sweep stamp)."""
    busy0, tree0 = _total_busy_jiffies(), _proc_tree_jiffies()
    time.sleep(window_sec)
    hz = os.sysconf("SC_CLK_TCK")
    ext = (_total_busy_jiffies() - busy0) - (_proc_tree_jiffies() - tree0)
    return max(0.0, ext / hz / window_sec)


def _loadavg1() -> float:
    """1-minute loadavg (separate function so tests can mock the
    machine state independently of the external-CPU probe)."""
    return os.getloadavg()[0]


def wait_for_external_idle(max_wait_sec: float = 600.0) -> bool:
    """Block (bounded) until competing load drops below the
    contamination threshold.  Returns True if idle was reached.

    VERDICT r11 item 2: the r11 guard *stamped* the sf1 sweep
    contaminated (external_cpu 1.78) but shipped it anyway, costing a
    round of usable sf1 signal.  Now every sweep waits for idle before
    starting, and a sweep that still stamps dirty is re-run once.

    VERDICT r13 item 2: ALSO require the 1-minute loadavg below
    ``LOADAVG_START_LIMIT`` — external CPU alone cannot see the tail
    of this process's OWN previous sweep (run queues, dirty page
    writeback), which is exactly what inflated r13's in-run sf10
    column."""
    waited = 0.0
    while waited < max_wait_sec:
        ext = _external_cpu_now()
        waited += 2.0
        load1 = _loadavg1()
        if ext <= EXTERNAL_CPU_LIMIT and load1 <= LOADAVG_START_LIMIT:
            return True
        print(
            f"bench: waiting for idle (external CPU {ext:.1f} vs limit "
            f"{EXTERNAL_CPU_LIMIT}, loadavg {load1:.1f} vs limit "
            f"{LOADAVG_START_LIMIT}); {waited:.0f}s/{max_wait_sec:.0f}s",
            file=sys.stderr,
        )
        time.sleep(8.0)
        waited += 8.0
    return False


def run_sweep_guarded(body) -> tuple[dict, dict]:
    """Run one timed sweep with contamination *recovery*, not just
    detection (VERDICT r11 item 2): wait for external idle, run
    ``body()`` under the load stamp, and if the stamp comes back
    contaminated, wait for idle again and re-run ONCE.  The shipped
    timings are the last attempt's; every attempt's stamp stays in the
    artifact (``prior_attempts``) so a retry is visible, and the final
    ``contaminated`` flag is honest if the retry was dirty too."""
    stamps: list[dict] = []
    timings: dict = {}
    for _attempt in range(2):
        wait_for_external_idle()
        begin = sweep_load_begin()
        timings = body()
        stamp = sweep_load_end(begin)
        stamps.append(stamp)
        if not stamp["contaminated"]:
            break
        print(
            "bench: sweep contaminated — retrying once after idle wait",
            file=sys.stderr,
        )
    final = dict(stamps[-1])
    final["retries"] = len(stamps) - 1
    if len(stamps) > 1:
        final["prior_attempts"] = stamps[:-1]
    return timings, final


def main() -> None:
    import __spark_entry__ as entrymod

    spark = get_session(
        app_name="bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        # local mode runs everything in ONE JVM whose default heap is
        # 1g — fine at sf0.1, fatal at the 10x scale point (the JVM
        # OOM-dies mid-query).  Must be set before the JVM launches,
        # hence here and not post-hoc.  The container has 128 GiB;
        # 48g heap leaves ample room for the 32 Python workers.
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    all_queries = entrymod.queries()
    headline = getattr(entrymod, "HEADLINE_QUERIES", tuple(all_queries))

    def _timed_min3(fn, sf_dir):
        """Warm once, then min-of-3 full noop-sink executions — with a
        forced JVM GC before EVERY timed run: at the 48g heap a full GC
        pause is multi-second and lands on whichever query is running
        (r07 adjudication: star_join 7.8s in one session, 1.9s isolated;
        r09 adjudication: dsir_importance escalated 2→10→30s across
        runs in ONE JVM without per-run GC and sat flat at 1.9-2.1s
        with it — a single pre-loop GC does not protect run 2+).
        Collections are taken OUTSIDE the timed window, every time."""
        fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()  # warm (JIT, scan cache)
        best = float("inf")
        for _ in range(3):
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 4)

    from projetbigdatastreaming_spark.cache import clear_scoped

    def _primary_sweep() -> dict[str, float]:
        t: dict[str, float] = {}
        for name in headline:
            t[name] = _timed_min3(all_queries[name], SF_DIR)
        return t

    timings, stamp = run_sweep_guarded(_primary_sweep)
    load_stamps = {"sf": stamp}
    clear_scoped()

    total = round(sum(timings.values()), 4)
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(SF_DIR),
    }

    # sf3 runs BEFORE sf2 (VERDICT r11 item 3): the big column's rows
    # are the most cold-state-sensitive, so they get the JVM right
    # after the light primary sweep instead of right after the heavy
    # 10x column's page-cache/GC churn (r11's sf3 sweep started at
    # loadavg 10.26 for exactly that reason).
    if SF3_FACTOR > 1:
        try:
            from tools.gen_scale import ensure_scaled

            t0 = time.perf_counter()
            ensure_scaled(spark, SF_DIR, SF3_DIR, SF3_FACTOR)
            build_sec = round(time.perf_counter() - t0, 1)

            def _sf3_sweep() -> dict[str, float]:
                t3: dict[str, float] = {}
                for name in SF3_QUERIES:
                    # min-of-3 now matches the other columns (VERDICT
                    # r11 item 3: q21's consecutive-run spread
                    # 10.7→28.9 s showed min-of-2 under-samples the
                    # cold-state band at 2-40 s per run)
                    t3[name] = _timed_min3(all_queries[name], SF3_DIR)
                return t3

            t3, load_stamps["sf3"] = run_sweep_guarded(_sf3_sweep)
            out["sf3"] = round(_sf_from_dir(SF_DIR) * SF3_FACTOR, 4)
            out["queries_sf3"] = t3
            out["value_sf3"] = round(sum(t3.values()), 4)
            out["sf3_build_sec"] = build_sec
        except Exception as exc:  # never break the primary contract
            out["sf3_error"] = f"{type(exc).__name__}: {exc}"[:200]
        finally:
            clear_scoped()

    if SF2_FACTOR > 1:
        try:
            from tools.gen_scale import ensure_scaled

            t0 = time.perf_counter()
            ensure_scaled(spark, SF_DIR, SF2_DIR, SF2_FACTOR)
            build_sec = round(time.perf_counter() - t0, 1)
            # opt in to the scaled media table for the sf2 sweep only
            # (correctness runs must stay on the committed fixture the
            # media oracles are built from — see media._media_path)
            os.environ["SPARK_GRAFT_MEDIA_SCALED"] = "1"

            def _sf2_sweep() -> dict[str, float]:
                t2: dict[str, float] = {}
                names = SF2_QUERIES if SF2_QUERIES is not None else headline
                for name in names:
                    t2[name] = _timed_min3(all_queries[name], SF2_DIR)
                return t2

            t2, load_stamps["sf2"] = run_sweep_guarded(_sf2_sweep)
            out["sf2"] = round(_sf_from_dir(SF_DIR) * SF2_FACTOR, 4)
            out["queries_sf2"] = t2
            out["value_sf2"] = round(sum(t2.values()), 4)
            out["sf2_build_sec"] = build_sec
        except Exception as exc:  # never break the primary contract
            out["sf2_error"] = f"{type(exc).__name__}: {exc}"[:200]
        finally:
            os.environ.pop("SPARK_GRAFT_MEDIA_SCALED", None)
            clear_scoped()

    out["load"] = load_stamps
    out["load_contaminated"] = any(
        s["contaminated"] for s in load_stamps.values()
    )
    print(json.dumps(out))
    # The grading driver keeps only the LAST ~2000 chars of stdout, so
    # the full line above loses its head once sf2/sf3 columns grow —
    # BENCH_r11/r12 shipped without their primary sf0.1 dict (VERDICT
    # r12 item 3).  Restate the primary contract compactly as the very
    # last line: a complete, parseable {"metric", "value", "unit",
    # "queries", "sf"} object that always fits inside the tail.
    # VERDICT r13 item 3: also carry the CROSS-SCALE totals (and each
    # scaled column's 5 slowest rows) through the tail — r13's full
    # line lost value_sf3 and most of the sf2 dict to the 2000-char
    # window.  Budget: 37 primary rows ≈ 1010 chars; the two totals +
    # two top-5 dicts add ≈ 330 — comfortably inside the window.
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "queries": timings,
        "sf": out["sf"],
        "load_contaminated": out["load_contaminated"],
    }
    for col in ("sf2", "sf3"):
        qcol = out.get(f"queries_{col}")
        if qcol:
            compact[f"value_{col}"] = out[f"value_{col}"]
            compact[f"top5_{col}"] = dict(
                sorted(qcol.items(), key=lambda kv: -kv[1])[:5]
            )
    print(json.dumps(compact, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
