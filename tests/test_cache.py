"""Scoped-persist cache semantics (`cache.persist_scoped`): eviction
by key, opt-in semantic memoization, and the mutable-input hazard the
memoize flag exists to avoid."""

from __future__ import annotations

import time

from projetbigdatastreaming_spark.cache import _SCOPED_PERSISTS, persist_scoped


def _fresh(key):
    _SCOPED_PERSISTS.pop(key, None)


def _assert_evicted(df):
    """unpersist(blocking=False) is asynchronous — poll briefly."""
    for _ in range(40):
        if not df.storageLevel.useMemory:
            return
        time.sleep(0.05)
    raise AssertionError("relation still cached after eviction")


def test_evict_default_replaces_previous(spark):
    """Default (memoize=False): every call persists the NEW plan and
    unpersists the previous one — per-micro-batch semantics."""
    _fresh("t1")
    a = spark.range(10).selectExpr("id * 2 AS v")
    out_a = persist_scoped("t1", a)
    assert out_a.storageLevel.useMemory
    # NOTE: Spark's CacheManager keys on the LOGICAL PLAN, so probing
    # eviction needs a semantically DIFFERENT successor (a same-plan
    # successor would re-cache the same entry and mask the unpersist)
    b = spark.range(10).selectExpr("id * 5 AS v")
    out_b = persist_scoped("t1", b)
    assert out_b is b and out_b is not out_a
    _assert_evicted(a)
    _fresh("t1")


def test_memoize_reuses_same_semantics_evicts_different(spark):
    """memoize=True: a sameSemantics re-invocation returns the CACHED
    relation (no recompute — the built-index reuse); a semantically
    different plan still evicts."""
    _fresh("t2")
    a = spark.range(10).selectExpr("id * 2 AS v")
    out_a = persist_scoped("t2", a, memoize=True)
    out_a.count()  # materialize
    same = spark.range(10).selectExpr("id * 2 AS v")
    assert persist_scoped("t2", same, memoize=True) is out_a

    different = spark.range(10).selectExpr("id * 3 AS v")
    out_d = persist_scoped("t2", different, memoize=True)
    assert out_d is different
    _assert_evicted(a)
    _fresh("t2")


def test_keys_are_independent(spark):
    _fresh("t3a")
    _fresh("t3b")
    a = persist_scoped("t3a", spark.range(5))
    b = persist_scoped("t3b", spark.range(6))
    assert a.storageLevel.useMemory and b.storageLevel.useMemory
    persist_scoped("t3a", spark.range(7))
    assert b.storageLevel.useMemory  # untouched by t3a's eviction
    _fresh("t3a")
    _fresh("t3b")
