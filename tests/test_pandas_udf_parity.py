"""Arrow pandas-UDF surface, pinned to its vectorized built-in twins.

The engine's policy keeps Python OFF the relational hot path (the
Arrow boundary exists for codecs and custom stateful ops), but the
API surface must still work — and the way to keep it honest is the
UDTF precedent: every pandas-UDF form is asserted EQUAL to the
built-in expression it would replace, so anyone reaching for the slow
path can see the fast-path twin next to it.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from projetbigdatastreaming_spark.catalog import load_table


def test_scalar_pandas_udf_equals_column_expr(spark, sf_dir):
    @pandas_udf("double")
    def cents(v: pd.Series) -> pd.Series:
        return (v * 100.0).floordiv(1) / 100.0

    ev = load_table(spark, sf_dir, "events").limit(500)
    got = ev.select("event_id", cents("value").alias("c")).collect()
    want = ev.select(
        "event_id",
        (F.floor(F.col("value") * 100.0) / 100.0).alias("c"),
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_grouped_agg_pandas_udf_equals_builtin_avg(spark, sf_dir):
    @pandas_udf("double")
    def pmean(v: pd.Series) -> float:
        return float(v.mean())

    ev = load_table(spark, sf_dir, "events")
    got = {
        r.event_type: round(r.m, 6)
        for r in ev.groupBy("event_type").agg(pmean("value").alias("m")).collect()
    }
    want = {
        r.event_type: round(r.m, 6)
        for r in ev.groupBy("event_type").agg(F.avg("value").alias("m")).collect()
    }
    assert got == want


def test_apply_in_pandas_equals_window_twin(spark, sf_dir):
    """Per-group z-score via applyInPandas == the window-function twin
    (the fast path: one shuffle, no Python)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "event_type", "value")
        .limit(2000)
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["value"].mean()
        sd = pdf["value"].std(ddof=1)
        out = pdf[["event_id", "event_type"]].copy()
        # no rounding here: pandas .round is half-to-even while Spark
        # F.round is HALF_UP — compare the raw doubles under a
        # tolerance instead of betting no value lands on a half
        out["z"] = (pdf["value"] - mu) / sd
        return out

    got = {
        r.event_id: r.z
        for r in ev.groupBy("event_type")
        .applyInPandas(zscore, "event_id long, event_type string, z double")
        .collect()
    }
    w = Window.partitionBy("event_type")
    want = {
        r.event_id: r.z
        for r in ev.select(
            "event_id",
            (
                (F.col("value") - F.avg("value").over(w))
                / F.stddev_samp("value").over(w)
            ).alias("z"),
        ).collect()
    }
    assert len(got) == len(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9
