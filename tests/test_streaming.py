"""Structured Streaming tests (SURVEY.md §5.3): micro-batched flagship
KPIs through a file source, empty-batch marker, checkpoint recovery.

The parquet directory source stands in for Kafka (same arrival
semantics: files land, batches form); availableNow drains synchronously.
"""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from projetbigdatastreaming_spark.catalog import load_table
from projetbigdatastreaming_spark.plans.kpi import quarter_hour_kpis
from projetbigdatastreaming_spark.sinks.files import stream_to_memory
from projetbigdatastreaming_spark.sources.files import parquet_stream
from projetbigdatastreaming_spark.streaming.runner import (
    EMPTY_WINDOW_MARKER,
    kpi_batch_writer,
    run_foreach_batch,
    streaming_quarter_hour_kpis,
)


@pytest.fixture()
def events_dir(spark, sf_dir, tmp_path):
    """Copy fixture events (post ns→µs conversion) into a spool dir."""
    out = str(tmp_path / "events_in")
    load_table(spark, sf_dir, "events").write.parquet(out)
    return out


def _events_schema(spark, events_dir):
    return spark.read.parquet(events_dir).schema


def test_streaming_kpis_match_batch(spark, sf_dir, events_dir, tmp_path):
    """The streaming plan over a drained file source must equal the
    batch flagship query on the same rows (the core Structured
    Streaming promise: one transformation, two execution modes)."""
    stream = parquet_stream(spark, events_dir, _events_schema(spark, events_dir))
    agg = streaming_quarter_hour_kpis(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("kpis_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.event_count, r.engaged_count, r.engagement_pct)
        for r in spark.sql("SELECT * FROM kpis_stream").collect()
    }
    want = {
        (r.window_start, r.event_count, r.engaged_count, r.engagement_pct)
        for r in quarter_hour_kpis(
            load_table(spark, sf_dir, "events")
        ).collect()
    }
    assert got == want


def test_foreach_batch_writes_and_recovers(spark, events_dir, tmp_path):
    """ST2+ST5: foreachBatch KPI writer produces CSV; restarting from
    the same checkpoint reprocesses nothing (exactly-once)."""
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt2")
    stream = parquet_stream(spark, events_dir, _events_schema(spark, events_dir))
    writer = kpi_batch_writer(out_dir, quarter_hour_kpis)
    q = run_foreach_batch(
        stream, writer, ckpt, available_now=True, query_name="kpi_fb"
    )
    q.awaitTermination(120)
    batches = [d for d in os.listdir(out_dir) if d.startswith("batch_id=")]
    assert batches, "no batch output written"
    first_run = {
        d: sorted(os.listdir(os.path.join(out_dir, d))) for d in batches
    }

    # restart from the same checkpoint: nothing new to process
    stream2 = parquet_stream(spark, events_dir, _events_schema(spark, events_dir))
    q2 = run_foreach_batch(
        stream2, writer, ckpt, available_now=True, query_name="kpi_fb2"
    )
    q2.awaitTermination(120)
    batches2 = [d for d in os.listdir(out_dir) if d.startswith("batch_id=")]
    assert sorted(batches2) == sorted(first_run)


def test_empty_batch_marker(spark, tmp_path):
    """ST8: an empty micro-batch writes the reference's French marker
    row (IndicateursStreaming.scala:64-75)."""
    out_dir = str(tmp_path / "out_empty")
    empty = spark.createDataFrame(
        [],
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    writer = kpi_batch_writer(out_dir, quarter_hour_kpis)
    writer(empty, 0)
    marker = spark.read.csv(
        f"{out_dir}/empty_marker", header=True
    ).collect()
    assert marker[0][0] == EMPTY_WINDOW_MARKER


def test_watermark_evicts_state(spark, tmp_path):
    """ST10: with a watermark, append-mode emits closed windows only —
    the semantics upgrade over the reference documented in SURVEY §7."""
    src_dir = str(tmp_path / "late_src")
    base = datetime.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, base, 1, "click", 1.0, '{"k": 60}'),
        (2, base + datetime.timedelta(hours=2), 1, "click", 1.0, '{"k": 10}'),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    df.write.parquet(src_dir)
    stream = parquet_stream(spark, src_dir, df.schema)
    agg = streaming_quarter_hour_kpis(stream, watermark="30 minutes")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_out")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM wm_out").collect()
    # the 10:00 window is closed by the 12:00 event and emitted; the
    # 12:00 window stays open (not past watermark), so exactly 1 row
    assert len(rows) == 1
    assert rows[0].window_start == base


def test_dedup_stream_drops_cross_batch_duplicates(spark, tmp_path):
    """Streaming exact dedup: duplicate fingerprints arriving in LATER
    micro-batches (within the watermark) are dropped; state is keyed,
    bounded by the watermark, and survives across batches."""
    from projetbigdatastreaming_spark.streaming.runner import dedup_stream

    src_dir = str(tmp_path / "dedup_src")
    base = datetime.datetime(2024, 1, 1, 10, 0, 0)
    schema = "doc_id long, fp string, ts timestamp_ntz"
    # batch 1: fingerprints a, b   batch 2 (separate file): b again + c
    spark.createDataFrame(
        [(1, "a", base), (2, "b", base)], schema
    ).coalesce(1).write.parquet(src_dir)
    spark.createDataFrame(
        [(3, "b", base + datetime.timedelta(minutes=5)),
         (4, "c", base + datetime.timedelta(minutes=6))],
        schema,
    ).coalesce(1).write.mode("append").parquet(src_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")  # force multiple micro-batches
        .parquet(src_dir)
    )
    deduped = dedup_stream(stream, ["fp"], ts_col="ts", delay="1 hour")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT fp FROM dedup_out").collect()
    fps = sorted(r.fp for r in got)
    assert fps == ["a", "b", "c"], fps


def test_interval_join_streams(spark, tmp_path):
    """Stream-stream interval join: clicks within 10 min of the
    impression match; later clicks don't.  The same function run on the
    batch DataFrames is the oracle (identical semantics by design)."""
    from projetbigdatastreaming_spark.streaming.joins import (
        interval_join_streams,
    )

    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    imp_rows = [(1, base, "ad_a"), (2, base, "ad_b")]
    clk_rows = [
        (1, base + datetime.timedelta(minutes=5), "c1"),   # in window
        (2, base + datetime.timedelta(minutes=25), "c2"),  # too late
        (1, base - datetime.timedelta(minutes=1), "c0"),   # before imp
    ]
    imp_schema = "user_id long, ts timestamp_ntz, ad string"
    clk_schema = "user_id long, ts timestamp_ntz, click_id string"
    imp_dir, clk_dir = str(tmp_path / "imp"), str(tmp_path / "clk")
    spark.createDataFrame(imp_rows, imp_schema).write.parquet(imp_dir)
    spark.createDataFrame(clk_rows, clk_schema).write.parquet(clk_dir)

    def _stream(path, schema):
        return spark.readStream.schema(schema).parquet(path)

    joined = interval_join_streams(
        _stream(imp_dir, imp_schema),
        _stream(clk_dir, clk_schema),
        key="user_id",
        max_delay="10 minutes",
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_ssj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.user_id, r.l_ad, r.r_click_id)
        for r in spark.sql("SELECT * FROM ssj_out").collect()
    )
    assert got == [(1, "ad_a", "c1")]

    # batch twin: identical function, identical result
    batch = interval_join_streams(
        spark.createDataFrame(imp_rows, imp_schema),
        spark.createDataFrame(clk_rows, clk_schema),
        key="user_id",
        max_delay="10 minutes",
    ).collect()
    assert sorted((r.user_id, r.l_ad, r.r_click_id) for r in batch) == got


def test_enrich_stream_broadcasts_dim(spark, tmp_path):
    """Stream-static enrichment: dim joined by broadcast (no stream
    shuffle), left rows with no dim match keep nulls."""
    from projetbigdatastreaming_spark.streaming.joins import enrich_stream

    src = str(tmp_path / "enrich_src")
    spark.createDataFrame(
        [(1, 100), (2, 200), (3, 999)], "event_id long, code long"
    ).write.parquet(src)
    dim = spark.createDataFrame(
        [(100, "alpha"), (200, "beta")], "code long, label string"
    )
    stream = spark.readStream.schema("event_id long, code long").parquet(src)
    out = enrich_stream(stream, dim, "code")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("enrich_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_enrich"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.event_id: r.label
        for r in spark.sql("SELECT * FROM enrich_out").collect()
    }
    assert got == {1: "alpha", 2: "beta", 3: None}


def test_restatement_writer_is_replay_safe(spark, events_dir, tmp_path):
    """A failure between sink write and checkpoint commit makes Spark
    re-deliver the same micro-batch; the dynamic-partition-overwrite
    sink must absorb the replay without duplicating rows."""
    from projetbigdatastreaming_spark.streaming.runner import (
        restatement_batch_writer,
    )

    out = str(tmp_path / "restated")
    writer = restatement_batch_writer(out)
    stream = parquet_stream(
        spark, events_dir, _events_schema(spark, events_dir)
    )
    q = run_foreach_batch(
        stream, writer, str(tmp_path / "ck_rs"), available_now=True,
        query_name="restate",
    )
    q.awaitTermination(120)
    n_input = spark.read.parquet(events_dir).count()
    n_first = spark.read.parquet(out).count()
    assert n_first == n_input

    # simulate the at-least-once replay: re-run every batch_fn call
    # with the same batch ids (fresh checkpoint = full redelivery)
    stream2 = parquet_stream(
        spark, events_dir, _events_schema(spark, events_dir)
    )
    q2 = run_foreach_batch(
        stream2, writer, str(tmp_path / "ck_rs2"), available_now=True,
        query_name="restate2",
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == n_input
    # distinct event ids survive intact (overwrite, not append)
    assert (
        spark.read.parquet(out).select("event_id").distinct().count()
        == n_input
    )


def test_cdc_merge_writer_applies_upserts_and_survives_replay(
    spark, tmp_path
):
    """Change records streamed through the CDC sink upsert the base
    table; full redelivery (fresh checkpoint) leaves the table
    unchanged — merge is idempotent."""
    from projetbigdatastreaming_spark.sources.files import parquet_stream
    from projetbigdatastreaming_spark.streaming.runner import (
        cdc_merge_writer,
    )

    table = str(tmp_path / "accounts")
    spark.createDataFrame(
        [("d1", 1, 10.0), ("d1", 2, 20.0), ("d2", 3, 30.0)],
        "day string, k int, v double",
    ).write.partitionBy("day").parquet(table)

    changes_dir = str(tmp_path / "changes")
    changes = spark.createDataFrame(
        [("d1", 2, 22.0), ("d2", 4, 40.0)], "day string, k int, v double"
    )
    changes.write.parquet(changes_dir)

    writer = cdc_merge_writer(table, ["k"], partition_by=["day"])
    stream = parquet_stream(
        spark, changes_dir, spark.read.parquet(changes_dir).schema
    )
    q = run_foreach_batch(
        stream, writer, str(tmp_path / "ck_cdc"), available_now=True,
        query_name="cdc",
    )
    q.awaitTermination(120)

    want = {
        ("d1", 1, 10.0), ("d1", 2, 22.0), ("d2", 3, 30.0), ("d2", 4, 40.0)
    }
    got = {
        (str(r.day), r.k, r.v) for r in spark.read.parquet(table).collect()
    }
    assert got == want

    # full redelivery: fresh checkpoint reprocesses every change
    stream2 = parquet_stream(
        spark, changes_dir, spark.read.parquet(changes_dir).schema
    )
    q2 = run_foreach_batch(
        stream2, writer, str(tmp_path / "ck_cdc2"), available_now=True,
        query_name="cdc2",
    )
    q2.awaitTermination(120)
    got2 = {
        (str(r.day), r.k, r.v) for r in spark.read.parquet(table).collect()
    }
    assert got2 == want


def test_near_dup_stream_flags_cross_batch_pairs(spark, tmp_path):
    """Streaming MinHash-LSH near-dup: a later micro-batch's document
    that nearly duplicates an EARLIER batch's document is flagged
    against the persisted band index; unrelated documents are not.
    Replaying a batch (same batch_id) must not duplicate flags or
    index rows (dynamic partition overwrite)."""
    from projetbigdatastreaming_spark.streaming.neardup import (
        near_dup_batch_writer,
    )

    src_dir = str(tmp_path / "nd_src")
    index_dir = str(tmp_path / "nd_index")
    flags_dir = str(tmp_path / "nd_flags")
    schema = "doc_id long, text string"
    words = " ".join(f"w{i}" for i in range(40))
    near = " ".join(f"w{i}" for i in range(39)) + " CHANGED"
    other = " ".join(f"x{i}" for i in range(40))
    spark.createDataFrame(
        [(1, words), (2, other)], schema
    ).coalesce(1).write.parquet(src_dir)
    spark.createDataFrame(
        [(3, near), (4, " ".join(f"y{i}" for i in range(40)))], schema
    ).coalesce(1).write.mode("append").parquet(src_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    q = (
        stream.writeStream.foreachBatch(
            near_dup_batch_writer(index_dir, flags_dir, threshold=0.8)
        )
        .option("checkpointLocation", str(tmp_path / "nd_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    flags = spark.read.parquet(flags_dir)
    got = {(r.doc_a, r.doc_b) for r in flags.collect()}
    assert got == {(1, 3)}, got
    # index holds all four docs exactly once
    sigs = spark.read.parquet(f"{index_dir}/sigs")
    assert sorted(r.doc_id for r in sigs.collect()) == [1, 2, 3, 4]

    # replay the second batch's content under the SAME batch_id: the
    # partition is overwritten, not appended
    batch2 = spark.createDataFrame([(3, near)], schema)
    writer = near_dup_batch_writer(index_dir, flags_dir, threshold=0.8)
    writer(batch2, 1)
    writer(batch2, 1)
    flags2 = spark.read.parquet(flags_dir)
    assert {(r.doc_a, r.doc_b) for r in flags2.collect()} == {(1, 3)}
    sigs2 = spark.read.parquet(f"{index_dir}/sigs")
    assert sorted(r.doc_id for r in sigs2.collect()) == [1, 2, 3]


def _nd_seed_index(spark, tmp_path, writer_factory):
    """Three micro-batches through a near-dup writer: (1, words) and
    (2, other); (3, near-dup of 1); (5, another near-dup of 1).
    Returns (index_dir, flags_dir, expected_flag_pairs)."""
    index_dir = str(tmp_path / "ndc_index")
    flags_dir = str(tmp_path / "ndc_flags")
    schema = "doc_id long, text string"
    words = " ".join(f"w{i}" for i in range(40))
    near = " ".join(f"w{i}" for i in range(39)) + " CHANGED"
    near2 = " ".join(f"w{i}" for i in range(39)) + " ALTERED"
    other = " ".join(f"x{i}" for i in range(40))
    writer = writer_factory(index_dir, flags_dir)
    writer(spark.createDataFrame([(1, words), (2, other)], schema), 0)
    writer(spark.createDataFrame([(3, near)], schema), 1)
    writer(spark.createDataFrame([(5, near2)], schema), 2)
    return index_dir, flags_dir, {(1, 3), (1, 5), (3, 5)}


def test_compact_neardup_preserves_probe_results(spark, tmp_path):
    """Compacting the streaming near-dup index must not change what a
    subsequent batch's probe flags, must converge bands+sigs to single
    base partitions, and must be idempotent."""
    import os

    from projetbigdatastreaming_spark.streaming.neardup import (
        compact_neardup,
        near_dup_batch_writer,
    )
    from projetbigdatastreaming_spark.streaming.sketches import BASE_ID

    def factory(ix, fl):
        return near_dup_batch_writer(ix, fl, threshold=0.8)

    index_dir, flags_dir, want = _nd_seed_index(spark, tmp_path, factory)
    flags = spark.read.parquet(flags_dir)
    assert {(r.doc_a, r.doc_b) for r in flags.collect()} == want

    nb, ns = compact_neardup(spark, index_dir)
    assert nb > 0 and ns == 4  # 4 docs, one sig row each
    for sub in ("bands", "sigs"):
        parts = [
            n
            for n in os.listdir(os.path.join(index_dir, sub))
            if n.startswith("batch_id=")
        ]
        assert parts == [f"batch_id={BASE_ID}"], (sub, parts)

    # probe after compaction: a NEW batch near-dup of doc 1 is still
    # flagged against every earlier copy, exactly as pre-compaction
    schema = "doc_id long, text string"
    near3 = " ".join(f"w{i}" for i in range(39)) + " TWEAKED"
    writer = factory(index_dir, flags_dir)
    writer(spark.createDataFrame([(7, near3)], schema), 3)
    got = {
        (r.doc_a, r.doc_b)
        for r in spark.read.parquet(flags_dir).collect()
    }
    assert got == want | {(1, 7), (3, 7), (5, 7)}, got

    # idempotent: compacting again folds batch 3 in, same totals + 1 doc
    nb2, ns2 = compact_neardup(spark, index_dir)
    assert ns2 == 5


def test_compact_neardup_kill_point_probe_still_exact(spark, tmp_path):
    """Kill the bands compaction between promote and source deletes
    (every band row exists BOTH in the base and in its source
    partition, and sigs were never compacted): the cross-join
    distinct + the writer's dropDuplicates sig fold keep the next
    probe's flags exact, with no recovery step; the next compaction
    converges."""
    import os as _os
    from unittest import mock

    from projetbigdatastreaming_spark.streaming import neardup as nd
    from projetbigdatastreaming_spark.streaming.sketches import STAGING_ID

    def factory(ix, fl):
        return nd.near_dup_batch_writer(ix, fl, threshold=0.8)

    index_dir, flags_dir, want = _nd_seed_index(spark, tmp_path, factory)

    real_rename = _os.rename
    killed = {"n": 0}

    def dying_rename(src, dst):
        real_rename(src, dst)
        if src.endswith(f"batch_id={STAGING_ID}"):
            killed["n"] += 1
            raise RuntimeError("killed after promote, before deletes")

    with mock.patch("os.rename", side_effect=dying_rename):
        try:
            nd.compact_neardup(spark, index_dir)
        except RuntimeError:
            pass
    assert killed["n"] == 1
    # bands compaction died mid-flight: base AND sources both present
    parts = [
        n
        for n in _os.listdir(f"{index_dir}/bands")
        if n.startswith("batch_id=")
    ]
    assert len(parts) == 4, parts  # base + 3 source partitions

    schema = "doc_id long, text string"
    near3 = " ".join(f"w{i}" for i in range(39)) + " TWEAKED"
    writer = factory(index_dir, flags_dir)
    writer(spark.createDataFrame([(7, near3)], schema), 3)
    got = {
        (r.doc_a, r.doc_b)
        for r in spark.read.parquet(flags_dir).collect()
    }
    assert got == want | {(1, 7), (3, 7), (5, 7)}, got

    # next compaction converges both subtables
    nb, ns = nd.compact_neardup(spark, index_dir)
    assert ns == 5
    writer(spark.createDataFrame([(7, near3)], schema), 3)
    got2 = {
        (r.doc_a, r.doc_b)
        for r in spark.read.parquet(flags_dir).collect()
    }
    assert got2 == got


def test_compact_neardup_cli(spark, tmp_path):
    """`maintain compact-neardup` drives the same fold."""
    from projetbigdatastreaming_spark.__main__ import main
    from projetbigdatastreaming_spark.streaming.neardup import (
        near_dup_batch_writer,
    )

    def factory(ix, fl):
        return near_dup_batch_writer(ix, fl, threshold=0.8)

    index_dir, _, _ = _nd_seed_index(spark, tmp_path, factory)
    rc = main(["maintain", "compact-neardup", index_dir], spark=spark)
    assert rc == 0
    import os

    for sub in ("bands", "sigs"):
        parts = [
            n
            for n in os.listdir(os.path.join(index_dir, sub))
            if n.startswith("batch_id=")
        ]
        assert parts == ["batch_id=-1"], (sub, parts)


def test_quality_gate_routes_and_survives_replay(
    spark, sf_dir, events_dir, tmp_path
):
    """Rows failing any declared check land in quarantine with the
    failing check names; clean rows land in the good table; a full
    redelivery (fresh checkpoint) changes neither — and the two sinks
    exactly partition the input."""
    from projetbigdatastreaming_spark.streaming.runner import (
        quality_gate_writer,
    )

    checks = {
        "value_non_negative": "value >= 0",
        "known_event_type": (
            "event_type IN ('click','view','purchase','login','logout',"
            "'scroll','search','share')"
        ),
        "user_id_present": "user_id IS NOT NULL",
    }
    good, quar = str(tmp_path / "good"), str(tmp_path / "quarantine")
    writer = quality_gate_writer(checks, good, quar)

    for ck in ("ck_a", "ck_b"):  # second pass = full redelivery
        stream = parquet_stream(
            spark, events_dir, _events_schema(spark, events_dir)
        )
        q = run_foreach_batch(
            stream, writer, str(tmp_path / ck), available_now=True,
            query_name=f"gate_{ck}",
        )
        q.awaitTermination(120)

    inp = spark.read.parquet(events_dir)
    n_in = inp.count()
    good_df = spark.read.parquet(good)
    quar_df = spark.read.parquet(quar)
    assert good_df.count() + quar_df.count() == n_in
    # the fixture contains event types outside the allowlist (signup,
    # error), so BOTH routes must be non-trivially exercised
    assert good_df.count() > 0 and quar_df.count() > 0
    # quarantined rows really violate; good rows really pass
    from pyspark.sql import functions as F2

    pred = " AND ".join(f"({e})" for e in checks.values())
    assert good_df.where(~F2.expr(pred)).count() == 0
    assert quar_df.where(F2.expr(pred)).count() == 0
    for r in quar_df.select("violations").distinct().collect():
        assert set(r.violations.split(",")) <= set(checks)
    # replay-safe: event ids unique across both sinks
    ids = good_df.select("event_id").union(quar_df.select("event_id"))
    assert ids.distinct().count() == n_in


def test_curation_ingest_chain_end_to_end(spark, tmp_path):
    """Composed streaming curation: quality-gate routing, near-dup
    flagging against the corpus-so-far, and CMS fold-in must all
    happen per batch, all replay-safe, from ONE foreachBatch fn."""
    from pyspark.sql import functions as F

    from projetbigdatastreaming_spark.operators.sketches import (
        cms_cells,
    )
    from projetbigdatastreaming_spark.streaming.ingest import (
        curation_ingest_writer,
    )
    from projetbigdatastreaming_spark.streaming.sketches import read_cms

    d = lambda n: str(tmp_path / n)  # noqa: E731
    words = " ".join(f"w{i}" for i in range(40))
    near = " ".join(f"w{i}" for i in range(39)) + " CHANGED"
    other = " ".join(f"x{i}" for i in range(40))
    schema = "doc_id long, text string, source string"
    write = curation_ingest_writer(
        checks={"nonempty": "length(text) > 10", "has_id": "doc_id IS NOT NULL"},
        good_path=d("good"),
        quarantine_path=d("quar"),
        neardup_index_dir=d("ndidx"),
        neardup_flags_dir=d("ndflags"),
        cms_state_dir=d("cms"),
        cms_key_col="source",
    )
    b0 = spark.createDataFrame(
        [(1, words, "web"), (2, other, "web"), (3, "tiny", "web")], schema
    )
    b1 = spark.createDataFrame(
        [(4, near, "books"), (5, "also tiny", "web")], schema
    )
    write(b0, 0)
    write(b1, 1)

    good = spark.read.parquet(d("good"))
    quar = spark.read.parquet(d("quar"))
    assert {r.doc_id for r in good.collect()} == {1, 2, 4}
    assert {r.doc_id for r in quar.collect()} == {3, 5}
    assert all("nonempty" in r.violations for r in quar.collect())

    flags = spark.read.parquet(d("ndflags"))
    assert {(r.doc_a, r.doc_b) for r in flags.collect()} == {(1, 4)}

    # CMS folded over GATED rows only: 2 web + 1 books
    grid = {(r.d, r.b): r.cnt for r in read_cms(spark, d("cms")).collect()}
    expect = spark.createDataFrame(
        [("web",), ("web",), ("books",)], "source string"
    )
    want = {
        (r.d, r.b): r.cnt for r in cms_cells(expect, "source").collect()
    }
    assert grid == want

    # replay batch 1: nothing doubles anywhere
    write(b1, 1)
    assert spark.read.parquet(d("good")).count() == 3
    assert spark.read.parquet(d("ndflags")).count() == 1
    assert {
        (r.d, r.b): r.cnt for r in read_cms(spark, d("cms")).collect()
    } == want

    # NULL-evaluating check ("length(text) > 10" with NULL text) PASSES
    # the gate (violation fires only when ~expr is TRUE), so the row
    # routes to good AND must reach the downstream CMS too — a bare
    # WHERE on the checks dropped NULL rows from the near-dup index and
    # CMS while the good corpus kept them (round-3 ADVICE finding)
    b2 = spark.createDataFrame([(6, None, "web")], schema)
    write(b2, 2)
    assert {r.doc_id for r in spark.read.parquet(d("good")).collect()} == {
        1, 2, 4, 6,
    }
    expect2 = spark.createDataFrame(
        [("web",), ("web",), ("books",), ("web",)], "source string"
    )
    want2 = {
        (r.d, r.b): r.cnt for r in cms_cells(expect2, "source").collect()
    }
    assert {
        (r.d, r.b): r.cnt for r in read_cms(spark, d("cms")).collect()
    } == want2


def test_curation_ingest_chain_recovers_from_mid_batch_kill(
    spark, tmp_path
):
    """Kill the composed ingest chain MID-BATCH (after the quality gate
    and near-dup stages committed their partitions, before the CMS
    fold), then replay the batch as Structured Streaming would after
    restart: every table — good, quarantine, near-dup index, flags,
    CMS — must end identical to a never-killed run.  The unit pieces
    are each replay-safe (batch_id dynamic overwrite); this pins the
    COMPOSITION."""
    from unittest import mock

    from projetbigdatastreaming_spark.streaming import ingest as ing

    schema = "doc_id long, text string, source string"
    words = " ".join(f"w{i}" for i in range(40))
    near = " ".join(f"w{i}" for i in range(39)) + " CHANGED"
    b0 = spark.createDataFrame(
        [(1, words, "web"), (2, "tiny", "web")], schema
    )
    b1 = spark.createDataFrame(
        [(3, near, "books"), (4, "x" * 30, "web")], schema
    )
    checks = {"nonempty": "length(text) > 10"}

    def mk(base):
        d = lambda n: str(tmp_path / base / n)  # noqa: E731
        return d, ing.curation_ingest_writer(
            checks=checks,
            good_path=d("good"),
            quarantine_path=d("quar"),
            neardup_index_dir=d("ndidx"),
            neardup_flags_dir=d("ndflags"),
            cms_state_dir=d("cms"),
            cms_key_col="source",
        )

    # clean reference run
    dc, clean = mk("clean")
    clean(b0, 0)
    clean(b1, 1)

    # killed run: the CMS stage dies on batch 1's first attempt
    calls = {"n": 0}
    real_cms_writer = ing.cms_batch_writer

    def flaky_cms_writer(state_dir, key_col):
        real = real_cms_writer(state_dir, key_col)

        def _w(df, bid):
            if bid == 1 and calls["n"] == 0:
                calls["n"] += 1
                raise RuntimeError("executor lost mid-batch")
            real(df, bid)

        return _w

    dk, _unused = mk("killed")
    with mock.patch.object(
        ing, "cms_batch_writer", side_effect=flaky_cms_writer
    ):
        _, killed = mk("killed")
        killed(b0, 0)
        try:
            killed(b1, 1)
            raise AssertionError("kill did not fire")
        except RuntimeError:
            pass  # gate + near-dup committed; CMS did not
        killed(b1, 1)  # restart: at-least-once redelivery of batch 1

    def table(d, name, sort_cols):
        try:
            return sorted(
                tuple(r)
                for r in spark.read.parquet(d(name))
                .select(*sort_cols)
                .collect()
            )
        except Exception:
            return []

    assert table(dk, "good", ["doc_id", "batch_id"]) == table(
        dc, "good", ["doc_id", "batch_id"]
    )
    assert table(dk, "quar", ["doc_id", "violations"]) == table(
        dc, "quar", ["doc_id", "violations"]
    )
    assert table(dk, "ndflags", ["doc_a", "doc_b"]) == table(
        dc, "ndflags", ["doc_a", "doc_b"]
    )
    assert table(dk, "ndidx/bands", ["doc_id", "band", "bh"]) == table(
        dc, "ndidx/bands", ["doc_id", "band", "bh"]
    )
    assert table(dk, "cms", ["d", "b", "cnt"]) == table(
        dc, "cms", ["d", "b", "cnt"]
    )
    # both runs actually flagged the cross-batch near-dup
    assert table(dc, "ndflags", ["doc_a", "doc_b"]) == [(1, 3)]


def test_interval_join_streams_left_outer_emits_after_watermark(
    spark, tmp_path
):
    """Left-outer stream-stream join: a matched impression emits with
    its click; an unmatched impression emits NULL-padded only after
    the watermark proves no click can still arrive.  The batch twin
    (plain left join) agrees on the final relation."""
    import datetime

    from projetbigdatastreaming_spark.streaming.joins import (
        interval_join_streams_outer,
    )

    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    late = datetime.datetime(2024, 1, 1, 18, 0, 0)
    imp_schema = "user_id long, ts timestamp_ntz, ad string"
    clk_schema = "user_id long, ts timestamp_ntz, click_id string"
    imp_dir, clk_dir = str(tmp_path / "imp_o"), str(tmp_path / "clk_o")
    # file 1: the interesting data; file 2: watermark pushers (both
    # sides must advance for the outer row to be licensed)
    spark.createDataFrame(
        [(1, base, "ad_a"), (2, base, "ad_b")], imp_schema
    ).coalesce(1).write.mode("append").parquet(imp_dir)
    spark.createDataFrame(
        [(9, late, "ad_z")], imp_schema
    ).coalesce(1).write.mode("append").parquet(imp_dir)
    spark.createDataFrame(
        [(1, base + datetime.timedelta(minutes=5), "c1")], clk_schema
    ).coalesce(1).write.mode("append").parquet(clk_dir)
    spark.createDataFrame(
        [(99, late, "c_z")], clk_schema
    ).coalesce(1).write.mode("append").parquet(clk_dir)

    def _stream(path, schema):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(path)
        )

    joined = interval_join_streams_outer(
        _stream(imp_dir, imp_schema),
        _stream(clk_dir, clk_schema),
        key="user_id",
        max_delay="10 minutes",
        watermark="30 minutes",
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_outer")
        .option("checkpointLocation", str(tmp_path / "ckpt_ssj_o"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r.user_id, r.l_ad, r.r_click_id)
        for r in spark.sql("SELECT * FROM ssj_outer").collect()
    )
    # u1 matched; u2 null-padded once the watermark passed 12:10;
    # u9/u99 still inside their horizon -> withheld (not emitted)
    assert got == [(1, "ad_a", "c1"), (2, "ad_b", None)]

    # batch twin over the data the watermark had sealed
    batch = interval_join_streams_outer(
        spark.createDataFrame(
            [(1, base, "ad_a"), (2, base, "ad_b")], imp_schema
        ),
        spark.createDataFrame(
            [(1, base + datetime.timedelta(minutes=5), "c1")], clk_schema
        ),
        key="user_id",
        max_delay="10 minutes",
    ).collect()
    assert sorted(
        (r.user_id, r.l_ad, r.r_click_id) for r in batch
    ) == got


def test_interval_join_streams_semi(spark, tmp_path):
    """LEFT SEMI stream-stream interval join: an impression emits once
    iff any click lands in its window — a double-clicked impression
    is not duplicated, an unclicked one never appears.  The batch
    twin is the oracle."""
    import datetime

    from projetbigdatastreaming_spark.streaming.joins import (
        interval_join_streams_semi,
    )

    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    imp_rows = [(1, base, "ad_a"), (2, base, "ad_b"), (3, base, "ad_c")]
    clk_rows = [
        (1, base + datetime.timedelta(minutes=5), "c1"),
        (1, base + datetime.timedelta(minutes=7), "c1b"),  # 2nd match
        (2, base + datetime.timedelta(minutes=25), "c2"),  # too late
    ]
    imp_schema = "user_id long, ts timestamp_ntz, ad string"
    clk_schema = "user_id long, ts timestamp_ntz, click_id string"
    imp_dir, clk_dir = str(tmp_path / "imp_s"), str(tmp_path / "clk_s")
    spark.createDataFrame(imp_rows, imp_schema).write.parquet(imp_dir)
    spark.createDataFrame(clk_rows, clk_schema).write.parquet(clk_dir)

    joined = interval_join_streams_semi(
        spark.readStream.schema(imp_schema).parquet(imp_dir),
        spark.readStream.schema(clk_schema).parquet(clk_dir),
        key="user_id",
        max_delay="10 minutes",
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_semi_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_semi"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.user_id, r.ad)
        for r in spark.sql("SELECT * FROM ssj_semi_out").collect()
    )
    assert got == [(1, "ad_a")]

    batch = interval_join_streams_semi(
        spark.createDataFrame(imp_rows, imp_schema),
        spark.createDataFrame(clk_rows, clk_schema),
        key="user_id",
        max_delay="10 minutes",
    )
    assert sorted((r.user_id, r.ad) for r in batch.collect()) == got
