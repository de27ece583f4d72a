"""Tests for the custom Python DataSources (Spark 4 DataSource API)
and the Python UDTF surface."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from projetbigdatastreaming_spark.sources.pysource import (
    parse_properties,
    register_python_sources,
)


def test_properties_parser_pure():
    text = """
# comment
! also comment
bootstrap.servers=localhost:9092
topic : orderline
flag
multi=a,\\
b,c
"""
    assert parse_properties(text) == [
        ("bootstrap.servers", "localhost:9092"),
        ("topic", "orderline"),
        ("flag", ""),
        ("multi", "a,b,c"),
    ]


def test_properties_parser_whitespace_and_escapes():
    # java.util.Properties semantics the round-3 ADVICE flagged:
    # whitespace is a separator; an even trailing-backslash count is
    # literal, not a continuation; escaped separators stay in the key
    assert parse_properties("key value") == [("key", "value")]
    assert parse_properties("key =  value") == [("key", "value")]
    assert parse_properties("key\tvalue = x") == [("key", "value = x")]
    assert parse_properties("a\\=b=c") == [("a=b", "c")]
    assert parse_properties("a\\ b : c") == [("a b", "c")]
    # two trailing backslashes = escaped literal backslash, no join
    assert parse_properties("k=v\\\\\nnext=1") == [
        ("k", "v\\\\"),
        ("next", "1"),
    ]
    # odd = continuation
    assert parse_properties("k=v,\\\n  w") == [("k", "v,w")]


def test_synthetic_events_zero_rows(spark):
    register_python_sources(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("rows", "0")
        .load()
    )
    assert df.count() == 0
    assert df.columns == ["event_id", "user_id", "event_type", "value_c"]


def test_synthetic_events_partition_parallel(spark):
    """The source must produce the SAME relation for any partition
    count (membership is a pure function of row id), and the declared
    split must actually reach the scan."""
    register_python_sources(spark)

    def load(parts):
        return (
            spark.read.format("synthetic_events")
            .option("rows", "1000")
            .option("partitions", str(parts))
            .load()
        )

    assert load(7).rdd.getNumPartitions() == 7
    a = sorted(load(1).collect())
    b = sorted(load(7).collect())
    assert a == b
    assert len(a) == 1000
    # deterministic across sessions/runs: pin one row
    r0 = a[0]
    assert r0.event_id == 0
    assert r0.user_id.startswith("u") and len(r0.user_id) == 4
    assert r0.event_type in ("view", "click", "purchase", "signup", "share")
    assert 0 <= r0.value_c < 1_000_000


def test_synthetic_events_filter_pushes_into_scan_semantics(spark):
    """Catalyst composes ordinary relational ops over the custom scan."""
    register_python_sources(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("rows", "500")
        .option("partitions", "3")
        .load()
        .where(F.col("event_type") == "click")
        .groupBy("user_id")
        .count()
    )
    total = df.agg(F.sum("count")).first()[0]
    assert 0 < total < 500


def test_java_properties_source_reads_config(spark, tmp_path):
    p1 = tmp_path / "a.properties"
    p1.write_text("k1=v1\n# c\nk2: v2\n")
    p2 = tmp_path / "b.properties"
    p2.write_text("k3=v3\n")
    register_python_sources(spark)
    rows = (
        spark.read.format("java_properties")
        .option("paths", f"{p1},{p2}")
        .load()
        .orderBy("key")
        .collect()
    )
    assert [(os.path.basename(r.file), r.key, r.value) for r in rows] == [
        ("a.properties", "k1", "v1"),
        ("a.properties", "k2", "v2"),
        ("b.properties", "k3", "v3"),
    ]


def test_udtf_lateral_expansion(spark):
    """Python UDTF surface: a table function lateral-joined per input
    row.  Kept OFF the corpus hot path by design (row-at-a-time
    Python); the idiomatic bulk equivalent is posexplode(split()) —
    asserted equal here so the UDTF is pinned to the vectorized
    semantics it would replace."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, sentence string")
    class SplitSentences:
        def eval(self, text: str):
            for i, s in enumerate(x for x in text.split(".") if x.strip()):
                yield i, s.strip()

    spark.udtf.register("split_sentences", SplitSentences)
    docs = spark.createDataFrame(
        [("d1", "A b. C d. E"), ("d2", "Single")], "doc_id string, body string"
    )
    docs.createOrReplaceTempView("udtf_docs")
    got = spark.sql(
        """
        SELECT doc_id, s.pos, s.sentence
        FROM udtf_docs, LATERAL split_sentences(body) s
        ORDER BY doc_id, pos
        """
    ).collect()
    want = (
        docs.select(
            "doc_id",
            F.posexplode(
                F.filter(
                    F.transform(
                        F.split("body", r"\."), lambda x: F.trim(x)
                    ),
                    lambda x: x != "",
                )
            ).alias("pos", "sentence"),
        )
        .orderBy("doc_id", "pos")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) == 4


def test_synthetic_events_stream_equals_batch(spark, tmp_path):
    """The streaming Python DataSource (Spark 4
    SimpleDataSourceStreamReader): successive availableNow runs over
    the same checkpoint advance the engine-tracked offset one
    prefetched micro-batch at a time (the simple-reader protocol)
    until max_rows; the union of all micro-batches is EXACTLY the
    batch source's rows (same generator), and a further restart
    delivers nothing."""
    from projetbigdatastreaming_spark.sources.pysource import (
        register_python_sources,
    )

    register_python_sources(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = (
            spark.readStream.format("synthetic_events_stream")
            .option("batch_rows", "40")
            .option("max_rows", "100")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    counts = []
    for _ in range(3):  # 100 rows / 40-row batches -> 3 runs drain it
        run()
        counts.append(spark.read.parquet(out).count())
    assert counts == [40, 80, 100], counts

    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    want = sorted(
        tuple(r)
        for r in spark.read.format("synthetic_events")
        .option("rows", "100")
        .load()
        .collect()
    )
    assert got == want

    # restart from the checkpoint: offset is at max_rows, nothing new
    run()
    assert (
        spark.read.parquet(out).count() == 100
    ), "restart re-delivered rows despite the committed offset"


def test_jsonl_shards_write_read_roundtrip(spark, tmp_path):
    """Custom Python DataSource WRITE path (Spark 4 DataSource API):
    shards land under final names only at commit, the manifest's
    per-shard counts reconcile, and the partition-parallel read
    returns the exact rows."""
    import json
    import os

    register_python_sources(spark)
    out = str(tmp_path / "shards")
    os.makedirs(out)
    df = spark.range(0, 100, 1, 4).selectExpr(
        "id", "CAST(id * 2 AS STRING) AS s"
    )
    df.write.format("jsonl_shards").option("path", out).mode(
        "append"
    ).save()

    with open(os.path.join(out, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    assert manifest["total_rows"] == 100
    assert len(manifest["shards"]) == 4  # one shard per task
    files = sorted(
        f for f in os.listdir(out) if f.startswith("shard-")
    )
    assert files == [s["file"] for s in manifest["shards"]]
    assert not os.listdir(os.path.join(out, "_tmp"))  # temps all moved

    back = (
        spark.read.format("jsonl_shards")
        .schema("id long, s string")
        .option("path", out)
        .load()
    )
    assert sorted(map(tuple, back.collect())) == [
        (i, str(i * 2)) for i in range(100)
    ]


def test_jsonl_shards_overwrite_replaces_previous_commit(spark, tmp_path):
    import json
    import os

    register_python_sources(spark)
    out = str(tmp_path / "shards2")
    os.makedirs(out)

    def write(df, mode):
        df.write.format("jsonl_shards").option("path", out).mode(
            mode
        ).save()

    write(spark.range(0, 10, 1, 2), "append")
    write(spark.range(100, 103, 1, 1), "overwrite")
    with open(os.path.join(out, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    assert manifest["total_rows"] == 3
    back = (
        spark.read.format("jsonl_shards")
        .schema("id long")
        .option("path", out)
        .load()
    )
    assert sorted(r.id for r in back.collect()) == [100, 101, 102]


def test_jsonl_stream_sink_full_python_pipeline(spark, tmp_path):
    """Custom Python STREAM source -> custom Python STREAM sink: three
    availableNow runs over one checkpoint drain the 120-row generator
    one prefetched micro-batch at a time (the simple-reader protocol),
    each landing its own batch_id directory through the
    DataSourceStreamWriter two-phase commit; rows round-trip exactly,
    and a redelivered batch RESTATES its directory instead of
    appending duplicates."""
    import glob
    import json
    import os

    register_python_sources(spark)
    out = str(tmp_path / "stream_shards")
    os.makedirs(out)

    def run():
        q = (
            spark.readStream.format("synthetic_events_stream")
            .option("batch_rows", "40")
            .option("max_rows", "120")
            .load()
            .writeStream.format("jsonl_shards")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    for _ in range(3):
        run()
    batch_dirs = sorted(
        d for d in os.listdir(out) if d.startswith("batch_id=")
    )
    assert batch_dirs == ["batch_id=0", "batch_id=1", "batch_id=2"]

    def all_ids():
        rows = []
        for f in glob.glob(os.path.join(out, "batch_id=*", "*.jsonl")):
            with open(f) as fh:
                rows += [json.loads(line) for line in fh]
        return sorted(r["event_id"] for r in rows)

    ids = all_ids()
    assert ids == list(range(120))

    # redelivery restates: re-committing batch 0's content must
    # REPLACE its directory, not append duplicate shards
    from projetbigdatastreaming_spark.sources.pysource import (
        _JsonlStreamWriter,
    )

    w = _JsonlStreamWriter(out)
    msg = w.write(iter(spark.read.json(
        os.path.join(out, "batch_id=0")).collect()))
    w.commit([msg], 0)
    assert all_ids() == ids
