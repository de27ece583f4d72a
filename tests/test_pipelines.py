"""End-to-end parity tests for the reference's three pipelines
(SURVEY.md §3), on the reference's own schemas."""

from __future__ import annotations

import datetime
import json

from pyspark.sql import Row
from pyspark.sql import functions as F

from projetbigdatastreaming_spark.sinks.files import stream_to_memory
from projetbigdatastreaming_spark.sources.files import json_stream
from projetbigdatastreaming_spark.streaming import pipelines


def _tweet(ts, id_, lang="fr", retweets=0):
    return json.dumps(
        {
            "event_date": ts.strftime("%Y-%m-%d %H:%M:%S"),
            "id": id_,
            "text": f"tweet {id_}",
            "lang": lang,
            "userid": "u1",
            "name": "user",
            "screenName": "sn",
            "location": "Paris",
            "followersCount": 10,
            "retweetCount": retweets,
            "favoriteCount": 0,
            "Zipcode": "75005",
            "ZipCodeType": "STANDARD",
            "City": "Paris",
            "State": "RAS",
        }
    )


def _values(spark, payloads):
    return spark.createDataFrame([Row(value=p) for p in payloads])


def test_indicateurs_pipeline_parity(spark):
    """§3.1: parse → KPI with the reference's exact output columns,
    French labels, ':45 - HH:60' bucket, and window-function row
    multiplicity (one row per input tweet, not per group)."""
    t = datetime.datetime(2021, 5, 3, 14, 50, 0)
    payloads = [
        _tweet(t, "1", retweets=3),
        _tweet(t + datetime.timedelta(minutes=1), "2", retweets=0),
        _tweet(t - datetime.timedelta(minutes=40), "3", retweets=1),
        _tweet(t, "4", lang="de", retweets=9),  # filtered out
        "not json at all",  # corrupt record → null struct → filtered
    ]
    parsed = pipelines.parse_tweets(_values(spark, payloads))
    assert parsed.count() == 3
    kpis = pipelines.tweet_kpis(parsed).collect()
    assert [r["Quart d'heure de l'event"] for r in kpis] == [
        "14:00 - 14:15",
        "14:45 - 14:60",
        "14:45 - 14:60",
    ]
    late = [r for r in kpis if r["Quart d'heure de l'event"] == "14:45 - 14:60"]
    assert all(r["Nbre de Tweets par QH"] == 2 for r in late)
    assert all(r["Nbre de Retweets par QH"] == 1 for r in late)
    assert all(r["Niveau de ReTweet (en %)"] == 50.0 for r in late)
    assert kpis[0]["Date de l'event"] == "2021-05-03"


def test_consommation_pipeline_parity(spark):
    """§3.2: zipcode JSON → schema_Kafka struct projection."""
    payloads = [
        json.dumps(
            {"Zipcode": 704, "ZipCodeType": "STANDARD", "City": "PARC",
             "State": "PR"}
        ),
        json.dumps({"Zipcode": 75005, "ZipCodeType": "PO BOX",
                    "City": "Paris", "State": "RAS"}),
    ]
    out = pipelines.consommation_pipeline(_values(spark, payloads))
    assert out.columns == ["Zipcode", "ZipCodeType", "City", "State"]
    rows = {r.Zipcode: r.City for r in out.collect()}
    assert rows == {704: "PARC", 75005: "Paris"}


def test_hashtag_pipeline_parity(spark):
    """§3.3: fr filter → hashtag explode → 3-min window counts."""
    t = datetime.datetime(2024, 1, 1, 12, 0, 30)
    rows = [
        Row(ts=t, text="#spark is #great", lang="fr"),
        Row(ts=t + datetime.timedelta(minutes=1), text="#spark again", lang="fr"),
        Row(ts=t, text="#english tweet", lang="en"),  # filtered
        Row(ts=t + datetime.timedelta(minutes=10), text="#spark later", lang="fr"),
    ]
    out = pipelines.hashtag_pipeline(spark.createDataFrame(rows)).collect()
    counts = {(r.window_start.minute, r.hashtag): r.n for r in out}
    assert counts[(0, "#spark")] == 2
    assert counts[(0, "#great")] == 1
    assert counts[(9, "#spark")] == 1
    assert not any(h == "#english" for (_, h) in counts)


def test_indicateurs_pipeline_streaming(spark, tmp_path):
    """§3.1 as a live micro-batched stream over a JSON spool dir."""
    t = datetime.datetime(2021, 5, 3, 9, 10, 0)
    src = tmp_path / "tweets_in"
    src.mkdir()
    (src / "batch1.json").write_text(
        "\n".join(
            json.dumps({"value": _tweet(t, str(i), retweets=i % 2)})
            for i in range(4)
        )
    )
    from pyspark.sql.types import StringType, StructField, StructType

    stream = json_stream(
        spark, str(src), StructType([StructField("value", StringType())])
    )
    # analytic-window KPIs aren't an incremental streaming aggregation;
    # like the reference (foreachRDD, IndicateursStreaming.scala:48),
    # they run per micro-batch via foreachBatch
    collected = []

    def _batch_fn(batch_df, batch_id):
        kpis = pipelines.tweet_kpis(pipelines.parse_tweets(batch_df))
        collected.extend(kpis.collect())

    from projetbigdatastreaming_spark.streaming.runner import (
        run_foreach_batch,
    )

    q = run_foreach_batch(
        stream,
        _batch_fn,
        str(tmp_path / "ckpt"),
        available_now=True,
        query_name="tweet_kpis_fb",
    )
    q.awaitTermination(120)
    rows = collected
    assert len(rows) == 4  # row-per-tweet multiplicity preserved
    assert all(r["Nbre de Tweets par QH"] == 4 for r in rows)
    assert all(r["Nbre de Retweets par QH"] == 2 for r in rows)


def test_hashtag_pipeline_over_socket(spark):
    """S4 end-to-end over a raw socket: a TCP server pushes JSON tweet
    events; the stream parses them against the tweet schema and runs
    the unchanged hashtag pipeline (source-agnostic by design) —
    the receiver-source analogue of TwitterKafkaStreaming.scala:176."""
    import socket
    import threading
    import time

    from projetbigdatastreaming_spark.sources.files import socket_stream

    tweets = [
        {"ts": "2024-01-01 12:00:30", "text": "#spark is #great", "lang": "fr"},
        {"ts": "2024-01-01 12:01:30", "text": "#spark again", "lang": "fr"},
        {"ts": "2024-01-01 12:00:30", "text": "#english tweet", "lang": "en"},
    ]
    payload = "".join(json.dumps(t) + "\n" for t in tweets).encode()

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    stop = threading.Event()

    def serve():
        conn, _ = srv.accept()
        conn.sendall(payload)
        stop.wait(60)
        conn.close()

    threading.Thread(target=serve, daemon=True).start()

    raw = socket_stream(spark, "127.0.0.1", port)
    parsed = raw.select(
        F.from_json(
            "value", "ts timestamp_ntz, text string, lang string"
        ).alias("j")
    ).select("j.*")
    counted = pipelines.hashtag_pipeline(parsed)
    q = (
        counted.writeStream.format("memory")
        .queryName("socket_hashtags")
        .outputMode("complete")
        .start()
    )
    try:
        deadline = time.time() + 60
        got = {}
        while time.time() < deadline:
            got = {
                r.hashtag: r.n
                for r in spark.sql("SELECT * FROM socket_hashtags").collect()
            }
            if got.get("#spark") == 2:
                break
            time.sleep(0.5)
        assert got.get("#spark") == 2, got
        assert got.get("#great") == 1
        assert "#english" not in got
    finally:
        q.stop()
        stop.set()
        srv.close()


def test_sentiment_pipeline_batch_and_stream_agree(spark, tmp_path):
    """The lexicon sentiment KPI: exact hits/valence on a known frame,
    and the STREAMING run over the same rows (windowed agg, availableNow)
    produces the identical relation."""
    t = datetime.datetime(2024, 1, 1, 12, 0, 30)
    rows = [
        Row(ts=t, text="spark is great and amazing", lang="en"),
        Row(ts=t + datetime.timedelta(minutes=1),
            text="terrible awful slow day", lang="en"),
        Row(ts=t, text="bon et neutre", lang="fr"),
        Row(ts=t + datetime.timedelta(minutes=10),
            text="love the best win", lang="en"),
    ]
    batch = pipelines.sentiment_pipeline(spark.createDataFrame(rows))
    got = {
        (r.window_start.minute, r.lang): (
            r.n_tweets, r.pos_hits, r.neg_hits, r.mean_valence,
        )
        for r in batch.collect()
    }
    # window 0: en has great(3)+amazing(4) over 2 tweets/9 tokens;
    # terrible(-5)+awful(-4)+slow(-1) -> valence (7-10)/9
    assert got[(0, "en")] == (2, 2, 3, (3 + 4 - 5 - 4 - 1) / 9)
    assert got[(0, "fr")] == (1, 0, 0, 0.0)
    assert got[(9, "en")] == (1, 3, 0, (3 + 3 + 2) / 4)

    # streaming twin over a parquet spool of the same rows
    src = tmp_path / "sent_in"
    spark.createDataFrame(rows).write.parquet(str(src))
    from projetbigdatastreaming_spark.sources.files import parquet_stream

    stream = parquet_stream(
        spark, str(src), spark.createDataFrame(rows).schema
    )
    out = pipelines.sentiment_pipeline(
        stream.withWatermark("ts", "10 minutes")
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sent_kpis")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r.window_start.minute, r.lang): (
            r.n_tweets, r.pos_hits, r.neg_hits, r.mean_valence,
        )
        for r in spark.sql("SELECT * FROM sent_kpis").collect()
    }
    assert streamed == got
