"""tools/gen_scale.py integrity: the benchmark's 10x fixture must
scale row counts and FK joins faithfully and must NOT manufacture
cross-copy duplicate text (the round-4 lesson: a vowel-only
perturbation left vowel-free docs as exact cross-copy dups and the
bench measured the generator artifact, not the operator)."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)


def test_scaled_fixture_contract(spark, tmp_path):
    from gen_scale import build_scaled

    src = "/root/testdata/sf0.001"
    out = str(tmp_path / "sf2x")
    build_scaled(spark, src, out, factor=2)

    rd = lambda d, t: spark.read.parquet(  # noqa: E731
        os.path.join(d, f"{t}.parquet")
    )

    # fact/dim tables scale by the factor; fixed dims don't
    for t in ("orders", "lineitem", "customer", "documents",
              "embeddings", "events"):
        assert rd(out, t).count() == 2 * rd(src, t).count(), t
    for t in ("region", "nation"):
        assert rd(out, t).count() == rd(src, t).count(), t

    # FK consistency: every scaled lineitem still joins its order and
    # every order its customer — no orphans introduced by key shifts
    li, o, c = rd(out, "lineitem"), rd(out, "orders"), rd(out, "customer")
    assert (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_anti").count() == 0
    )
    assert (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti").count() == 0
    )

    # copy-sensitive surfaces really were perturbed: no document text
    # occurs more often in the scaled corpus than its source
    # multiplicity ALLOWS only via within-copy duplicates — i.e. the
    # max per-text count must not exceed factor * source max, and the
    # number of distinct texts must double (every copy-0 text differs
    # from its copy-1 twin)
    src_docs = rd(src, "documents")
    out_docs = rd(out, "documents")
    assert (
        out_docs.select("text").distinct().count()
        == 2 * src_docs.select("text").distinct().count()
    )
    # user cardinality scales with the copies
    assert (
        rd(out, "events").select("user_id").distinct().count()
        == 2 * rd(src, "events").select("user_id").distinct().count()
    )
    # embeddings perturbed: no vector equals its shifted twin
    e = rd(out, "embeddings")
    twin = e.alias("a").join(
        e.alias("b"),
        (F.col("a.vec_id") + 10_000_000_000) == F.col("b.vec_id"),
    )
    assert (
        twin.where(
            F.col("a.embedding").cast("array<double>")
            == F.col("b.embedding").cast("array<double>")
        ).count()
        == 0
    )


def test_scaled_media_table(spark, tmp_path, monkeypatch):
    """Round 6: the scale dir must carry a media table whose row count
    scales with the factor, whose real payloads DECODE (not
    hash-fakes), and which the media queries pick up via sf_dir —
    but ONLY under the explicit SPARK_GRAFT_MEDIA_SCALED=1 opt-in
    (set by bench.py around its sf2 sweep).  Without the opt-in,
    every dir — even one carrying media.parquet — resolves to the
    committed fixture, where the oracles live (round-7 ADVICE: a
    correctness run pointed at .bench_sf1 must not silently diverge
    from the fixture-built oracles)."""
    from gen_scale import build_scaled

    from projetbigdatastreaming_spark.plans.media import (
        _media_path,
        q_image_stats,
    )

    src = "/root/testdata/sf0.001"
    out = str(tmp_path / "sf2xm")
    build_scaled(spark, src, out, factor=2)

    media = spark.read.parquet(os.path.join(out, "media.parquet"))
    assert media.count() == 2 * 13 + 3  # per-copy set + garbage rows
    assert set(
        r.kind for r in media.select("kind").distinct().collect()
    ) == {"image", "audio", "video"}

    # without the bench opt-in, even a dir WITH media.parquet keeps
    # the fixture (oracle safety)
    monkeypatch.delenv("SPARK_GRAFT_MEDIA_SCALED", raising=False)
    assert _media_path(out).endswith("fixtures/media.parquet")

    # with the opt-in: scale dir -> its table, driver dir -> fixture
    monkeypatch.setenv("SPARK_GRAFT_MEDIA_SCALED", "1")
    assert _media_path(out) == os.path.join(out, "media.parquet")
    assert _media_path(src).endswith("fixtures/media.parquet")

    rows = {r.media_id: r for r in q_image_stats(spark, out).collect()}
    decoded = [r for r in rows.values() if r.width is not None]
    assert len(decoded) == 14  # 7 image payloads x 2 copies, all real
    # copies are perturbed, not byte-identical: same dims, new hashes
    assert rows[1].feature_hash != rows[1001].feature_hash
    assert (rows[1].width, rows[1].height) == (
        rows[1001].width, rows[1001].height,
    )
