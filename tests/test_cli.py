"""CLI entry-point tests (in-process with the shared session — a
subprocess would pay a second JVM startup for no extra coverage)."""

from __future__ import annotations

from projetbigdatastreaming_spark.__main__ import main


def test_cli_list(capsys):
    assert main(["list"]) == 0
    names = capsys.readouterr().out.split()
    assert "kpi_quarter_hour" in names and len(names) > 80


def test_cli_run_and_explain(spark, sf_dir, capsys):
    assert main(["run", "agg_groupby", "--sf-dir", sf_dir], spark=spark) == 0
    out = capsys.readouterr().out
    assert "event_type" in out

    assert (
        main(["explain", "tpch_q3", "--sf-dir", sf_dir], spark=spark) == 0
    )
    out = capsys.readouterr().out
    assert "Physical Plan" in out


def test_cli_unknown_query(spark, sf_dir, capsys):
    assert main(["run", "nope", "--sf-dir", sf_dir], spark=spark) == 2
    assert "unknown query" in capsys.readouterr().err


def test_cli_maintain_repair_and_compacts(spark, tmp_path, capsys):
    """The maintain subcommand drives every maintenance entry point:
    repair-table heals a mid-swap merge crash; the three state
    compactions run against real state dirs."""
    import os

    from projetbigdatastreaming_spark.__main__ import main
    from projetbigdatastreaming_spark.streaming.curation import (
        substring_fp_batch_writer,
    )
    from projetbigdatastreaming_spark.streaming.sketches import (
        bloom_batch_writer,
        cms_batch_writer,
    )

    # repair-table on a healthy table is a no-op success
    table = str(tmp_path / "t")
    spark.createDataFrame([(1, "a")], "k int, v string").write.parquet(table)
    assert main(["maintain", "repair-table", table], spark=spark) == 0

    # compact-parquet
    out = str(tmp_path / "t_compact")
    assert main(
        ["maintain", "compact-parquet", table, "--dst", out], spark=spark
    ) == 0
    assert spark.read.parquet(out).count() == 1

    # state compactions
    cms_state = str(tmp_path / "cms")
    cms_batch_writer(cms_state, "v")(
        spark.createDataFrame([("a",), ("b",)], "v string"), 0
    )
    assert main(["maintain", "compact-cms", cms_state], spark=spark) == 0

    bloom_state = str(tmp_path / "bloom")
    bloom_batch_writer(bloom_state)(
        spark.createDataFrame([("f1",), ("f2",)], "fp string"), 0
    )
    assert main(["maintain", "compact-bloom", bloom_state], spark=spark) == 0

    cur_state = str(tmp_path / "cur")
    substring_fp_batch_writer(cur_state)(
        spark.createDataFrame(
            [(1, "alpha beta gamma delta")], "doc_id long, text string"
        ),
        0,
    )
    assert main(
        ["maintain", "compact-curation", cur_state], spark=spark
    ) == 0
    for st in (cms_state, bloom_state, cur_state):
        parts = [p for p in os.listdir(st) if p.startswith("batch_id=")]
        assert parts == ["batch_id=-1"], (st, parts)


def test_cli_compact_versioned(spark, tmp_path, capsys):
    """`maintain compact-versioned` folds the retired __base__ files
    of a versioned table into ~target_mb outputs, preserving content
    and recent batch attribution."""
    from projetbigdatastreaming_spark.sinks.versioned import (
        _read_manifest,
        list_versions,
        read_version,
        versioned_append_batch,
    )

    t = str(tmp_path / "vt")
    for b in range(6):
        versioned_append_batch(
            spark.createDataFrame([(b,)], "id long").coalesce(1),
            t,
            b,
            retire_horizon=2,
        )
    before = sorted(r.id for r in read_version(spark, t).collect())
    assert (
        main(["maintain", "compact-versioned", t], spark=spark) == 0
    )
    assert "compacted" in capsys.readouterr().out
    v = list_versions(t)[-1]
    assert sorted(r.id for r in read_version(spark, t, v).collect()) == before
    assert len(_read_manifest(t, v)["batches"]["__base__"]) == 1
