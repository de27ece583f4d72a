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
