"""CLI control-surface tests (SURVEY §2.10 — the reference's
Express API re-expressed as `python -m rsbsa_etl_spark ...`)."""

from __future__ import annotations

from rsbsa_etl_spark.__main__ import main


def test_list_prints_registry(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out.split()
    assert "agg_sum_groups" in out and "stream_tail" in out
    assert len(out) >= 130


def test_tail_drains_and_parses(spark, tmp_path, capsys):
    logdir = tmp_path / "logs"
    logdir.mkdir()
    (logdir / "app.log").write_text(
        "[2026-01-01T00:00:00] started\n\nno timestamp here\n"
    )
    assert main(["tail", "--log-dir", str(logdir)]) == 0
    out = capsys.readouterr().out
    assert "[2026-01-01T00:00:00] started" in out
    assert "[__missing__] no timestamp here" in out


def test_status_reports_session(spark, capsys):
    assert main(["status"]) == 0
    out = capsys.readouterr().out
    assert "active streaming queries:" in out


def test_explain_audits_plan(spark, capsys):
    from rsbsa_etl_spark.__main__ import main

    from tests.conftest import SF_DIR

    assert main(["explain", "join_bloom_pruned", "--sf-dir", SF_DIR]) == 0
    out = capsys.readouterr().out
    assert "sort-merge joins:           0" in out
    assert "broadcast joins:            2" in out
    assert main(["explain", "no_such_key"]) == 2
