"""CLI surface tests (in-process; the CLI reuses the session via
getOrCreate, so no second JVM is started)."""

from __future__ import annotations

from etl_wikipedia_updates_spark.__main__ import main
from etl_wikipedia_updates_spark.registry import REGISTRY


def test_cli_list(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    for name in REGISTRY.queries:
        assert name in out


def test_cli_run_query(spark, sf_smoke, capsys):
    assert main(["run", "q6", "--sf-dir", sf_smoke]) == 0
    assert "r_name" in capsys.readouterr().out


def test_cli_run_unknown(capsys):
    assert main(["run", "nope"]) == 2


def test_cli_ingest_replay(spark, sf_smoke, tmp_path, capsys):
    from pyspark.sql import functions as F

    from etl_wikipedia_updates_spark.sources.replay import write_replay_splits
    from etl_wikipedia_updates_spark.tables import load_table

    events = load_table(spark, sf_smoke, "events")
    replay = str(tmp_path / "replay")
    write_replay_splits(events, replay, 2, "ts")
    assert (
        main(
            [
                "ingest",
                "--replay", replay,
                "--sink", str(tmp_path / "sink"),
                "--sf-dir", sf_smoke,
            ]
        )
        == 0
    )
    out = capsys.readouterr().out
    assert f"'rows': {events.count()}" in out
