"""CLI contract (reference parity: cli.py:190-277): YAML config in,
exit 1 on bad config, end-to-end run with --available-now."""

from __future__ import annotations

import json
import sqlite3

import yaml

from rabbithole_spark.cli import main


def test_invalid_config_exits_1(tmp_path):
    missing = str(tmp_path / "nope.yml")
    assert main([missing]) == 1


def test_bad_block_type_exits_1(tmp_path):
    cfg = tmp_path / "bad.yml"
    cfg.write_text(yaml.safe_dump({"blocks": [{"name": "x", "type": "bogus"}]}))
    assert main([str(cfg)]) == 1


def test_cli_end_to_end(spark, tmp_path):
    from rabbithole_spark.streaming.sources import write_spool_messages

    spool = str(tmp_path / "spool")
    write_spool_messages(
        spool,
        [
            {"exchange": "logs", "content_type": "application/json",
             "body": json.dumps({"ts": f"2024-01-01T00:00:{i:02d}",
                                  "msg": {"text": f"m{i}"}})}
            for i in range(4)
        ],
        "b0.jsonl",
    )
    db_path = str(tmp_path / "out.sqlite")
    con = sqlite3.connect(db_path)
    con.execute("CREATE TABLE logs (ts TEXT, msg TEXT)")
    con.commit()
    con.close()

    cfg = tmp_path / "pipeline.yml"
    cfg.write_text(
        yaml.safe_dump(
            {
                "size_limit": 10,
                "time_limit": 1,
                "blocks": [
                    {"name": "in", "type": "spool", "kwargs": {"path": spool}},
                    {"name": "out", "type": "sql",
                     "kwargs": {"url": f"sqlite:///{db_path}"}},
                ],
                "flows": [[
                    {"name": "in", "kwargs": {"exchange": "logs"}},
                    {"name": "out", "kwargs": {
                        "query": "INSERT INTO logs (ts, msg) VALUES (:ts, :msg)",
                        "parameters": {"ts": "ts", "msg": "msg.text"},
                    }},
                ]],
            }
        )
    )
    rc = main([str(cfg), "--available-now",
               "--checkpoint-dir", str(tmp_path / "ckpt")])
    assert rc == 0
    con = sqlite3.connect(db_path)
    rows = sorted(con.execute("SELECT ts, msg FROM logs").fetchall())
    con.close()
    assert len(rows) == 4
    assert rows[0] == ("2024-01-01T00:00:00", "m0")


def test_default_checkpoint_dir_is_stable_per_config():
    """A fresh mkdtemp per run would forget all source offsets and
    replay the whole spool into the sink on every restart — the
    default must be a pure function of the config path."""
    from rabbithole_spark.cli import _default_checkpoint_dir

    a1 = _default_checkpoint_dir("/some/conf.yml")
    a2 = _default_checkpoint_dir("/some/conf.yml")
    b = _default_checkpoint_dir("/other/conf.yml")
    assert a1 == a2
    assert a1 != b


def test_missing_required_block_kwarg_is_pipeline_error(spark, tmp_path):
    """A spool block without 'path' is a CONFIG error: PipelineError
    (the CLI's clean exit-1 path), never a raw KeyError traceback."""
    import pytest as _pytest

    from rabbithole_spark.plans.spec import (
        PipelineError,
        PipelineSpec,
        compile_pipeline,
    )

    cfg = """
blocks:
  - name: in_spool
    type: spool
    kwargs: {}
  - name: out_mem
    type: memory
flows:
  - - name: in_spool
    - name: out_mem
"""
    spec = PipelineSpec.from_yaml(cfg)
    with _pytest.raises(PipelineError, match="path"):
        compile_pipeline(spark, spec, str(tmp_path / "ckpt"))


def test_sql_mode_runs_adhoc_query(spark, capsys):
    """--sql registers the parquet tables as views and prints JSON
    lines — the ad-hoc analytics entry point. Uses the session spark
    (get_spark returns the active one), so no second JVM spins up."""
    import json

    from rabbithole_spark.cli import main

    rc = main(
        [
            "--sql",
            "SELECT r_name, count(*) AS n FROM region "
            "JOIN nation ON n_regionkey = r_regionkey "
            "GROUP BY r_name ORDER BY r_name",
            "--sf-dir",
            "/root/testdata/sf0.001",
        ]
    )
    assert rc == 0
    rows = [json.loads(line) for line in capsys.readouterr().out.splitlines()]
    assert len(rows) == 5 and all(r["n"] == 5 for r in rows)
    assert [r["r_name"] for r in rows] == sorted(r["r_name"] for r in rows)


def test_sql_and_config_are_mutually_exclusive(tmp_path):
    import pytest as _pytest

    from rabbithole_spark.cli import parse_arguments

    with _pytest.raises(SystemExit):
        parse_arguments([])  # neither
    with _pytest.raises(SystemExit):
        parse_arguments([str(tmp_path / "c.yml"), "--sql", "SELECT 1"])  # both
