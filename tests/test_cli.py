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
