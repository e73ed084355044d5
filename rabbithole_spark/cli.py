"""CLI front-end: ``python -m rabbithole_spark.cli config.yml``.

Parity with the reference console script (cli.py:190-277): positional
YAML config, ``--log-level``/``--log-file`` flags, exit 1 on config
errors, run until interrupted.
"""

from __future__ import annotations

import argparse
import hashlib
import logging
import os
import sys

from rabbithole_spark.plans.spec import PipelineError, PipelineSpec, compile_pipeline
from rabbithole_spark.session import get_spark


#: Tables the ad-hoc SQL mode registers as temp views (TESTDATA.md).
_SQL_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def parse_arguments(argv: list[str] | None = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Run a rabbithole-style streaming pipeline on Spark, "
        "or ad-hoc SQL over the parquet tables with --sql"
    )
    parser.add_argument(
        "config", nargs="?", help="YAML pipeline configuration file"
    )
    parser.add_argument(
        "-l",
        "--log-level",
        default="warning",
        choices=["debug", "info", "warning", "error", "critical"],
    )
    parser.add_argument("-f", "--log-file", default=None)
    parser.add_argument(
        "--available-now",
        action="store_true",
        help="process everything currently available, then exit (testing)",
    )
    parser.add_argument("--checkpoint-dir", default=None)
    parser.add_argument("--dead-letter-dir", default=None)
    parser.add_argument(
        "--sql",
        default=None,
        help="ad-hoc mode: run one SQL statement against the parquet "
        "tables in --sf-dir (registered as temp views by name) and "
        "print the result as JSON lines",
    )
    parser.add_argument(
        "--sf-dir",
        default="/root/testdata/sf0.01",
        help="table directory for --sql mode",
    )
    args = parser.parse_args(argv)
    if (args.config is None) == (args.sql is None):
        parser.error("exactly one of the config positional or --sql is required")
    return args


def run_sql(spark, sql: str, sf_dir: str) -> int:
    """Ad-hoc SQL entry point: register every driver table that exists
    in ``sf_dir`` as a temp view, run the statement, print JSON lines.
    The declarative path end to end — Catalyst still sees the parquet
    scans through the views, so pushdown/pruning behave exactly as in
    the registered queries."""
    from rabbithole_spark.session import table

    for name in _SQL_TABLES:
        if os.path.exists(os.path.join(sf_dir, f"{name}.parquet")):
            table(spark, sf_dir, name).createOrReplaceTempView(name)
    for line in spark.sql(sql).toJSON().toLocalIterator():
        print(line)
    return 0


def configure_logging(level: str, log_file: str | None) -> None:
    kwargs: dict = {"level": getattr(logging, level.upper())}
    if log_file:
        kwargs["filename"] = log_file
    logging.basicConfig(
        format="%(asctime)s %(levelname)s %(name)s %(message)s", **kwargs
    )


def _default_checkpoint_dir(config_path: str) -> str:
    """STABLE default checkpoint dir, keyed by the config file's
    absolute path: a fresh mkdtemp per run would forget all source
    offsets, so every CLI restart against the same spool would replay
    the entire history into the sink (duplicating every row — the
    reference broker never redelivers consumed messages). Same-config
    reruns resume; pass --checkpoint-dir to isolate runs on purpose."""
    key = hashlib.sha256(os.path.abspath(config_path).encode()).hexdigest()[:16]
    base = os.path.join(
        os.path.expanduser("~"), ".cache", "rabbithole_spark", "checkpoints"
    )
    os.makedirs(base, exist_ok=True)
    return os.path.join(base, key)


def main(argv: list[str] | None = None) -> int:
    args = parse_arguments(argv)
    configure_logging(args.log_level, args.log_file)
    if args.sql is not None:
        return run_sql(
            get_spark(app_name="rabbithole-spark-sql"), args.sql, args.sf_dir
        )
    try:
        spec = PipelineSpec.from_yaml(args.config)
    except (PipelineError, OSError, ValueError) as exc:
        # narrow on purpose: a bare Exception here would relabel
        # genuine code bugs in the spec layer as "invalid config"
        # and hide their tracebacks behind exit 1
        logging.error("Invalid pipeline config: %s", exc)
        return 1

    spark = get_spark(app_name="rabbithole-spark-pipeline")
    checkpoint = args.checkpoint_dir or _default_checkpoint_dir(args.config)
    try:
        runners = compile_pipeline(
            spark, spec, checkpoint, dead_letter_dir=args.dead_letter_dir
        )
    except PipelineError as exc:
        logging.error("Cannot compile pipeline: %s", exc)
        return 1

    queries = []
    for runner in runners:
        queries.extend(runner.start(available_now=args.available_now))
    try:
        if args.available_now:
            for q in queries:
                q.awaitTermination()
        else:
            spark.streams.awaitAnyTermination()
    except KeyboardInterrupt:
        for q in queries:
            q.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
