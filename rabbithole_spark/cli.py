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


def parse_arguments(argv: list[str] | None = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Run a rabbithole-style streaming pipeline on Spark"
    )
    parser.add_argument("config", help="YAML pipeline configuration file")
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
    return parser.parse_args(argv)


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
