"""Sinks + message decode with the reference's error policy.

- decode_messages: content-type check + JSON validation; malformed
  deliveries are *marked*, not crashed on (amqp.py:101-109 parity —
  nack-without-requeue becomes a dead-letter split).
- sql_sink: parameterized-SQL foreachBatch sink; SQL errors are logged
  and the batch dropped, the stream continues (sql.py:99-105 parity,
  at-most-once per batch — documented).
- parquet/dead-letter writers: the durable, replayable upgrades.
"""

from __future__ import annotations

import logging
from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rabbithole_spark.streaming.batcher import BatchPolicy

LOGGER = logging.getLogger(__name__)

JSON_CONTENT_TYPE = "application/json"


def _is_valid_json(body: Column) -> Column:
    # get_json_object('$') is NULL for unparseable bodies. The JSON
    # literal `null` also maps to NULL — treated as invalid; the
    # reference would deliver payload=None, an edge we document away.
    return F.get_json_object(body, "$").isNotNull()


def decode_messages(
    df: DataFrame,
    body_col: str = "body",
    content_type_col: str = "content_type",
) -> DataFrame:
    """Add ``payload`` (the validated JSON body) + ``dead_reason``.

    dead_reason is NULL for good rows; bad rows keep the raw body for
    the dead-letter sink. Content-type mismatch only *warns* in the
    reference (amqp.py:101-103) — it still tries to parse; we mirror
    that: only parse failure kills a row.
    """
    body = F.col(body_col)
    valid = _is_valid_json(body)
    return df.withColumn(
        "payload", F.when(valid, body)
    ).withColumn(
        "dead_reason",
        F.when(~valid, F.lit("undecodable body")),
    ).withColumn(
        "content_type_ok",
        F.coalesce(F.col(content_type_col) == JSON_CONTENT_TYPE, F.lit(False)),
    )


def dead_letter_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, dead) — the streaming analogue of ack vs nack(requeue=False)."""
    good = df.filter(F.col("dead_reason").isNull())
    dead = df.filter(F.col("dead_reason").isNotNull())
    return good, dead


def sql_sink(
    url: str,
    query: str,
    policy: BatchPolicy | None = None,
    positional: bool = False,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch callable executing a parameterized SQL statement.

    The incoming micro-batch is already mapped to parameter columns
    (plans.mapper). Rows bind as named dicts (``:name`` placeholders)
    or positional tuples (``?``), executemany'd in chunks of
    ``policy.size_limit`` (write-amplification parity with sql.py:98).

    Error policy = reference sql.py:99-105: log the query and the
    error, drop the batch, keep the stream alive.

    Supported URLs: ``sqlite:///<path>`` (stdlib sqlite3; also
    ``sqlite:///:memory:`` for tests). For server databases use
    jdbc_table_sink — per-partition JDBC appends, the scale path.
    """
    policy = policy or BatchPolicy()

    if not url.startswith("sqlite:///"):
        raise ValueError(f"sql_sink supports sqlite:/// URLs, got {url!r}")
    db_path = url[len("sqlite:///") :]

    def callback(batch_df: DataFrame, batch_id: int) -> None:
        import sqlite3

        rows = batch_df.collect()
        if not rows:
            return
        params = [
            tuple(row) if positional else row.asDict() for row in rows
        ]
        try:
            con = sqlite3.connect(db_path)
            try:
                with con:
                    for chunk in policy.chunks(params):
                        con.executemany(query, chunk)
            finally:
                con.close()
        except Exception as exc:  # reference: log twice, swallow, continue
            LOGGER.error("Query execution error (batch %s dropped):\n%s", batch_id, query)
            LOGGER.error(str(exc))

    return callback


def jdbc_table_sink(
    url: str, table: str, mode: str = "append", options: dict | None = None
) -> Callable[[DataFrame, int], None]:
    """foreachBatch JDBC append — executors write partitions in parallel
    (connection per partition; no single-connection bottleneck like the
    reference's shared SQLAlchemy connection, SURVEY.md §3.4)."""

    def callback(batch_df: DataFrame, batch_id: int) -> None:
        writer = batch_df.write.format("jdbc").option("url", url).option(
            "dbtable", table
        )
        for k, v in (options or {}).items():
            writer = writer.option(k, v)
        try:
            writer.mode(mode).save()
        except Exception as exc:
            LOGGER.error("JDBC write error (batch %s dropped): %s", batch_id, table)
            LOGGER.error(str(exc))

    return callback


def idempotent_sqlite_table_sink(
    url: str, table: str, columns: list[str]
) -> Callable[[DataFrame, int], None]:
    """Exactly-once table append: batch-id-keyed transactional upsert.

    Structured Streaming guarantees deterministic micro-batch ids; a
    sink that (1) deletes any rows previously written for this batch id
    and (2) inserts the batch rows tagged with it, inside ONE
    transaction, makes replays (crash between write and checkpoint
    commit) idempotent — upgrading sql_sink's at-most-once to
    exactly-once (SURVEY.md §3.4 hard part #4). The target table needs
    a ``__batch_id`` column. The same delete-then-insert pattern works
    on any transactional JDBC store; per-partition parallel writes need
    a staging table + single transactional swap instead.
    """
    if not url.startswith("sqlite:///"):
        raise ValueError(f"sink supports sqlite:/// URLs, got {url!r}")
    db_path = url[len("sqlite:///") :]
    col_list = ", ".join(columns)
    placeholders = ", ".join("?" for _ in columns)
    insert = (
        f"INSERT INTO {table} ({col_list}, __batch_id) "
        f"VALUES ({placeholders}, ?)"
    )

    def callback(batch_df: DataFrame, batch_id: int) -> None:
        import sqlite3

        rows = [tuple(r) + (batch_id,) for r in batch_df.select(*columns).collect()]
        con = sqlite3.connect(db_path)
        try:
            with con:  # one transaction: replay-safe
                con.execute(
                    f"DELETE FROM {table} WHERE __batch_id = ?", (batch_id,)
                )
                con.executemany(insert, rows)
        finally:
            con.close()

    return callback


def parquet_sink_path(df: DataFrame, path: str, checkpoint: str):
    """Durable exactly-once parquet appends (file-sink WAL)."""
    return (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
    )
