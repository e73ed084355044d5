"""Count-or-time micro-batch policy — parity with the reference Batcher.

Reference semantics (rabbithole batcher.py:40-41, 54-109): buffer
messages; flush when ``len(batch) >= size_limit`` OR ``time_limit``
seconds after the batch's *first* message, whichever first; flush
resets both. Defaults size=5, time=15 s.

Spark mapping (SURVEY.md §4.3.2): micro-batch triggers are time-driven,
so the policy compiles to

- ``trigger(processingTime=time_limit)`` — the time half (an upper
  bound on flush latency, like the reference's timer);
- source admission capping rows per micro-batch — the count half
  (``maxFilesPerTrigger`` for file sources; ``max_messages_per_batch``
  in the AMQP DataSource, which ends a batch early when full — the
  exact "flush early when full" behavior);
- sink-side chunking (sinks.sql_sink) so each SQL executemany carries
  at most ``size_limit`` rows — write-amplification parity with
  sql.py:98.

Documented deviation: between triggers, a partially-filled buffer
flushes at the *trigger* cadence, not ``time_limit`` after the first
buffered message. Latency bound is identical; alignment differs
(SURVEY.md §2C.3 notes the reference's windows are per-batch too).
"""

from __future__ import annotations

from dataclasses import dataclass

#: Reference defaults (batcher.py:40-41).
DEFAULT_SIZE_LIMIT = 5
DEFAULT_TIME_LIMIT = 15


@dataclass(frozen=True)
class BatchPolicy:
    size_limit: int = DEFAULT_SIZE_LIMIT
    time_limit: float = DEFAULT_TIME_LIMIT

    @property
    def trigger(self) -> dict:
        """Kwargs for DataStreamWriter.trigger()."""
        return {"processingTime": f"{self.time_limit} seconds"}

    def chunks(self, rows: list) -> list[list]:
        """Split collected micro-batch rows into executemany chunks of at
        most size_limit — per-call write amplification parity."""
        if self.size_limit <= 0:
            return [rows] if rows else []
        return [
            rows[i : i + self.size_limit]
            for i in range(0, len(rows), self.size_limit)
        ]
