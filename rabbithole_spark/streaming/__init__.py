"""Structured-streaming parity layer: sources, sinks, batching policy.

Maps the reference's signal-wired pipeline (SURVEY.md §3) onto
checkpointed micro-batch streaming:

- sources.py  — spool-dir JSON-lines source (deterministic AMQP stand-in)
                and the pika-backed AMQP Python DataSource
- sinks.py    — parameterized-SQL foreachBatch sink with the reference's
                error-swallow policy, dead-letter split, parquet sinks
                (plus the sharded sqlite/parquet N-writer twins and
                their fold/union readers)
- batcher.py  — count-or-time micro-batch policy (batcher.py:54-109 parity)
"""
