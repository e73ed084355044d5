"""Reusable distributed operators — the engine's operator library.

Each operator is a plain DataFrame -> DataFrame transformation built on
Catalyst-visible primitives (joins, windows, aggregates), so pushdown,
AQE, and whole-stage codegen apply. Pandas UDFs appear only where the
built-ins genuinely cannot express the semantics (see similarity.py,
multimodal.py).
"""

from rabbithole_spark.operators.relational import (  # noqa: F401
    asof_join,
    range_join,
    top_k_per_group,
)
